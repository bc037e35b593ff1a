"""Incremental dedup: new batch vs. a historical seen-hashes corpus.

Reference analog: the production exact layer keeps an ever-growing
SQLite `hash_dedup` table probed per document
(`/root/reference/src/quarrycore/dedup/hash_db.py:136-176`). The
dataflow form: the historical state is a Parquet *seen-hashes* table;
new documents are anti-joined against it. The small-side summary
travels as a broadcast — exact hash set when it fits, Bloom filter
pre-filter + exact confirmation otherwise (semi/anti-join pattern,
SURVEY.md §2.5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..state.bloom import BloomFilter
from ..stages.exact import add_content_hash


def write_seen_hashes(conversations: "rd.Dataset", path: str) -> None:
    """Persist content hashes of a processed corpus (one shuffle-free pass)."""
    hashes = conversations.map_batches(add_content_hash, batch_format="pyarrow")
    hashes.select_columns(["content_hash"]).write_parquet(path)


def incremental_new_only(
    new_conversations: "rd.Dataset",
    seen_hashes_path: str,
    use_bloom: bool = False,
) -> "rd.Dataset":
    """Anti-join: rows of `new_conversations` whose canonical text hash
    is NOT in the historical table.

    `use_bloom=True` broadcasts a Bloom summary instead of the exact
    set — constant memory per worker; Bloom false positives would drop
    novel docs, so positives are confirmed against the exact set (here:
    the same broadcast; at scale: a partitioned lookup of only the
    Bloom-positive minority).
    """
    seen = pq.read_table(seen_hashes_path).column("content_hash").to_pylist()
    if use_bloom:
        bf = BloomFilter(capacity=max(len(seen), 1024))
        bf.add_many(seen)
        summary_ref = ray.put((bf.to_bytes(), set(seen)))
    else:
        summary_ref = ray.put((None, set(seen)))

    def _filter(batch: pa.Table) -> pa.Table:
        blob, exact = ray.get(summary_ref)
        hashes = batch["content_hash"].to_pylist()
        if blob is not None:
            bf_local = BloomFilter.from_bytes(blob)
            maybe_seen = bf_local.contains_many(hashes)
            keep = [
                not (m and h in exact) for m, h in zip(maybe_seen, hashes)
            ]
        else:
            keep = [h not in exact for h in hashes]
        return batch.filter(pa.array(keep))

    return new_conversations.map_batches(add_content_hash, batch_format="pyarrow").map_batches(
        _filter, batch_format="pyarrow"
    )
