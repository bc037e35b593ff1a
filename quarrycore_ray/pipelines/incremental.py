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
    confirm: str = "broadcast",
) -> "rd.Dataset":
    """Anti-join: rows of `new_conversations` whose canonical text hash
    is NOT in the historical table.

    `use_bloom=True` broadcasts a Bloom summary instead of the exact
    set — constant memory per worker; Bloom false positives would drop
    novel docs, so positives are confirmed against the exact set.
    `confirm` picks how:

    - "broadcast": confirm against a broadcast exact set (fine while
      the seen table fits the object store).
    - "partitioned" (requires use_bloom): the 100 TB shape — ONLY the
      constant-size Bloom blob is broadcast; the Bloom-positive
      minority is confirmed with a partitioned hash anti-join against
      the seen-hashes Dataset (stages/grouped.py:attach_lookup), so no
      worker ever holds the exact set.
    """
    if confirm == "partitioned":
        if not use_bloom:
            raise ValueError("confirm='partitioned' requires use_bloom=True")
        return _incremental_partitioned(new_conversations, seen_hashes_path)

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
            bf_local = BloomFilter.from_bytes(blob, copy=False)
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


def _incremental_partitioned(
    new_conversations: "rd.Dataset", seen_hashes_path: str
) -> "rd.Dataset":
    """Bloom pre-filter + partitioned anti-join confirmation.

    Definitely-new rows (Bloom negative) stream through untouched; only
    the Bloom-positive minority is shuffled against the seen table.
    """
    from ..stages.grouped import attach_lookup

    # the Bloom summary derives from the seen table in one streaming pass
    seen_ds = rd.read_parquet(seen_hashes_path)
    n_seen = seen_ds.count()
    bf = BloomFilter(capacity=max(n_seen, 1024))
    for b in seen_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        bf.add_many(b["content_hash"].to_pylist())
    blob_ref = ray.put(bf.to_bytes())

    hashed = new_conversations.map_batches(
        add_content_hash, batch_format="pyarrow"
    ).materialize()
    schema = hashed.schema().base_schema

    def _split(positive: bool):
        def _f(batch: pa.Table) -> pa.Table:
            bf_local = BloomFilter.from_bytes(ray.get(blob_ref), copy=False)
            maybe = bf_local.contains_many(batch["content_hash"].to_pylist())
            mask = maybe if positive else [not m for m in maybe]
            return batch.filter(pa.array(mask))

        return _f

    negatives = hashed.map_batches(_split(False), batch_format="pyarrow")
    positives = hashed.map_batches(_split(True), batch_format="pyarrow")

    def _mark(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": batch["content_hash"],
                "_seen": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    confirmed = attach_lookup(
        positives, schema, ["content_hash"],
        seen_ds.map_batches(_mark, batch_format="pyarrow"),
        "content_hash", "_seen", pa.int8(), ["_seen"],
    )

    def _novel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_null(batch["_seen"])).drop_columns(["_seen"])

    return negatives.union(confirmed.map_batches(_novel, batch_format="pyarrow"))
