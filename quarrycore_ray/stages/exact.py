"""Stage S2 — exact dedup by SHA-256 of canonical text.

Reference semantics: the exact layer inserts sha256(canonical) into a
SQLite table with a PRIMARY KEY; a conflict means duplicate
(`/root/reference/src/quarrycore/dedup/hash_db.py:136-176`). The
shared-index probe becomes a hash-partitioned groupby: all
conversations with the same `content_hash` land in one group; the
minimum `conv_id` is the deterministic representative (the reference's
"first doc wins" is arrival-order-nondeterministic; see SURVEY.md
§2.10).

Output is one row per distinct content hash carrying the representative
plus the full member list, so the expensive MinHash/LSH stages run on
unique texts only — the distributed analog of the reference's exact
short-circuit (`deduplicator/deduplicator.py:202-251`).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..text import sha256_hex_array


def add_content_hash(batch: pa.Table) -> pa.Table:
    """Append `content_hash` (sha256 hex of canonical_text)."""
    return batch.append_column("content_hash", sha256_hex_array(batch["canonical_text"]))


def _dedup_partition(df: pd.DataFrame) -> pa.Table:
    """Vectorized exact-dedup of ALL hash groups in one partition.

    Sorted by (content_hash, conv_id), the first row of each run is the
    min-conv_id representative; member lists come from one grouped agg.
    """
    df = df.sort_values(["content_hash", "conv_id"], kind="mergesort")
    members = df.groupby("content_hash", sort=False)["conv_id"].agg(list)
    sizes = df.groupby("content_hash", sort=False).size()
    first = df.drop_duplicates("content_hash", keep="first")
    hashes = first["content_hash"].to_numpy()
    return pa.table(
        {
            "conv_id": pa.array(first["conv_id"].to_numpy(), pa.string()),
            "canonical_text": pa.array(first["canonical_text"].to_numpy(), pa.string()),
            "n_turns": pa.array(
                first["n_turns"].to_numpy().astype("int32"), pa.int32()
            ),
            "content_hash": pa.array(hashes, pa.string()),
            "exact_members": pa.array(
                pd.Series(hashes).map(members).tolist(), pa.list_(pa.string())
            ),
            "exact_group_size": pa.array(
                pd.Series(hashes).map(sizes).to_numpy().astype("int64"), pa.int64()
            ),
        }
    )


def exact_dedup(
    conversations: "ray.data.Dataset", num_partitions: int = 64, lineage: bool = False
) -> "ray.data.Dataset":
    """conversations -> one row per distinct canonical text (shuffle #2).

    Output adds: content_hash, exact_members (list<string> incl. the
    representative), exact_group_size. Coarse hash partitioning +
    vectorized per-partition grouping (stages/grouped.py).
    """
    from .grouped import partitioned_group_map

    ds = conversations.map_batches(add_content_hash, batch_format="pyarrow")
    return partitioned_group_map(
        ds, "content_hash", _dedup_partition, num_partitions,
        lineage_stage="exact" if lineage else None,
    )
