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

import pyarrow as pa

import ray.data

from ..text import sha256_hex_array


def add_content_hash(batch: pa.Table) -> pa.Table:
    """Append `content_hash` (sha256 hex of canonical_text)."""
    return batch.append_column("content_hash", sha256_hex_array(batch["canonical_text"]))


def _dedup_partition(tb: pa.Table) -> pa.Table:
    """Vectorized exact-dedup of ALL hash groups in one partition.

    One polars grouped pass: min-conv_id representative (its text and
    turn count via sort-first), full member list, group size.
    """
    import polars as pl

    has_domain = "domain" in tb.column_names
    df = pl.from_arrow(tb).sort(["content_hash", "conv_id"])
    aggs = [
        pl.col("conv_id").first().alias("conv_id"),
        pl.col("canonical_text").first().alias("canonical_text"),
        pl.col("n_turns").first().alias("n_turns"),
        pl.col("conv_id").alias("exact_members"),
        pl.len().cast(pl.Int64).alias("exact_group_size"),
    ]
    cols = ["conv_id", "canonical_text", "n_turns", "content_hash",
            "exact_members", "exact_group_size"]
    fields = [
        ("conv_id", pa.string()),
        ("canonical_text", pa.string()),
        ("n_turns", pa.int32()),
        ("content_hash", pa.string()),
        ("exact_members", pa.list_(pa.string())),
        ("exact_group_size", pa.int64()),
    ]
    if has_domain:  # optional content-domain tag rides with the rep
        aggs.append(pl.col("domain").first().alias("domain"))
        cols.append("domain")
        fields.append(("domain", pa.string()))
    out = df.group_by("content_hash", maintain_order=True).agg(aggs).select(cols)
    return out.to_arrow().cast(pa.schema(fields))


def exact_dedup(
    conversations: "ray.data.Dataset", num_partitions: int | None = None, lineage: bool = False
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
        lineage_stage="exact" if lineage else None, arrow=True,
    )
