"""Stage S1 — per-turn canonicalization + conversation assembly.

Reference semantics: `CanonicalHTMLProcessor.canonicalize`
(`/root/reference/src/quarrycore/dedup/canonical.py:50-77`) normalizes a
document to whitespace-collapsed text before hashing. Our document unit
is one *conversation*: turns are normalized per-row (vectorized Arrow
kernels, zero-copy batches), then assembled per `conv_id` with a
sort-within-group on `turn_idx` — never a global sort — preserving the
north-rule invariant of per-turn text equality under stable turn
ordering.

Scale notes: the assembly groupby is shuffle #1, hash-partitioned on
`conv_id`. Groups are single conversations (bounded size), so
`map_groups` materializing one group at a time is safe at any corpus
size; conversation-length skew is bounded by turn counts, not corpus
size.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..text import normalize_whitespace_array

TURN_SEP = " "  # single space: joining per-turn-normalized texts with one
# space equals whole-document whitespace normalization (canonical.py:155-172).


def normalize_turns(batch: pa.Table) -> pa.Table:
    """Vectorized per-turn whitespace normalization -> `text_norm` column."""
    return batch.append_column("text_norm", normalize_whitespace_array(batch["text"]))


def _assemble_partition(tb: pa.Table) -> pa.Table:
    """Vectorized assembly of ALL conversations in one hash partition.

    Sort by (conv_id, turn_idx) — the sort-within-group — then one
    polars grouped string-join (Arrow in / Arrow out, no pandas
    round-trip). Empty normalized turns are skipped in the join (equals
    whole-document whitespace normalization of the concatenated turns:
    an empty turn must not leave a stray space in the canonical text).
    """
    import polars as pl

    has_domain = "domain" in tb.column_names
    df = pl.from_arrow(tb).sort(["conv_id", "turn_idx"])
    count_aggs = [pl.len().cast(pl.Int32).alias("n_turns")]
    cols = ["conv_id", "canonical_text", "n_turns"]
    fields = [
        ("conv_id", pa.string()),
        ("canonical_text", pa.string()),
        ("n_turns", pa.int32()),
    ]
    if has_domain:
        # optional content-domain tag: first turn's value represents the
        # conversation (tags are per-document in the reference; a mixed
        # conversation keeps its opening domain deterministically)
        count_aggs.append(pl.col("domain").first().alias("domain"))
        cols.append("domain")
        fields.append(("domain", pa.string()))
    counts = df.group_by("conv_id", maintain_order=True).agg(count_aggs)
    joined = (
        df.filter(pl.col("text_norm") != "")
        .group_by("conv_id", maintain_order=True)
        .agg(pl.col("text_norm").str.join(TURN_SEP).alias("canonical_text"))
    )
    out = (
        counts.join(joined, on="conv_id", how="left")
        .with_columns(pl.col("canonical_text").fill_null(""))
        .select(cols)
    )
    return out.to_arrow().cast(pa.schema(fields))


def assemble_conversations(
    ds: "ray.data.Dataset", num_partitions: int | None = None, lineage: bool = False
) -> "ray.data.Dataset":
    """transcript rows -> one row per conversation (shuffle #1 on conv_id).

    Output schema: conv_id: string, canonical_text: string, n_turns: int32.
    Uses coarse hash partitioning + vectorized per-partition grouping
    (see stages/grouped.py) rather than per-conversation dispatch.
    """
    from .grouped import partitioned_group_map

    # schema probe BEFORE the map: on a parquet-backed input this is
    # metadata-only, while probing the mapped dataset would execute it
    schema = ds.schema()
    keep_cols = ["conv_id", "turn_idx", "text_norm"]
    if schema is not None and "domain" in schema.names:
        keep_cols.append("domain")  # optional tag rides to the reps
    ds = ds.map_batches(normalize_turns, batch_format="pyarrow")
    ds = ds.select_columns(keep_cols)
    return partitioned_group_map(
        ds, "conv_id", _assemble_partition, num_partitions,
        lineage_stage="canonical" if lineage else None, arrow=True,
    )
