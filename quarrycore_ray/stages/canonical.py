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

import pandas as pd
import pyarrow as pa

import ray.data

from ..text import normalize_whitespace_array

TURN_SEP = " "  # single space: joining per-turn-normalized texts with one
# space equals whole-document whitespace normalization (canonical.py:155-172).


def normalize_turns(batch: pa.Table) -> pa.Table:
    """Vectorized per-turn whitespace normalization -> `text_norm` column."""
    return batch.append_column("text_norm", normalize_whitespace_array(batch["text"]))


def _assemble_partition(df: pd.DataFrame) -> pa.Table:
    """Vectorized assembly of ALL conversations in one hash partition.

    Sort by (conv_id, turn_idx) — the sort-within-group — then a single
    pandas groupby(sort=False) joins per-turn texts. Empty normalized
    turns are skipped in the join (equals whole-document whitespace
    normalization of the concatenated turns: an empty turn must not
    leave a stray space in the canonical text).
    """
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    counts = df.groupby("conv_id", sort=False).size()
    nonempty = df[df["text_norm"] != ""]
    joined = nonempty.groupby("conv_id", sort=False)["text_norm"].agg(TURN_SEP.join)
    conv_ids = counts.index.to_numpy()
    texts = pd.Series(conv_ids).map(joined).fillna("").to_numpy()
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "canonical_text": pa.array(texts, pa.string()),
            "n_turns": pa.array(counts.to_numpy().astype("int32"), pa.int32()),
        }
    )


def assemble_conversations(
    ds: "ray.data.Dataset", num_partitions: int = 64, lineage: bool = False
) -> "ray.data.Dataset":
    """transcript rows -> one row per conversation (shuffle #1 on conv_id).

    Output schema: conv_id: string, canonical_text: string, n_turns: int32.
    Uses coarse hash partitioning + vectorized per-partition grouping
    (see stages/grouped.py) rather than per-conversation dispatch.
    """
    from .grouped import partitioned_group_map

    ds = ds.map_batches(normalize_turns, batch_format="pyarrow")
    ds = ds.select_columns(["conv_id", "turn_idx", "text_norm"])
    return partitioned_group_map(
        ds, "conv_id", _assemble_partition, num_partitions,
        lineage_stage="canonical" if lineage else None,
    )
