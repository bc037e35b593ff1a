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


def _assemble_group(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("turn_idx", kind="mergesort")
    # skip empty normalized turns when joining: equals whole-document
    # whitespace normalization of the concatenated turns (an empty turn
    # must not leave a stray double/leading space in the canonical text)
    parts = [t for t in g["text_norm"].tolist() if t]
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "canonical_text": [TURN_SEP.join(parts)],
            "n_turns": pd.array([len(g)], dtype="int32"),
        }
    )


def assemble_conversations(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """transcript rows -> one row per conversation.

    Output schema: conv_id: string, canonical_text: string, n_turns: int32.
    """
    ds = ds.map_batches(normalize_turns, batch_format="pyarrow")
    ds = ds.select_columns(["conv_id", "turn_idx", "text_norm"])
    return ds.groupby("conv_id").map_groups(_assemble_group, batch_format="pandas")
