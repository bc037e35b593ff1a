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


def _dedup_group(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("conv_id", kind="mergesort")
    rep = g.iloc[0]
    return pd.DataFrame(
        {
            "conv_id": [rep["conv_id"]],
            "canonical_text": [rep["canonical_text"]],
            "n_turns": pd.array([rep["n_turns"]], dtype="int32"),
            "content_hash": [rep["content_hash"]],
            "exact_members": [g["conv_id"].tolist()],
            "exact_group_size": pd.array([len(g)], dtype="int64"),
        }
    )


def exact_dedup(conversations: "ray.data.Dataset") -> "ray.data.Dataset":
    """conversations -> one row per distinct canonical text (shuffle #2).

    Output adds: content_hash, exact_members (list<string> incl. the
    representative), exact_group_size.
    """
    ds = conversations.map_batches(add_content_hash, batch_format="pyarrow")
    return ds.groupby("content_hash").map_groups(_dedup_group, batch_format="pandas")
