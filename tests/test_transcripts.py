"""Tests for pipelines/transcripts.py (context-budget truncation)."""

import pyarrow as pa
import pytest

import ray.data as rd

from quarrycore_ray.pipelines.transcripts import (
    apply_truncation,
    truncate_conversations,
)


def _ds(rows):
    tb = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(
                ["user" if r[1] % 2 == 0 else "assistant" for r in rows],
                pa.string(),
            ),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return rd.from_arrow(tb)


ROWS = [
    # conv a: word counts 3, 2, 4 — budget 6 keeps the (2, 4) suffix
    ("a", 0, "one two three"),
    ("a", 1, "four five"),
    ("a", 2, "a b c d"),
    # conv b: final turn alone exceeds the budget — forced keep
    ("b", 0, "x y"),
    ("b", 1, "w1 w2 w3 w4 w5 w6 w7 w8"),
    # conv c: zero-word turns only
    ("c", 0, ""),
    ("c", 1, "  \n"),
]


class TestTruncateConversations:
    def test_suffix_budget(self):
        out = (
            truncate_conversations(_ds(ROWS), budget=6)
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["a", "n_turns"] == 3
        assert out.loc["a", "kept_turns"] == 2
        assert out.loc["a", "kept_words"] == 6
        assert out.loc["a", "first_kept_idx"] == 1

    def test_forced_last_turn(self):
        out = (
            truncate_conversations(_ds(ROWS), budget=6)
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["b", "kept_turns"] == 1
        assert out.loc["b", "kept_words"] == 8
        assert out.loc["b", "first_kept_idx"] == 1

    def test_zero_word_turns(self):
        out = (
            truncate_conversations(_ds(ROWS), budget=6)
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["c", "kept_turns"] == 2
        assert out.loc["c", "kept_words"] == 0
        assert out.loc["c", "first_kept_idx"] == 0

    def test_apply_matches_stats(self):
        stats = (
            truncate_conversations(_ds(ROWS), budget=6)
            .to_pandas()
            .set_index("conv_id")
        )
        kept = apply_truncation(_ds(ROWS), budget=6).to_pandas()
        for cid, grp in kept.groupby("conv_id"):
            assert len(grp) == stats.loc[cid, "kept_turns"]
            assert grp["turn_idx"].min() == stats.loc[cid, "first_kept_idx"]
        # kept rows are exactly the suffix: contiguous turn_idx up to max
        for cid, grp in kept.groupby("conv_id"):
            idx = sorted(grp["turn_idx"])
            assert idx == list(range(idx[0], idx[0] + len(idx)))

    def test_ws_variant_counts_like_base(self):
        rows = [("p", 0, "alpha beta gamma"), ("q", 0, "alpha  beta  gamma\n")]
        out = (
            truncate_conversations(_ds(rows), budget=2)
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["p", "kept_words"] == out.loc["q", "kept_words"] == 3
