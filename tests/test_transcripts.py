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


class TestConversationWindows:
    def test_windows_hand_case(self):
        from quarrycore_ray.pipelines.transcripts import conversation_windows

        rows = [
            # conv a: 7 turns, wc = 1..7 -> windows (k=4, s=2): [0,3],[2,5]
            *[("a", i, " ".join(["w"] * (i + 1))) for i in range(7)],
            # conv b: 2 turns (< k) -> single window [0,1]
            ("b", 0, "x y"),
            ("b", 1, "z"),
        ]
        out = (
            conversation_windows(_ds(rows), k=4, stride=2)
            .to_pandas()
            .sort_values(["conv_id", "window_idx"])
            .reset_index(drop=True)
        )
        a = out[out["conv_id"] == "a"]
        assert a["window_idx"].tolist() == [0, 1]
        assert a["start_turn"].tolist() == [0, 2]
        assert a["end_turn"].tolist() == [3, 5]
        # wc sums: turns 0-3 -> 1+2+3+4=10; turns 2-5 -> 3+4+5+6=18
        assert a["n_words"].tolist() == [10, 18]
        b = out[out["conv_id"] == "b"]
        assert b["window_idx"].tolist() == [0]
        assert b["start_turn"].tolist() == [0]
        assert b["end_turn"].tolist() == [1]
        assert b["n_words"].tolist() == [3]

    def test_exact_multiple_coverage(self):
        from quarrycore_ray.pipelines.transcripts import conversation_windows

        # 6 turns, k=4, s=2 -> windows at 0 and 2 (2+4=6 fits exactly)
        rows = [("c", i, "one two") for i in range(6)]
        out = conversation_windows(_ds(rows), k=4, stride=2).to_pandas()
        assert len(out) == 2
        assert out["end_turn"].max() == 5
        assert set(out["n_words"]) == {8}
