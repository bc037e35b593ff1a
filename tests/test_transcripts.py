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


class TestDHash:
    def test_constant_shift_invariance(self):
        import numpy as np

        from quarrycore_ray.multimodal import dhash16

        base = (np.arange(80, dtype=np.int64) % 200).reshape(8, 10)
        shifted = base + 30  # constant intensity shift, no wraparound
        assert dhash16(base.astype(np.uint8)) == dhash16(
            shifted.astype(np.uint8)
        )

    def test_distinct_patterns_differ(self):
        import numpy as np

        from quarrycore_ray.multimodal import dhash16

        asc = np.tile(np.arange(10, dtype=np.uint8) * 20, (8, 1))
        desc = asc[:, ::-1].copy()
        a, d = dhash16(asc), dhash16(desc)
        assert a != d
        # ascending rows: every left cell mean < right cell mean
        assert a == 0xFFFF
        assert d == 0

    def test_rgb_reduces_to_channel_sum(self):
        import numpy as np

        from quarrycore_ray.multimodal import dhash16

        g = np.tile(np.arange(10, dtype=np.uint8) * 10, (8, 1))
        rgb = np.stack([g, g, g], axis=2)
        assert dhash16(rgb) == dhash16(g)

    def test_real_codec_roundtrip_groups(self, tmp_path):
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.documents import image_dhash_dedup

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(40)), pa.int64()),
                    "text": pa.array(["t"] * 40, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = image_dhash_dedup(str(tmp_path)).to_pandas()
        assert len(out) == 40
        # gradient rasters with equal dims and no wrap split collide:
        # at least one non-singleton perceptual group must exist
        assert (out["group_size"] > 1).any()
        # rep is the min doc_id of its group
        g = out.groupby("dhash")["doc_id"].min()
        assert (out["rep_id"] == out["dhash"].map(g)).all()


class TestAudioFingerprint:
    def test_shift_invariance_on_envelope(self):
        import numpy as np

        from quarrycore_ray.multimodal import audio_fp15

        # a loudness ramp: every next frame carries more energy
        x = (np.arange(160) * 100 % 20000).astype(np.int64)
        ramp = np.sort(np.abs(x)).astype(np.int16)
        assert audio_fp15(ramp) == (1 << 15) - 1
        # reversed envelope -> all-descending energies -> zero bits
        assert audio_fp15(ramp[::-1].copy()) == 0

    def test_short_clip_guard(self):
        import numpy as np

        from quarrycore_ray.multimodal import audio_fp15

        assert audio_fp15(np.array([1, 2, 3], dtype=np.int16)) == 0

    def test_real_codec_groups(self, tmp_path):
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.documents import audio_fingerprint_dedup

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(64)), pa.int64()),
                    "text": pa.array(["t"] * 64, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = audio_fingerprint_dedup(str(tmp_path)).to_pandas()
        assert len(out) == 64
        assert (out["group_size"] > 1).any()
        g = out.groupby("afp")["doc_id"].min()
        assert (out["rep_id"] == out["afp"].map(g)).all()


class TestMedoidsAndTrending:
    def test_medoid_identity_matches_pairwise(self, tmp_path):
        import numpy as np
        import pyarrow.parquet as pq

        from quarrycore_ray.functions.similarity import label_medoids

        rng = [[float(((i * 7 + j * 3) % 11) - 5) / 3 for j in range(4)]
               for i in range(12)]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(range(12)), pa.int64()),
                    "embedding": pa.array(rng, pa.list_(pa.float32())),
                    "label": pa.array([i % 2 for i in range(12)], pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        out = label_medoids(str(tmp_path)).to_pandas().set_index("label")
        # brute-force pairwise verification of the sum-vector identity
        q = np.floor(
            np.array(rng, dtype=np.float32).astype(np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        for lab in (0, 1):
            ids = [i for i in range(12) if i % 2 == lab]
            costs = {
                a: sum(int(((q[a] - q[b]) ** 2).sum()) for b in ids)
                for a in ids
            }
            best = min(ids, key=lambda a: (costs[a], a))
            assert out.loc[lab, "medoid_id"] == best
            assert out.loc[lab, "cost_u"] == costs[best]

    def test_trending_rank_boundary(self, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.relational import events_trending_types

        base = dt.datetime(2026, 1, 1)
        rows = (
            [("a", base)] * 5 + [("b", base)] * 5  # tie broken by type
            + [("c", base)] * 7
            + [("d", base)] * 1
            + [("z", base + dt.timedelta(days=1))] * 2
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([0] * len(rows), pa.int64()),
                    "event_type": pa.array([r[0] for r in rows], pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            str(tmp_path / "events.parquet"),
        )
        out = (
            events_trending_types(str(tmp_path))
            .to_pandas()
            .sort_values(["day", "rank"])
            .reset_index(drop=True)
        )
        d1 = out[out["rank"].notna()][out["day"] == out["day"].min()]
        assert d1["event_type"].tolist() == ["c", "a", "b"]  # d cut at k=3
        assert d1["rank"].tolist() == [1, 2, 3]
        d2 = out[out["day"] == out["day"].max()]
        assert d2["event_type"].tolist() == ["z"]


class TestQuestionsPerConversation:
    def test_counts_and_roles(self):
        from quarrycore_ray.pipelines.transcripts import (
            questions_per_conversation,
        )

        rows = [
            ("a", 0, "is this a question?"),   # user, q
            ("a", 1, "yes it is"),             # assistant
            ("a", 2, "really? are you sure?"), # user, q
            ("a", 3, "indeed?"),               # assistant, q
            ("b", 0, "no questions here"),
        ]
        out = (
            questions_per_conversation(_ds(rows))
            .to_pandas()
            .set_index("conv_id")
        )
        assert out.loc["a", "n_turns"] == 4
        assert out.loc["a", "n_question_turns"] == 3
        assert out.loc["a", "n_user_question_turns"] == 2
        assert out.loc["b", "n_question_turns"] == 0


class TestDauWau:
    def test_rolling_distinct(self, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.relational import events_dau_wau

        base = dt.datetime(2026, 1, 1)
        # user 1 active day 0 and day 3; user 2 active day 0 only;
        # user 3 active day 8 (outside user 1/2's 7-day windows)
        rows = [
            (1, base),
            (1, base),  # duplicate event, same day
            (2, base),
            (1, base + dt.timedelta(days=3)),
            (3, base + dt.timedelta(days=8)),
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array(["x"] * len(rows), pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            str(tmp_path / "events.parquet"),
        )
        out = (
            events_dau_wau(str(tmp_path))
            .to_pandas()
            .set_index("day")
            .sort_index()
        )
        d0, d3, d8 = (base, base + dt.timedelta(days=3), base + dt.timedelta(days=8))
        assert out.loc[d0, "dau"] == 2 and out.loc[d0, "wau"] == 2
        # day 3: user 1 active; WAU = users 1 and 2 (both within 7 days),
        # and user 1 counted ONCE despite day-0 + day-3 activity
        assert out.loc[d3, "dau"] == 1 and out.loc[d3, "wau"] == 2
        # day 8: only user 3 (days 0/3 are > 6 days back... day 3 is
        # 5 days back -> user 1 still in the window)
        assert out.loc[d8, "dau"] == 1 and out.loc[d8, "wau"] == 2
        # only activity days appear
        assert len(out) == 3


class TestStratifiedSample:
    def test_hamilton_allocation_sums_to_k(self, tmp_path):
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.dataset import stratified_sample_docs

        # sizes 7 / 2 / 1 with K = 5: quotas 3.5 / 1.0 / 0.5 ->
        # base 3/1/0, remainders .5/.0/.5 -> leftover 1 goes to the
        # tied-largest remainder with the LEXICALLY SMALLER source
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(10)), pa.int64()),
                    "text": pa.array(["t"] * 10, pa.string()),
                    "lang": pa.array(["en"] * 10, pa.string()),
                    "source": pa.array(
                        ["a"] * 7 + ["b"] * 2 + ["c"], pa.string()
                    ),
                    "n_chars": pa.array([1] * 10, pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = stratified_sample_docs(str(tmp_path), total_k=5).to_pandas()
        got = out.groupby("source")["doc_id"].count().to_dict()
        # rem(a) = (5*7) % 10 = 5, rem(b) = 0, rem(c) = 5; leftover =
        # 5 - (3+1+0) = 1 -> the a/c remainder tie breaks source-asc
        assert got == {"a": 4, "b": 1}
        assert len(out) == 5
        assert (out["pick_rank"] >= 1).all()


class TestTurnStutter:
    """Agent-loop detection (transcripts.turn_stutter_stats): adjacent
    turns with near-identical token SETS count as stutter; distinct
    turns, whitespace variants, and empty-vs-empty pairs behave per
    the integer 5*inter >= 4*union predicate."""

    def _run(self, rows):
        from quarrycore_ray.pipelines.transcripts import turn_stutter_stats

        out = turn_stutter_stats(_ds(rows)).to_pandas()
        return {
            r.conv_id: (int(r.n_pairs), int(r.n_stutter))
            for r in out.itertuples()
        }

    def test_exact_repeat_and_reorder(self):
        got = self._run(
            [
                # turn 1 repeats turn 0 (reordered, extra whitespace):
                # identical token set -> stutter; turn 2 is disjoint
                ("a", 0, "alpha beta gamma delta epsilon"),
                ("a", 1, "delta  epsilon alpha\tbeta gamma"),
                ("a", 2, "zeta eta theta iota kappa"),
            ]
        )
        assert got["a"] == (2, 1)

    def test_four_fifths_boundary(self):
        # |a|=|b|=9, inter=8 -> union=10, 5*8 >= 4*10 holds (J=0.8)
        a = " ".join(f"t{i}" for i in range(9))
        b = " ".join(f"t{i}" for i in range(8)) + " zzz"
        # |c|=9 vs |d|=9, inter=7 -> union=11, 35 < 44 fails
        d = " ".join(f"t{i}" for i in range(7)) + " y1 y2"
        got = self._run([("p", 0, a), ("p", 1, b), ("q", 0, a), ("q", 1, d)])
        assert got["p"] == (1, 1)
        assert got["q"] == (1, 0)

    def test_empty_pairs_do_not_count(self):
        got = self._run([("e", 0, ""), ("e", 1, "  "), ("e", 2, "word word")])
        # empty-vs-empty union is 0 (excluded); repeated WORD within one
        # turn is one token, vs empty -> union 1, inter 0
        assert got["e"] == (2, 0)

    def test_single_turn_conversation(self):
        got = self._run([("s", 0, "only turn")])
        assert got["s"] == (0, 0)


class TestToolChains:
    """Ordered tool-chain inventory (transcripts.tool_chain_stats)."""

    def test_chains_and_empty(self):
        import pyarrow as pa

        from quarrycore_ray.pipelines.transcripts import tool_chain_stats

        tb = pa.table(
            {
                "conv_id": pa.array(
                    ["a", "a", "a", "a", "b", "b", "c"], pa.string()
                ),
                "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 0], pa.int32()),
                "tool": pa.array(
                    ["", "search", "", "code", "", "search", ""], pa.string()
                ),
            }
        )
        out = tool_chain_stats(rd.from_arrow(tb)).to_pandas()
        got = dict(zip(out["chain"], out["n_convs"]))
        assert got == {"search>code": 1, "search": 1, "": 1}

    def test_order_is_turn_order_not_input_order(self):
        import pyarrow as pa

        from quarrycore_ray.pipelines.transcripts import tool_chain_stats

        # rows arrive turn-reversed; the chain must follow turn_idx
        tb = pa.table(
            {
                "conv_id": pa.array(["r", "r"], pa.string()),
                "turn_idx": pa.array([3, 1], pa.int32()),
                "tool": pa.array(["code", "search"], pa.string()),
            }
        )
        out = tool_chain_stats(rd.from_arrow(tb)).to_pandas()
        assert dict(zip(out["chain"], out["n_convs"])) == {"search>code": 1}


class TestOpeningGroups:
    """Template-opening groups (transcripts.conversation_opening_groups)."""

    def test_groups_and_normalization(self):
        from quarrycore_ray.pipelines.transcripts import (
            conversation_opening_groups,
        )

        rows = [
            # three convs sharing the same first-two-turn content, one
            # with messy whitespace; later turns differ and are ignored
            ("a", 0, "hello world"), ("a", 1, "hi there"), ("a", 2, "x"),
            ("b", 0, " hello \t world"), ("b", 1, "hi  there\n"),
            ("c", 0, "hello world"), ("c", 1, "hi there"), ("c", 2, "zz"),
            # singleton opening: excluded
            ("d", 0, "unique opening"), ("d", 1, "hi there"),
        ]
        out = conversation_opening_groups(_ds(rows)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["opening"] == "hello world | hi there"
        assert int(r["n_convs"]) == 3
        assert r["rep_conv_id"] == "a"


class TestCurateConversations:
    """Conversation curation gate (transcripts.curate_conversations):
    first-reject attribution across the four rules, total lineage."""

    def test_rules_and_first_reject(self, tmp_path):
        from quarrycore_ray.pipelines.transcripts import curate_conversations

        rows = [
            # kept: two balanced turns
            ("keep", 0, "hello there friend"), ("keep", 1, "hi yourself pal"),
            # too_short wins even though the turn is also empty
            ("short", 0, ""),
            # empty turn mid-conversation
            ("empty", 0, "something here"), ("empty", 1, ""),
            ("empty", 2, "more words now"),
            # stutter: near-identical adjacent turns (also unbalanced-ish,
            # but stutter is attributed first)
            ("loop", 0, "alpha beta gamma delta epsilon"),
            ("loop", 1, "epsilon delta gamma beta alpha"),
            # unbalanced: assistant says one word to the user's twelve
            ("mono", 0, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
            ("mono", 1, "ok"),
        ]
        out = curate_conversations(_ds(rows)).to_pandas()
        got = {
            r.conv_id: (int(r.keep), r.reject_stage)
            for r in out.itertuples()
        }
        assert got == {
            "keep": (1, None),
            "short": (0, "too_short"),
            "empty": (0, "empty_turn"),
            "loop": (0, "stutter"),
            "mono": (0, "unbalanced"),
        }
        # total lineage: one row per conversation
        assert len(out) == 5


class TestCurateThenDedup:
    """Composed gate -> dedup (transcripts.curate_then_dedup): rejected
    conversations never reach dedup; survivors cluster as usual."""

    def test_gate_filters_before_dedup(self):
        from quarrycore_ray.pipelines.transcripts import curate_then_dedup

        rows = [
            # two exact-dup conversations that pass the gate
            ("a", 0, "hello there friend of mine"),
            ("a", 1, "hi yourself my good pal"),
            ("b", 0, "hello there friend of mine"),
            ("b", 1, "hi yourself my good pal"),
            # a stuttering conversation that would ALSO be an exact dup
            # of a/b if it reached dedup — the gate drops it first
            ("c", 0, "hello there friend of mine"),
            ("c", 1, "hello there friend of mine"),
            # too short
            ("d", 0, "lonely"),
        ]
        out = curate_then_dedup(_ds(rows)).to_pandas()
        assert sorted(out["conv_id"]) == ["a", "b"]
        got = out.set_index("conv_id")
        assert got.loc["b", "cluster_id"] == "a"
        assert got.loc["b", "dup_kind"] == "exact"
        assert bool(got.loc["a", "is_representative"])


class TestApplyCuration:
    def test_surviving_rows_match_gate(self):
        from quarrycore_ray.pipelines.transcripts import (
            apply_curation,
            curate_conversations,
        )

        rows = [
            ("keep", 0, "hello there friend"), ("keep", 1, "hi yourself pal"),
            ("short", 0, "alone"),
            ("mono", 0, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
            ("mono", 1, "ok"),
        ]
        ds = _ds(rows)
        gate = curate_conversations(ds).to_pandas()
        out = apply_curation(ds).to_pandas()
        kept = set(gate[gate.keep == 1].conv_id)
        assert set(out.conv_id) == kept
        # every turn of every kept conversation survives, none others
        assert len(out) == sum(1 for r in rows if r[0] in kept)
        # schema passes through untouched (whatever columns came in)
        assert set(out.columns) == set(ds.schema().names)


class TestTurnSimhashDupPairs:
    """Turn-level SimHash near-dedup (transcripts.turn_simhash_dup_pairs):
    cross-conversation pairs at Hamming <= 3, whitespace variants
    collide (canonicalized), intra-conversation repeats are excluded,
    and over-cap band buckets fall back to the k-sorted chain."""

    def _run(self, rows, **kw):
        from quarrycore_ray.pipelines.transcripts import turn_simhash_dup_pairs

        df = turn_simhash_dup_pairs(_ds(rows), **kw).to_pandas()
        return {
            (r.a_conv, int(r.a_turn), r.b_conv, int(r.b_turn)): int(r.hamming)
            for r in df.itertuples()
        }

    def test_exact_and_ws_variants_pair(self):
        text = "the quick brown fox jumps over the lazy dog tonight"
        got = self._run(
            [
                ("a", 0, text),
                ("b", 0, "the  quick brown\tfox jumps  over the lazy dog tonight "),
                ("c", 0, "completely different words about ray data pipelines here"),
            ]
        )
        assert got == {("a", 0, "b", 0): 0}

    def test_near_variant_within_hamming(self):
        # a one-word edit of a long sentence stays within Hamming 3
        # often but not always; use a known-close pair: same text with
        # one trailing word changed barely perturbs the majority votes
        base = " ".join(f"word{i}" for i in range(40))
        edit = " ".join(f"word{i}" for i in range(39)) + " word39x"
        got = self._run([("a", 0, base), ("b", 3, edit)])
        # the pair is either matched (ham <= 3) or absent; assert the
        # deterministic observed behavior and the key shape
        if got:
            ((ac, at, bc, bt),) = got.keys()
            assert (ac, at, bc, bt) == ("a", 0, "b", 3)

    def test_intra_conversation_excluded(self):
        text = "identical boilerplate assistant reply used twice in one conv"
        got = self._run([("a", 0, text), ("a", 2, text)])
        assert got == {}

    def test_empty_turns_skipped(self):
        got = self._run([("a", 0, ""), ("b", 0, "   "), ("c", 0, "\n")])
        assert got == {}

    def test_bucket_cap_chain(self):
        # 12 identical turns across 12 conversations with cap=4: every
        # band bucket is the same 12 rows -> chain pairs only (11 edges
        # per band, deduped across bands), all Hamming 0, consecutive in
        # composite-key order
        text = "you are a helpful assistant that answers questions clearly"
        rows = [(f"c{i:02d}", 0, text) for i in range(12)]
        got = self._run(rows, bucket_cap=4)
        expect = {
            (f"c{i:02d}", 0, f"c{i+1:02d}", 0): 0 for i in range(11)
        }
        assert got == expect

    def test_bucket_cap_chain_survives_intra_conv_repeat(self):
        # an intra-conversation repeat sitting between two conversations
        # in k-order must NOT split the group: each row links to the
        # head of the NEXT conversation's run, so a0 and a1 both reach
        # b0 and the bucket stays one connected component
        text = "you are a helpful assistant that answers questions clearly"
        rows = [("a", 0, text), ("a", 1, text), ("b", 0, text), ("c", 0, text)]
        got = self._run(rows, bucket_cap=2)
        assert got == {
            ("a", 0, "b", 0): 0,
            ("a", 1, "b", 0): 0,
            ("b", 0, "c", 0): 0,
        }

    def test_full_pairs_under_cap(self):
        text = "you are a helpful assistant that answers questions clearly"
        rows = [(f"c{i}", 0, text) for i in range(4)]
        got = self._run(rows)
        assert len(got) == 6  # C(4,2)
        assert all(h == 0 for h in got.values())


class TestTurnDedupConversations:
    """Segment-tier duplicate-turn REMOVAL
    (transcripts.turn_dedup_conversations): transitive groups keep only
    the min-composite-key representative; conversations reassemble from
    surviving turns."""

    def _run(self, rows, **kw):
        import hashlib

        from quarrycore_ray.pipelines.transcripts import (
            turn_dedup_conversations,
        )

        df = (
            turn_dedup_conversations(_ds(rows), **kw)
            .to_pandas()
            .set_index("conv_id")
            .sort_index()
        )
        return df, hashlib

    def test_representative_kept_others_removed(self):
        boiler = "you are a helpful assistant that answers questions clearly"
        rows = [
            ("a", 0, boiler), ("a", 1, "unique alpha turn with enough words"),
            ("b", 0, boiler), ("b", 1, "unique beta turn with enough words"),
            ("c", 0, boiler),
        ]
        df, hashlib = self._run(rows)
        # a#0000 is the min key -> kept; b#0000 and c#0000 removed
        assert df.loc["a", "n_removed"] == 0
        assert df.loc["b", "n_removed"] == 1
        assert df.loc["c", "n_removed"] == 1
        assert df.loc["a", "n_turns"] == 2 and df.loc["c", "n_turns"] == 1
        # cleaned text drops the removed boilerplate turn
        exp_b = hashlib.md5(
            b"unique beta turn with enough words"
        ).hexdigest()
        assert df.loc["b", "cleaned_md5"] == exp_b
        exp_c = hashlib.md5(b"").hexdigest()  # everything removed
        assert df.loc["c", "cleaned_md5"] == exp_c
        exp_a = hashlib.md5(
            (boiler + " unique alpha turn with enough words").encode()
        ).hexdigest()
        assert df.loc["a", "cleaned_md5"] == exp_a

    def test_non_duplicate_turns_untouched(self):
        rows = [
            ("x", 0, "completely distinct first conversation content here"),
            ("y", 0, "another entirely different second conversation text"),
        ]
        df, _ = self._run(rows)
        assert (df["n_removed"] == 0).all()

    def test_transitive_group_single_representative(self):
        # over-cap chain: c00..c05 identical turns form ONE component
        # through chain edges; only c00's copy survives
        text = "repeated boilerplate turn used across many conversations"
        rows = [(f"c{i:02d}", 0, text) for i in range(6)]
        df, _ = self._run(rows, bucket_cap=2)
        assert df.loc["c00", "n_removed"] == 0
        assert (df.drop(index="c00")["n_removed"] == 1).all()

    def test_apply_matches_stats(self):
        from quarrycore_ray.pipelines.transcripts import (
            apply_turn_dedup, turn_dedup_conversations,
        )

        boiler = "you are a helpful assistant that answers questions clearly"
        rows = [
            ("a", 0, boiler), ("a", 1, "unique alpha turn with enough words"),
            ("b", 0, boiler), ("b", 1, "unique beta turn with enough words"),
            ("c", 0, boiler),
        ]
        stats = (
            turn_dedup_conversations(_ds(rows)).to_pandas().set_index("conv_id")
        )
        kept = apply_turn_dedup(_ds(rows)).to_pandas()
        for cid, grp in kept.groupby("conv_id"):
            assert len(grp) == (
                stats.loc[cid, "n_turns"] - stats.loc[cid, "n_removed"]
            )
        # schema passes through untouched; conv c lost its only turn
        assert set(kept.columns) == {"conv_id", "turn_idx", "role", "text"}
        assert "c" not in set(kept["conv_id"])

    def test_null_key_rows_pass_through(self):
        import pyarrow as pa

        from quarrycore_ray.pipelines.transcripts import apply_turn_dedup

        tb = pa.table(
            {
                "conv_id": pa.array(["a", None, "b"], pa.string()),
                "turn_idx": pa.array([0, 1, None], pa.int32()),
                "role": pa.array(["user"] * 3, pa.string()),
                "text": pa.array(["alpha text", "orphan", "unplaceable"]),
            }
        )
        kept = apply_turn_dedup(rd.from_arrow(tb)).to_pandas()
        # null-key rows can never be in a pair -> they survive untouched
        assert len(kept) == 3
        assert kept["text"].tolist() == ["alpha text", "orphan", "unplaceable"]
