"""Corpus-curation operators (pipelines/curation.py) and the as-of join
(pipelines/relational.py) on planted fixtures: segment dedup keeps
exactly the first occurrence of every repeated window, PII redaction
counts and replaces each pattern kind, repetition metrics match
hand-computed values, and the as-of join honors tie/no-match rules."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def _write_docs(tmp_path, texts: dict[int, str]) -> str:
    tb = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(tb, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestSegmentDedup:
    def test_first_occurrence_wins(self, tmp_path):
        from quarrycore_ray.pipelines.curation import segment_dedup_docs

        seg_a = "a b c"  # shared 3-word segment
        sf = _write_docs(
            tmp_path,
            {
                # doc 0: [a b c] [d e f]
                0: f"{seg_a} d e f",
                # doc 1: [a b c] [g h i] -> first segment is a repeat
                1: f"{seg_a} g h i",
                # doc 2: entirely the repeated segment -> fully removed
                2: seg_a,
                # doc 3: unique, survives whole (incl. short tail)
                3: "j k l m",
            },
        )
        out = (
            segment_dedup_docs(sf, seg_words=3)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [0, 1, 3]
        assert out.loc[0, "kept_text"] == "a b c d e f"
        assert out.loc[0, "n_kept_segs"] == 2 and out.loc[0, "n_total_segs"] == 2
        assert out.loc[1, "kept_text"] == "g h i"
        assert out.loc[1, "n_kept_segs"] == 1 and out.loc[1, "n_total_segs"] == 2
        assert out.loc[3, "kept_text"] == "j k l m"
        assert out.loc[3, "n_kept_segs"] == 2  # "j k l" + "m"

    def test_within_doc_repeat_removed(self, tmp_path):
        from quarrycore_ray.pipelines.curation import segment_dedup_docs

        sf = _write_docs(tmp_path, {7: "x y z x y z"})
        out = segment_dedup_docs(sf, seg_words=3).to_pandas()
        assert out.loc[0, "kept_text"] == "x y z"
        assert out.loc[0, "n_total_segs"] == 2


class TestPiiRedact:
    def test_counts_and_placeholders(self, tmp_path):
        from quarrycore_ray.pipelines.curation import pii_redact_docs

        sf = _write_docs(tmp_path, {5: "hello world"})
        out = pii_redact_docs(sf).to_pandas()
        row = out.iloc[0]
        assert row["n_emails"] == 1
        assert row["n_phones"] == 1
        assert row["n_ips"] == 1
        assert (
            row["redacted"]
            == "hello world contact <EMAIL> or call <PHONE> from host <IP>"
        )

    def test_multiple_matches_counted(self, tmp_path):
        from quarrycore_ray.pipelines.curation import pii_redact_docs

        # text itself contains an extra email and IP
        sf = _write_docs(tmp_path, {3: "ping a.b@c.io from 1.2.3.4 ok"})
        out = pii_redact_docs(sf).to_pandas()
        row = out.iloc[0]
        assert row["n_emails"] == 2 and row["n_ips"] == 2
        assert row["redacted"].count("<EMAIL>") == 2
        assert row["redacted"].count("<IP>") == 2


class TestRepetitionStats:
    def test_hand_computed(self, tmp_path):
        from quarrycore_ray.pipelines.curation import repetition_stats_docs

        sf = _write_docs(
            tmp_path,
            {
                # words: a a a b -> top a=3/4; bigrams: (a a),(a a),(a b)
                # -> 3 total, 2 unique -> dup 1/3
                0: "a a a b",
                # single word: no bigrams -> dup 0
                1: "solo",
            },
        )
        out = repetition_stats_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_words"] == 4
        assert out.loc[0, "top_word_frac"] == 0.75
        assert out.loc[0, "dup_bigram_frac"] == pytest.approx(0.333333, abs=1e-6)
        assert out.loc[1, "n_words"] == 1
        assert out.loc[1, "top_word_frac"] == 1.0
        assert out.loc[1, "dup_bigram_frac"] == 0.0


class TestAsofJoin:
    def _write_events(self, tmp_path, rows):
        df = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
        )
        df["ts"] = pd.to_datetime(df["ts"])
        tb = pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                ]
            )
        )
        pq.write_table(tb, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_latest_prior_view_with_ties(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_asof_join

        t = dt.datetime(2024, 1, 1)
        s = dt.timedelta(seconds=1)
        sf = self._write_events(
            tmp_path,
            [
                (0, 1, t, "view", 10.0),
                (1, 1, t + s, "view", 20.0),
                (2, 1, t + 2 * s, "click", 0.0),   # -> 20.0 (latest prior)
                (3, 1, t + 3 * s, "view", 30.0),
                (4, 1, t + 3 * s, "click", 0.0),   # same-instant view counts -> 30.0
                (5, 2, t, "click", 0.0),           # user 2 has no view -> null
                (6, 3, t, "view", 1.0),
                (7, 3, t, "view", 2.0),            # ts tie: max event_id wins
                (8, 3, t + s, "click", 0.0),       # -> 2.0
                (9, 1, t, "purchase", 99.0),       # other types ignored
            ],
        )
        out = (
            events_asof_join(sf)
            .to_pandas()
            .set_index("event_id")
            .sort_index()
        )
        assert list(out.index) == [2, 4, 5, 8]
        assert out.loc[2, "last_view_value"] == 20.0
        assert out.loc[4, "last_view_value"] == 30.0
        assert pd.isna(out.loc[5, "last_view_value"])
        assert out.loc[8, "last_view_value"] == 2.0


class TestLengthQuantiles:
    def test_hand_computed(self, tmp_path):
        from quarrycore_ray.pipelines.documents import length_quantiles

        # lengths 1..10 -> q-th value at floor(9*q): q=.5 -> idx 4 -> 5
        tb = pa.table(
            {
                "doc_id": pa.array(list(range(10)), pa.int64()),
                "n_chars": pa.array(list(range(1, 11)), pa.int64()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        out = length_quantiles(str(tmp_path)).set_index("q")
        assert out.loc[0.25, "n_chars"] == 3   # floor(9*.25)=2 -> value 3
        assert out.loc[0.5, "n_chars"] == 5
        assert out.loc[0.9, "n_chars"] == 9    # floor(8.1)=8 -> value 9
        assert out.loc[0.99, "n_chars"] == 9   # floor(8.91)=8


class TestSlidingWindow:
    def test_rolling_mean_per_type(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_sliding_window

        t = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        rows = []
        # type A: 1, 2, 3 events in consecutive hours -> ma3 = 1, 1.5, 2
        eid = 0
        for hour, n in [(0, 1), (1, 2), (2, 3)]:
            for _ in range(n):
                rows.append((eid, t + hour * h)); eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "ts"])
        df["user_id"] = 1
        df["event_type"] = "A"
        df["value"] = 0.0
        df["props"] = "{}"
        tb = pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        pq.write_table(tb, str(tmp_path / "events.parquet"))
        out = (
            events_sliding_window(str(tmp_path))
            .to_pandas()
            .sort_values("hour")
            .reset_index(drop=True)
        )
        assert out["n_events"].tolist() == [1, 2, 3]
        assert out["ma3"].tolist() == [1.0, 1.5, 2.0]


class TestDecontaminate:
    def test_planted_overlap(self, tmp_path):
        from quarrycore_ray.pipelines.curation import decontaminate_docs

        shared = "q w e"
        sf = _write_docs(
            tmp_path,
            {
                0: f"{shared} z z z",          # holdout (0 % 2 == 0)
                1: f"{shared} u i o",          # train: 1 shared segment
                2: "n m k l p r",              # holdout, disjoint
                3: "totally clean text here wow yes",  # train: clean
                5: f"{shared} {shared}",       # train: same seg twice -> counts once
            },
        )
        out = (
            decontaminate_docs(sf, seg_words=3, holdout_mod=2)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.index) == [1, 5]
        assert out.loc[1, "n_contaminated_segs"] == 1
        assert out.loc[5, "n_contaminated_segs"] == 1


class TestGroupTopK:
    def test_rank_and_ties(self, tmp_path):
        from quarrycore_ray.pipelines.documents import top_docs_per_source

        tb = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "source": pa.array(["a", "a", "a", "b", "b"], pa.string()),
                "n_chars": pa.array([10, 30, 30, 5, 9], pa.int64()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        out = (
            top_docs_per_source(str(tmp_path), k=2)
            .to_pandas()
            .sort_values(["source", "rank"])
            .reset_index(drop=True)
        )
        # source a: 30-char tie broken by doc_id asc -> docs 1, 2
        assert out[out.source == "a"]["doc_id"].tolist() == [1, 2]
        # source b: 9 then 5
        assert out[out.source == "b"]["doc_id"].tolist() == [4, 3]
        assert out["rank"].tolist() == [1, 2, 1, 2]


class TestRollup:
    def test_three_levels(self, tmp_path):
        from quarrycore_ray.pipelines.relational import orders_rollup

        tb = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": pa.array(["O", "O", "F"], pa.string()),
                "o_totalprice": pa.array([10.5, 20.25, 1.0], pa.float64()),
                "o_orderdate": pa.array([None, None, None], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-HI", "2-LO", "1-HI"], pa.string()),
            }
        )
        pq.write_table(tb, str(tmp_path / "orders.parquet"))
        out = orders_rollup(str(tmp_path))
        # 3 fine rows + 2 status subtotals + 1 grand total
        assert len(out) == 6
        grand = out[out.o_orderstatus.isna()]
        assert grand["n_orders"].tolist() == [3]
        assert grand["sum_price"].tolist() == [31.75]
        o_sub = out[(out.o_orderstatus == "O") & out.o_orderpriority.isna()]
        assert o_sub["sum_price"].tolist() == [30.75]


class TestLabelCentroids:
    def test_hand_computed(self, tmp_path):
        from quarrycore_ray.functions.similarity import label_centroids

        tb = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([7, 7, 8], pa.int32()),
            }
        )
        pq.write_table(tb, str(tmp_path / "embeddings.parquet"))
        out = (
            label_centroids(str(tmp_path))
            .to_pandas()
            .set_index(["label", "dim"])
            .sort_index()
        )
        assert out.loc[(7, 0), "mean_val"] == 2.0
        assert out.loc[(7, 1), "mean_val"] == 3.0
        assert out.loc[(8, 0), "mean_val"] == 10.0
        assert out.loc[(8, 1), "mean_val"] == 20.0


class TestExactSubstrSpans:
    def test_planted_spans(self, tmp_path):
        from quarrycore_ray.pipelines.curation import exact_substr_spans

        shared = "x" * 25 + "y" * 25  # 50-char block shared by docs 0/1
        uniq0 = "".join(chr(ord("a") + (7 * i) % 26) for i in range(60))
        uniq1 = "".join(chr(ord("a") + (11 * i + 3) % 26) for i in range(60))
        rep = "".join(chr(ord("a") + (5 * i + 1) % 26) for i in range(45))
        sf = _write_docs(
            tmp_path,
            {
                # docs 0/1 share a 50-char block at different offsets
                0: uniq0 + shared,
                1: shared + uniq1,
                # doc 2 repeats a 45-char block internally (same-doc dup)
                2: rep + "0123456789" + rep,
                # doc 3: strictly increasing chars -> every 40-gram unique
                3: "".join(chr(33 + i) for i in range(80)),
            },
        )
        out = (
            exact_substr_spans(sf, gram_chars=40)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        spans = {
            d: [(r.span_start, r.span_end) for r in g.itertuples()]
            for d, g in out.groupby("doc_id")
        }
        # docs 0/1: exactly the shared 50-char block, at its offset
        assert spans[0] == [(60, 110)]
        assert spans[1] == [(0, 50)]
        # doc 2: both copies of the repeated block, merged per copy
        # (gap of 10 + offset > 40 keeps them separate)
        assert spans[2] == [(0, 45), (55, 100)]
        assert 3 not in spans

    def test_touching_spans_merge(self, tmp_path):
        from quarrycore_ray.pipelines.curation import exact_substr_spans

        # two 40-char blocks, each duplicated in another doc, sitting
        # adjacent in doc 0 -> gaps-and-islands merges them into one span
        blk_a = "".join(chr(ord("a") + (3 * i) % 26) for i in range(40))
        blk_b = "".join(chr(ord("a") + (9 * i + 2) % 26) for i in range(40))
        pad = "".join(chr(ord("a") + (21 * i + 7) % 26) for i in range(50))
        sf = _write_docs(
            tmp_path,
            {0: blk_a + blk_b, 1: blk_a + pad, 2: pad[:45] + blk_b},
        )
        out = exact_substr_spans(sf, gram_chars=40).to_pandas()
        doc0 = out[out.doc_id == 0]
        assert [(r.span_start, r.span_end) for r in doc0.itertuples()] == [(0, 80)]

    def test_removal_keeps_first_occurrence(self, tmp_path):
        from quarrycore_ray.pipelines.curation import exact_substr_dedup_docs

        blk = "".join(chr(ord("a") + (3 * i) % 26) for i in range(50))
        head0 = "".join(chr(33 + i) for i in range(20))
        tail1 = "".join(chr(90 - i) for i in range(20))
        sf = _write_docs(
            tmp_path,
            {
                0: head0 + blk,          # first occurrence (doc order) -> kept
                1: blk + tail1,          # later occurrence -> cut
                2: "".join(chr(33 + i) for i in range(60)),  # untouched
            },
        )
        out = (
            exact_substr_dedup_docs(sf, gram_chars=40)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "kept_text"] == head0 + blk
        assert out.loc[0, "n_removed_chars"] == 0
        assert out.loc[1, "kept_text"] == tail1
        assert out.loc[1, "n_removed_chars"] == 50
        assert out.loc[2, "n_removed_chars"] == 0
        assert len(out) == 3


class TestC4LineFilter:
    def test_planted_cascade(self, tmp_path):
        from quarrycore_ray.pipelines.curation import c4_line_filter_docs

        w = [f"w{i}" for i in range(40)]
        line = lambda a, b: " ".join(w[a:b])  # noqa: E731
        sf = _write_docs(
            tmp_path,
            {
                # doc 1: 5 full lines; punct (1+j)%3 -> j=0 '!', j=1 '',
                # j=2 '.', j=3 '!', j=4 '' -> kept j=0,2,3 (3 sentence
                # terminators -> page kept)
                1: " ".join(w[:40]),
                # doc 0: 12 words; j=0 gets ' javascript' ((0+0)%7==0),
                # j=1 has 4 words (<5) -> nothing kept -> page dropped
                0: " ".join(w[:12]),
                # doc 31: 'lorem ipsum' injected on line 0 -> dropped
                31: " ".join(w[:24]),
                # doc 37: '{' injected on line 1 -> dropped
                37: " ".join(w[:24]),
            },
        )
        out = {
            r["doc_id"]: r
            for r in c4_line_filter_docs(sf).take_all()
        }
        assert sorted(out) == [1]
        r = out[1]
        assert r["n_total_lines"] == 5
        assert r["n_kept_lines"] == 3
        assert r["filtered_text"] == (
            line(0, 8) + "!\n" + line(16, 24) + ".\n" + line(24, 32) + "!"
        )

    def test_empty_corpus_and_short_doc(self, tmp_path):
        from quarrycore_ray.pipelines.curation import c4_line_filter_docs

        # a single 3-word doc: one line, <5 words -> dropped
        sf = _write_docs(tmp_path, {2: "a b c"})
        assert c4_line_filter_docs(sf).count() == 0


class TestDedupLines:
    def test_injected_third_line_duplicate(self, tmp_path):
        from quarrycore_ray.pipelines.curation import dedup_lines_docs

        w = [f"w{i}" for i in range(24)]
        sf = _write_docs(tmp_path, {5: " ".join(w)})
        (r,) = dedup_lines_docs(sf).take_all()
        # line j=2 is replaced by a copy of line j=0 -> deduped away
        assert r["n_total_lines"] == 3
        assert r["n_kept_lines"] == 2
        assert r["deduped_text"] == (
            " ".join(w[:8]) + "\n" + " ".join(w[8:16])
        )

    def test_no_duplicates_when_short(self, tmp_path):
        from quarrycore_ray.pipelines.curation import dedup_lines_docs

        # two lines only -> no j%3==2 line, nothing removed
        sf = _write_docs(tmp_path, {7: " ".join(f"x{i}" for i in range(10))})
        (r,) = dedup_lines_docs(sf).take_all()
        assert r["n_total_lines"] == 2
        assert r["n_kept_lines"] == 2


class TestRangeJoin:
    def test_attribution_window(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_range_join

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # (event_id, user_id, ts, event_type)
            (1, 7, t0 - dt.timedelta(minutes=90), "view"),   # outside
            (2, 7, t0 - dt.timedelta(minutes=60), "view"),   # boundary: ts == p.ts-1h -> included
            (3, 7, t0 - dt.timedelta(minutes=5), "click"),   # inside
            (4, 7, t0, "purchase"),                          # the purchase
            (5, 7, t0, "view"),                              # ts == p.ts -> excluded
            (6, 8, t0 - dt.timedelta(minutes=5), "view"),    # other user
            (7, 7, t0 - dt.timedelta(minutes=30), "purchase"),  # purchase in window of 4
        ]
        tb = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tb, str(tmp_path / "events.parquet"))
        out = sorted(
            (r["purchase_id"], r["event_id"])
            for r in events_range_join(str(tmp_path)).take_all()
        )
        # purchase 4 window [11:00, 12:00): events 2, 3, 7
        # purchase 7 window [10:30, 11:30): events 1 (on the closed
        # lower bound), 2
        assert out == [(4, 2), (4, 3), (4, 7), (7, 1), (7, 2)]


class TestSoftDedupWeights:
    def test_weight_is_inverse_multiplicity(self, tmp_path):
        from quarrycore_ray.pipelines.curation import soft_dedup_weights

        # 'x y' appears 3 times (one with extra whitespace -> same
        # canonical), 'z' once
        sf = _write_docs(tmp_path, {0: "x y", 1: "x  y", 2: "x y", 3: "z"})
        out = (
            soft_dedup_weights(sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out["group_size"]) == [3, 3, 3, 1]
        import math

        w3 = math.floor((1.0 / 3) * 1e6 + 0.5) / 1e6
        assert list(out["weight"]) == [w3, w3, w3, 1.0]

    def test_total_mass_per_group_is_one(self, tmp_path):
        from quarrycore_ray.pipelines.curation import soft_dedup_weights

        sf = _write_docs(tmp_path, {i: "dup text" for i in range(5)})
        out = soft_dedup_weights(sf).to_pandas()
        assert len(out) == 5
        assert abs(out["weight"].sum() - 1.0) < 1e-4


class TestCurationPipeline:
    def _corpus(self):
        import random

        rng = random.Random(7)
        vocab = [f"word{i}" for i in range(30)]
        good = (
            "the quick brown fox jumps over that lazy dog again " * 6
        ).strip()
        texts = {}
        for i in range(60):
            if i % 7 == 3:
                texts[i] = "way too short"  # gopher reject
            elif i % 7 == 4:
                texts[i] = good  # exact-dup family
            else:
                # gopher-passing text with randomized tail: 'the ... it is'
                # repeated base keeps stopwords/word-length in range
                words = [
                    "the",
                    "it",
                    "is",
                    "for",
                    "and",
                ] + [rng.choice(vocab) for _ in range(55)]
                rng.shuffle(words)
                texts[i] = " ".join(words)
        return texts

    def test_total_lineage_and_stage_consistency(self, tmp_path):
        from quarrycore_ray.pipelines.curation import (
            curation_pipeline_docs,
            decontaminate_docs,
        )
        from quarrycore_ray.pipelines.training import (
            ccnet_bucket_docs,
            gopher_quality_docs,
        )
        from quarrycore_ray.text import normalize_whitespace

        texts = self._corpus()
        sf = _write_docs(tmp_path, texts)
        out = curation_pipeline_docs(sf).to_pandas().set_index("doc_id")

        # one row per input document — lineage is total
        assert sorted(out.index) == sorted(texts)
        assert set(out["reject_stage"]) <= {
            "holdout",
            "gopher",
            "ccnet",
            "decontaminate",
            "exact_dup",
            "kept",
        }
        # kept flag is exactly the 'kept' stage
        assert ((out["reject_stage"] == "kept") == (out["kept"] == 1)).all()

        gop = gopher_quality_docs(sf).to_pandas().set_index("doc_id")
        cc = ccnet_bucket_docs(sf).to_pandas().set_index("doc_id")
        dec_df = decontaminate_docs(sf).to_pandas()
        # Ray drops columns on zero-row to_pandas
        dec = set(dec_df["doc_id"]) if "doc_id" in dec_df.columns else set()

        for i in sorted(texts):
            stage = out.loc[i, "reject_stage"]
            if i % 50 == 0:
                assert stage == "holdout", i
            elif gop.loc[i, "keep"] == 0:
                assert stage == "gopher", i
            elif cc.loc[i, "bucket"] == "tail":
                assert stage == "ccnet", i
            elif i in dec:
                assert stage == "decontaminate", i
            else:
                assert stage in ("kept", "exact_dup"), i

        # every stage actually fires on this corpus
        assert set(out["reject_stage"]) >= {
            "holdout",
            "gopher",
            "kept",
            "exact_dup",
        }

        # exact_dup rows point at an earlier kept survivor with the
        # same canonical text
        canon = {i: normalize_whitespace(t) for i, t in texts.items()}
        kept_by_canon = {}
        for i in sorted(out[out["kept"] == 1].index):
            kept_by_canon.setdefault(canon[i], i)
        for i in out[out["reject_stage"] == "exact_dup"].index:
            assert canon[i] in kept_by_canon
            assert kept_by_canon[canon[i]] < i
        # kept canonicals are unique
        kept_canons = [canon[i] for i in out[out["kept"] == 1].index]
        assert len(kept_canons) == len(set(kept_canons))

    def test_holdout_mod_param(self, tmp_path):
        from quarrycore_ray.pipelines.curation import curation_pipeline_docs

        good = (
            "the quick brown fox jumps over that lazy dog again " * 6
        ).strip()
        sf = _write_docs(tmp_path, {i: good for i in range(6)})
        out = (
            curation_pipeline_docs(sf, holdout_mod=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "reject_stage"] == "holdout"
        assert out.loc[3, "reject_stage"] == "holdout"
        # identical survivors: min doc_id wins, rest are exact dups —
        # unless the shared-segment decontamination fires first (all six
        # docs share every segment with the holdout docs)
        assert out.loc[1, "reject_stage"] in ("kept", "decontaminate")


class TestNgramNovelty:
    def test_matches_hand_computation(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as _pq

        from quarrycore_ray.pipelines.curation import ngram_novelty_docs

        texts = {
            0: "a b c d",          # grams: abc, bcd -> both novel
            1: "a b c e",          # abc (seen), bce (novel)
            2: "x y",              # < 3 tokens -> absent from output
            3: "a b c d",          # exact dup of 0: nothing novel
        }
        ids = sorted(texts)
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([texts[i] for i in ids], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = (
            ngram_novelty_docs(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
        )
        assert sorted(out.index) == [0, 1, 3]
        assert (out.loc[0, "n_grams"], out.loc[0, "n_novel"]) == (2, 2)
        assert (out.loc[1, "n_grams"], out.loc[1, "n_novel"]) == (2, 1)
        assert (out.loc[3, "n_grams"], out.loc[3, "n_novel"]) == (2, 0)


class TestBoilerplateLines:
    """Corpus-level boilerplate-line removal (curation.boilerplate_lines_docs):
    lines repeated across >= min_df docs of one source are removed
    everywhere; low-DF lines (and low-DF footers in small sources)
    survive. LINE_WORDS=8: 16-word docs -> 2 lines, j=0 footer-injected."""

    def _write(self, tmp_path, rows):
        tb = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_high_df_removed_low_df_kept(self, tmp_path):
        import hashlib

        from quarrycore_ray.pipelines.curation import boilerplate_lines_docs

        shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-word line
        filler = "f1 f2 f3 f4 f5 f6 f7 f8"
        rows = [(i, f"{filler} {shared}", "sA") for i in range(10)]
        rows += [(10 + i, f"{filler} {shared}", "sB") for i in range(2)]
        sf = self._write(tmp_path, rows)
        df = (
            boilerplate_lines_docs(sf, min_df=8)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # sA: footer (j=0, df=10) and shared line (j=1, df=10) both removed
        for i in range(10):
            assert df.loc[i, "n_total_lines"] == 2
            assert df.loc[i, "n_removed_lines"] == 2
            assert df.loc[i, "cleaned_md5"] == hashlib.md5(b"").hexdigest()
        # sB: df=2 < 8 for both its footer and the shared line -> all kept
        footer_b = "subscribe to the sB newsletter for daily updates"
        kept = f"{footer_b}\n{shared}"
        for i in (10, 11):
            assert df.loc[i, "n_removed_lines"] == 0
            assert (
                df.loc[i, "cleaned_md5"]
                == hashlib.md5(kept.encode()).hexdigest()
            )

    def test_deterministic(self, tmp_path):
        from quarrycore_ray.pipelines.curation import boilerplate_lines_docs

        rows = [(i, f"word{i} a b c d e f g h i j k l m n o", "s") for i in range(6)]
        sf = self._write(tmp_path, rows)
        a = boilerplate_lines_docs(sf).to_pandas().sort_values("doc_id")
        b = boilerplate_lines_docs(sf).to_pandas().sort_values("doc_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


class TestSuffixArray:
    """Suffix-array machinery (functions/suffix.py) against naive
    first-principles implementations on random inputs."""

    def test_sa_matches_naive_sort(self):
        import numpy as np

        from quarrycore_ray.functions.suffix import suffix_array

        rng = np.random.default_rng(5)
        for n, alpha in [(1, 2), (7, 2), (40, 3), (200, 5), (500, 26)]:
            toks = rng.integers(0, alpha, size=n).astype(np.int64)
            sa = suffix_array(toks)
            naive = sorted(range(n), key=lambda i: tuple(toks[i:]))
            assert sa.tolist() == naive, (n, alpha)

    def test_lcp_matches_naive(self):
        import numpy as np

        from quarrycore_ray.functions.suffix import lcp_array, suffix_array

        rng = np.random.default_rng(6)
        toks = rng.integers(0, 3, size=300).astype(np.int64)
        sa = suffix_array(toks)
        lcp = lcp_array(toks, sa)
        assert lcp[0] == 0
        for r in range(1, len(toks)):
            a, b = toks[sa[r - 1] :], toks[sa[r] :]
            m = 0
            while m < len(a) and m < len(b) and a[m] == b[m]:
                m += 1
            assert lcp[r] == m, r

    def test_longest_repeat_planted(self):
        import numpy as np

        from quarrycore_ray.functions.suffix import longest_repeat

        # unique tokens: no repeat
        assert longest_repeat(np.arange(10, dtype=np.int64)) == (0, -1)
        # planted repeated run of length 4 at positions 2 and 9
        t = np.array([9, 8, 1, 2, 3, 4, 7, 6, 5, 1, 2, 3, 4, 0], dtype=np.int64)
        assert longest_repeat(t) == (4, 2)
        # overlapping repeat (aaaa): longest repeat aaa at pos 0
        t2 = np.zeros(4, dtype=np.int64)
        assert longest_repeat(t2) == (3, 0)
        # brute-force cross-check on random strings
        rng = np.random.default_rng(7)
        for _ in range(20):
            toks = rng.integers(0, 4, size=60).astype(np.int64)
            ln, pos = longest_repeat(toks)
            best, bpos = 0, -1
            n = len(toks)
            for i in range(n):
                for j in range(i + 1, n):
                    m = 0
                    while j + m < n and toks[i + m] == toks[j + m]:
                        m += 1
                    if m > best:
                        best, bpos = m, i
            assert ln == best
            if best:
                assert pos == bpos

    def test_docs_query_shape(self):
        from quarrycore_ray.pipelines.documents import longest_repeat_docs

        df = longest_repeat_docs("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        assert (df["repeat_len"] >= 0).all()
        assert ((df["repeat_len"] > 0) == (df["repeat_pos"] >= 0)).all()
        nz = df[df["n_words"] > 0]
        assert (nz["repeat_len"] <= nz["n_words"] - 1).all()


class TestHtmlCurateDedupDocs:
    """The composed documents-axis pipeline (HTML -> extract cascade ->
    curation gate -> flagship dedup) keeps TOTAL lineage: one verdict
    row per input document (reference main loop pipeline.py:583-880)."""

    def test_total_lineage_and_stage_values(self):
        from quarrycore_ray.pipelines.curation import html_curate_dedup_docs

        out = html_curate_dedup_docs("/root/testdata/sf0.001").to_pandas()
        assert out["doc_id"].is_unique
        assert len(out) == 500  # every input doc has a verdict
        stages = set(out["reject_stage"])
        assert stages <= {
            "holdout", "gopher", "ccnet", "decontaminate",
            "exact_dup", "near_dup", "kept",
        }
        kept = out[out["kept"] == 1]
        assert (kept["reject_stage"] == "kept").all()
        # survivors carry their flagship cluster label, rejects do not
        assert kept["cluster_id"].notna().all()
        assert out[out["reject_stage"] == "gopher"]["cluster_id"].isna().all()
        # every holdout slot is attributed to the holdout stage first
        assert (
            out[out["doc_id"] % 50 == 0]["reject_stage"] == "holdout"
        ).all()
