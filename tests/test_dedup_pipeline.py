"""End-to-end dedup pipeline tests on transcript fixtures.

Transplants the semantic shapes of the reference dedup suite
(`/root/reference/tests/test_deduplication.py`, TestMultiLevelDeduplicator
407-617) onto the transcript table, plus the north-rule invariants:
sort-within-group canonicalization, deterministic min-conv_id
representatives, dup-pair recall >= 0.99 vs the in-process sequential
oracle, and skew-capped hot LSH buckets.
"""

import collections

import pyarrow as pa
import pytest

import ray.data as rd

from quarrycore_ray.config import DedupConfig
from quarrycore_ray.oracle import SequentialLSHOracle, pair_recall
from quarrycore_ray.pipelines.dedup import dedup_conversations, dedup_transcripts
from quarrycore_ray.stages.canonical import TURN_SEP, assemble_conversations
from quarrycore_ray.synth import generate_transcripts
from quarrycore_ray.text import normalize_whitespace, sha256_hex


def _mk_transcripts(convs: dict[str, list[str]], shuffle_rows: bool = False) -> pa.Table:
    """{conv_id: [turn texts]} -> transcript table (optionally row-shuffled)."""
    import datetime as dt

    rows = []
    for ci, (cid, turns) in enumerate(convs.items()):
        for ti, text in enumerate(turns):
            rows.append(
                {
                    "conv_id": cid,
                    "turn_idx": ti,
                    "role": ["user", "assistant"][ti % 2],
                    "text": text,
                    "tool": "",
                    "ts": dt.datetime(2026, 1, 1) + dt.timedelta(minutes=ci, seconds=ti),
                }
            )
    if shuffle_rows:
        rows = rows[::-1]
    return pa.table(
        {
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )


LONG_A = [
    "hello there how can i help you today with your data pipeline questions",
    "i need to deduplicate a large corpus of conversation transcripts using ray",
    "you should use minhash signatures with lsh banding over arrow batches",
    "what shingle size and how many permutations should i configure for this",
    "use seven character shingles with one hundred twenty eight permutations",
    "thank you that works perfectly for my use case with the streaming executor",
]


class TestCanonicalAssembly:
    def test_sort_within_group_invariant(self):
        """Shuffled row order must yield identical canonical text."""
        convs = {"conv-a": LONG_A}
        t1 = _mk_transcripts(convs)
        t2 = _mk_transcripts(convs, shuffle_rows=True)
        c1 = assemble_conversations(rd.from_arrow(t1)).to_pandas()
        c2 = assemble_conversations(rd.from_arrow(t2)).to_pandas()
        assert c1["canonical_text"].iloc[0] == c2["canonical_text"].iloc[0]
        expected = TURN_SEP.join(normalize_whitespace(t) for t in LONG_A)
        assert c1["canonical_text"].iloc[0] == expected
        assert c1["n_turns"].iloc[0] == len(LONG_A)

    def test_per_turn_text_equality(self):
        """North-rule invariant: canonical text is the ordered join of
        per-turn normalized texts — each turn's normalized text appears
        verbatim."""
        convs = {"conv-a": ["First  turn\n", "\tsecond turn here"]}
        out = assemble_conversations(rd.from_arrow(_mk_transcripts(convs))).to_pandas()
        assert out["canonical_text"].iloc[0] == "First turn second turn here"


class TestExactLevel:
    def test_exact_duplicate_detected(self):
        """Byte-identical copy => same cluster, dropped as `exact`
        (reference test_deduplication.py:439-463)."""
        convs = {"conv-a": LONG_A, "conv-b": list(LONG_A)}
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)))
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-a"
        assert cl.loc["conv-b", "dup_kind"] == "exact"
        assert bool(cl.loc["conv-a", "is_representative"])
        uniq = res.unique_conversations.to_pandas()
        assert list(uniq["conv_id"]) == ["conv-a"]

    def test_whitespace_variant_is_exact_duplicate(self):
        """Extra whitespace/newlines canonicalize away (reference
        canonicalization tests)."""
        messy = [t.replace(" ", "  ").upper() for t in LONG_A]
        convs = {"conv-a": LONG_A, "conv-b": [t.replace(" ", "   ") for t in LONG_A]}
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)))
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-a"
        assert cl.loc["conv-b", "dup_kind"] == "exact"
        # case differences are NOT exact dups (hash is case-sensitive, as
        # the reference's sha256-of-canonical is) but ARE near dups via
        # lowercased shingles
        convs2 = {"conv-a": LONG_A, "conv-c": messy}
        res2 = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs2)))
        cl2 = res2.clusters.to_pandas().set_index("conv_id")
        assert cl2.loc["conv-c", "cluster_id"] == "conv-a"
        assert cl2.loc["conv-c", "dup_kind"] == "near"


class TestNearLevel:
    def test_near_duplicate_clustered(self):
        """1 lightly edited turn => same cluster via MinHash/LSH
        (reference test_deduplication.py:466-518)."""
        near = list(LONG_A)
        near[2] = near[2].replace("minhash", "simhash")
        convs = {"conv-a": LONG_A, "conv-b": near}
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)))
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-a"
        assert cl.loc["conv-b", "dup_kind"] == "near"
        assert res.metrics["verified_edges"] >= 1

    def test_distinct_not_clustered(self):
        distinct = [
            "totally unrelated conversation about cooking italian pasta dishes",
            "yes the secret is using fresh basil and good quality olive oil",
            "simmer the tomato sauce slowly for at least forty five minutes",
        ]
        convs = {"conv-a": LONG_A, "conv-b": distinct}
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)))
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-b"
        assert cl.loc["conv-b", "dup_kind"] == "unique"

    def test_partial_overlap_not_lsh_clustered(self):
        """A conversation 2x the length sharing a prefix is below the 0.85
        Jaccard threshold => separate cluster (FIXTURES.md partial case)."""
        partial = list(LONG_A) + [
            "now let us discuss a completely different topic entirely unrelated",
            "the weather forecast for next week predicts heavy rain and wind",
            "remember to bring an umbrella when you leave the house tomorrow",
            "thanks for the reminder i will definitely pack one in my bag",
            "also the trains might be delayed due to the storm conditions",
            "i will plan to leave earlier than usual to arrive on time",
        ]
        convs = {"conv-a": LONG_A, "conv-b": partial}
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)))
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-b"


class TestSubstringStage:
    def test_contained_in_detected_within_cluster(self):
        """Near-clustered pair where one text contains the other => the
        substring stage flags containment (reference
        fuzzy_matcher.py:200-236 `contains`/`contained_in`)."""
        longer = list(LONG_A) + ["one extra closing turn saying goodbye politely"]
        convs = {"conv-a": LONG_A, "conv-b": longer}
        res = dedup_transcripts(
            rd.from_arrow(_mk_transcripts(convs)), with_substring=True
        )
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-a"  # high Jaccard
        sub = res.substring.to_pandas()
        assert len(sub) == 1
        assert sub["match_type"].iloc[0] == "contained_in"
        assert sub["a_id"].iloc[0] == "conv-a"  # the shorter, contained one


class TestCorpusRecall:
    @pytest.fixture(scope="class")
    def corpus(self):
        transcripts, truth = generate_transcripts(
            n_convs=150, seed=42, boilerplate_group=20
        )
        return transcripts, truth

    @pytest.fixture(scope="class")
    def engine_assign(self, corpus):
        transcripts, _ = corpus
        res = dedup_transcripts(rd.from_arrow(transcripts))
        cl = res.clusters.to_pandas()
        return dict(zip(cl["conv_id"], cl["cluster_id"])), res

    @staticmethod
    def _oracle_assign(transcripts: pa.Table) -> dict[str, str]:
        rows = sorted(
            zip(
                transcripts.column("conv_id").to_pylist(),
                transcripts.column("turn_idx").to_pylist(),
                transcripts.column("text").to_pylist(),
            )
        )
        conv: dict[str, list[tuple[int, str]]] = collections.defaultdict(list)
        for cid, ti, tx in rows:
            conv[cid].append((ti, tx))
        canon = {
            cid: TURN_SEP.join(normalize_whitespace(t) for _, t in sorted(v))
            for cid, v in conv.items()
        }
        by_hash: dict[str, list[str]] = collections.defaultdict(list)
        for cid, t in canon.items():
            by_hash[sha256_hex(t)].append(cid)
        rep_of = {}
        for members in by_hash.values():
            rep = min(members)
            for m in members:
                rep_of[m] = rep
        orc = SequentialLSHOracle()
        for cid in sorted(canon):
            if rep_of[cid] == cid:
                orc.add(cid, canon[cid])
        near = orc.clusters()
        return {cid: near.get(rep_of[cid], rep_of[cid]) for cid in canon}

    def test_recall_vs_oracle(self, corpus, engine_assign):
        """THE correctness gate: dup-pair recall >= 0.99 vs the sequential
        reference oracle (BASELINE.md)."""
        transcripts, _ = corpus
        engine, _res = engine_assign
        oracle = self._oracle_assign(transcripts)
        assert pair_recall(oracle, engine) >= 0.99
        # and no spurious merges either (pairwise precision)
        assert pair_recall(engine, oracle) >= 0.99

    def test_recall_vs_planted_truth(self, corpus, engine_assign):
        transcripts, truth = corpus
        engine, _res = engine_assign
        truth_assign = dict(
            zip(
                truth.column("conv_id").to_pylist(),
                truth.column("truth_cluster_id").to_pylist(),
            )
        )
        assert pair_recall(truth_assign, engine) >= 0.99

    def test_deterministic_across_runs(self, corpus, engine_assign):
        transcripts, _ = corpus
        engine, _res = engine_assign
        res2 = dedup_transcripts(rd.from_arrow(transcripts))
        cl2 = res2.clusters.to_pandas()
        assert dict(zip(cl2["conv_id"], cl2["cluster_id"])) == engine

    def test_counts_add_up(self, corpus, engine_assign):
        transcripts, _ = corpus
        _engine, res = engine_assign
        n_convs = len(set(transcripts.column("conv_id").to_pylist()))
        assert res.metrics["total_conversations"] == n_convs
        assert res.unique_conversations.count() == res.metrics["n_clusters"]


class TestSkewCap:
    def test_hot_bucket_capped_but_connected(self):
        """K identical-boilerplate conversations form one hot LSH bucket;
        with bucket_cap << K the emitted pairs are O(K*cap) yet the
        cluster still forms (chain links preserve connectivity)."""
        boiler = [
            "welcome to support chat how may we assist you today with anything",
            "please describe the issue you are experiencing in as much detail",
            "thank you for contacting us we will look into the problem soon",
        ]
        convs = {f"conv-{i:03d}": boiler for i in range(30)}
        cfg = DedupConfig(bucket_cap=8)
        res = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs)), config=cfg)
        cl = res.clusters.to_pandas()
        assert set(cl["cluster_id"]) == {"conv-000"}
        # exact layer already collapses identical texts; now distinct-but-
        # similar hot buckets: vary one word each
        convs2 = {
            f"conv-{i:03d}": boiler[:2] + [boiler[2] + f" case {i}"] for i in range(30)
        }
        res2 = dedup_transcripts(rd.from_arrow(_mk_transcripts(convs2)), config=cfg)
        cl2 = res2.clusters.to_pandas()
        assert set(cl2["cluster_id"]) == {"conv-000"}


class TestLabelPropSwitch:
    def test_labelprop_path_matches_driver_union_find(self):
        """Forcing the distributed label-propagation path (edge threshold
        0) must reproduce the driver union-find clusters exactly, and the
        edges must stay a Dataset (never collected)."""
        transcripts, _ = generate_transcripts(n_convs=120, seed=7, boilerplate_group=15)

        res_driver = dedup_transcripts(rd.from_arrow(transcripts))
        assert res_driver.metrics["cluster_path"] == "driver_union_find"
        cl_driver = res_driver.clusters.to_pandas()

        cfg = DedupConfig(labelprop_edge_threshold=0)
        res_lp = dedup_transcripts(rd.from_arrow(transcripts), config=cfg)
        assert res_lp.metrics["cluster_path"] == "label_propagation"
        assert isinstance(res_lp.edges, rd.Dataset)
        cl_lp = res_lp.clusters.to_pandas()

        a = dict(zip(cl_driver["conv_id"], cl_driver["cluster_id"]))
        b = dict(zip(cl_lp["conv_id"], cl_lp["cluster_id"]))
        assert a == b
        kinds_a = dict(zip(cl_driver["conv_id"], cl_driver["dup_kind"]))
        kinds_b = dict(zip(cl_lp["conv_id"], cl_lp["dup_kind"]))
        assert kinds_a == kinds_b
        assert res_lp.metrics["n_clusters"] == res_driver.metrics["n_clusters"]
        assert (
            res_lp.unique_conversations.count()
            == res_driver.unique_conversations.count()
        )


class TestUnicodeAndEmptyTurns:
    def test_emoji_conversation_exact_dup_of_reordered_twin(self):
        """Unicode/emoji text with empty turns: the reordered twin must
        come out an exact duplicate (empty turns are skipped in
        assembly; unicode flows through untouched)."""
        turns = [
            "héllo wörld 🌍 this is a test conversation",
            "",  # empty turn must not leave a stray separator
            "日本語のテキストと emoji 🚀 mixed content here",
            "final turn with ümlauts and ßharp s",
        ]
        t1 = _mk_transcripts({"conv-a": turns, "conv-b": turns})
        res = dedup_conversations(
            assemble_conversations(rd.from_arrow(t1))
        )
        cl = res.clusters.to_pandas().set_index("conv_id")
        assert cl.loc["conv-b", "cluster_id"] == "conv-a"
        assert cl.loc["conv-b", "dup_kind"] == "exact"

    def test_single_row_dataset(self):
        t = _mk_transcripts({"conv-solo": ["just one short turn"]})
        res = dedup_conversations(assemble_conversations(rd.from_arrow(t)))
        cl = res.clusters.to_pandas()
        assert len(cl) == 1
        assert cl["dup_kind"].iloc[0] == "unique"
        assert bool(cl["is_representative"].iloc[0])


class TestHotbandQueryCapBinds:
    def test_skew_cap_actually_binds_on_hotband_input(self):
        """dedup_docs_hotband's value is that the skew cap BINDS while
        clusters still match the uncapped SQL closure; assert via
        lineage that pairs are genuinely dropped (>0) on this input so
        the query cannot silently degrade into a no-skew case."""
        import pyarrow.parquet as pq_

        from quarrycore_ray.pipelines.dedup import dedup_conversations as _dc
        from quarrycore_ray.pipelines.documents import (
            HOTBAND_VARIANTS,
            _docs_as_conversations,
        )
        from quarrycore_ray.state.metrics import drain_metrics
        from quarrycore_ray.text import normalize_whitespace as _nw

        sf = "/root/testdata/sf0.001"
        tb = pq_.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        import pyarrow.compute as pc_

        base = _nw(tb.filter(pc_.equal(tb["doc_id"], pa.scalar(0)))["text"].to_pylist()[0])
        import numpy as np_

        vt = pa.table(
            {
                "conv_id": pa.array([f"hot-{k:04d}" for k in range(HOTBAND_VARIANTS)]),
                "canonical_text": pa.array([f"{base} v{k}" for k in range(HOTBAND_VARIANTS)]),
                "n_turns": pa.array(np_.ones(HOTBAND_VARIANTS, dtype=np_.int32)),
            }
        )
        drain_metrics()  # clear any prior rows
        res = _dc(
            _docs_as_conversations(sf).union(rd.from_arrow(vt)), lineage=True
        )
        res.clusters.materialize()
        m = drain_metrics().to_pandas()
        dropped = int(m[m.stage == "lsh_pairs"].dropped_pairs_skew_cap.sum())
        assert dropped > 0, "skew cap no longer binds on the hotband input"
        # the hot family must still land in ONE cluster (bridge links)
        cl = res.clusters.to_pandas()
        hot = cl[cl.conv_id.str.startswith("hot-")]
        assert hot.cluster_id.nunique() == 1


class TestDedupDiagnostics:
    """Cluster-size histogram + per-source dedup lineage rollups
    (pipelines/documents.dedup_cluster_size_hist / dedup_rate_by_source)
    must reconcile exactly with the clusters table they roll up."""

    def test_hist_and_rates_reconcile_with_clusters(self):
        import pandas as pd

        from quarrycore_ray.pipelines.documents import (
            dedup_cluster_size_hist,
            dedup_rate_by_source,
            minhash_dedup_docs,
        )

        sf = "/root/testdata/sf0.001"
        cl = minhash_dedup_docs(sf).to_pandas()
        hist = dedup_cluster_size_hist(sf).to_pandas()
        # histogram masses: sum(size * n_clusters) == total docs,
        # sum(n_clusters) == number of distinct clusters
        assert int((hist["size"] * hist["n_clusters"]).sum()) == len(cl)
        assert int(hist["n_clusters"].sum()) == cl["cluster_id"].nunique()
        sizes = cl.groupby("cluster_id").size().value_counts()
        got = dict(zip(hist["size"], hist["n_clusters"]))
        assert got == {int(k): int(v) for k, v in sizes.items()}

        rates = dedup_rate_by_source(sf).to_pandas()
        src = pd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "source"]
        )
        assert int(rates["n_docs"].sum()) == len(cl)
        assert (rates["n_docs"] == rates["n_kept"] + rates["n_removed"]).all()
        # kept == cluster label holders, attributed to the doc's source
        cl["did"] = cl["conv_id"].str.slice(4).astype("int64")
        merged = cl.merge(src, left_on="did", right_on="doc_id")
        kept = (
            merged[merged["conv_id"] == merged["cluster_id"]]
            .groupby("source")
            .size()
        )
        got_kept = dict(zip(rates["source"], rates["n_kept"]))
        assert got_kept == {k: int(v) for k, v in kept.items()}

    def test_cross_source_matrix_reconciles(self):
        import itertools

        import pandas as pd

        from quarrycore_ray.pipelines.documents import (
            cross_source_dup_matrix,
            minhash_dedup_docs,
        )

        sf = "/root/testdata/sf0.001"
        cl = minhash_dedup_docs(sf).to_pandas()
        cl["did"] = cl["conv_id"].str.slice(4).astype("int64")
        src = pd.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "source"]
        )
        m = cl.merge(src, left_on="did", right_on="doc_id")
        expect: dict[tuple[str, str], int] = {}
        for _, grp in m.groupby("cluster_id"):
            for a, b in itertools.combinations(
                sorted(set(grp["source"])), 2
            ):
                expect[(a, b)] = expect.get((a, b), 0) + 1
        out = cross_source_dup_matrix(sf).to_pandas()
        got = {
            (a, b): int(n)
            for a, b, n in zip(
                out["source_a"], out["source_b"], out["n_clusters"]
            )
        }
        assert got == expect

    def test_cluster_rep_by_quality_reconciles(self):
        import pandas as pd

        from quarrycore_ray.pipelines.documents import (
            cluster_rep_by_quality,
            minhash_dedup_docs,
            quality_score_docs,
        )

        sf = "/root/testdata/sf0.001"
        cl = minhash_dedup_docs(sf).to_pandas()
        cl["did"] = cl["conv_id"].str.slice(4).astype("int64")
        q = quality_score_docs(sf).to_pandas().set_index("doc_id")["quality"]
        out = cluster_rep_by_quality(sf).to_pandas().set_index("cluster_id")
        # one row per cluster, member counts reconcile
        sizes = cl.groupby("cluster_id").size()
        assert sorted(out.index) == sorted(sizes.index)
        assert all(
            out.loc[c, "n_members"] == n for c, n in sizes.items()
        )
        # the chosen rep is the (quality desc, doc_id asc) argmax
        m = cl.assign(quality=cl["did"].map(q))
        for c, grp in m.groupby("cluster_id"):
            grp = grp.sort_values(
                ["quality", "did"], ascending=[False, True]
            )
            assert out.loc[c, "rep_doc_id"] == grp.iloc[0]["did"], c
            assert out.loc[c, "quality"] == grp.iloc[0]["quality"], c

    def test_threshold_sweep_monotone_and_anchored(self):
        from quarrycore_ray.pipelines.documents import (
            dedup_threshold_sweep,
            minhash_dedup_docs,
        )

        sf = "/root/testdata/sf0.001"
        out = (
            dedup_threshold_sweep(sf)
            .to_pandas()
            .sort_values("threshold")
            .reset_index(drop=True)
        )
        assert list(out["threshold"]) == [0.75, 0.8, 0.85, 0.9, 0.95]
        # one candidate set across the sweep
        assert out["n_candidates"].nunique() == 1
        # raising the threshold never adds edges or merges clusters
        assert list(out["n_edges"]) == sorted(out["n_edges"], reverse=True)
        assert list(out["n_clusters"]) == sorted(out["n_clusters"])
        assert (out["n_edges"] <= out["n_candidates"]).all()
        # anchor: at the flagship threshold, est-only clusters can only
        # be >= the flagship count (which adds the Hamming rescue)
        cl = minhash_dedup_docs(sf).to_pandas()
        flag = cl["cluster_id"].nunique()
        row = out[out["threshold"] == 0.85].iloc[0]
        assert row["n_clusters"] >= flag


class TestSetSimJoin:
    """PPJoin-style prefix-filtered set-similarity join
    (pipelines/documents.setsim_join_docs): planted near-identical
    token sets are found with exact intersection/union sizes, and the
    prefix filter is LOSSLESS — engine output equals a brute-force
    all-pairs join on a corpus with planted high-Jaccard variants."""

    @staticmethod
    def _write(tmp_path, texts: dict[int, str]) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tb = pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    @staticmethod
    def _brute(texts: dict[int, str]) -> list[tuple[int, int, int, int]]:
        import itertools

        from quarrycore_ray.text import normalize_whitespace

        sets = {
            d: set(normalize_whitespace(t).split(" ")) for d, t in texts.items()
        }
        out = []
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 10 >= union * 9:
                out.append((a, b, inter, union))
        return out

    def test_planted_pairs(self, tmp_path):
        from quarrycore_ray.pipelines.documents import setsim_join_docs

        base = " ".join(f"tok{i}" for i in range(20))
        texts = {
            0: base,
            # one token of twenty replaced: J = 19/21 >= 0.9
            1: base.replace("tok7", "zzz"),
            # same token SET as 0 (reordered, messy whitespace): J = 1
            2: "  " + " ".join(f"tok{i}" for i in reversed(range(20))) + "\t",
            # half overlap: excluded
            3: " ".join(f"tok{i}" for i in range(10))
            + " "
            + " ".join(f"other{i}" for i in range(10)),
        }
        out = setsim_join_docs(self._write(tmp_path, texts))
        got = {
            (a, b): (i, u)
            for a, b, i, u in zip(
                out["a_id"], out["b_id"], out["inter_size"], out["union_size"]
            )
        }
        assert got == {
            (0, 1): (19, 21),
            (0, 2): (20, 20),
            (1, 2): (19, 21),
        }
        jac = dict(zip(zip(out["a_id"], out["b_id"]), out["jaccard"]))
        assert jac[(0, 2)] == 1.0
        assert jac[(0, 1)] == 19 / 21

    def test_matches_bruteforce(self, tmp_path):
        import random

        from quarrycore_ray.pipelines.documents import setsim_join_docs

        rng = random.Random(97)
        vocab = [f"w{i}" for i in range(120)]
        texts: dict[int, str] = {}
        for d in range(30):
            texts[d] = " ".join(rng.choice(vocab) for _ in range(25))
        # planted variants: one occurrence of one token changed; the
        # distinct-set Jaccard stays high but is NOT always >= 0.9
        # (depends on within-doc repeats), so the brute force decides
        for k, d in enumerate(range(30, 40)):
            words = texts[d - 30].split(" ")
            words[rng.randrange(len(words))] = f"x{k}"
            texts[d] = " ".join(words)
        # exact set duplicates (always joined)
        for d in range(40, 44):
            words = texts[d - 40].split(" ")
            rng.shuffle(words)
            texts[d] = " ".join(words)

        out = setsim_join_docs(self._write(tmp_path, texts))
        got = sorted(
            zip(out["a_id"], out["b_id"], out["inter_size"], out["union_size"])
        )
        expect = self._brute(texts)
        assert got == [(int(a), int(b), int(i), int(u)) for a, b, i, u in expect]
        assert len(expect) >= 10  # the fixture genuinely plants joins

    def test_dense_matches_partitioned(self, tmp_path):
        """The dense-id rep-grouped fast path and the string-keyed
        partitioned scale path produce identical pair tables on a corpus
        with identical-set cliques (where the expansion logic is live)."""
        import random

        from quarrycore_ray.pipelines.documents import (
            _setsim_join_partitioned,
            canonical_docs,
            setsim_join_docs,
        )

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(40)]
        texts: dict[int, str] = {}
        for d in range(20):
            texts[d] = " ".join(rng.choice(vocab) for _ in range(15))
        # a 4-doc identical-set clique and a 3-doc one, set-similar to
        # each other: exercises intra-clique emission AND cross expansion
        base = texts[0].split(" ")
        for d in range(20, 24):
            w = list(base)
            rng.shuffle(w)
            texts[d] = " ".join(w)
        near = list(dict.fromkeys(base))  # distinct tokens of the clique
        near[0] = "y0"
        for d in range(24, 27):
            w = list(near)
            rng.shuffle(w)
            texts[d] = " ".join(w)

        sf = self._write(tmp_path, texts)
        dense = setsim_join_docs(sf)  # vocab far below the limit
        part = (
            _setsim_join_partitioned(canonical_docs(sf).materialize())
            .sort_values(["a_id", "b_id"])
            .reset_index(drop=True)
        )
        assert dense.equals(part)
        # the planted cliques are actually present in the output
        pairs = set(zip(dense["a_id"], dense["b_id"]))
        assert (20, 21) in pairs and (0, 20) in pairs


class TestReviewSample:
    """Stratified dup-pair review sample
    (documents.dedup_review_sample): deterministic md5-ordered deciles,
    per_bucket cap, bucket = integer decile of the Jaccard estimate."""

    def test_buckets_and_determinism(self, tmp_path):
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.documents import dedup_review_sample

        base = " ".join(f"w{i:03d}" for i in range(60))
        texts = {0: base}
        # near variants at staggered similarity: flip k words each
        for k, d in ((1, 1), (2, 2), (3, 3)):
            words = base.split(" ")
            for i in range(k):
                words[5 + i * 7] = f"x{d}{i}"
            texts[d] = " ".join(words)
        for d in range(4, 10):
            texts[d] = " ".join(f"z{d}{i}" for i in range(40))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array(
                        [texts[k] for k in sorted(texts)], pa.string()
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = dedup_review_sample(str(tmp_path), per_bucket=2).to_pandas()
        assert len(out) > 0
        # decile math: bucket == floor(eq*10/128) for every row
        for r in out.itertuples():
            eq = round(r.jaccard * 128)
            assert r.bucket == eq * 10 // 128
            assert 1 <= r.rank <= 2
        # md5 ordering within each bucket
        for _, grp in out.groupby("bucket"):
            mks = [
                hashlib.md5(f"{a}|{b}".encode()).hexdigest()
                for a, b in zip(grp["a_id"], grp["b_id"])
            ]
            assert mks == sorted(mks)
        # rerun: identical sample
        again = dedup_review_sample(str(tmp_path), per_bucket=2).to_pandas()
        pdsort = lambda d: d.sort_values(["bucket", "rank"]).reset_index(drop=True)  # noqa: E731
        assert pdsort(out).equals(pdsort(again))


class TestBroadcastAttachMissingId:
    """A pair id absent from the broadcast signature table must raise a
    descriptive KeyError naming the ids — not surface later as an
    undefined NaN->int64 index inside Table.take (ADVICE r4)."""

    def test_missing_id_raises_keyerror(self):
        import numpy as np
        import pytest
        import ray

        from quarrycore_ray.stages.lsh import _BroadcastAttach

        sigs = pa.table(
            {
                "conv_id": pa.array(["a", "b"], pa.string()),
                "minhash_sig": pa.array([b"\x00" * 512] * 2, pa.binary()),
                "simhash": pa.array([0, 1], pa.int64()),
                "thr": pa.array([0.85, 0.85], pa.float64()),
            }
        )
        stage = _BroadcastAttach(ray.put(sigs))
        good = pa.table(
            {
                "a_id": pa.array(["a"], pa.string()),
                "b_id": pa.array(["b"], pa.string()),
                "bucket_size": pa.array([2], pa.int64()),
                "dropped_pairs": pa.array([0], pa.int64()),
            }
        )
        out = stage(good)
        assert out.num_rows == 1
        bad = pa.table(
            {
                "a_id": pa.array(["a"], pa.string()),
                "b_id": pa.array(["MISSING"], pa.string()),
                "bucket_size": pa.array([2], pa.int64()),
                "dropped_pairs": pa.array([0], pa.int64()),
            }
        )
        with pytest.raises(KeyError, match="MISSING"):
            stage(bad)
