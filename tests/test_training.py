"""Training-data construction operators (pipelines/training.py) on
planted fixtures: TF-IDF ranks match hand-computed scores, Gopher rules
keep/drop the right documents, sequence packing reproduces the global
prefix sum, unigram log-probs match math.log arithmetic, and mixing
weights follow the temperature power law."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts: dict[int, str], sources: dict[int, str] | None = None):
    ids = sorted(texts)
    cols = {
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[k] for k in ids], pa.string()),
    }
    if sources is not None:
        cols["source"] = pa.array([sources[k] for k in ids], pa.string())
    pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


class TestTfidf:
    def test_ranks_match_hand_computation(self, tmp_path):
        from quarrycore_ray.pipelines.training import tfidf_top_terms

        # 'rare' appears only in doc 0 (df=1), 'shared' in all three (df=3)
        sf = _write_docs(
            tmp_path,
            {
                0: "rare shared shared",
                1: "shared common common",
                2: "shared common other",
            },
        )
        out = tfidf_top_terms(sf, k=2).to_pandas()
        d0 = out[out.doc_id == 0].sort_values("rank")
        # doc 0: score(rare) = 1*ln(3/1) = 1.0986; score(shared) = 2*ln(3/3) = 0
        assert list(d0.token) == ["rare", "shared"]
        assert abs(d0.iloc[0].tfidf - math.log(3.0)) < 1e-6
        assert d0.iloc[1].tfidf == 0.0
        # every doc emits exactly min(k, n_distinct_terms) rows
        assert out.groupby("doc_id").size().max() <= 2
        assert list(out.columns) == ["doc_id", "token", "tfidf", "rank"]

    def test_rank_ties_break_by_token(self, tmp_path):
        from quarrycore_ray.pipelines.training import tfidf_top_terms

        # 'aa' and 'bb' both unique to doc 0 with tf=1 -> equal scores,
        # tie broken alphabetically
        sf = _write_docs(tmp_path, {0: "bb aa", 1: "zz"})
        out = tfidf_top_terms(sf, k=2).to_pandas()
        d0 = out[out.doc_id == 0].sort_values("rank")
        assert list(d0.token) == ["aa", "bb"]


class TestGopherRules:
    def test_keep_and_drop(self, tmp_path):
        from quarrycore_ray.pipelines.training import gopher_quality_docs

        good = "the quick brown fox jumps over that lazy dog again " * 6  # 60 words
        short = "way too short"
        symbols = ("# " * 30 + "the and that it is for ok " * 5).strip()
        sf = _write_docs(tmp_path, {0: good, 1: short, 2: symbols})
        out = gopher_quality_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "keep"] == 1
        assert out.loc[0, "n_words"] == 60
        assert out.loc[0, "stop_hits"] >= 2
        # doc 1: under the 50-word floor
        assert out.loc[1, "keep"] == 0
        # doc 2: symbol ratio 30/65 >= 0.1
        assert out.loc[2, "keep"] == 0
        assert out.loc[2, "symbol_ratio"] > 0.1

    def test_bullet_and_ellipsis_lines(self, tmp_path):
        from quarrycore_ray.pipelines.training import gopher_quality_docs

        text = "- first bullet\n- second bullet\ntrailing thought...\nplain line"
        sf = _write_docs(tmp_path, {0: text})
        out = gopher_quality_docs(sf).to_pandas().iloc[0]
        assert abs(out.bullet_frac - 2 / 4) < 1e-6
        assert abs(out.ellipsis_frac - 1 / 4) < 1e-6


class TestPackSequences:
    def test_prefix_sum_bins(self, tmp_path):
        from quarrycore_ray.pipelines.training import pack_sequences

        # token counts 5, 5, 5, 2 with budget 8:
        # before = 0, 5, 10, 15 -> bins 0, 0, 1, 1
        sf = _write_docs(
            tmp_path,
            {
                0: "a b c d e",
                1: "f g h i j",
                2: "k l m n o",
                3: "p q",
            },
        )
        out = (
            pack_sequences(sf, budget=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out.n_tokens) == [5, 5, 5, 2]
        assert list(out.bin_id) == [0, 0, 1, 1]

    def test_bucket_boundaries_preserve_global_order(self, tmp_path):
        from quarrycore_ray.pipelines.training import pack_sequences

        # bucket_size=2 forces multiple buckets; the bucket offsets must
        # stitch the per-bucket cumsums into one global prefix sum
        texts = {i: " ".join(["w"] * 3) for i in range(10)}  # 3 tokens each
        sf = _write_docs(tmp_path, texts)
        out = (
            pack_sequences(sf, budget=4, bucket_size=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expect = [(3 * i) // 4 for i in range(10)]
        assert list(out.bin_id) == expect


class TestUnigramLogprob:
    def test_matches_math_log(self, tmp_path):
        from quarrycore_ray.pipelines.training import unigram_logprob_docs

        # corpus: 'a' x3, 'b' x1 -> p(a)=3/4, p(b)=1/4
        sf = _write_docs(tmp_path, {0: "a a a", 1: "b"})
        out = unigram_logprob_docs(sf).to_pandas().set_index("doc_id")
        u_a = math.floor(-math.log(3 / 4) * 1e6 + 0.5)
        u_b = math.floor(-math.log(1 / 4) * 1e6 + 0.5)
        exp0 = math.floor((3 * u_a / 1e6 / 3) * 1e6 + 0.5) / 1e6
        exp1 = math.floor((u_b / 1e6 / 1) * 1e6 + 0.5) / 1e6
        assert out.loc[0, "avg_neg_logprob"] == exp0
        assert out.loc[1, "avg_neg_logprob"] == exp1
        assert out.loc[0, "n_tokens"] == 3


class TestBigramLogprob:
    def test_matches_hand_computation(self, tmp_path):
        from quarrycore_ray.pipelines.training import bigram_logprob_docs

        # corpus: doc0 = 'a b a b', doc1 = 'b a'
        # unigrams: a x3, b x3, T=6; bigrams: ab x2, ba x2
        sf = _write_docs(tmp_path, {0: "a b a b", 1: "b a"})
        out = bigram_logprob_docs(sf).to_pandas().set_index("doc_id")
        T = 6.0
        pa_, pb = 3 / T, 3 / T
        # p(b|a) = .7*(2/3) + .3*(3/6); p(a|b) = .7*(2/3) + .3*(3/6)
        u_ab = math.floor(-math.log(0.7 * (2 / 3) + 0.3 * pb) * 1e6 + 0.5)
        u_ba = math.floor(-math.log(0.7 * (2 / 3) + 0.3 * pa_) * 1e6 + 0.5)
        u_a0 = math.floor(-math.log(pa_) * 1e6 + 0.5)
        u_b0 = math.floor(-math.log(pb) * 1e6 + 0.5)
        # doc0: first 'a' unigram + b|a, a|b, b|a
        su0 = u_a0 + 2 * u_ab + u_ba
        exp0 = math.floor((su0 / 1e6 / 4) * 1e6 + 0.5) / 1e6
        # doc1: first 'b' unigram + a|b
        su1 = u_b0 + u_ba
        exp1 = math.floor((su1 / 1e6 / 2) * 1e6 + 0.5) / 1e6
        assert out.loc[0, "n_tokens"] == 4
        assert out.loc[1, "n_tokens"] == 2
        assert out.loc[0, "avg_neg_logprob"] == exp0
        assert out.loc[1, "avg_neg_logprob"] == exp1

    def test_single_token_doc_scores_unigram_only(self, tmp_path):
        from quarrycore_ray.pipelines.training import bigram_logprob_docs

        sf = _write_docs(tmp_path, {0: "x", 1: "x y"})
        out = bigram_logprob_docs(sf).to_pandas().set_index("doc_id")
        # doc0 has one token, no bigrams: exact unigram term p(x)=2/3
        u = math.floor(-math.log(2 / 3) * 1e6 + 0.5)
        exp = math.floor((u / 1e6) * 1e6 + 0.5) / 1e6
        assert out.loc[0, "n_tokens"] == 1
        assert out.loc[0, "avg_neg_logprob"] == exp


class TestSourceMixing:
    def test_temperature_flattens(self, tmp_path):
        from quarrycore_ray.pipelines.training import source_mixing_weights

        texts = {i: "x" for i in range(10)}
        sources = {i: ("big" if i < 9 else "small") for i in range(10)}
        sf = _write_docs(tmp_path, texts, sources)
        out = source_mixing_weights(sf, alpha=0.7).set_index("source")
        assert out.loc["big", "n_docs"] == 9
        # weights normalized
        assert abs(out.mix_weight.sum() - 1.0) < 1e-5
        # alpha < 1 flattens: small source gets MORE than its 0.1 share
        assert out.loc["small", "mix_weight"] > 0.1
        assert out.loc["big", "mix_weight"] < 0.9
        # exact power-law ratio (up to micro-unit rounding)
        ratio = out.loc["big", "mix_weight"] / out.loc["small", "mix_weight"]
        assert abs(ratio - 9**0.7) < 1e-3


def _write_embeddings(tmp_path, vecs, labels):
    tb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tb, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


class TestQuantizeEmbeddings:
    def test_roundtrip_error_and_scale(self, tmp_path):
        from quarrycore_ray.functions.similarity import quantize_embeddings

        sf = _write_embeddings(
            tmp_path, [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0]], [0, 0]
        )
        out = quantize_embeddings(sf).to_pandas().set_index("vec_id")
        assert abs(out.loc[0, "scale"] - 1.0 / 127) < 1e-9
        # exactly representable values quantize with tiny error
        assert out.loc[0, "mse"] < 1e-5
        # the all-zero vector: scale 0, zero error (no div-by-zero)
        assert out.loc[1, "scale"] == 0.0
        assert out.loc[1, "mse"] == 0.0
        assert out.loc[0, "dim"] == 4

    def test_clip_bounds(self, tmp_path):
        from quarrycore_ray.functions.similarity import quantize_embeddings

        # one dominant component: smallest components round to 0,
        # reconstruction error bounded by (scale/2)^2 per dim
        sf = _write_embeddings(tmp_path, [[127.0, 0.4, -0.4, 0.1]], [0])
        out = quantize_embeddings(sf).to_pandas().iloc[0]
        assert abs(out.scale - 1.0) < 1e-9
        assert out.mse <= 0.25


class TestSemdedupPrune:
    def test_prunes_within_cluster_only(self, tmp_path):
        from quarrycore_ray.functions.similarity import semdedup_prune

        # vecs 0,1 identical in label 0 -> 1 pruned, kept_id 0
        # vec 2 identical direction but label 1 -> untouched (cluster-scoped)
        # vec 3 orthogonal in label 0 -> survives
        sf = _write_embeddings(
            tmp_path,
            [[1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [0.0, 1.0]],
            [0, 0, 1, 0],
        )
        out = semdedup_prune(sf, threshold=0.9).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].vec_id == 1
        assert out.iloc[0].kept_id == 0
        assert out.iloc[0].label == 0

    def test_chain_keeps_earliest(self, tmp_path):
        from quarrycore_ray.functions.similarity import semdedup_prune

        # three near-identical vectors in one cluster: 1 and 2 both
        # report kept_id=0 (the earliest), not a chain
        sf = _write_embeddings(
            tmp_path,
            [[1.0, 0.01], [1.0, 0.02], [1.0, 0.03]],
            [5, 5, 5],
        )
        out = semdedup_prune(sf, threshold=0.99).to_pandas().sort_values("vec_id")
        assert list(out.vec_id) == [1, 2]
        assert list(out.kept_id) == [0, 0]


class TestOovRate:
    def test_topk_vocab_and_rates(self, tmp_path):
        from quarrycore_ray.pipelines.training import oov_rate_docs

        # counts: a=3, b=1, c=1 -> vocab(k=1) = {a}
        sf = _write_docs(tmp_path, {0: "a a b", 1: "a c"})
        out = oov_rate_docs(sf, vocab_size=1).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "n_oov"] == 1
        assert abs(out.loc[0, "oov_rate"] - 1 / 3) < 1e-6
        assert out.loc[1, "n_oov"] == 1
        assert abs(out.loc[1, "oov_rate"] - 0.5) < 1e-6

    def test_vocab_ties_break_by_token(self, tmp_path):
        from quarrycore_ray.pipelines.training import oov_rate_docs

        # b and z tie at count 1; vocab(k=1) picks 'b' alphabetically
        sf = _write_docs(tmp_path, {0: "b z"})
        out = oov_rate_docs(sf, vocab_size=1).to_pandas().iloc[0]
        assert out.n_oov == 1  # z is OOV, b is in-vocab


class TestSourceOverlap:
    def test_shared_segments_and_jaccard(self, tmp_path):
        from quarrycore_ray.pipelines.training import source_overlap

        # 2-word segments: X = {"a b", "c d"}, Y = {"a b", "x y"}
        # shared = 1, jaccard = 1 / (2 + 2 - 1) = 1/3
        sf = _write_docs(
            tmp_path,
            {0: "a b c d", 1: "a b x y"},
            sources={0: "X", 1: "Y"},
        )
        out = source_overlap(sf, seg_words=2).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row.source_a, row.source_b) == ("X", "Y")
        assert row.n_shared == 1
        assert abs(row.jaccard - 1 / 3) < 1e-6

    def test_disjoint_sources_emit_nothing(self, tmp_path):
        from quarrycore_ray.pipelines.training import source_overlap

        sf = _write_docs(
            tmp_path,
            {0: "a b", 1: "x y"},
            sources={0: "X", 1: "Y"},
        )
        out = source_overlap(sf, seg_words=2).to_pandas()
        assert len(out) == 0

    def test_duplicate_segments_counted_once(self, tmp_path):
        from quarrycore_ray.pipelines.training import source_overlap

        # the shared segment appears twice in X but counts once (distinct)
        sf = _write_docs(
            tmp_path,
            {0: "a b", 1: "a b", 2: "a b c c"},
            sources={0: "X", 1: "X", 2: "Y"},
        )
        out = source_overlap(sf, seg_words=2).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].n_shared == 1


class TestPmiBigrams:
    def test_known_collocation(self, tmp_path):
        from quarrycore_ray.pipelines.training import pmi_bigrams

        # "x y" x5 -> bigram (x,y) 5 times, (y,x) 4 times; T=10, c_x=c_y=5
        sf = _write_docs(tmp_path, {0: "x y x y x y x y x y"})
        out = pmi_bigrams(sf, k=5, min_count=5)
        assert len(out) == 1  # (y,x) has count 4 < min_count
        row = out.iloc[0]
        assert (row.w1, row.w2) == ("x", "y")
        assert row.n_pair == 5
        # pmi = ln5 + ln10 - ln5 - ln5 = ln 2
        assert abs(row.pmi - math.log(2.0)) < 1e-6

    def test_topk_orders_by_pmi(self, tmp_path):
        from quarrycore_ray.pipelines.training import pmi_bigrams

        # 'a b' always adjacent (high PMI); 'c' pairs with many partners
        text = "a b c d a b c e a b c f a b c g a b c h"
        sf = _write_docs(tmp_path, {i: text for i in range(3)})
        out = pmi_bigrams(sf, k=2, min_count=3)
        assert list(out.columns) == ["w1", "w2", "n_pair", "pmi"]
        assert len(out) == 2
        assert out.pmi.is_monotonic_decreasing


class TestSourceMedianFilter:
    def test_keeps_strictly_above_median(self, tmp_path):
        from quarrycore_ray.pipelines.training import filter_below_source_median

        # 5 docs in one source with strictly increasing length scores
        texts = {
            i: " ".join(["the word is that it for and of in to"] * (i + 1))
            for i in range(5)
        }
        sf = _write_docs(tmp_path, texts, sources={i: "S" for i in range(5)})
        out = filter_below_source_median(sf).to_pandas()
        kept = sorted(out.doc_id)

        # expectation derived from the engine's own quality scores
        from quarrycore_ray.pipelines.documents import quality_score_docs

        q = quality_score_docs(sf).to_pandas().set_index("doc_id")["quality"]
        med = sorted(q)[(len(q) - 1) // 2]
        expect = sorted(q[q > med].index)
        assert kept == expect
        assert 0 < len(kept) < len(q)  # strict median filter is non-trivial
        assert (out.source == "S").all()
        assert out.quality.between(0, 1).all()


class TestRandomizedSerialOracles:
    """Seeded random inputs checked against serial numpy recomputation —
    sweeps the distributed two-phase scan and quantization kernels over
    shapes the hand fixtures don't cover."""

    def test_pack_sequences_matches_serial_prefix_sum(self, tmp_path):
        from quarrycore_ray.pipelines.training import pack_sequences

        rng = np.random.default_rng(7)
        n_tok = rng.integers(1, 40, size=200)
        texts = {i: " ".join(["w"] * int(n)) for i, n in enumerate(n_tok)}
        sf = _write_docs(tmp_path, texts)
        out = (
            pack_sequences(sf, budget=64, bucket_size=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        before = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        assert list(out.n_tokens) == list(n_tok)
        assert list(out.bin_id) == list(before // 64)

    def test_quantize_matches_serial_numpy(self, tmp_path):
        from quarrycore_ray.functions.similarity import quantize_embeddings

        rng = np.random.default_rng(11)
        vecs = (rng.standard_normal((50, 16)) * rng.uniform(0.1, 10)).astype(
            np.float32
        )
        sf = _write_embeddings(tmp_path, vecs.tolist(), [0] * 50)
        out = (
            quantize_embeddings(sf)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        v = vecs.astype(np.float64)
        amax = np.abs(v).max(axis=1)
        scale = amax / 127.0
        q = np.clip(np.floor(v / scale[:, None] + 0.5), -127, 127)
        d = v - q * scale[:, None]
        tu = np.floor(d * d * 1e12 + 0.5).astype(np.int64).sum(axis=1)
        exp_mse = np.floor(tu / 1e12 / 16 * 1e9 + 0.5) / 1e9
        exp_scale = np.floor(scale * 1e9 + 0.5) / 1e9
        assert np.array_equal(out.scale.to_numpy(), exp_scale)
        assert np.array_equal(out.mse.to_numpy(), exp_mse)
        # quantization error bound: each component off by at most scale/2
        assert (out.mse.to_numpy() <= (scale / 2) ** 2 + 1e-12).all()


class TestGlobalLengthRank:
    def test_matches_serial_row_number(self, tmp_path):
        from quarrycore_ray.pipelines.documents import global_length_rank

        rng = np.random.default_rng(3)
        # heavy ties: only 5 distinct lengths over 60 docs
        lens = rng.integers(1, 6, size=60)
        texts = {i: "x" * int(n) for i, n in enumerate(lens)}
        ids = sorted(texts)
        tb = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[k] for k in ids], pa.string()),
                "n_chars": pa.array([len(texts[k]) for k in ids], pa.int64()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        out = (
            global_length_rank(str(tmp_path))
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        order = sorted(ids, key=lambda i: (len(texts[i]), i))
        assert list(out.doc_id) == order
        assert list(out["rank"]) == list(range(1, 61))


class TestSkyline:
    def test_matches_serial_dominance_scan(self, tmp_path):
        from quarrycore_ray.pipelines.documents import skyline_docs

        rng = np.random.default_rng(5)
        # random texts -> varied (n_chars, quality); include exact ties
        words = ["the", "fast", "table", "scan", "zz", "qq", "row"]
        texts = {
            i: " ".join(rng.choice(words, size=rng.integers(1, 30)))
            for i in range(80)
        }
        texts[80] = texts[0]  # duplicate point: both must survive together
        ids = sorted(texts)
        tb = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[k] for k in ids], pa.string()),
                "n_chars": pa.array(
                    [len(texts[k]) for k in ids], pa.int64()
                ),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        out = skyline_docs(str(tmp_path))

        # serial O(n^2) dominance oracle over the engine's own scores
        from quarrycore_ray.pipelines.documents import quality_score_docs

        q = quality_score_docs(str(tmp_path)).to_pandas().set_index("doc_id")
        pts = {
            i: (len(texts[i]), round(q.loc[i, "quality"] * 1e6))
            for i in ids
        }
        expect = sorted(
            a
            for a in ids
            if not any(
                pts[b][0] >= pts[a][0]
                and pts[b][1] >= pts[a][1]
                and pts[b] != pts[a]
                for b in ids
            )
        )
        assert list(out.doc_id) == expect
        # the duplicated point pair survives or falls together
        assert (0 in expect) == (80 in expect)


class TestHeuristicQuality:
    def test_spam_formula(self, tmp_path):
        from quarrycore_ray.pipelines.documents import heuristic_quality_docs

        spammy = "FREE CASH PRIZE! Buy now! Click here! Win a prize! URGENT!"
        clean = "The quarterly report shows steady revenue growth this year."
        sf = _write_docs(tmp_path, {0: spammy, 1: clean})
        out = heuristic_quality_docs(sf).to_pandas().set_index("doc_id")
        # spammy: kw hits free/cash/prize/buy now/click here/win/urgent = 7
        # -> kw term saturates at 1.0; many uppercase; !/(.+1) saturates
        assert out.loc[0, "spam_score"] > 0.6
        assert out.loc[1, "spam_score"] < 0.25
        assert out.loc[0, "spam_score"] > out.loc[1, "spam_score"]

    def test_grammar_penalties(self, tmp_path):
        from quarrycore_ray.pipelines.documents import heuristic_quality_docs

        # 2 well-formed sentences of 4+ words -> no penalties
        good = "This is a sentence. Here is another one."
        # lowercase starts (2), short sentences (2), double space (2),
        # missing space after punct (2), repeated punctuation (1) -> 9
        bad = "bad one.  tiny.Next!! ok"
        sf = _write_docs(tmp_path, {0: good, 1: bad})
        out = heuristic_quality_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "grammar_score"] == 1.0
        assert out.loc[1, "grammar_score"] < 0.7
        # reference clamp: never below 0
        assert (out.grammar_score >= 0).all()

    def test_empty_and_wordless(self, tmp_path):
        from quarrycore_ray.pipelines.documents import heuristic_quality_docs

        sf = _write_docs(tmp_path, {0: "", 1: "   "})
        out = heuristic_quality_docs(sf).to_pandas()
        assert (out.spam_score == 0.0).all()


class TestLexicalQuality:
    def test_hand_computed_metrics(self, tmp_path):
        from quarrycore_ray.pipelines.documents import lexical_quality_docs

        # 2 sentences, 8 words, all distinct
        text = "The cat sat down. A dog ran away."
        sf = _write_docs(tmp_path, {0: text, 1: ""})
        out = lexical_quality_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "lexical_diversity"] == 1.0
        assert out.loc[0, "avg_sentence_length"] == 4.0
        # syllable proxy: vowel groups of lowercased text
        import re

        syll = len(re.findall(r"[aeiouy]+", text.lower()))
        exp = 206.835 - 1.015 * 4.0 - 84.6 * (syll / 8)
        assert abs(out.loc[0, "flesch"] - exp) < 1e-6
        # empty doc: all zeros
        assert (out.loc[1] == 0.0).all()

    def test_repetition_lowers_diversity(self, tmp_path):
        from quarrycore_ray.pipelines.documents import lexical_quality_docs

        sf = _write_docs(tmp_path, {0: "word word word word", 1: "a b c d"})
        out = lexical_quality_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "lexical_diversity"] == 0.25
        assert out.loc[1, "lexical_diversity"] == 1.0


class TestExtractionConfidence:
    def test_component_buckets_and_weights(self, tmp_path):
        from quarrycore_ray.pipelines.documents import extraction_confidence_docs

        # ~900 chars of well-structured prose: optimal length bucket,
        # full structure score
        para = (
            "However the article section provides a thorough introduction "
            "to the topic. " * 6
        ).strip()
        rich = para + "\n\n" + para
        tiny = "too short"
        spam_nav = "click here to login and register now home about contact menu"
        sf = _write_docs(tmp_path, {0: rich, 1: tiny, 2: spam_nav})
        out = extraction_confidence_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "content_length_score"] == 1.0  # 500..5000 chars
        assert out.loc[0, "structure_score"] >= 0.7
        assert out.loc[1, "content_length_score"] == 0.0  # < 50 chars
        # bad + nav pattern penalties drag text quality down
        assert out.loc[2, "text_quality_score"] < out.loc[0, "text_quality_score"]
        # weighted total stays in [0, 1] and orders sensibly
        assert out.confidence.between(0, 1).all()
        assert out.loc[0, "confidence"] > out.loc[1, "confidence"]

    def test_constant_tail(self, tmp_path):
        from quarrycore_ray.pipelines.documents import extraction_confidence_docs

        # empty text: cl=0, st=0, tq=0 -> confidence = method/html/domain
        # defaults only = 0.6*0.15 + 0.5*0.15 + 0.5*0.10 = 0.215
        sf = _write_docs(tmp_path, {0: ""})
        out = extraction_confidence_docs(sf).to_pandas().iloc[0]
        assert abs(out.confidence - 0.215) < 1e-6


class TestReadingMetrics:
    def test_mattr_matches_naive_reference_algorithm(self, tmp_path):
        from quarrycore_ray.pipelines.documents import (
            ANALYZER_STOPWORDS,
            reading_metrics_docs,
        )

        rng = np.random.default_rng(13)
        pool = ["table", "scan", "merge", "window", "quarry", "stream",
                "batch", "spark", "shuffle", "vector"]
        words = [pool[i] for i in rng.integers(0, len(pool), size=250)]
        text = " ".join(words)
        sf = _write_docs(tmp_path, {0: text})
        out = reading_metrics_docs(sf, mattr_window=100).to_pandas().iloc[0]

        # naive reference MATTR (content_analyzer.py:715-726): mean of
        # per-window type-token ratios
        import re

        toks = [w for w in re.findall(r"\b\w+\b", text.lower()) if len(w) > 1]
        content = [w for w in toks if w not in ANALYZER_STOPWORDS]
        ttrs = [
            len(set(content[i : i + 100])) / 100
            for i in range(len(content) - 99)
        ]
        naive = sum(ttrs) / len(ttrs)
        assert abs(out.mattr - naive) < 1e-9
        assert out.word_count == 250
        assert abs(out.ttr - len(set(content)) / len(content)) < 1e-6

    def test_syllables_and_flesch(self, tmp_path):
        from quarrycore_ray.pipelines.documents import reading_metrics_docs

        # "hello world." -> hello: he-llo 2 vowel groups; world: 1 -> 3
        sf = _write_docs(tmp_path, {0: "hello world."})
        out = reading_metrics_docs(sf).to_pandas().iloc[0]
        assert out.syllables == 3
        assert out.sentence_count == 1 and out.word_count == 2
        exp = 206.835 - 1.015 * 2 - 84.6 * (3 / 2)
        assert abs(out.flesch - max(0, min(100, exp))) < 1e-6
        # silent trailing e: "table" -> t-a-ble: groups a,e -> 2-1 = 1
        sf2 = _write_docs(tmp_path, {0: "table"})
        # need fresh dir; reuse tmp_path is fine (overwrites parquet)
        out2 = reading_metrics_docs(sf2).to_pandas().iloc[0]
        assert out2.syllables == 1


class TestQualityIndicators:
    def test_flags_on_planted_texts(self, tmp_path):
        from quarrycore_ray.pipelines.documents import quality_indicators_docs

        # no trailing '.' — a trailing dot adds an empty segment to the
        # reference's capitalization denominator (re.split keeps it)
        good = (
            "This sentence has exactly eleven well formed words in it today. "
            "Another sentence follows with a similar healthy word count too. "
            "Therefore the research analysis shows good data structure here"
        )
        shouty = "no caps here. neither here. l33t w0rds c0unt as err0rs."
        short_words = "a be cat dog run fun. We go up now"
        sf = _write_docs(tmp_path, {0: good, 1: shouty, 2: short_words})
        out = quality_indicators_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "proper_capitalization"] == 1  # 3/3 capitalized
        assert out.loc[0, "proper_punctuation"] == 1
        assert out.loc[0, "coherent"] == 1  # ~10 words per sentence
        assert out.loc[0, "completeness"] > 0.2  # depth + info words present
        # faithful reference quirk: words of 5+ chars count as potential
        # typos (content_analyzer.py:773), so normal prose fails the 5% bar
        assert out.loc[0, "spelling_ok"] == 0
        assert out.loc[1, "proper_capitalization"] == 0
        assert out.loc[1, "spelling_ok"] == 0  # digit-words over 5%
        # only sub-5-char clean words: zero pattern hits -> passes
        assert out.loc[2, "spelling_ok"] == 1

    def test_completeness_buckets(self, tmp_path):
        from quarrycore_ray.pipelines.documents import quality_indicators_docs

        # 300+ words, 5+ sentences, 3 paragraphs, depth + info words:
        # tenths = 3 + 2 + 2 + 2 + 1 = 10 -> capped 1.0
        para = ("Because research data results matter. " * 30).strip()
        full = para + "\n\n" + para + "\n\n" + para
        sf = _write_docs(tmp_path, {0: full, 1: "tiny"})
        out = quality_indicators_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "completeness"] == 1.0
        assert out.loc[1, "completeness"] == 0.0


class TestPowerIteration:
    def test_matches_serial_replica_and_dominates(self, tmp_path):
        from quarrycore_ray.functions.similarity import embedding_top_component

        rng = np.random.default_rng(17)
        # strong planted direction + noise
        d = 8
        planted = np.zeros(d)
        planted[2] = 1.0
        vecs = (
            planted[None, :] * rng.uniform(2, 3, size=(120, 1))
            + rng.standard_normal((120, d)) * 0.05
        ).astype(np.float32)
        sf = _write_embeddings(tmp_path, vecs.tolist(), [0] * 120)
        out = embedding_top_component(sf, n_iter=8)
        v = out.component.to_numpy()

        # serial replica of the per-row-quantized algorithm
        emb = vecs.astype(np.float64)
        ref = np.zeros(d)
        ref[0] = 1.0
        for _ in range(8):
            w = emb @ ref
            q = np.floor(emb * w[:, None] * 1e9 + 0.5).astype(np.int64)
            s = q.sum(axis=0) / 1e9
            n = np.linalg.norm(s)
            ref = s / n
            nz = np.nonzero(np.abs(ref) > 1e-12)[0]
            if len(nz) and ref[nz[0]] < 0:
                ref = -ref
        # per-row quantization => engine result == serial replica for
        # ANY block layout, not just the single-batch case
        assert np.allclose(v, ref, atol=1e-12)
        # converged to the planted direction
        assert abs(v[2]) > 0.99
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


class TestAnalyticsReport:
    def test_matches_numpy_on_planted_corpus(self, tmp_path):
        from quarrycore_ray.pipelines.dataset import dataset_analytics_report

        texts = {i: " ".join(["w%d" % (j % 7) for j in range(i + 1)])
                 for i in range(9)}  # token counts 1..9
        sf = _write_docs(tmp_path, texts)
        out = dataset_analytics_report(sf).iloc[0]
        counts = np.arange(1, 10)
        assert out.total_records == 9
        assert out.vocabulary_size == 7
        assert abs(out.tok_mean - counts.mean()) < 1e-6
        assert abs(out.tok_std - counts.std()) < 1e-6
        assert out.tok_min == 1 and out.tok_max == 9
        # numpy-percentile linear interpolation definition
        assert abs(out.tok_p25 - np.percentile(counts, 25)) < 1e-6
        assert abs(out.tok_p50 - np.percentile(counts, 50)) < 1e-6
        assert abs(out.tok_p75 - np.percentile(counts, 75)) < 1e-6
        assert 0 <= out.quality_min <= out.quality_mean <= out.quality_max <= 1


class TestConstructDataset:
    def test_end_to_end_and_resume(self, tmp_path):
        import os

        from quarrycore_ray.pipelines.dataset import construct_dataset

        texts = {i: " ".join(["tok%d" % j for j in range(i * 5 + 3)])
                 for i in range(12)}
        sf = _write_docs(tmp_path, texts)
        # write n_chars column expected by curriculum_sample
        import pyarrow.parquet as _pq

        tb = _pq.read_table(str(tmp_path / "documents.parquet"))
        tb = tb.append_column(
            "n_chars",
            pa.array([len(t) for t in tb["text"].to_pylist()], pa.int64()),
        )
        _pq.write_table(tb, str(tmp_path / "documents.parquet"))

        out_dir = str(tmp_path / "job")
        m1 = construct_dataset(sf, out_dir, sample_k=6)
        assert m1["n_sampled"] == 6
        assert m1["n_chunks"] >= 6  # at least one chunk per sampled doc
        assert m1["n_records"] == m1["n_chunks"]
        assert os.path.exists(os.path.join(out_dir, "export_parquet"))
        assert os.path.exists(os.path.join(out_dir, "export_jsonl"))
        assert m1["stages_skipped"] == []

        # formatted export is readable and carries the template
        import ray.data as rd

        rec = rd.read_parquet(m1["exports"]["parquet"]).take(1)[0]
        assert rec["text"].startswith("### Instruction:")

        # rerun: every stage resumes from its manifest
        m2 = construct_dataset(sf, out_dir, sample_k=6)
        assert m2["stages_run"] == []
        assert set(m2["stages_skipped"]) == {"sampled", "chunked", "formatted"}
        assert m2["n_records"] == m1["n_records"]


class TestRegistryGopher:
    def test_spec_pipeline_composes_gopher_filter(self):
        import pyarrow as pa

        import ray.data as rd

        from quarrycore_ray.registry import available_stages, build_pipeline

        assert "gopher_quality" in available_stages()
        good = "the quick brown fox jumps over that lazy dog again " * 6
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([good, "too short"], pa.string()),
                }
            )
        )
        pipe = build_pipeline(
            [{"stage": "gopher_quality"}, {"stage": "filter_gopher_keep"}]
        )
        out = pipe(ds).to_pandas()
        assert list(out.doc_id) == [0]


class TestCompositeScores:
    def test_bands_and_caps(self, tmp_path):
        from quarrycore_ray.pipelines.documents import content_composite_scores

        # rich multi-paragraph prose with depth/info words: high quality
        para = (
            "Because the research data shows steady analysis results, the "
            "study therefore matters greatly for everyone involved today. "
        ) * 12
        rich = para.strip() + "\n\n" + para.strip()
        sf = _write_docs(tmp_path, {0: rich, 1: "x", 2: ""})
        out = content_composite_scores(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "quality_score"] > 0.35
        assert out.loc[0, "engagement_score"] > 0.4
        # readability defaults to 0.5 when Flesch undefined (no words)
        assert out.loc[2, "readability_score"] == 0.5
        # all scores clamp to [0, 1]
        for c in out.columns:
            assert out[c].between(0, 1).all()
        # degenerate one-char doc scores below the rich doc
        assert out.loc[1, "quality_score"] < out.loc[0, "quality_score"]


class TestCleanText:
    def test_duckdb_parity_on_boilerplate_heavy_docs(self, tmp_path):
        """The sf corpora never trigger the 11 boilerplate patterns, so
        this fixture plants texts that exercise every cascade step and
        compares the engine against the generated DuckDB oracle —
        pinning Python-re vs RE2 semantics where it matters."""
        import duckdb

        from quarrycore_ray.pipelines.documents import (
            clean_text_docs,
            clean_text_oracle_sql,
        )

        texts = {
            0: "Real content stays here.\nClick here to subscribe now!\n"
               "More real text follows.",
            1: "HOME | ABOUT | CONTACT\nThe actual article body.\n"
               "Copyright 2024 All rights reserved.",
            2: "Line   with    runs\n\n\n\nand   many blanks\t\t here",
            3: "   leading and trailing   \n  spaced line  ",
            4: "Share on Facebook\nFollow us on Twitter\nloading...\n"
               "Please wait while javascript loads\nKept sentence.",
            5: "",
            6: "normal text with like in the middle\nnext page link",
        }
        sf = _write_docs(tmp_path, texts)
        eng = (
            clean_text_docs(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        ora = (
            con.execute(clean_text_oracle_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i in range(len(texts)):
            assert eng.loc[i, "cleaned"] == ora.loc[i, "cleaned"], (
                i, repr(eng.loc[i, "cleaned"]), repr(ora.loc[i, "cleaned"])
            )
        # boilerplate really was removed
        assert "subscribe" not in eng.loc[0, "cleaned"].lower()
        assert "Real content stays here." in eng.loc[0, "cleaned"]
        assert "copyright" not in eng.loc[1, "cleaned"].lower()
        assert eng.loc[2, "cleaned"] == "Line with runs\n\nand many blanks here"
        assert eng.loc[5, "cleaned"] == ""


class TestMarkdownStructure:
    def test_classification_precedence_and_firsts(self, tmp_path):
        from quarrycore_ray.pipelines.documents import markdown_structure_docs

        text = (
            "# Title Header\n"
            "## Sub header\n"
            "- first bullet\n"
            "* second bullet\n"
            "3. numbered item\n"
            "> quoted wisdom\n"
            "short\n"
            "This paragraph line is definitely long enough to count.\n"
            "\n"
        )
        sf = _write_docs(tmp_path, {0: text, 1: "tiny"})
        out = markdown_structure_docs(sf).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_headers"] == 2
        assert out.loc[0, "n_lists"] == 3
        assert out.loc[0, "n_quotes"] == 1
        assert out.loc[0, "n_paragraphs"] == 1
        assert out.loc[0, "first_header"] == "Title Header"
        assert out.loc[0, "first_list_item"] == "first bullet"
        assert out.loc[1, "n_paragraphs"] == 0  # 'tiny' under 20 chars

    def test_duckdb_parity_on_markdown(self, tmp_path):
        import duckdb

        import importlib.util

        from quarrycore_ray.pipelines.documents import markdown_structure_docs

        texts = {
            0: "# H\n- a\n2. b\n> q\n" + "x" * 25,
            1: "no structure at all but quite a long single line here",
            2: "",
        }
        sf = _write_docs(tmp_path, texts)
        eng = (
            markdown_structure_docs(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        spec = importlib.util.spec_from_file_location(
            "_entry", "/root/repo/__ray_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sql = mod.oracle_sql()["markdown_structure_docs"]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        ora = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        for col in eng.columns:
            assert list(eng[col]) == list(ora[col]), col


class TestEntryContract:
    def test_oracles_subset_of_queries_and_all_callable(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_entry_contract", "/root/repo/__ray_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        q = mod.queries()
        o = mod.oracle_sql()
        # every oracle belongs to a query; rows-only set stays small
        assert set(o) <= set(q)
        assert all(callable(f) for f in q.values())
        assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
        rows_only = sorted(set(q) - set(o))
        assert len(rows_only) <= 8, rows_only


class TestDsirImportanceWeights:
    def test_matches_pure_python_model(self, tmp_path):
        from quarrycore_ray.pipelines.training import dsir_importance_weights
        from quarrycore_ray.simhash import md5_feature_hash64

        B = 8192
        texts = {
            0: "alpha beta alpha beta gamma",
            1: "alpha beta delta",
            2: "zeta eta theta iota",
            3: "zeta eta zeta eta",
        }
        # target = min(source) = 'a_tgt' (docs 0, 1)
        sources = {0: "a_tgt", 1: "a_tgt", 2: "b_raw", 3: "b_raw"}
        sf = _write_docs(tmp_path, texts, sources)
        out = (
            dsir_importance_weights(sf)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )

        # independent pure-python reimplementation
        def feats(t):
            w = t.split(" ")
            ks = [
                md5_feature_hash64(f"{a}\x1f{b}") % B
                for a, b in zip(w, w[1:])
            ]
            return ks

        from collections import Counter

        q = Counter()
        p = Counter()
        for i, t in texts.items():
            q.update(feats(t))
            if sources[i] == "a_tgt":
                p.update(feats(t))
        tq, tp = sum(q.values()), sum(p.values())
        for i, t in texts.items():
            ks = feats(t)
            su = 0
            for k in ks:
                lr = math.log((p[k] + 1) / (tp + B)) - math.log(
                    (q[k] + 1) / (tq + B)
                )
                su += math.floor(lr * 1e6 + 0.5)
            exp = math.floor((su / 1e6 / len(ks)) * 1e6 + 0.5) / 1e6
            assert out.loc[i, "n_bigrams"] == len(ks), i
            assert out.loc[i, "dsir_score"] == exp, i
        # target-source docs should score higher than raw-only docs
        assert min(out.loc[0, "dsir_score"], out.loc[1, "dsir_score"]) > max(
            out.loc[2, "dsir_score"], out.loc[3, "dsir_score"]
        )

    def test_single_token_docs_emit_no_row(self, tmp_path):
        from quarrycore_ray.pipelines.training import dsir_importance_weights

        sf = _write_docs(
            tmp_path, {0: "only", 1: "two words"}, {0: "s", 1: "s"}
        )
        out = dsir_importance_weights(sf).to_pandas()
        assert list(out["doc_id"]) == [1]


class TestCcnetBuckets:
    def test_thirds_by_score_order(self, tmp_path):
        from quarrycore_ray.pipelines.training import ccnet_bucket_docs

        # six docs with strictly distinct LM scores: repeated common
        # tokens score low (head), rare-token docs score high (tail)
        texts = {
            0: "a a a a a a a a",
            1: "a a a a a a a b",
            2: "a a a a a b c d",
            3: "a a a b c d e f",
            4: "a b c d e f g h",
            5: "q r s t u v w x",
        }
        sf = _write_docs(tmp_path, texts)
        out = (
            ccnet_bucket_docs(sf)
            .to_pandas()
            .sort_values("avg_neg_logprob")
            .reset_index(drop=True)
        )
        assert len(out) == 6
        # scores strictly increasing -> exact thirds, in score order
        assert out["avg_neg_logprob"].is_unique
        assert list(out["bucket"]) == ["head"] * 2 + ["middle"] * 2 + [
            "tail"
        ] * 2

    def test_ties_share_a_bucket(self, tmp_path):
        from quarrycore_ray.pipelines.training import ccnet_bucket_docs

        # identical docs -> identical scores -> the value-based cutoff
        # puts every doc in 'head' (score <= c1), never a split tie
        sf = _write_docs(tmp_path, {i: "x y x y" for i in range(5)})
        out = ccnet_bucket_docs(sf).to_pandas()
        assert set(out["bucket"]) == {"head"}

    def test_empty_corpus(self, tmp_path):
        from quarrycore_ray.pipelines.training import ccnet_bucket_docs

        sf = _write_docs(tmp_path, {})
        out = ccnet_bucket_docs(sf)
        assert out.count() == 0
        # Ray's to_pandas drops columns on zero-row datasets; the
        # dataset-level schema is the honest check here
        assert out.schema().names == [
            "doc_id",
            "n_tokens",
            "avg_neg_logprob",
            "bucket",
        ]


class TestTokenLengthQuantiles:
    def test_rank_quantiles_per_source(self, tmp_path):
        from quarrycore_ray.pipelines.training import token_length_quantiles

        texts = {
            0: "w",
            1: "w w",
            2: "w w w",
            3: "w w w w",
            4: "v v v v v",
        }
        sources = {0: "a", 1: "a", 2: "a", 3: "a", 4: "b"}
        sf = _write_docs(tmp_path, texts, sources)
        out = token_length_quantiles(sf).set_index("source")
        # source a: lengths 1..4 -> ranks ceil(.25*4)=1, ceil(.5*4)=2,
        # ceil(.75*4)=3 -> values 1, 2, 3
        assert out.loc["a", "n_docs"] == 4
        assert (
            out.loc["a", "p25"],
            out.loc["a", "p50"],
            out.loc["a", "p75"],
        ) == (1, 2, 3)
        # source b: single doc of 5 tokens -> all quantiles 5
        assert out.loc["b", "n_docs"] == 1
        assert (
            out.loc["b", "p25"],
            out.loc["b", "p50"],
            out.loc["b", "p75"],
        ) == (5, 5, 5)

    def test_whitespace_is_normalized_before_counting(self, tmp_path):
        from quarrycore_ray.pipelines.training import token_length_quantiles

        # runs of whitespace collapse to one separator: 3 tokens, not 5
        sf = _write_docs(tmp_path, {0: "a  b \t c"}, {0: "s"})
        out = token_length_quantiles(sf).set_index("source")
        assert out.loc["s", "p50"] == 3


class TestTokenBudgetSample:
    def test_prefix_sum_cutoff(self, tmp_path):
        from quarrycore_ray.pipelines.training import token_budget_sample

        # source s: docs 0..3 with 2,3,4,5 tokens; budget 9 keeps
        # cum 2,5,9 (docs 0,1,2) and drops doc 3 (cum 14)
        texts = {
            0: "a a",
            1: "b b b",
            2: "c c c c",
            3: "d d d d d",
            4: "e",
        }
        sources = {0: "s", 1: "s", 2: "s", 3: "s", 4: "t"}
        sf = _write_docs(tmp_path, texts, sources)
        out = (
            token_budget_sample(sf, budget=9)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["doc_id"]) == [0, 1, 2, 4]
        assert list(out["cum_tokens"]) == [2, 5, 9, 1]

    def test_bucket_boundaries_do_not_change_result(self, tmp_path):
        from quarrycore_ray.pipelines.training import token_budget_sample

        texts = {i: " ".join(["w"] * (1 + i % 4)) for i in range(20)}
        sources = {i: f"s{i % 3}" for i in range(20)}
        sf = _write_docs(tmp_path, texts, sources)
        a = (
            token_budget_sample(sf, budget=7, bucket_size=1024)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            token_budget_sample(sf, budget=7, bucket_size=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_exactly_at_budget_is_kept(self, tmp_path):
        from quarrycore_ray.pipelines.training import token_budget_sample

        sf = _write_docs(tmp_path, {0: "x y z"}, {0: "s"})
        out = token_budget_sample(sf, budget=3).to_pandas()
        assert list(out["doc_id"]) == [0]


class TestDsirSelectTopk:
    def test_rank_order_and_cutoff(self, tmp_path):
        from quarrycore_ray.pipelines.training import (
            dsir_importance_weights,
            dsir_select_topk,
        )

        texts = {
            0: "alpha beta alpha beta gamma",
            1: "alpha beta delta",
            2: "zeta eta theta iota",
            3: "zeta eta zeta eta",
            4: "alpha beta gamma delta",
        }
        sources = {0: "a_tgt", 1: "a_tgt", 2: "b_raw", 3: "b_raw", 4: "b_raw"}
        sf = _write_docs(tmp_path, texts, sources)
        scores = (
            dsir_importance_weights(sf).to_pandas().set_index("doc_id")
        )
        out = dsir_select_topk(sf, k=2).to_pandas()
        # per source, ranks follow (dsir_score desc, doc_id asc)
        for src, grp in out.groupby("source"):
            grp = grp.sort_values("rank")
            assert list(grp["rank"]) == list(range(1, len(grp) + 1))
            sc = list(grp["dsir_score"])
            assert sc == sorted(sc, reverse=True)
        # k=2 cap: b_raw has 3 scored docs, only 2 survive
        assert len(out[out["source"] == "b_raw"]) == 2
        # the dropped b_raw doc is the lowest-scoring one
        b = scores.loc[[2, 3, 4]].sort_values(
            ["dsir_score"], ascending=False
        )
        kept = set(out[out["source"] == "b_raw"]["doc_id"])
        assert kept == set(b.index[:2])


class TestShardDocsDeterministic:
    def test_matches_pure_python(self, tmp_path):
        import hashlib

        from quarrycore_ray.pipelines.training import (
            shard_docs_deterministic,
        )

        ids = list(range(40))
        sf = _write_docs(tmp_path, {i: "x" for i in ids})
        out = (
            shard_docs_deterministic(sf, n_shards=4)
            .to_pandas()
            .set_index("doc_id")
        )
        hx = {i: hashlib.md5(str(i).encode()).hexdigest() for i in ids}
        expect = {}
        by_shard: dict[int, list[int]] = {}
        for i in ids:
            s = int(hx[i][:8], 16) % 4
            by_shard.setdefault(s, []).append(i)
        for s, members in by_shard.items():
            members.sort(key=lambda i: (hx[i], i))
            for pos, i in enumerate(members, 1):
                expect[i] = (s, pos)
        for i in ids:
            assert (out.loc[i, "shard"], out.loc[i, "pos"]) == expect[i], i

    def test_positions_are_a_permutation_per_shard(self, tmp_path):
        from quarrycore_ray.pipelines.training import (
            shard_docs_deterministic,
        )

        sf = _write_docs(tmp_path, {i: "x" for i in range(100)})
        out = shard_docs_deterministic(sf, n_shards=8).to_pandas()
        assert len(out) == 100
        for _, grp in out.groupby("shard"):
            assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


class TestShardPackAssignments:
    def test_matches_pure_python(self, tmp_path):
        import hashlib

        from quarrycore_ray.pipelines.training import (
            shard_pack_assignments,
        )

        texts = {i: " ".join(["tok"] * (1 + i % 7)) for i in range(60)}
        sf = _write_docs(tmp_path, texts)
        out = (
            shard_pack_assignments(sf, n_shards=4, budget=10)
            .to_pandas()
            .set_index("doc_id")
        )
        hx = {i: hashlib.md5(str(i).encode()).hexdigest() for i in texts}
        by_shard: dict[int, list[int]] = {}
        for i in texts:
            by_shard.setdefault(int(hx[i][:8], 16) % 4, []).append(i)
        expect = {}
        for s, members in by_shard.items():
            members.sort(key=lambda i: (hx[i], i))
            cum = 0
            for pos, i in enumerate(members, 1):
                nt = len(texts[i].split())
                expect[i] = (s, pos, nt, cum // 10)
                cum += nt
        assert len(out) == len(texts)
        for i in texts:
            got = (
                int(out.loc[i, "shard"]),
                int(out.loc[i, "pos"]),
                int(out.loc[i, "n_tokens"]),
                int(out.loc[i, "bin_id"]),
            )
            assert got == expect[i], i

    def test_bins_monotone_and_positions_permutation(self, tmp_path):
        from quarrycore_ray.pipelines.training import (
            shard_pack_assignments,
        )

        sf = _write_docs(
            tmp_path, {i: " ".join(["w"] * (1 + i % 11)) for i in range(200)}
        )
        out = shard_pack_assignments(sf, n_shards=8, budget=16).to_pandas()
        assert len(out) == 200
        for _, grp in out.groupby("shard"):
            grp = grp.sort_values("pos")
            assert list(grp["pos"]) == list(range(1, len(grp) + 1))
            bins = list(grp["bin_id"])
            assert bins == sorted(bins)
            assert bins[0] == 0


class TestWriteTrainingShards:
    def test_writes_partitioned_and_resumes(self, tmp_path):
        import json
        import os

        import pyarrow.dataset as pads

        from quarrycore_ray.pipelines.training import (
            shard_pack_assignments,
            write_training_shards,
        )

        texts = {i: " ".join(["tok"] * (1 + i % 5)) for i in range(50)}
        sf = _write_docs(tmp_path, texts)
        out_dir = str(tmp_path / "shards")
        manifest = write_training_shards(
            sf, out_dir, n_shards=4, budget=12
        )
        # manifest totals match the plan
        plan = shard_pack_assignments(sf, n_shards=4, budget=12).to_pandas()
        for s, grp in plan.groupby("shard"):
            m = manifest["shards"][str(int(s))]
            assert m["n_docs"] == len(grp)
            assert m["n_tokens"] == int(grp["n_tokens"].sum())
        # hive layout: one directory per shard, text attached
        tbl = pads.dataset(
            os.path.join(out_dir, "data"), partitioning="hive"
        ).to_table()
        assert tbl.num_rows == 50
        names = set(tbl.schema.names)
        assert {"doc_id", "pos", "n_tokens", "bin_id", "text"} <= names
        got = {
            i: t for i, t in zip(
                tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()
            )
        }
        assert got == texts
        # no stale tmp dir
        assert not os.path.exists(out_dir + ".tmp")
        # resume: second call is a no-op returning the stored manifest
        with open(os.path.join(out_dir, "manifest.json")) as f:
            stored = json.load(f)
        marker = os.path.join(out_dir, "marker")
        with open(marker, "w") as f:
            f.write("x")
        again = write_training_shards(sf, out_dir, n_shards=4, budget=12)
        assert again == stored
        assert os.path.exists(marker)  # nothing was rewritten


class TestNbSourceClassifier:
    def test_separable_sources_classified_correctly(self, tmp_path):
        from quarrycore_ray.pipelines.training import (
            nb_source_classifier_docs,
        )

        texts = {
            0: "apple banana apple fruit",
            1: "banana apple apple pie",
            2: "engine piston crank torque",
            3: "torque engine engine oil",
            4: "apple engine",  # mixed: tips by token counts
        }
        sources = {0: "food", 1: "food", 2: "cars", 3: "cars", 4: "food"}
        sf = _write_docs(tmp_path, texts, sources)
        out = (
            nb_source_classifier_docs(sf).to_pandas().set_index("doc_id")
        )
        assert len(out) == 5
        # clearly separable docs go to their own source
        for i in (0, 1):
            assert out.loc[i, "pred_source"] == "food", i
            assert out.loc[i, "correct"] == 1
        for i in (2, 3):
            assert out.loc[i, "pred_source"] == "cars", i
            assert out.loc[i, "correct"] == 1
        # correct flag is consistent with the prediction
        assert (
            out.loc[4, "correct"]
            == int(out.loc[4, "pred_source"] == "food")
        )

    def test_matches_pure_python_scores(self, tmp_path):
        import math
        from collections import Counter

        from quarrycore_ray.pipelines.training import (
            nb_source_classifier_docs,
        )

        texts = {
            0: "a b a",
            1: "b c",
            2: "c c d",
            3: "a d",
        }
        sources = {0: "x", 1: "x", 2: "y", 3: "y"}
        sf = _write_docs(tmp_path, texts, sources)
        out = (
            nb_source_classifier_docs(sf).to_pandas().set_index("doc_id")
        )

        # pure-python NB with the same micro-unit flooring
        toks = {i: t.split() for i, t in texts.items()}
        cls: dict[str, Counter] = {}
        for i, ts in toks.items():
            cls.setdefault(sources[i], Counter()).update(ts)
        vocab = len({t for ts in toks.values() for t in ts})
        n = len(texts)
        srcs = sorted(cls)

        def u(x: float) -> int:
            return int(math.floor(math.log(x) * 1e6 + 0.5))

        for i, ts in toks.items():
            best, best_s = None, None
            for s in srcs:
                tot = sum(cls[s].values())
                nd = sum(1 for j in sources if sources[j] == s)
                score = u(nd / n) + sum(
                    u((cls[s][t] + 1.0) / (tot + vocab)) for t in ts
                )
                if best is None or score > best:
                    best, best_s = score, s
            assert out.loc[i, "pred_source"] == best_s, i


class TestSourceKlMatrix:
    def test_matches_pure_python_and_nonnegative(self, tmp_path):
        import math
        from collections import Counter

        from quarrycore_ray.pipelines.training import source_kl_matrix

        texts = {
            0: "a a b",
            1: "a b b c",
            2: "c c d d",
            3: "d d d e",
        }
        sources = {0: "x", 1: "x", 2: "y", 3: "y"}
        sf = _write_docs(tmp_path, texts, sources)
        out = source_kl_matrix(sf).to_pandas()
        assert len(out) == 2  # (x,y) and (y,x)
        assert (out["kl"] >= 0).all()  # Gibbs' inequality survives rounding

        cls: dict[str, Counter] = {}
        for i, t in texts.items():
            cls.setdefault(sources[i], Counter()).update(t.split())
        vocab = len({w for t in texts.values() for w in t.split()})
        srcs = sorted(cls)
        den = {s: sum(cls[s].values()) + vocab for s in srcs}
        all_toks = sorted({w for t in texts.values() for w in t.split()})

        def kl(a: str, b: str) -> float:
            su = 0
            for t in all_toks:
                p_a = (cls[a][t] + 1.0) / den[a]
                p_b = (cls[b][t] + 1.0) / den[b]
                su += int(math.floor(p_a * math.log(p_a / p_b) * 1e12 + 0.5))
            return math.floor((su / 1e12) * 1e6 + 0.5) / 1e6

        got = {
            (a, b): v
            for a, b, v in zip(out["source_a"], out["source_b"], out["kl"])
        }
        assert got == {("x", "y"): kl("x", "y"), ("y", "x"): kl("y", "x")}

    def test_identical_distributions_give_zero(self, tmp_path):
        from quarrycore_ray.pipelines.training import source_kl_matrix

        texts = {0: "a b c", 1: "a b c"}
        sources = {0: "p", 1: "q"}
        sf = _write_docs(tmp_path, texts, sources)
        out = source_kl_matrix(sf).to_pandas()
        assert len(out) == 2
        assert (out["kl"] == 0.0).all()


class TestSourceDiversityStats:
    def test_matches_hand_computation(self, tmp_path):
        from quarrycore_ray.pipelines.training import (
            source_diversity_stats,
        )

        texts = {
            0: "a a a a",       # 4 tokens, 1 distinct; 3 bigrams, 1 distinct
            1: "a b c d",       # 4 tokens, 4 distinct; 3 bigrams, 3 distinct
            2: "x",             # 1 token; no bigrams
        }
        sources = {0: "loop", 1: "rich", 2: "tiny"}
        sf = _write_docs(tmp_path, texts, sources)
        out = (
            source_diversity_stats(sf).to_pandas().set_index("source")
        )
        assert len(out) == 3
        assert tuple(out.loc["loop"][
            ["n_tokens", "distinct_tokens", "n_bigrams",
             "distinct_bigrams"]]) == (4, 1, 3, 1)
        assert out.loc["loop", "ttr_1"] == 0.25
        assert abs(out.loc["loop", "ttr_2"] - 0.333333) < 1e-9
        assert tuple(out.loc["rich"][
            ["n_tokens", "distinct_tokens", "n_bigrams",
             "distinct_bigrams"]]) == (4, 4, 3, 3)
        assert out.loc["rich", "ttr_1"] == 1.0
        # bigram-free source: zeros, not NaN
        assert tuple(out.loc["tiny"][
            ["n_bigrams", "distinct_bigrams", "ttr_2"]]) == (0, 0, 0.0)


class TestZipfProfile:
    def test_matches_hand_computation(self, tmp_path):
        import math

        from quarrycore_ray.pipelines.training import zipf_profile_docs

        # counts: aa=4, bb=2, cc=1  -> ranks 1,2,3
        sf = _write_docs(
            tmp_path,
            {0: "aa aa bb", 1: "aa bb cc", 2: "aa"},
        )
        out = zipf_profile_docs(sf).iloc[0]
        assert out["n_top"] == 3
        assert out["total_tokens"] == 7
        assert out["distinct_tokens"] == 3
        assert out["hapax_count"] == 1
        assert out["top1_share_micro"] == 4 * 1_000_000 // 7

        def mic(v):
            return int(math.floor(math.log(v) * 1_000_000 + 0.5))

        xs = [mic(1), mic(2), mic(3)]
        ys = [mic(4), mic(2), mic(1)]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        assert out["zipf_num"] == 3 * sxy - sx * sy
        assert out["zipf_den"] == 3 * sxx - sx * sx
        # slope ~ -1.26 for this head
        assert -1.5 < out["zipf_num"] / out["zipf_den"] < -1.0


class TestBpeTrainer:
    @staticmethod
    def _seq_bpe(word_freqs: dict[str, int], n_merges: int):
        """Sequential reference: Sennrich et al. 2016 trainer loop."""
        words = {w: list(w) for w in word_freqs}
        merges = []
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for w, syms in words.items():
                f = word_freqs[w]
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            # max count, ties to lexicographically smaller pair
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), n = best
            merges.append((a, b, a + b, n))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return merges

    def test_matches_sequential_reference(self, tmp_path):
        from quarrycore_ray.pipelines.training import bpe_train_merges

        texts = {
            0: "lower lower lowest low low low newer newer new",
            1: "wider wide wide widest newer lower low",
            2: "aaaa aaa aa aaaa banana bandana",
        }
        sf = _write_docs(tmp_path, texts)
        word_freqs: dict[str, int] = {}
        for t in texts.values():
            for w in t.split():
                word_freqs[w] = word_freqs.get(w, 0) + 1
        ref = self._seq_bpe(word_freqs, 12)
        out = bpe_train_merges(sf, n_merges=12)
        got = list(
            zip(out["left"], out["right"], out["merged"], out["pair_count"])
        )
        assert got == ref

    def test_overlapping_run_merges_every_other(self, tmp_path):
        # 'aaaa' x3: pair (a,a) counts 9; greedy apply -> [aa, aa]
        from quarrycore_ray.pipelines.training import bpe_train_merges

        sf = _write_docs(tmp_path, {0: "aaaa aaaa aaaa"})
        out = bpe_train_merges(sf, n_merges=2)
        assert out.iloc[0][["left", "right", "pair_count"]].tolist() == ["a", "a", 9]
        # after merging: every word is [aa, aa] -> pair (aa,aa) count 3
        assert out.iloc[1][["left", "right", "pair_count"]].tolist() == ["aa", "aa", 3]


class TestSourceQualityRegression:
    def test_matches_hand_ols(self, tmp_path):
        import math

        from quarrycore_ray.functions.textstats import (
            LENGTH_FULL_SCORE_CHARS,
            STOPWORDS_EN,
        )
        from quarrycore_ray.pipelines.training import source_quality_regression

        texts = {
            0: "the quick brown fox jumps over the lazy dog",
            1: "short text",
            2: "a a a a a a a a a a a a",
            3: "completely different words in every position here now",
        }
        sf = _write_docs(
            tmp_path, texts, sources={0: "s1", 1: "s1", 2: "s2", 3: "s2"}
        )
        out = (
            source_quality_regression(sf)
            .to_pandas()
            .set_index("source")
            .sort_index()
        )

        stop = set(STOPWORDS_EN)

        def q_micro(t):
            words = t.split(" ")
            n = len(words)
            ls = min(len(t) / LENGTH_FULL_SCORE_CHARS, 1.0)
            lgs = min(5.0 * sum(1 for w in words if w in stop) / n, 1.0)
            ch = min(2.0 * len(set(words)) / n, 1.0)
            return int(math.floor((0.3 * ls + 0.4 * lgs + 0.3 * ch) * 1e6 + 0.5))

        for src, ids in {"s1": [0, 1], "s2": [2, 3]}.items():
            xs = [len(texts[i]) for i in ids]
            ys = [q_micro(texts[i]) for i in ids]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            row = out.loc[src]
            assert row["n_docs"] == n
            assert row["sum_len"] == sx
            assert row["sum_q_micro"] == sy
            assert row["slope_num"] == n * sxy - sx * sy
            assert row["slope_den"] == n * sxx - sx * sx


class TestVocabCoverage:
    """Coverage-curve semantics (training.vocab_coverage_curve):
    deterministic (count DESC, token) head, small-vocab saturation."""

    def test_hand_counts(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.training import vocab_coverage_curve

        # counts: a=4, b=3, c=2, d=1 -> total 10
        texts = ["a a b c", "a b d", "a b c"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = vocab_coverage_curve(str(tmp_path), ns=(1, 2, 3, 10))
        got = {
            int(r.n_top): (int(r.covered_tokens), int(r.total_tokens))
            for r in out.itertuples()
        }
        assert got == {1: (4, 10), 2: (7, 10), 3: (9, 10), 10: (10, 10)}

    def test_tie_break_by_token(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from quarrycore_ray.pipelines.training import vocab_coverage_curve

        # all counts equal: top-1 must be the lexicographically smallest
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["zz aa mm"], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        out = vocab_coverage_curve(str(tmp_path), ns=(1,))
        assert out.iloc[0]["covered_tokens"] == 1  # exactly one token's mass
        assert out.iloc[0]["total_tokens"] == 3
