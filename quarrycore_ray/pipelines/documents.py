"""Operators over the `documents` test table (doc_id, text, lang, source,
n_chars) — the driver-checkable surface of SURVEY.md §2.

Every function takes `sf_dir` and returns a Dataset / DataFrame whose
columns match its `oracle_sql` twin exactly (names AND values), so the
driver's DuckDB comparison hashes identically. Dedup variants reuse the
transcript engine's stages with each document as a one-turn
conversation.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..config import DedupConfig
from ..exactmath import floor_round, floor_round_np
from ..functions.textstats import (
    LangIdStage,
    add_fingerprint,
    add_regex_token_count,
    add_token_counts,
    quality_scores,
)
from ..text import normalize_whitespace_array
from .dedup import dedup_conversations


def _docs(sf_dir: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _with_canonical(batch: pa.Table) -> pa.Table:
    return batch.append_column("canonical", normalize_whitespace_array(batch["text"]))


def canonical_docs(sf_dir: str) -> "rd.Dataset":
    """doc_id + whitespace-normalized canonical text."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_with_canonical, batch_format="pyarrow")
        .drop_columns(["text"])
    )


# --- dedup operators ---------------------------------------------------------


def exact_dedup_docs(sf_dir: str) -> "rd.Dataset":
    """Distinct canonical texts keeping min doc_id (reference exact layer
    semantics, dedup/hash_db.py) — (doc_id, canonical)."""

    def _group(g: pd.DataFrame) -> pa.Table:
        i = g["doc_id"].idxmin()
        return pa.table(
            {
                "doc_id": pa.array([int(g["doc_id"].min())], pa.int64()),
                "canonical": pa.array([g.loc[i, "canonical"]], pa.string()),
            }
        )

    return canonical_docs(sf_dir).groupby("canonical").map_groups(
        _group, batch_format="pandas"
    )


def _docs_as_conversations(sf_dir: str) -> "rd.Dataset":
    def _conv(batch: pa.Table) -> pa.Table:
        ids = [f"doc-{i:08d}" for i in batch["doc_id"].to_pylist()]
        return pa.table(
            {
                "conv_id": pa.array(ids, pa.string()),
                "canonical_text": normalize_whitespace_array(batch["text"]),
                "n_turns": pa.array(np.ones(batch.num_rows, dtype=np.int32)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_conv, batch_format="pyarrow")


def minhash_dedup_docs(sf_dir: str) -> "rd.Dataset":
    """Full multi-level dedup over documents (MinHash/LSH/verify/cluster);
    returns the clusters table. Non-SQL-expressible (rows-only check)."""
    res = dedup_conversations(_docs_as_conversations(sf_dir))
    return res.clusters


def simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming <= 3 via 16-bit-band LSH.

    Pigeonhole: two 64-bit fingerprints within Hamming distance 3 share
    at least one of four 16-bit bands. Bucket by each band, verify
    exact Hamming within buckets (Manku et al., WWW 2007). Rows-only
    check (not SQL-expressible).
    """
    from ..simhash import SimHasher
    from ..stages.verify import _popcount64

    cfg = DedupConfig()

    class _Sim:
        def __init__(self):
            self.sh = SimHasher(cfg.shingle_size)

        def __call__(self, batch: pa.Table) -> pa.Table:
            fps = self.sh.fingerprints(batch["canonical"].to_pylist())
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "simhash": pa.array(fps.view(np.int64), pa.int64()),
                }
            )

    def _explode(batch: pa.Table) -> pa.Table:
        fp = np.asarray(batch["simhash"], dtype=np.int64).view(np.uint64)
        n = len(fp)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        bands = [(fp >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        band_key = np.concatenate(
            [b.astype(np.int64) | (np.int64(i) << np.int64(32)) for i, b in enumerate(bands)]
        )
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(np.tile(fp.view(np.int64), 4), pa.int64()),
            }
        )

    def _pairs(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        ids = g["doc_id"].to_numpy()
        fps = g["simhash"].to_numpy().view(np.uint64)
        ai, bi = np.triu_indices(len(g), k=1)
        ham = _popcount64(np.bitwise_xor(fps[ai], fps[bi]))
        keep = ham <= 3
        return pa.table(
            {
                "a_id": pa.array(ids[ai[keep]], pa.int64()),
                "b_id": pa.array(ids[bi[keep]], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    pairs = (
        canonical_docs(sf_dir)
        .map_batches(_Sim, batch_format="pyarrow", concurrency=(1, 4))
        .map_batches(_explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(_pairs, batch_format="pandas")
    )
    # dedupe pairs discovered in multiple bands (small result)
    pdf = pairs.to_pandas()
    return (
        pdf.drop_duplicates(["a_id", "b_id"]).sort_values(["a_id", "b_id"]).reset_index(drop=True)
    )


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    """Exact word n-gram Jaccard >= threshold pairs, as a distributed
    gram-inverted-index join: explode distinct grams -> groupby(gram)
    emits co-occurrence pairs -> count intersections -> Jaccard from
    per-doc gram counts. SQL-expressible => exact DuckDB oracle."""

    def _grams(batch: pa.Table) -> pa.Table:
        out_doc: list[int] = []
        out_gram: list[str] = []
        counts_doc: list[int] = []
        counts_n: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["canonical"].to_pylist()
        ):
            words = text.split(" ") if text else []
            grams = {
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            }
            out_doc.extend([doc_id] * len(grams))
            out_gram.extend(grams)
            counts_doc.append(doc_id)
            counts_n.append(len(grams))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "gram": pa.array(out_gram, pa.string()),
            }
        )

    grams = canonical_docs(sf_dir).map_batches(_grams, batch_format="pyarrow")

    def _cooccur(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return pa.table({"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"a_id": pa.array(ids[ai], pa.int64()), "b_id": pa.array(ids[bi], pa.int64())}
        )

    inter = (
        grams.groupby("gram")
        .map_groups(_cooccur, batch_format="pandas")
        .groupby(["a_id", "b_id"])
        .aggregate(Count(alias_name="n_both"))
    )

    gram_counts = {
        r["doc_id"]: r["n_grams"]
        for r in grams.groupby("doc_id").aggregate(Count(alias_name="n_grams")).take_all()
    }
    counts_ref = ray.put(gram_counts)

    def _jaccard(batch: pa.Table) -> pa.Table:
        cnt = ray.get(counts_ref)
        a = batch["a_id"].to_pylist()
        b = batch["b_id"].to_pylist()
        nb = np.asarray(batch["n_both"], dtype=np.float64)
        union = np.array([cnt[x] + cnt[y] for x, y in zip(a, b)], dtype=np.float64) - nb
        jac = floor_round_np(nb / union, 6)
        out = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return (
        inter.map_batches(_jaccard, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def substring_containment(sf_dir: str) -> pd.DataFrame:
    """Pairs where one canonical text is a strict substring of a longer
    one (reference fuzzy partial-match semantics, fuzzy_matcher.py:213-236).

    Broadcast design: the corpus's canonical texts are `ray.put` once
    (small side at test scale); each batch checks its docs against all
    strictly-longer texts with C-speed `in`. At production scale this
    runs intra-cluster only (see stages/substring.py).
    """
    docs = canonical_docs(sf_dir).to_pandas()
    by_len = docs.sort_values(["doc_id"]).reset_index(drop=True)
    texts_ref = ray.put(list(zip(by_len["doc_id"].tolist(), by_len["canonical"].tolist())))

    def _contained(batch: pa.Table) -> pa.Table:
        corpus = ray.get(texts_ref)
        rows_a: list[int] = []
        rows_b: list[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["canonical"].to_pylist()):
            for other_id, other in corpus:
                if other_id != doc_id and len(text) < len(other) and text in other:
                    rows_a.append(doc_id)
                    rows_b.append(other_id)
        return pa.table(
            {"a_id": pa.array(rows_a, pa.int64()), "b_id": pa.array(rows_b, pa.int64())}
        )

    out = canonical_docs(sf_dir).map_batches(_contained, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# --- text analysis -----------------------------------------------------------


def doc_stats(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_tokens, n_chars_norm) over canonical text."""
    return (
        canonical_docs(sf_dir)
        .map_batches(add_token_counts, batch_format="pyarrow")
        .drop_columns(["canonical"])
    )


def token_count_regex(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_tokens_re): BPE-ish regex token count on raw text."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_regex_token_count, batch_format="pyarrow")
        .drop_columns(["text"])
    )


def quality_score_docs(sf_dir: str) -> "rd.Dataset":
    """(doc_id, length_score, language_score, coherence_score, quality)."""
    return (
        canonical_docs(sf_dir)
        .map_batches(quality_scores, batch_format="pyarrow")
        .drop_columns(["canonical"])
    )


def filter_docs_by_quality(sf_dir: str, min_quality: float = 0.6) -> "rd.Dataset":
    """Quality gate (reference pipeline.py:761-779: score < 0.6 => drop):
    (doc_id, quality) of passing docs."""

    def _f(batch: pa.Table) -> pa.Table:
        batch = quality_scores(batch)
        keep = pc.greater_equal(batch["quality"], pa.scalar(min_quality))
        return batch.filter(keep).select(["doc_id", "quality"])

    return canonical_docs(sf_dir).map_batches(_f, batch_format="pyarrow")


def langid_docs(sf_dir: str) -> "rd.Dataset":
    """(doc_id, pred_lang, lang_conf) — heuristic language ID actor pool."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))
        .drop_columns(["text"])
    )


def fingerprint_docs(sf_dir: str) -> "rd.Dataset":
    """(doc_id, fingerprint) rolling-hash content fingerprints."""
    return (
        canonical_docs(sf_dir)
        .map_batches(add_fingerprint, batch_format="pyarrow")
        .drop_columns(["canonical"])
    )


# --- distributions / sampling / sorts ---------------------------------------


def source_distribution(sf_dir: str) -> "rd.Dataset":
    """(source, n_docs, avg_chars) — reference analytics.py domain dist.

    The average derives from an exact integer Sum (order-independent)
    rather than a float Mean, so the reduce is bit-equal to the oracle."""
    ds = _docs(sf_dir, ["source", "n_chars"])
    out = ds.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )

    def _derive(batch: pa.Table) -> pa.Table:
        avg = floor_round(
            pc.divide(
                pc.cast(batch["sum_chars"], pa.float64()),
                pc.multiply(pa.scalar(1.0), pc.cast(batch["n_docs"], pa.float64())),
            ),
            6,
        )
        return batch.drop_columns(["sum_chars"]).append_column("avg_chars", avg)

    return out.map_batches(_derive, batch_format="pyarrow")


def lang_distribution(sf_dir: str) -> "rd.Dataset":
    """(lang, n_docs)."""
    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n_docs"))


def top_docs_by_len(sf_dir: str, k: int = 10) -> "rd.Dataset":
    """Top-k (doc_id, n_chars) by length, deterministic tie-break."""
    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
    )


def balanced_sample_by_source(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """First k doc_ids per source (reference constructor.py:169-190
    max_samples_per_domain semantics, deterministic variant)."""

    def _head(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id").head(k)
        return pa.table(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "doc_id": pa.array(g["doc_id"].tolist(), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["source", "doc_id"])
        .groupby("source")
        .map_groups(_head, batch_format="pandas")
    )


def vocab_stats(sf_dir: str) -> pd.DataFrame:
    """Single row: (n_docs, total_tokens, vocab_size) over canonical text.

    vocab_size is an exact distinct count via a token groupby (the
    sketch path would be an HLL per batch; exact here so the SQL oracle
    matches bit-for-bit)."""

    def _tokens(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["canonical"].to_pylist():
            if t:
                toks.extend(t.split(" "))
        return pa.table({"token": pa.array(toks, pa.string())})

    tokens = canonical_docs(sf_dir).map_batches(_tokens, batch_format="pyarrow")
    token_counts = tokens.groupby("token").aggregate(Count(alias_name="n"))
    vocab_size = token_counts.count()
    total_tokens = int(token_counts.sum("n"))
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    return pd.DataFrame(
        {
            "n_docs": pd.array([n_docs], dtype="int64"),
            "total_tokens": pd.array([total_tokens], dtype="int64"),
            "vocab_size": pd.array([vocab_size], dtype="int64"),
        }
    )
