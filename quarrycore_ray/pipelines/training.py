"""Training-data construction operators.

Extends the reference's dataset analytics / quality surface
(`/root/reference/src/quarrycore/dataset/analytics.py:27-101`,
`/root/reference/src/quarrycore/quality/scorers.py:74-146`) with the
standard public corpus-curation recipes a 100 TB pipeline needs:
TF-IDF keyword extraction, Gopher-style quality rules, sequence
packing via a distributed prefix sum, unigram-LM log-prob scoring,
and temperature-scaled source mixing.

Scale notes
-----------
* Term-level tables (`_term_counts`) are built per batch with one
  vectorized polars explode+count — complete per document because each
  input row is one whole document, so no shuffle is needed to finish a
  doc's term counts.
* Global lookups (document frequency, corpus token counts) are
  token-keyed aggregates attached back with
  `stages.grouped.attach_lookup`, which broadcasts below 1M entries and
  switches to a hash-partitioned join above (same rule as the LSH
  signature attach).
* Float reductions follow the micro-unit integer pattern
  (`exactmath.py`): transcendentals are applied per element, floored to
  integer micro-units, and summed exactly so results are independent of
  reduction order — bit-identical to the DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..exactmath import floor_round_np
from ..sources.io import typed_pandas
from ..stages.grouped import attach_lookup, partitioned_group_map
from ..text import normalize_whitespace_array
from .documents import _docs, canonical_docs

# the deterministic English stoplist shared with quality_scores
# (functions/textstats.py) and its SQL twin in __ray_entry__
STOPLIST = ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for")

TF_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("token", pa.string()),
        pa.field("tf", pa.int64()),
    ]
)


def _term_counts(ds: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, token, tf) term-frequency triples, one vectorized polars
    explode+count per batch (complete per doc: one input row = one doc).

    Single-space split of the canonical text; an empty canonical yields
    the single token '' (mirroring DuckDB ``string_split('', ' ')``)."""

    def _tf(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "canonical"]))
        out = (
            df.with_columns(pl.col("canonical").str.split(" ").alias("token"))
            .drop("canonical")
            .explode("token")
            .group_by(["doc_id", "token"])
            .len()
            .rename({"len": "tf"})
        )
        return out.to_arrow().cast(TF_SCHEMA)

    return ds.map_batches(_tf, batch_format="pyarrow")


def _token_aggregate(
    tf: "rd.Dataset", alias: str, value: str | None = None
) -> "rd.Dataset":
    """Token-keyed global aggregate with a per-batch combiner: partial
    sums per batch, then one small groupby — only (token, partial) rows
    cross the shuffle, never the raw triples. `value=None` counts rows
    (document frequency over tf triples); otherwise sums `value`."""

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        if value is None:
            df = pl.from_arrow(batch.select(["token"]))
            out = df.group_by("token").len().rename({"len": "_part_sum"})
        else:
            df = pl.from_arrow(batch.select(["token", value]))
            out = df.group_by("token").agg(pl.col(value).sum().alias("_part_sum"))
        return out.to_arrow().cast(
            pa.schema(
                [pa.field("token", pa.string()), pa.field("_part_sum", pa.int64())]
            )
        )

    return (
        tf.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("_part_sum", alias_name=alias))
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Per-document top-k TF-IDF keywords: score = tf * ln(N / df).

    Document frequency is a token-keyed aggregate attached back to the
    term triples (broadcast/join switch via `attach_lookup`); top-k per
    doc runs inside a hash-partitioned group map (one vectorized polars
    pass per partition, never per doc). Output
    (doc_id, token, tfidf, rank), rank 1..k ordered by
    (score desc, token asc)."""
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    tf = _term_counts(canonical_docs(sf_dir)).materialize()

    df_tbl = _token_aggregate(tf, "df")
    scored = attach_lookup(
        tf, TF_SCHEMA, ["token"], df_tbl, "token", "df", pa.int64(), ["df"]
    )

    def _topk(tb: pa.Table) -> pa.Table:
        import polars as pl

        tfs = np.asarray(tb["tf"], dtype=np.float64)
        dfs = np.asarray(tb["df"], dtype=np.float64)
        # identical IEEE sequence to the oracle: tf * ln(N * 1.0 / df)
        score = tfs * np.log(float(n_docs) / dfs)
        df = pl.from_arrow(tb.select(["doc_id", "token"])).with_columns(
            pl.Series("score", score)
        )
        df = df.sort(["doc_id", "score", "token"], descending=[False, True, False])
        df = df.with_columns(
            pl.int_range(1, pl.len() + 1).over("doc_id").alias("rank")
        ).filter(pl.col("rank") <= k)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "token": pa.array(df["token"].to_list(), pa.string()),
                "tfidf": pa.array(
                    floor_round_np(df["score"].to_numpy()), pa.float64()
                ),
                "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
            }
        )

    return partitioned_group_map(scored, "doc_id", _topk, arrow=True)


def gopher_quality_docs(sf_dir: str) -> "rd.Dataset":
    """Gopher-style document quality rules (Rae et al. 2021, public
    recipe), fully vectorized Arrow kernels — one stateless map_batches,
    no shuffle.

    Emitted metrics (rounded 6 dp) and the unrounded keep predicate:
      n_words        single-space split of canonical text
      mean_word_len  (len(canonical) - n_words + 1) / n_words — exact,
                     since canonical is single-space joined
      symbol_ratio   ('#' + '...' occurrences in raw text) / n_words
      bullet_frac    lines starting '- ' or '* '  / n_lines
      ellipsis_frac  lines ending '...'           / n_lines
      stop_hits      distinct STOPLIST words present
      keep           50<=n_words<=100000 and 3<=mean_word_len<=10 and
                     symbol_ratio<0.1 and bullet_frac<0.9 and
                     ellipsis_frac<0.3 and stop_hits>=2   (as int64)
    """
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_stats_batch, batch_format="pyarrow"
    )


def gopher_stats_batch(batch: pa.Table) -> pa.Table:
    """Batch kernel for `gopher_quality_docs` (module-level so it can be
    registered as a composable stage, registry.py)."""
    import polars as pl

    text = batch["text"]
    canon = normalize_whitespace_array(text)
    nw = np.asarray(
        pc.cast(pc.list_value_length(pc.split_pattern(canon, " ")), pa.int64())
    )
    n_chars = np.asarray(pc.cast(pc.utf8_length(canon), pa.int64()))
    mean_wl = (n_chars - nw + 1) * 1.0 / nw
    n_sym = np.asarray(
        pc.cast(pc.count_substring(text, pattern="#"), pa.int64())
    ) + np.asarray(pc.cast(pc.count_substring(text, pattern="..."), pa.int64()))
    sym_ratio = n_sym * 1.0 / nw
    n_lines = (
        np.asarray(pc.cast(pc.count_substring(text, pattern="\n"), pa.int64())) + 1
    )
    bullets = np.asarray(
        pc.cast(pc.count_substring_regex(text, pattern=r"(?m)^[\-\*] "), pa.int64())
    )
    ellipsis = np.asarray(
        pc.cast(pc.count_substring_regex(text, pattern=r"(?m)\.\.\.$"), pa.int64())
    )
    bullet_frac = bullets * 1.0 / n_lines
    ellipsis_frac = ellipsis * 1.0 / n_lines
    words = pl.from_arrow(pa.table({"w": pc.split_pattern(canon, " ")}))
    hits = (
        words.select(
            sum(
                pl.col("w").list.contains(s).cast(pl.Int64) for s in STOPLIST
            ).alias("h")
        )["h"]
        .to_numpy()
        .astype(np.int64)
    )
    keep = (
        (nw >= 50)
        & (nw <= 100000)
        & (mean_wl >= 3)
        & (mean_wl <= 10)
        & (sym_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (hits >= 2)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw, pa.int64()),
            "mean_word_len": pa.array(floor_round_np(mean_wl), pa.float64()),
            "symbol_ratio": pa.array(floor_round_np(sym_ratio), pa.float64()),
            "bullet_frac": pa.array(floor_round_np(bullet_frac), pa.float64()),
            "ellipsis_frac": pa.array(
                floor_round_np(ellipsis_frac), pa.float64()
            ),
            "stop_hits": pa.array(hits, pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        }
    )



def pack_sequences(
    sf_dir: str, budget: int = 512, bucket_size: int = 1024
) -> "rd.Dataset":
    """Contiguous sequence packing via a distributed prefix sum: docs in
    doc_id order are concatenated into fixed token-budget bins;
    bin_id = (tokens before this doc) // budget.

    Two-phase scan (the classic BSP prefix sum): (1) per-bucket token
    totals — buckets are contiguous doc_id ranges — aggregated into a
    corpus/bucket_size-row table whose running offsets are computed on
    the driver and broadcast; (2) a hash-partitioned group map computes
    the within-bucket cumulative sum and adds the bucket offset. The
    driver holds corpus/bucket_size rows, not the corpus; at extreme
    scale the same scan recurses over the totals table. All-integer —
    no float reduction anywhere."""
    import polars as pl

    def _prep(batch: pa.Table) -> pa.Table:
        nw = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["canonical"], " ")),
            pa.int64(),
        )
        bucket = pc.cast(
            pc.divide(batch["doc_id"], pa.scalar(bucket_size, pa.int64())), pa.int64()
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": nw, "bucket": bucket}
        )

    tok = (
        canonical_docs(sf_dir).map_batches(_prep, batch_format="pyarrow").materialize()
    )
    totals = typed_pandas(
        tok.groupby("bucket").aggregate(Sum("n_tokens", alias_name="tot")),
        {"bucket": "int64", "tot": "int64"},
    ).sort_values("bucket")
    offs = totals["tot"].cumsum().shift(fill_value=0)
    offsets_ref = ray.put(dict(zip(totals["bucket"].astype(int), offs.astype(int))))

    def _assign(tb: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        df = pl.from_arrow(tb).sort(["bucket", "doc_id"])
        df = df.with_columns(
            (pl.col("n_tokens").cum_sum().over("bucket") - pl.col("n_tokens")).alias(
                "_local"
            ),
            pl.col("bucket")
            .replace_strict(offsets, return_dtype=pl.Int64)
            .alias("_off"),
        )
        before = df["_local"].to_numpy() + df["_off"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(df["n_tokens"].to_numpy(), pa.int64()),
                "bin_id": pa.array(before // budget, pa.int64()),
            }
        )

    return partitioned_group_map(tok, "bucket", _assign, arrow=True)


def unigram_logprob_docs(sf_dir: str) -> "rd.Dataset":
    """Unigram language-model scoring: per doc, the mean negative log
    probability of its tokens under the corpus unigram distribution
    (the shuffle-light analog of a KenLM perplexity filter).

    Corpus counts are a token-keyed aggregate attached back via
    `attach_lookup`; per-token -ln p is floored to integer micro-units
    before the per-doc sum so the reduction is exact and
    order-independent. Output (doc_id, n_tokens, avg_neg_logprob)."""
    tf = _term_counts(canonical_docs(sf_dir)).materialize()
    cnt = _token_aggregate(tf, "c", value="tf").materialize()
    total = int(cnt.sum("c")) if cnt.count() else 0

    with_cnt = attach_lookup(
        tf, TF_SCHEMA, ["token"], cnt, "token", "c", pa.int64(), ["c"]
    )

    def _terms(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["c"], dtype=np.float64)
        tfs = np.asarray(batch["tf"], dtype=np.int64)
        u = np.floor(-np.log(c / float(total)) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tf": batch["tf"],
                "su": pa.array(tfs * u, pa.int64()),
            }
        )

    agg = (
        with_cnt.map_batches(_terms, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("tf", alias_name="n_tokens"), Sum("su", alias_name="_su")
        )
    )

    def _final(batch: pa.Table) -> pa.Table:
        su = np.asarray(batch["_su"], dtype=np.float64)
        n = np.asarray(batch["n_tokens"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(batch["n_tokens"], pa.int64()),
                "avg_neg_logprob": pa.array(
                    floor_round_np(su / 1e6 / n), pa.float64()
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


BG_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("pair", pa.string()),
        pa.field("prev", pa.string()),
        pa.field("cur", pa.string()),
        pa.field("tf", pa.int64()),
    ]
)

FIRST_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.int64()), pa.field("token", pa.string())]
)


def _bigram_counts(ds: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, pair, prev, cur, tf) per-doc bigram occurrence counts —
    one vectorized polars explode + within-doc shift per batch (complete
    per doc: one input row is one whole document). `pair` is the join
    key `prev + US + cur` (unit separator never appears in canonical
    text, which is single-space normalized)."""

    def _bg(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "canonical"]))
        e = (
            df.with_columns(pl.col("canonical").str.split(" ").alias("cur"))
            .drop("canonical")
            .explode("cur")
            .with_columns(pl.col("cur").shift(1).over("doc_id").alias("prev"))
            .drop_nulls("prev")
        )
        out = (
            e.group_by(["doc_id", "prev", "cur"])
            .len()
            .rename({"len": "tf"})
            .with_columns(
                (pl.col("prev") + "\x1f" + pl.col("cur")).alias("pair")
            )
            .select(["doc_id", "pair", "prev", "cur", "tf"])
        )
        return out.to_arrow().cast(BG_SCHEMA)

    return ds.map_batches(_bg, batch_format="pyarrow")


def _first_tokens(ds: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, token) — each document's first token (split of '' yields
    [''], so every doc contributes exactly one row)."""

    def _f(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "canonical"]))
        out = df.with_columns(
            pl.col("canonical").str.split(" ").list.first().alias("token")
        ).select(["doc_id", "token"])
        return out.to_arrow().cast(FIRST_SCHEMA)

    return ds.map_batches(_f, batch_format="pyarrow")


def bigram_logprob_docs(
    sf_dir: str,
    lam: float = 0.7,
    lam_c: float = 0.3,
    canon: "rd.Dataset | None" = None,
) -> "rd.Dataset":
    """Interpolated bigram language-model scoring — the CCNet-style
    perplexity filter (Wenzek et al. 2020, arXiv:1911.00359 §3.2 uses a
    KenLM n-gram LM; this is the from-scratch distributed analog):
    per doc, the mean negative log probability under
    p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                       + lam_c * c(w_i)/T,
    with the first token scored by the unigram term alone.

    Distribution: bigram triples are complete per doc (one row = one
    document); the corpus bigram and unigram tables are token-keyed
    combiner aggregates attached back via `attach_lookup` (broadcast
    under 1M entries, partitioned join above). Per-term -ln p is floored
    to integer micro-units before the per-doc sum (exactmath pattern),
    so the reduction is exact, order-independent, and bit-identical to
    the DuckDB oracle. `lam_c` is passed explicitly (not computed as
    1-lam) so engine and oracle use the same float literals.
    Output (doc_id, n_tokens, avg_neg_logprob). `canon` lets a composed
    pipeline share one materialized canonical corpus instead of
    re-reading + re-normalizing (curation_pipeline_docs)."""
    docs = canon if canon is not None else canonical_docs(sf_dir)
    tf = _term_counts(docs).materialize()
    cnt = _token_aggregate(tf, "c", value="tf").materialize()
    total = int(cnt.sum("c")) if cnt.count() else 0

    bg = _bigram_counts(docs).materialize()

    def _as_tok(batch: pa.Table) -> pa.Table:
        return pa.table({"token": batch["pair"], "tf": batch["tf"]})

    cb_tbl = _token_aggregate(
        bg.map_batches(_as_tok, batch_format="pyarrow"), "cb", value="tf"
    )

    with_cb = attach_lookup(
        bg, BG_SCHEMA, ["pair"], cb_tbl, "token", "cb", pa.int64(), ["cb"]
    )
    s2 = pa.schema(list(BG_SCHEMA) + [pa.field("cb", pa.int64())])
    with_cnt = attach_lookup(
        with_cb, s2, ["prev", "cur"], cnt, "token", "c", pa.int64(),
        ["cp", "cc"],
    )

    def _terms(batch: pa.Table) -> pa.Table:
        bf = np.asarray(batch["tf"], dtype=np.int64)
        cb = np.asarray(batch["cb"], dtype=np.float64)
        cp = np.asarray(batch["cp"], dtype=np.float64)
        cc = np.asarray(batch["cc"], dtype=np.float64)
        p = lam * (cb / cp) + lam_c * (cc / float(total))
        u = np.floor(-np.log(p) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n": pa.array(bf, pa.int64()),
                "su": pa.array(bf * u, pa.int64()),
            }
        )

    first = attach_lookup(
        _first_tokens(docs), FIRST_SCHEMA, ["token"], cnt, "token", "c",
        pa.int64(), ["cc"],
    )

    def _t0(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch["cc"], dtype=np.float64)
        u = np.floor(-np.log(cc / float(total)) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n": pa.array(np.ones(len(u), dtype=np.int64), pa.int64()),
                "su": pa.array(u, pa.int64()),
            }
        )

    parts = with_cnt.map_batches(_terms, batch_format="pyarrow").union(
        first.map_batches(_t0, batch_format="pyarrow")
    )
    agg = parts.groupby("doc_id").aggregate(
        Sum("n", alias_name="n_tokens"), Sum("su", alias_name="_su")
    )

    def _final(batch: pa.Table) -> pa.Table:
        su = np.asarray(batch["_su"], dtype=np.float64)
        n = np.asarray(batch["n_tokens"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(batch["n_tokens"], pa.int64()),
                "avg_neg_logprob": pa.array(
                    floor_round_np(su / 1e6 / n), pa.float64()
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def _rank_cutoffs(
    hist: pd.DataFrame, key: str, cnt: str, ranks: list[int]
) -> list[int]:
    """Value-at-rank cutoffs from a (value, count) histogram: for each
    rank k (1-based) return the smallest value whose cumulative count
    reaches k — i.e. the k-th smallest element of the expanded
    multiset. O(distinct values) driver work."""
    h = hist.sort_values(key).reset_index(drop=True)
    cum = h[cnt].cumsum()
    return [int(h.loc[(cum >= k).idxmax(), key]) for k in ranks]


def ccnet_bucket_docs(
    sf_dir: str, canon: "rd.Dataset | None" = None
) -> "rd.Dataset":
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3: split the corpus into three equal parts by
    LM perplexity; 'head' is the best-scoring third). Scores come from
    the interpolated bigram LM (`bigram_logprob_docs`); the two cutoffs
    are the exact scores at ranks ceil(n/3) and ceil(2n/3) under
    ascending (lower = better) order, and buckets are assigned by VALUE
    (score <= cutoff), so ties share a bucket deterministically.

    Scale: the only extra step beyond scoring is a histogram of the
    1e-6-quantized scores (per-batch combiner partials, then a groupby
    whose cardinality is the number of DISTINCT scores — bounded by the
    score range / 1e-6, not the corpus size); the driver folds that
    histogram into two integers and broadcasts them back inside the
    closure. Bit-identical to the DuckDB oracle: both sides recover the
    micro-unit integer with floor(avg * 1e6 + 0.5) from the same
    floor-rounded float. Output (doc_id, n_tokens, avg_neg_logprob,
    bucket)."""
    scored = bigram_logprob_docs(sf_dir, canon=canon).materialize()

    _H_SCHEMA = pa.schema(
        [pa.field("su", pa.int64()), pa.field("_p", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        su = np.floor(
            np.asarray(batch["avg_neg_logprob"], dtype=np.float64) * 1e6
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame({"su": su})
            .group_by("su")
            .len()
            .rename({"len": "_p"})
            .to_arrow()
            .cast(_H_SCHEMA)
        )

    hist = typed_pandas(
        scored.map_batches(_partial, batch_format="pyarrow")
        .groupby("su")
        .aggregate(Sum("_p", alias_name="n")),
        {"su": "int64", "n": "int64"},
    )
    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("avg_neg_logprob", pa.float64()),
            pa.field("bucket", pa.string()),
        ]
    )
    if hist.empty:
        return rd.from_arrow(out_schema.empty_table())
    ntot = int(hist["n"].sum())
    # ceil(n/3) and ceil(2n/3), matching SQL ceil(n / 3.0)
    c1, c2 = _rank_cutoffs(
        hist, "su", "n", [(ntot + 2) // 3, (2 * ntot + 2) // 3]
    )

    def _bucket(batch: pa.Table) -> pa.Table:
        su = np.floor(
            np.asarray(batch["avg_neg_logprob"], dtype=np.float64) * 1e6
            + 0.5
        ).astype(np.int64)
        b = np.where(su <= c1, "head", np.where(su <= c2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "avg_neg_logprob": batch["avg_neg_logprob"],
                "bucket": pa.array(b, pa.string()),
            }
        )

    return scored.map_batches(_bucket, batch_format="pyarrow")


def token_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-source token-length distribution: n_docs and the p25/p50/p75
    whitespace-token counts (value at rank ceil(q*n) — discrete
    quantiles, the corpus-profiling numbers a mixing recipe starts
    from).

    Scale: token counts are complete per row; the only shuffle is a
    (source, n_tokens)-keyed combiner histogram whose cardinality is
    n_sources x distinct lengths, independent of corpus size; the
    driver folds each source's histogram into three integers. Output
    (source, n_docs, p25, p50, p75) sorted by source."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    _H_SCHEMA = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("nt", pa.int64()),
            pa.field("_p", pa.int64()),
        ]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        canonical = normalize_whitespace_array(batch["text"])
        # token count of the single-space split; '' splits to [''] -> 1
        nt = pc.add(
            pc.cast(
                pc.count_substring(canonical, pattern=" "), pa.int64()
            ),
            1,
        )
        return (
            pl.from_arrow(
                pa.table({"source": batch["source"], "nt": nt})
            )
            .group_by(["source", "nt"])
            .len()
            .rename({"len": "_p"})
            .to_arrow()
            .cast(_H_SCHEMA)
        )

    hist = typed_pandas(
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["source", "nt"])
        .aggregate(Sum("_p", alias_name="n")),
        {"source": "object", "nt": "int64", "n": "int64"},
    )
    rows = []
    for source, h in hist.groupby("source", sort=True):
        n = int(h["n"].sum())
        import math

        ranks = [math.ceil(n * q) for q in (0.25, 0.5, 0.75)]
        p25, p50, p75 = _rank_cutoffs(
            h.reset_index(drop=True), "nt", "n", ranks
        )
        rows.append((source, n, p25, p50, p75))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "p25", "p50", "p75"]
    ).astype(
        {
            "source": "object",
            "n_docs": "int64",
            "p25": "int64",
            "p50": "int64",
            "p75": "int64",
        }
    )


FEAT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("source", pa.string()),
        pa.field("k", pa.int64()),
        pa.field("tf", pa.int64()),
    ]
)


def dsir_importance_weights(
    sf_dir: str, n_buckets: int = 8192
) -> "rd.Dataset":
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score
    each raw document by the hashed-bigram importance log-ratio between
    a target distribution and the raw corpus, the published recipe for
    picking pretraining data that matches a target domain. The target
    here is the lexicographically smallest `source` (deterministic);
    features are bigrams hashed into `n_buckets` buckets (md5, the same
    64-bit little-endian parse DuckDB reproduces); both bag-of-buckets
    multinomials use add-one smoothing.

    Scale: per-doc features are complete per batch (one row = one doc);
    the bucket tables are <= n_buckets rows (combiner aggregates,
    broadcast back); per-feature log-ratios are floored to integer
    micro-units before the per-doc sum (exactmath pattern), so the
    score is order-independent and bit-identical to the DuckDB oracle.
    Docs with no bigrams (single-token) emit no row — same in the
    oracle. Output (doc_id, n_bigrams, dsir_score) where dsir_score is
    the mean per-bigram log p_target/p_raw."""
    from ..simhash import md5_feature_hash64

    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    def _canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "canonical": normalize_whitespace_array(batch["text"]),
            }
        )

    docs = ds.map_batches(_canon, batch_format="pyarrow")

    def _feats(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "source", "canonical"]))
        e = (
            df.with_columns(pl.col("canonical").str.split(" ").alias("cur"))
            .drop("canonical")
            .explode("cur")
            .with_columns(pl.col("cur").shift(1).over("doc_id").alias("prev"))
            .drop_nulls("prev")
            .with_columns(
                (pl.col("prev") + "\x1f" + pl.col("cur")).alias("pair")
            )
            .select(["doc_id", "source", "pair"])
        )
        if e.height == 0:
            return FEAT_SCHEMA.empty_table()
        pairs = e["pair"].to_numpy()
        uniq, inv = np.unique(pairs, return_inverse=True)
        ks = np.array(
            [md5_feature_hash64(p) % n_buckets for p in uniq], dtype=np.int64
        )
        out = (
            e.with_columns(pl.Series("k", ks[inv]))
            .group_by(["doc_id", "source", "k"])
            .len()
            .rename({"len": "tf"})
            .select(["doc_id", "source", "k", "tf"])
        )
        return out.to_arrow().cast(FEAT_SCHEMA)

    feats = docs.map_batches(_feats, batch_format="pyarrow").materialize()

    # deterministic target pick: smallest source name over the FULL
    # documents table (tiny combiner groupby, driver-side min)
    src_tbl = typed_pandas(
        ds.groupby("source").aggregate(Count(alias_name="n")),
        {"source": "object", "n": "int64"},
    )
    if src_tbl.empty or feats.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [
                    pa.field("doc_id", pa.int64()),
                    pa.field("n_bigrams", pa.int64()),
                    pa.field("dsir_score", pa.float64()),
                ]
            ).empty_table()
        )
    target = min(src_tbl["source"])

    _K_SCHEMA = pa.schema(
        [pa.field("k", pa.int64()), pa.field("_p", pa.int64())]
    )

    def _bucket_agg(d: "rd.Dataset", alias: str) -> "rd.Dataset":
        def _partial(batch: pa.Table) -> pa.Table:
            import polars as pl

            return (
                pl.from_arrow(batch.select(["k", "tf"]))
                .group_by("k")
                .agg(pl.col("tf").sum().alias("_p"))
                .to_arrow()
                .cast(_K_SCHEMA)
            )

        return (
            d.map_batches(_partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("_p", alias_name=alias))
        )

    qcnt = _bucket_agg(feats, "cq")
    tgt_feats = feats.filter(
        expr=f"source == {target!r}"
    )
    pcnt = _bucket_agg(tgt_feats, "cp")
    tq = int(feats.sum("tf"))
    tp_raw = tgt_feats.sum("tf")
    tp = int(tp_raw) if tp_raw is not None else 0

    with_q = attach_lookup(
        feats, FEAT_SCHEMA, ["k"], qcnt, "k", "cq", pa.int64(), ["cq"]
    )
    s2 = pa.schema(list(FEAT_SCHEMA) + [pa.field("cq", pa.int64())])
    with_pq = attach_lookup(
        with_q, s2, ["k"], pcnt, "k", "cp", pa.int64(), ["cp"]
    )

    def _terms(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch["tf"], dtype=np.int64)
        cq = np.asarray(batch["cq"], dtype=np.float64)
        cp = np.asarray(pc.fill_null(batch["cp"], 0), dtype=np.float64)
        lr = np.log((cp + 1.0) / float(tp + n_buckets)) - np.log(
            (cq + 1.0) / float(tq + n_buckets)
        )
        u = np.floor(lr * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tf": pa.array(tf, pa.int64()),
                "su": pa.array(tf * u, pa.int64()),
            }
        )

    agg = (
        with_pq.map_batches(_terms, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("tf", alias_name="n_bigrams"), Sum("su", alias_name="_su")
        )
    )

    def _final(batch: pa.Table) -> pa.Table:
        su = np.asarray(batch["_su"], dtype=np.float64)
        n = np.asarray(batch["n_bigrams"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pc.cast(batch["n_bigrams"], pa.int64()),
                "dsir_score": pa.array(
                    floor_round_np(su / 1e6 / n), pa.float64()
                ),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def source_mixing_weights(sf_dir: str, alpha: float = 0.7) -> pd.DataFrame:
    """Temperature-scaled source mixing weights (the multinomial
    alpha-sampling recipe used for multi-source pretraining mixes):
    w_s = (n_s / N)^alpha, normalized over sources.

    The distributed part is one groupby count; the final normalization
    runs on the per-source table (|sources| rows — driver-small by
    construction). Weights are normalized over micro-unit integers so
    the sum is order-independent."""
    agg = (
        typed_pandas(
            _docs(sf_dir, ["source"]).groupby("source").aggregate(
                Count(alias_name="n_docs")
            ),
            {"source": "object", "n_docs": "int64"},
        )
        .sort_values("source")
        .reset_index(drop=True)
    )
    if agg.empty:  # no sources -> no mixture to weight
        return pd.DataFrame(
            {"source": pd.Series([], dtype="object"),
             "n_docs": pd.Series([], dtype="int64"),
             "weight": pd.Series([], dtype="float64")}
        )
    n = int(agg["n_docs"].sum())
    w = (agg["n_docs"].to_numpy(dtype=np.float64) / float(n)) ** alpha
    w_u = np.floor(w * 1e9 + 0.5).astype(np.int64)
    tot = int(w_u.sum())
    return pd.DataFrame(
        {
            "source": agg["source"],
            "n_docs": agg["n_docs"].astype("int64"),
            "mix_weight": floor_round_np(w_u * 1.0 / tot),
        }
    )


def oov_rate_docs(sf_dir: str, vocab_size: int = 20) -> "rd.Dataset":
    """Out-of-vocabulary rate per document against the corpus top-K
    vocabulary — the tokenizer-prep diagnostic run before committing to
    a vocab (docs with high OOV are scripts/languages the vocab misses).

    Two-pass: (1) token totals via the per-batch combiner aggregate,
    top-K selected with a deterministic (count desc, token asc) sort —
    the vocab is K rows, broadcast via ray.put; (2) per-doc OOV token
    sums via one groupby over per-row flags. Output
    (doc_id, n_tokens, n_oov, oov_rate)."""
    tf = _term_counts(canonical_docs(sf_dir)).materialize()
    vocab_rows = typed_pandas(
        _token_aggregate(tf, "c", value="tf")
        .sort(["c", "token"], descending=[True, False])
        .limit(vocab_size),
        {"token": "object", "c": "int64"},
    )
    vocab_ref = ray.put(frozenset(vocab_rows["token"]))

    def _flags(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        toks = batch["token"].to_pylist()
        tfs = np.asarray(batch["tf"], dtype=np.int64)
        oov = np.fromiter(
            (t not in vocab for t in toks), dtype=bool, count=len(toks)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "tf": batch["tf"],
                "oov": pa.array(np.where(oov, tfs, 0), pa.int64()),
            }
        )

    agg = (
        tf.map_batches(_flags, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("tf", alias_name="n_tokens"), Sum("oov", alias_name="n_oov"))
    )

    def _rate(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_tokens"], dtype=np.float64)
        o = np.asarray(batch["n_oov"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(batch["n_tokens"], pa.int64()),
                "n_oov": pc.cast(batch["n_oov"], pa.int64()),
                "oov_rate": pa.array(floor_round_np(o / n), pa.float64()),
            }
        )

    return agg.map_batches(_rate, batch_format="pyarrow")


def source_overlap(sf_dir: str, seg_words: int = 10) -> "rd.Dataset":
    """Cross-source content-overlap matrix: for every source pair, the
    number of shared distinct `seg_words`-word segments and their
    Jaccard overlap — the corpus-composition audit run before mixing
    sources (near-identical mirrors show up as jaccard ~= 1).

    Shape: distinct (source, segment) pairs (per-batch pre-dedup, one
    groupby), then pairs are emitted per segment inside a hash-
    partitioned group map — a segment present in k sources emits
    k(k-1)/2 pairs, bounded by the (small) source count, so boilerplate
    segments cannot blow up the pair table the way unbounded bucket
    joins would. Per-source distinct-segment totals ride the same
    distinct table. Output (source_a, source_b, n_shared, jaccard)."""
    import polars as pl

    from ray.data.aggregate import Count

    def _canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "canonical": normalize_whitespace_array(batch["text"]),
            }
        )

    def _segs(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["source", "canonical"]))
        out = (
            df.with_columns(pl.col("canonical").str.split(" ").alias("w"))
            .drop("canonical")
            .with_row_index("_doc")
            .explode("w")
            .with_columns(
                (pl.int_range(pl.len()).over("_doc") // seg_words).alias("_seg_idx")
            )
            .group_by(["_doc", "_seg_idx", "source"], maintain_order=True)
            .agg(pl.col("w").str.join(" ").alias("seg"))
            .select(["source", "seg"])
            .unique()
        )
        return out.to_arrow().cast(
            pa.schema([pa.field("source", pa.string()), pa.field("seg", pa.string())])
        )

    distinct = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(_canon, batch_format="pyarrow")
        .map_batches(_segs, batch_format="pyarrow")
        .groupby(["seg", "source"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    sizes = typed_pandas(
        distinct.groupby("source").aggregate(Count(alias_name="n_segs")),
        {"source": "object", "n_segs": "int64"},
    )
    sizes_ref = ray.put(dict(zip(sizes["source"], sizes["n_segs"].astype(int))))

    def _pairs(tb: pa.Table) -> pa.Table:
        df = pl.from_arrow(tb)
        out = (
            df.sort(["seg", "source"])
            .group_by("seg", maintain_order=True)
            .agg(pl.col("source").alias("srcs"))
        )
        a_out, b_out = [], []
        for srcs in out["srcs"].to_list():
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    a_out.append(srcs[i])
                    b_out.append(srcs[j])
        return pa.table(
            {
                "source_a": pa.array(a_out, pa.string()),
                "source_b": pa.array(b_out, pa.string()),
            }
        )

    counts = (
        partitioned_group_map(distinct, "seg", _pairs, arrow=True)
        .groupby(["source_a", "source_b"])
        .aggregate(Count(alias_name="n_shared"))
    )

    def _jaccard(batch: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        na = np.array([sizes[s] for s in batch["source_a"].to_pylist()], dtype=np.float64)
        nb = np.array([sizes[s] for s in batch["source_b"].to_pylist()], dtype=np.float64)
        sh = np.asarray(batch["n_shared"], dtype=np.float64)
        return pa.table(
            {
                "source_a": batch["source_a"],
                "source_b": batch["source_b"],
                "n_shared": pc.cast(batch["n_shared"], pa.int64()),
                "jaccard": pa.array(
                    floor_round_np(sh / (na + nb - sh)), pa.float64()
                ),
            }
        )

    return counts.map_batches(_jaccard, batch_format="pyarrow")


def pmi_bigrams(sf_dir: str, k: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Top-k adjacent-word bigrams by pointwise mutual information:
    PMI = ln(c_ab * T / (c_a * c_b)) — the collocation detector behind
    tokenizer-merge candidates and phrase mining.

    Two count aggregates (unigrams from the tf triples, bigrams from a
    per-batch sliding zip), both with per-batch combiners; unigram
    counts for the surviving >= min_count bigrams are attached from the
    (broadcast/join-switched) lookup; final top-k via per-batch top-k
    combiner + driver merge of k-row partials. Output
    (w1, w2, n_pair, pmi) sorted (pmi desc, w1, w2)."""
    import polars as pl

    docs = canonical_docs(sf_dir).materialize()
    tf = _term_counts(docs)
    uni = _token_aggregate(tf, "c", value="tf").materialize()
    total = int(uni.sum("c")) if uni.count() else 0

    def _bigrams(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["canonical"]))
        out = (
            df.with_row_index("_doc")
            .with_columns(pl.col("canonical").str.split(" ").alias("w"))
            .drop("canonical")
            .explode("w")
            .with_columns(pl.col("w").shift(-1).over("_doc").alias("w2"))
            .drop_nulls("w2")
            .group_by(["w", "w2"])
            .len()
            .rename({"w": "w1", "len": "n"})
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    pa.field("w1", pa.string()),
                    pa.field("w2", pa.string()),
                    pa.field("n", pa.int64()),
                ]
            )
        )

    pairs = (
        docs.map_batches(_bigrams, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n_pair"))
        .filter(expr=f"n_pair >= {min_count}")
        .materialize()
    )
    pair_schema = pa.schema(
        [
            pa.field("w1", pa.string()),
            pa.field("w2", pa.string()),
            pa.field("n_pair", pa.int64()),
        ]
    )
    with_counts = attach_lookup(
        pairs, pair_schema, ["w1", "w2"], uni, "token", "c", pa.int64(), ["c1", "c2"]
    )

    def _topk(batch: pa.Table) -> pa.Table:
        nab = np.asarray(batch["n_pair"], dtype=np.float64)
        c1 = np.asarray(batch["c1"], dtype=np.float64)
        c2 = np.asarray(batch["c2"], dtype=np.float64)
        # log-sum form, left-associative — the identical IEEE sequence
        # to the oracle's ln(n)+ln(T)-ln(c1)-ln(c2) (a product form would
        # round differently between int-exact SQL and float numpy)
        pmi = np.log(nab) + np.log(float(total)) - np.log(c1) - np.log(c2)
        out = pa.table(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "n_pair": batch["n_pair"],
                "pmi": pa.array(floor_round_np(pmi), pa.float64()),
            }
        )
        df = pl.from_arrow(out).sort(
            ["pmi", "w1", "w2"], descending=[True, False, False]
        )
        return df.head(k).to_arrow().cast(out.schema)

    partials = typed_pandas(
        with_counts.map_batches(_topk, batch_format="pyarrow"),
        {"w1": "object", "w2": "object", "n_pair": "int64", "pmi": "float64"},
    )
    return (
        partials.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]
        )
        .head(k)
        .reset_index(drop=True)
    )


def filter_below_source_median(sf_dir: str) -> "rd.Dataset":
    """Per-source quality gate: keep documents whose quality score is
    strictly above their source's median — composition of the quality
    scorer and the per-group histogram-quantile machinery (no global
    sort; medians come from exact per-source value histograms over
    micro-unit scores).

    Output (doc_id, source, quality) for the surviving docs."""
    from ..functions.textstats import quality_scores

    def _scored(batch: pa.Table) -> pa.Table:
        qb = quality_scores(
            batch.append_column(
                "canonical", normalize_whitespace_array(batch["text"])
            )
        )
        q_u = np.floor(
            np.asarray(qb["quality"], dtype=np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "q_u": pa.array(q_u, pa.int64()),
            }
        )

    scored = (
        _docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(_scored, batch_format="pyarrow")
        .materialize()
    )

    # per-(source, value) histogram -> exact median at floor((n-1)*0.5)
    hist = typed_pandas(
        scored.groupby(["source", "q_u"]).aggregate(Count(alias_name="n")),
        {"source": "object", "q_u": "int64", "n": "int64"},
    ).sort_values(["source", "q_u"])
    medians: dict[str, int] = {}
    for src, g in hist.groupby("source", sort=False):
        n = int(g["n"].sum())
        target = (n - 1) // 2
        cum = g["n"].cumsum()
        medians[src] = int(g.loc[cum > target, "q_u"].iloc[0])
    med_ref = ray.put(medians)

    def _filter(batch: pa.Table) -> pa.Table:
        med = ray.get(med_ref)
        q_u = np.asarray(batch["q_u"], dtype=np.int64)
        cut = np.array([med[s] for s in batch["source"].to_pylist()], dtype=np.int64)
        keep = q_u > cut
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "source": out["source"],
                "quality": pa.array(
                    np.asarray(out["q_u"], dtype=np.float64) / 1e6, pa.float64()
                ),
            }
        )

    return scored.map_batches(_filter, batch_format="pyarrow")


def token_budget_sample(
    sf_dir: str, budget: int = 1500, bucket_size: int = 1024
) -> "rd.Dataset":
    """Token-budget corpus selection: within each source, take documents
    in doc_id order while the running token total stays within `budget`
    — the per-source quota step of a data-mixing recipe (each source
    contributes at most `budget` tokens to the mix; the reference's
    analog is the per-domain `max_samples_per_domain` cap,
    dataset/constructor.py:169-190, in tokens instead of documents).

    Scale: the keep/drop decision needs the per-source prefix sum of
    token counts, computed with the same two-phase BSP scan as
    `pack_sequences`: (1) per-(source, doc_id-range-bucket) token totals
    — a bounded combiner groupby — whose per-source running offsets the
    driver folds and broadcasts; (2) one vectorized polars pass per
    hash partition adds the within-bucket cumulative sum. All-integer,
    order-independent, no global sort. Output (doc_id, source,
    n_tokens, cum_tokens) for kept docs, where cum_tokens is the
    inclusive per-source running total (<= budget)."""
    import polars as pl

    ds = _docs(sf_dir, ["doc_id", "text", "source"])

    _T_SCHEMA = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("source", pa.string()),
            pa.field("n_tokens", pa.int64()),
            pa.field("bucket", pa.int64()),
        ]
    )

    def _prep(batch: pa.Table) -> pa.Table:
        canonical = normalize_whitespace_array(batch["text"])
        nw = pc.add(
            pc.cast(pc.count_substring(canonical, pattern=" "), pa.int64()),
            1,
        )
        bucket = pc.cast(
            pc.divide(batch["doc_id"], pa.scalar(bucket_size, pa.int64())),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tokens": nw,
                "bucket": bucket,
            }
        )

    tok = ds.map_batches(_prep, batch_format="pyarrow").materialize()
    totals = typed_pandas(
        tok.groupby(["source", "bucket"]).aggregate(
            Sum("n_tokens", alias_name="tot")
        ),
        {"source": "object", "bucket": "int64", "tot": "int64"},
    ).sort_values(["source", "bucket"])
    if totals.empty:
        return rd.from_arrow(
            pa.schema(
                [
                    pa.field("doc_id", pa.int64()),
                    pa.field("source", pa.string()),
                    pa.field("n_tokens", pa.int64()),
                    pa.field("cum_tokens", pa.int64()),
                ]
            ).empty_table()
        )
    offs = totals.groupby("source")["tot"].cumsum() - totals["tot"]
    offsets_ref = ray.put(
        {
            (s, int(b)): int(o)
            for s, b, o in zip(totals["source"], totals["bucket"], offs)
        }
    )

    def _select(tb: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        df = pl.from_arrow(tb).sort(["source", "bucket", "doc_id"])
        off = np.array(
            [
                offsets[(s, int(b))]
                for s, b in zip(df["source"], df["bucket"])
            ],
            dtype=np.int64,
        )
        local = (
            df.select(
                pl.col("n_tokens").cum_sum().over(["source", "bucket"])
            )
            .to_series()
            .to_numpy()
        )
        cum = off + local
        keep = cum <= budget
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()[keep], pa.int64()),
                "source": pa.array(
                    df["source"].to_numpy()[keep], pa.string()
                ),
                "n_tokens": pa.array(
                    df["n_tokens"].to_numpy()[keep], pa.int64()
                ),
                "cum_tokens": pa.array(cum[keep], pa.int64()),
            }
        )

    return partitioned_group_map(tok, "bucket", _select, arrow=True)


def dsir_select_topk(sf_dir: str, k: int = 5) -> "rd.Dataset":
    """DSIR selection step (Xie et al. 2023 §3.2): after importance
    scoring, keep the top-k documents per source by (dsir_score desc,
    doc_id asc) — the data-selection pass that follows
    `dsir_importance_weights`.

    Scale: the score table is corpus-sized, so source is attached with
    `attach_lookup` (broadcast under 1M docs, hash-partitioned join
    above) and the top-k runs as the coarse-partitioned rank pattern
    (`top_docs_per_source`): hash-partition on source, one vectorized
    polars rank per partition, <= k rows out per source. Output
    (source, doc_id, n_bigrams, dsir_score, rank)."""
    import polars as pl

    scored = dsir_importance_weights(sf_dir).materialize()

    _S_SCHEMA = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("dsir_score", pa.float64()),
        ]
    )
    with_src = attach_lookup(
        scored,
        _S_SCHEMA,
        ["doc_id"],
        _docs(sf_dir, ["doc_id", "source"]),
        "doc_id",
        "source",
        pa.string(),
        ["source"],
    )

    _OUT = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("doc_id", pa.int64()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("dsir_score", pa.float64()),
            pa.field("rank", pa.int64()),
        ]
    )

    def _rank_part(tb: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(tb)
            .sort(
                ["source", "dsir_score", "doc_id"],
                descending=[False, True, False],
            )
            .with_columns(
                (pl.int_range(pl.len()).over("source") + 1).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return (
            out.select(
                ["source", "doc_id", "n_bigrams", "dsir_score", "rank"]
            )
            .to_arrow()
            .cast(_OUT)
        )

    return partitioned_group_map(with_src, "source", _rank_part, arrow=True)


def shard_docs_deterministic(
    sf_dir: str, n_shards: int = 8
) -> "rd.Dataset":
    """Deterministic global shuffle + shard assignment: every doc gets a
    shard (md5 of its doc_id, first 32 bits, mod n_shards) and a 1-based
    position within that shard in full-md5-hash order — the
    seed-reproducible shuffle order a training-shard writer consumes
    (same md5 key family as `train_val_test_split`; the hash order IS
    the shuffle).

    Scale: positions come from the two-phase rank scan
    (`global_length_rank` pattern) keyed on the hash's first 16 bits:
    a (shard, prefix-bucket) count histogram (<= n_shards * 65536 rows,
    independent of corpus size) is folded into per-shard running
    offsets on the driver and broadcast; each hash partition then ranks
    its rows locally within (shard, bucket) sorted by (hash_hex,
    doc_id). The bucket is a prefix of the sort key, so bucket blocks
    are contiguous in shard order and offset + local rank is the global
    position. No global sort. Output (doc_id, shard, pos)."""
    import hashlib

    import polars as pl

    ds = _docs(sf_dir, ["doc_id"])

    def _key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        h32 = np.array([int(h[:8], 16) for h in hx], dtype=np.int64)
        b16 = np.array([int(h[:4], 16) for h in hx], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "hx": pa.array(hx, pa.string()),
                "shard": pa.array(h32 % n_shards, pa.int64()),
                "bucket": b16,
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow").materialize()
    hist = typed_pandas(
        keyed.groupby(["shard", "bucket"]).aggregate(Count(alias_name="n")),
        {"shard": "int64", "bucket": "int64", "n": "int64"},
    ).sort_values(["shard", "bucket"])
    if hist.empty:
        return rd.from_arrow(
            pa.schema(
                [
                    pa.field("doc_id", pa.int64()),
                    pa.field("shard", pa.int64()),
                    pa.field("pos", pa.int64()),
                ]
            ).empty_table()
        )
    offs = hist.groupby("shard")["n"].cumsum() - hist["n"]
    offsets_ref = ray.put(
        {
            (int(s), int(b)): int(o)
            for s, b, o in zip(hist["shard"], hist["bucket"], offs)
        }
    )

    def _pos(tb: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        df = pl.from_arrow(tb).sort(["shard", "bucket", "hx", "doc_id"])
        off = np.array(
            [
                offsets[(int(s), int(b))]
                for s, b in zip(df["shard"], df["bucket"])
            ],
            dtype=np.int64,
        )
        local = (
            df.select(
                (pl.int_range(pl.len()) + 1).over(["shard", "bucket"])
            )
            .to_series()
            .to_numpy()
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "shard": pa.array(df["shard"].to_numpy(), pa.int64()),
                "pos": pa.array(off + local, pa.int64()),
            }
        )

    return partitioned_group_map(keyed, "bucket", _pos, arrow=True)


def shard_pack_assignments(
    sf_dir: str, n_shards: int = 8, budget: int = 512
) -> "rd.Dataset":
    """Shard + pack plan for training-shard writing: every doc gets its
    md5 shard, its 1-based position in shard hash order, and the
    token-budget bin it packs into within that shard (bin boundaries
    follow the same deterministic hash order, so the plan is
    seed-reproducible end to end — `shard_docs_deterministic` and
    `pack_sequences` composed on one key).

    Scale: one pass computes (hash, shard, 16-bit prefix bucket, token
    count); a (shard, bucket) histogram of counts AND token totals —
    <= n_shards * 65536 rows regardless of corpus size — is folded into
    per-shard running offsets on the driver and broadcast; each hash
    partition then ranks and prefix-sums locally within (shard, bucket)
    sorted by (hash_hex, doc_id). All-integer. Output (doc_id, shard,
    pos, n_tokens, bin_id)."""
    import hashlib

    import polars as pl

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        h32 = np.array([int(h[:8], 16) for h in hx], dtype=np.int64)
        b16 = np.array([int(h[:4], 16) for h in hx], dtype=np.int64)
        canonical = normalize_whitespace_array(batch["text"])
        nt = pc.add(
            pc.cast(pc.count_substring(canonical, pattern=" "), pa.int64()),
            1,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "hx": pa.array(hx, pa.string()),
                "shard": pa.array(h32 % n_shards, pa.int64()),
                "bucket": b16,
                "n_tokens": nt,
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow").materialize()
    hist = typed_pandas(
        keyed.groupby(["shard", "bucket"]).aggregate(
            Count(alias_name="n"), Sum("n_tokens", alias_name="tok")
        ),
        {"shard": "int64", "bucket": "int64", "n": "int64", "tok": "int64"},
    ).sort_values(["shard", "bucket"])
    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("shard", pa.int64()),
            pa.field("pos", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("bin_id", pa.int64()),
        ]
    )
    if hist.empty:
        return rd.from_arrow(out_schema.empty_table())
    n_off = hist.groupby("shard")["n"].cumsum() - hist["n"]
    t_off = hist.groupby("shard")["tok"].cumsum() - hist["tok"]
    offsets_ref = ray.put(
        {
            (int(s), int(b)): (int(no), int(to))
            for s, b, no, to in zip(
                hist["shard"], hist["bucket"], n_off, t_off
            )
        }
    )

    def _assign(tb: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        df = pl.from_arrow(tb).sort(["shard", "bucket", "hx", "doc_id"])
        pairs = [
            offsets[(int(s), int(b))]
            for s, b in zip(df["shard"], df["bucket"])
        ]
        n_off = np.array([p[0] for p in pairs], dtype=np.int64)
        t_off = np.array([p[1] for p in pairs], dtype=np.int64)
        local_pos = (
            df.select((pl.int_range(pl.len()) + 1).over(["shard", "bucket"]))
            .to_series()
            .to_numpy()
        )
        local_before = (
            df.select(
                (
                    pl.col("n_tokens").cum_sum().over(["shard", "bucket"])
                    - pl.col("n_tokens")
                )
            )
            .to_series()
            .to_numpy()
        )
        before = t_off + local_before
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "shard": pa.array(df["shard"].to_numpy(), pa.int64()),
                "pos": pa.array(n_off + local_pos, pa.int64()),
                "n_tokens": pa.array(
                    df["n_tokens"].to_numpy(), pa.int64()
                ),
                "bin_id": pa.array(before // budget, pa.int64()),
            }
        )

    return partitioned_group_map(keyed, "bucket", _assign, arrow=True)


def write_training_shards(
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    budget: int = 512,
) -> dict:
    """Resumable training-shard writer: plans with
    `shard_pack_assignments`, attaches the text back by doc_id, and
    writes hive-partitioned Parquet (`shard=K/` directories — the
    resumable layout: a re-run skips a completed output via the
    manifest) with the tmp+rename protocol (a crash mid-write can never
    leave a partial directory that a resume mistakes for complete —
    same discipline as CheckpointManager.stage). Returns the manifest
    (per-shard row counts + token totals); calling again with the same
    out_dir is a no-op that returns the stored manifest."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from ..sources.io import write_partitioned

    manifest_path = _os.path.join(out_dir, "manifest.json")
    if _os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return _json.load(f)

    plan = shard_pack_assignments(
        sf_dir, n_shards=n_shards, budget=budget
    ).materialize()
    _P_SCHEMA = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("shard", pa.int64()),
            pa.field("pos", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("bin_id", pa.int64()),
        ]
    )
    with_text = attach_lookup(
        plan,
        _P_SCHEMA,
        ["doc_id"],
        _docs(sf_dir, ["doc_id", "text"]),
        "doc_id",
        "text",
        pa.string(),
        ["text"],
    )

    tmp = out_dir + ".tmp"
    _shutil.rmtree(tmp, ignore_errors=True)
    _os.makedirs(tmp, exist_ok=True)
    write_partitioned(with_text, _os.path.join(tmp, "data"),
                      partition_cols=["shard"])
    stats = typed_pandas(
        plan.groupby("shard").aggregate(
            Count(alias_name="n_docs"), Sum("n_tokens", alias_name="tok")
        ),
        {"shard": "int64", "n_docs": "int64", "tok": "int64"},
    ).sort_values("shard")
    manifest = {
        "n_shards": n_shards,
        "budget": budget,
        "shards": {
            str(int(s)): {"n_docs": int(n), "n_tokens": int(t)}
            for s, n, t in zip(stats["shard"], stats["n_docs"], stats["tok"])
        },
    }
    with open(_os.path.join(tmp, "manifest.json"), "w") as f:
        _json.dump(manifest, f)
    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.rename(tmp, out_dir)
    return manifest


def _class_token_counts(tf: "rd.Dataset", docs_src: "rd.Dataset"):
    """Class-conditional token counts for source-keyed distributional
    ops (NB classifier, KL matrix): attach each tf triple's source and
    fold a per-batch combiner into one (source, token) groupby. Returns
    the materialized counts Dataset (source, token, cnt)."""
    import polars as pl

    with_src = attach_lookup(
        tf, TF_SCHEMA, ["doc_id"], docs_src, "doc_id", "source",
        pa.string(), ["source"],
    )

    def _cls_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["source", "token", "tf"]))
        out = df.group_by(["source", "token"]).agg(
            pl.col("tf").sum().alias("cnt")
        )
        return out.to_arrow().cast(
            pa.schema(
                [pa.field("source", pa.string()),
                 pa.field("token", pa.string()),
                 pa.field("cnt", pa.int64())]
            )
        )

    return (
        with_src.map_batches(_cls_partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )


def nb_source_classifier_docs(sf_dir: str) -> "rd.Dataset":
    """Multinomial Naive-Bayes source classifier over unigram tokens
    (Laplace smoothing) — the closed-form, exactly-reproducible stand-in
    for the fasttext-style quality/domain classifiers of web-corpus
    curation (DSIR's discriminative cousin: instead of importance
    ratios, argmax_s ln P(s) + sum_t tf ln P(t|s)).

    Every log is floored to integer micro-units BEFORE any sum, so
    scores are order-independent integers and the DuckDB oracle matches
    bit-for-bit. The unseen-token default factors out: score(d, s) =
    prior_u[s] + n_d * def_u[s] + sum over (t in d, s saw t) of
    tf * (lp_u[s,t] - def_u[s]) — so the only large join carries the
    class-count rows that actually exist.

    Shuffles: class-conditional counts via per-batch combiners (one
    (source, token)-keyed groupby); ONE token-key hash partition joins
    doc term rows with class rows; integer combiner groupbys fold
    (doc, source) adjustment partials; per-doc argmax runs inside a
    doc_id hash partition with the S-sized prior/default vectors
    broadcast. Vocabulary is token-string-keyed here; at 10^9+ vocab
    the scale path is feature hashing (hash buckets as tokens), which
    changes no plumbing. Output (doc_id, pred_source, correct)."""
    import polars as pl

    docs_src = _docs(sf_dir, ["doc_id", "source"]).materialize()
    n_docs = docs_src.count()
    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("pred_source", pa.string()),
            pa.field("correct", pa.int64()),
        ]
    )
    if n_docs == 0:
        return rd.from_arrow(out_schema.empty_table())

    tf = _term_counts(canonical_docs(sf_dir)).materialize()
    cls = _class_token_counts(tf, docs_src)

    # small driver-side vectors: per-source token totals + doc priors
    tot = typed_pandas(
        cls.groupby("source").aggregate(Sum("cnt", alias_name="tot")),
        {"source": "object", "tot": "int64"},
    )
    vocab = _token_aggregate(tf, "df").count()
    pri = typed_pandas(
        docs_src.groupby("source").aggregate(Count(alias_name="nd")),
        {"source": "object", "nd": "int64"},
    )
    sources = sorted(tot["source"])
    tot_by_s = dict(zip(tot["source"], tot["tot"]))
    nd_by_s = dict(zip(pri["source"], pri["nd"]))
    import math

    def_u = {
        s: int(math.floor(
            math.log(1.0 / float(tot_by_s[s] + vocab)) * 1e6 + 0.5
        ))
        for s in sources
    }
    prior_u = {
        s: int(math.floor(
            math.log(float(nd_by_s[s]) / float(n_docs)) * 1e6 + 0.5
        ))
        for s in sources
    }
    const_ref = ray.put((sources, def_u, prior_u))

    # adjustment rows per existing class count: tf * (lp_u - def_u)
    def _adj_rows(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        cnts = batch["cnt"].to_pylist()
        _, d_u, _ = ray.get(const_ref)
        lut = ray.get(tot_ref)
        adj = [
            int(math.floor(
                math.log((c + 1.0) / float(lut[s] + vocab)) * 1e6 + 0.5
            )) - d_u[s]
            for s, c in zip(srcs, cnts)
        ]
        return pa.table(
            {
                "token": batch["token"],
                "source": batch["source"],
                "adj_u": pa.array(adj, pa.int64()),
            }
        )

    tot_ref = ray.put(tot_by_s)
    cls_adj = cls.map_batches(_adj_rows, batch_format="pyarrow")

    # token-key partitioned join: doc term rows x class adjustment rows
    _U_SCHEMA = pa.schema(
        [
            pa.field("token", pa.string()),
            pa.field("doc_id", pa.int64()),
            pa.field("tf", pa.int64()),
            pa.field("source", pa.string()),
            pa.field("adj_u", pa.int64()),
        ]
    )

    def _tag_doc(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "token": batch["token"],
                "doc_id": batch["doc_id"],
                "tf": batch["tf"],
                "source": pa.nulls(n, pa.string()),
                "adj_u": pa.nulls(n, pa.int64()),
            }
        )

    def _tag_cls(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "token": batch["token"],
                "doc_id": pa.nulls(n, pa.int64()),
                "tf": pa.nulls(n, pa.int64()),
                "source": batch["source"],
                "adj_u": batch["adj_u"],
            }
        )

    unioned = tf.map_batches(_tag_doc, batch_format="pyarrow").union(
        cls_adj.map_batches(_tag_cls, batch_format="pyarrow")
    )

    def _join_part(tb: pa.Table) -> pa.Table:
        df = pl.from_arrow(tb)
        doc_rows = df.filter(pl.col("doc_id").is_not_null()).select(
            ["token", "doc_id", "tf"]
        )
        cls_rows = df.filter(pl.col("doc_id").is_null()).select(
            ["token", "source", "adj_u"]
        )
        j = doc_rows.join(cls_rows, on="token")
        out = (
            j.group_by(["doc_id", "source"])
            .agg((pl.col("tf") * pl.col("adj_u")).sum().alias("a_p"))
        )
        return out.to_arrow().cast(
            pa.schema(
                [pa.field("doc_id", pa.int64()),
                 pa.field("source", pa.string()),
                 pa.field("a_p", pa.int64())]
            )
        )

    adj = (
        partitioned_group_map(unioned, "token", _join_part, arrow=True)
        .groupby(["doc_id", "source"])
        .aggregate(Sum("a_p", alias_name="a"))
    )

    # per-doc totals + true source, unioned with adjustments, argmax
    # inside a doc_id hash partition
    nd_tbl = tf.groupby("doc_id").aggregate(Sum("tf", alias_name="n_d"))
    _N_SCHEMA = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("n_d", pa.int64())]
    )
    nd_src = attach_lookup(
        nd_tbl, _N_SCHEMA, ["doc_id"], docs_src, "doc_id", "source",
        pa.string(), ["src_true"],
    )

    def _tag_nd(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": pa.nulls(n, pa.string()),
                "a": pa.nulls(n, pa.int64()),
                "n_d": batch["n_d"],
                "src_true": batch["src_true"],
            }
        )

    def _tag_adj(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "a": batch["a"],
                "n_d": pa.nulls(n, pa.int64()),
                "src_true": pa.nulls(n, pa.string()),
            }
        )

    final_in = nd_src.map_batches(_tag_nd, batch_format="pyarrow").union(
        adj.map_batches(_tag_adj, batch_format="pyarrow")
    )

    def _argmax_part(tb: pa.Table) -> pa.Table:
        srcs, d_u, p_u = ray.get(const_ref)
        s_index = {s: k for k, s in enumerate(srcs)}
        def_vec = np.array([d_u[s] for s in srcs], dtype=np.int64)
        pri_vec = np.array([p_u[s] for s in srcs], dtype=np.int64)
        df = pl.from_arrow(tb)
        base = df.filter(pl.col("n_d").is_not_null()).select(
            ["doc_id", "n_d", "src_true"]
        ).sort("doc_id")
        if base.height == 0:
            return out_schema.empty_table()
        ids = base["doc_id"].to_numpy()
        pos = {int(i): k for k, i in enumerate(ids)}
        # scores start at prior + n_d * default for every source
        scores = (
            pri_vec[None, :]
            + base["n_d"].to_numpy()[:, None] * def_vec[None, :]
        )
        arows = df.filter(pl.col("source").is_not_null())
        for i, s, a in zip(
            arows["doc_id"].to_numpy(),
            arows["source"].to_list(),
            arows["a"].to_numpy(),
        ):
            scores[pos[int(i)], s_index[s]] += int(a)
        # argmax with smallest-source tie-break: sources are sorted, and
        # np.argmax returns the first (lowest index) maximum
        best = np.argmax(scores, axis=1)
        pred = [srcs[k] for k in best]
        truth = base["src_true"].to_list()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_source": pa.array(pred, pa.string()),
                "correct": pa.array(
                    [int(p == t) for p, t in zip(pred, truth)], pa.int64()
                ),
            }
        )

    return partitioned_group_map(final_in, "doc_id", _argmax_part, arrow=True)


def source_kl_matrix(sf_dir: str) -> "rd.Dataset":
    """Pairwise KL divergence between source unigram distributions
    (Laplace-smoothed over the shared vocabulary): KL(a || b) for every
    ORDERED source pair — the distributional-redundancy view of the
    corpus mix (two sources with near-zero symmetric KL are candidates
    for down-sampling; the counterpart to `cross_source_dup_matrix`,
    which sees only verbatim near-dups).

    Exactness: each token's contribution p_a ln(p_a / p_b) is an
    identical IEEE sequence in engine and oracle, floored to 1e-12
    integer units BEFORE the sum, so the per-pair reduction is
    order-independent. Shuffles: the (source, token) class counts (one
    combiner groupby), then ONE token-key hash partition where each
    token's S-vector is assembled (zeros filled locally — a token lives
    wholly in its partition) and S^2 partial sums fold; only
    |partitions| x S^2 integer rows reach the final groupby. Output
    (source_a, source_b, kl) at 1e-6 rounding."""
    import polars as pl

    docs_src = _docs(sf_dir, ["doc_id", "source"]).materialize()
    out_schema = pa.schema(
        [
            pa.field("source_a", pa.string()),
            pa.field("source_b", pa.string()),
            pa.field("kl", pa.float64()),
        ]
    )
    if docs_src.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    tf = _term_counts(canonical_docs(sf_dir)).materialize()
    cls = _class_token_counts(tf, docs_src)

    tot = typed_pandas(
        cls.groupby("source").aggregate(Sum("cnt", alias_name="tot")),
        {"source": "object", "tot": "int64"},
    )
    vocab = _token_aggregate(tf, "df").count()
    sources = sorted(tot["source"])
    denom = {
        s: float(t + vocab) for s, t in zip(tot["source"], tot["tot"])
    }
    const_ref = ray.put((sources, denom))

    def _pair_partial(tb: pa.Table) -> pa.Table:
        srcs, den = ray.get(const_ref)
        s_index = {s: k for k, s in enumerate(srcs)}
        S = len(srcs)
        df = pl.from_arrow(tb)
        piv = df.pivot(
            values="cnt", index="token", on="source",
            aggregate_function="first",
        )
        n_tok = piv.height
        counts = np.zeros((n_tok, S), dtype=np.float64)
        for col in piv.columns:
            if col == "token":
                continue
            counts[:, s_index[col]] = (
                piv[col].fill_null(0).cast(pl.Int64).to_numpy()
            )
        den_vec = np.array([den[s] for s in srcs], dtype=np.float64)
        p = (counts + 1.0) / den_vec[None, :]  # (n_tok, S)
        # su[a, b] = sum_t floor(p[t,a] * ln(p[t,a]/p[t,b]) * 1e12 + .5)
        su = np.zeros((S, S), dtype=np.int64)
        for a in range(S):
            pa_col = p[:, a]
            terms = pa_col[:, None] * np.log(pa_col[:, None] / p)
            su[a, :] = np.floor(terms * 1e12 + 0.5).astype(np.int64).sum(
                axis=0
            )
        ai, bi = [k for k in range(S) for _ in range(S)], list(
            range(S)
        ) * S
        return pa.table(
            {
                "source_a": pa.array([srcs[k] for k in ai], pa.string()),
                "source_b": pa.array([srcs[k] for k in bi], pa.string()),
                "su": pa.array(su.reshape(-1), pa.int64()),
            }
        )

    parts = partitioned_group_map(cls, "token", _pair_partial, arrow=True)
    agg = parts.groupby(["source_a", "source_b"]).aggregate(
        Sum("su", alias_name="su")
    )

    def _final(batch: pa.Table) -> pa.Table:
        # self-pairs are exactly 0 by construction; keep the off-diagonal
        batch = batch.filter(
            pc.invert(pc.equal(batch["source_a"], batch["source_b"]))
        )
        su = np.asarray(batch["su"], dtype=np.float64)
        return pa.table(
            {
                "source_a": batch["source_a"],
                "source_b": batch["source_b"],
                "kl": pa.array(floor_round_np(su / 1e12), pa.float64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def source_diversity_stats(sf_dir: str) -> "rd.Dataset":
    """Per-source lexical-diversity rollup: token/bigram totals,
    distinct counts, and type-token ratios (distinct-1 / distinct-2 in
    the self-BLEU family of generation-diversity metrics) — the quick
    screen for template-heavy or looping sources before dedup even
    runs.

    Everything reduces through (source, gram)-keyed combiner groupbys
    (`_class_token_counts` over unigram and bigram triples); only
    S-sized tables reach the driver. Ratios are single int/int divides
    floor-rounded at 1e-6 (exact oracle); a bigram-free source reports
    ttr_2 = 0."""
    docs_src = _docs(sf_dir, ["doc_id", "source"]).materialize()
    out_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("n_tokens", pa.int64()),
            pa.field("distinct_tokens", pa.int64()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("distinct_bigrams", pa.int64()),
            pa.field("ttr_1", pa.float64()),
            pa.field("ttr_2", pa.float64()),
        ]
    )
    if docs_src.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    docs = canonical_docs(sf_dir)
    tf = _term_counts(docs).materialize()

    def _bg_as_tf(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "token": batch["pair"],
                "tf": batch["tf"],
            }
        )

    bg = (
        _bigram_counts(docs)
        .map_batches(_bg_as_tf, batch_format="pyarrow")
        .materialize()
    )

    def _per_source(cls: "rd.Dataset", dcol: str, ncol: str):
        from ray.data.aggregate import Count as _Count

        return typed_pandas(
            cls.groupby("source").aggregate(
                _Count(alias_name=dcol), Sum("cnt", alias_name=ncol)
            ),
            {"source": "object", dcol: "int64", ncol: "int64"},
        ).set_index("source")

    uni = _per_source(
        _class_token_counts(tf, docs_src), "distinct_tokens", "n_tokens"
    )
    big = _per_source(
        _class_token_counts(bg, docs_src), "distinct_bigrams", "n_bigrams"
    )
    out = uni.join(big, how="left").fillna(0).astype("int64").reset_index()
    n1 = out["n_tokens"].to_numpy(dtype=np.float64)
    d1 = out["distinct_tokens"].to_numpy(dtype=np.float64)
    n2 = out["n_bigrams"].to_numpy(dtype=np.float64)
    d2 = out["distinct_bigrams"].to_numpy(dtype=np.float64)
    out["ttr_1"] = floor_round_np(d1 / n1)  # every source has >= 1 token
    out["ttr_2"] = np.where(n2 > 0, floor_round_np(d2 / np.maximum(n2, 1)), 0.0)
    out = out[
        ["source", "n_tokens", "distinct_tokens", "n_bigrams",
         "distinct_bigrams", "ttr_1", "ttr_2"]
    ]
    return rd.from_arrow(
        pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)
    )


def zipf_profile_docs(sf_dir: str, n_top: int = 100) -> pd.DataFrame:
    """One-row corpus lexical profile: Zipf rank-frequency regression
    over the top-`n_top` tokens plus exact vocabulary scalars — the
    distribution check a curation run does before/after dedup to see
    whether duplicate removal flattened the head of the token
    distribution (cf. the reference's vocabulary analytics,
    dataset/analytics.py:61-81).

    Columns (all int64, division-free where a ratio would be lossy):
    n_top, total_tokens, distinct_tokens, hapax_count,
    top1_share_micro (= top1*1e6 // total), and the OLS slope of
    ln(count) on ln(rank) as an exact integer pair
    (zipf_num, zipf_den): slope = (N*Sxy - Sx*Sy) / (N*Sxx - Sx*Sx)
    over per-element micro-units x=floor(ln(rank)*1e6+0.5),
    y=floor(ln(count)*1e6+0.5) — transcendentals per element
    (math.log, bit-equal to DuckDB ln()), sums as exact ints.

    Scale shape: per-batch token-count combiner -> one token-keyed
    groupby; then the vocab table is reduced by per-batch combiners
    (scalar partials + per-batch top-k), so only O(blocks) rows and the
    <= n_top head ever reach the driver.
    """
    import math

    import polars as pl

    def _partial(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch.select(["canonical"]))
            .filter(pl.col("canonical") != "")
            .select(pl.col("canonical").str.split(" ").alias("token"))
            .explode("token")
            .group_by("token")
            .agg(pl.len().cast(pl.Int64).alias("n_partial"))
        )
        return out.to_arrow().cast(
            pa.schema([("token", pa.string()), ("n_partial", pa.int64())])
        )

    counts = (
        canonical_docs(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()  # reused: scalar partials + top-k combiner
    )

    def _scalars(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            # empty corpus: aggregate tail emits schemaless empty blocks
            return pa.table(
                {
                    "tt": pa.array([0], pa.int64()),
                    "dt": pa.array([0], pa.int64()),
                    "hx": pa.array([0], pa.int64()),
                }
            )
        n = np.asarray(batch["n"], dtype=np.int64)
        return pa.table(
            {
                "tt": pa.array([int(n.sum())], pa.int64()),
                "dt": pa.array([len(n)], pa.int64()),
                "hx": pa.array([int((n == 1).sum())], pa.int64()),
            }
        )

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return pa.schema(
                [("token", pa.string()), ("n", pa.int64())]
            ).empty_table()
        df = pl.from_arrow(batch.select(["token", "n"]))
        return (
            df.sort(["n", "token"], descending=[True, False])
            .head(n_top)
            .to_arrow()
            .cast(pa.schema([("token", pa.string()), ("n", pa.int64())]))
        )

    sc = counts.map_batches(_scalars, batch_format="pyarrow").to_pandas()
    total_tokens = int(sc["tt"].sum()) if "tt" in sc.columns else 0
    distinct_tokens = int(sc["dt"].sum()) if "dt" in sc.columns else 0
    hapax_count = int(sc["hx"].sum()) if "hx" in sc.columns else 0

    top = counts.map_batches(_topk, batch_format="pyarrow").to_pandas()
    if "n" not in top.columns:
        top = pd.DataFrame({"token": [], "n": []})
    top = (
        top.sort_values(["n", "token"], ascending=[False, True])
        .head(n_top)
        .reset_index(drop=True)
    )
    # exact integer regression on the driver (<= n_top rows)
    xs = [int(math.floor(math.log(i + 1) * 1_000_000 + 0.5)) for i in range(len(top))]
    ys = [
        int(math.floor(math.log(int(v)) * 1_000_000 + 0.5)) for v in top["n"]
    ]
    nn = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    top1 = int(top["n"].iloc[0]) if nn else 0
    out = pd.DataFrame(
        {
            "n_top": [nn],
            "total_tokens": [total_tokens],
            "distinct_tokens": [distinct_tokens],
            "hapax_count": [hapax_count],
            "top1_share_micro": [
                (top1 * 1_000_000) // total_tokens if total_tokens else 0
            ],
            "zipf_num": [nn * sxy - sx * sy],
            "zipf_den": [nn * sxx - sx * sx],
        }
    )
    return out.astype("int64")


# --- BPE vocabulary training --------------------------------------------------

BPE_SYM_SCHEMA = pa.schema(
    [("syms", pa.list_(pa.string())), ("freq", pa.int64())]
)
_BPE_PAIR_SCHEMA = pa.schema([("pair", pa.string()), ("c", pa.int64())])


def _flat_syms(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy-ish flatten of the `syms` list column: (flat symbol
    object array, per-word lengths)."""
    col = batch["syms"].combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(col.flatten().to_pylist(), dtype=object)
    return flat, lens


def _inner_mask(flat_len: int, lens: np.ndarray) -> np.ndarray:
    """True at positions whose right neighbor is in the same word."""
    inner = np.ones(flat_len, dtype=bool)
    if flat_len:
        inner[np.cumsum(lens) - 1] = False
    return inner


def _bpe_pair_top1(words: "rd.Dataset") -> pd.DataFrame:
    """Global (pair, count) argmax: per-batch combiner partials, one
    pair-keyed groupby, per-block top-1 combiner, tiny driver min."""
    import polars as pl

    def _partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_syms(batch)
        if len(flat) == 0:
            return _BPE_PAIR_SCHEMA.empty_table()
        freqs = np.asarray(batch["freq"], dtype=np.int64)
        inner = _inner_mask(len(flat), lens)
        sel = inner[:-1] if len(flat) > 1 else np.zeros(0, dtype=bool)
        left = flat[:-1][sel]
        right = flat[1:][sel]
        w = np.repeat(freqs, lens)[:-1][sel]
        if len(left) == 0:
            return _BPE_PAIR_SCHEMA.empty_table()
        df = (
            pl.DataFrame(
                {
                    "pair": pl.Series(left, dtype=pl.String)
                    + "\x00"
                    + pl.Series(right, dtype=pl.String),
                    "w": pl.Series(w),
                }
            )
            .group_by("pair")
            .agg(pl.col("w").sum().cast(pl.Int64).alias("c"))
        )
        return df.to_arrow().cast(_BPE_PAIR_SCHEMA)

    def _top1(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch)
            .sort(["n", "pair"], descending=[True, False])
            .head(1)
        )
        return out.to_arrow().cast(
            pa.schema([("pair", pa.string()), ("n", pa.int64())])
        )

    return (
        words.map_batches(_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("c", alias_name="n"))
        .map_batches(_top1, batch_format="pyarrow")
        .to_pandas()
    )


def _bpe_apply_merge(left_sym: str, right_sym: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) occurrences — the standard BPE apply, vectorized: in a
    run of consecutive candidate positions every other one merges."""

    def _apply(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_syms(batch)
        if len(flat) == 0:
            return batch.cast(BPE_SYM_SCHEMA)
        inner = _inner_mask(len(flat), lens)
        cand = np.zeros(len(flat), dtype=bool)
        if len(flat) > 1:
            cand[:-1] = inner[:-1] & (flat[:-1] == left_sym) & (flat[1:] == right_sym)
        if not cand.any():
            return batch.cast(BPE_SYM_SCHEMA)
        idx = np.flatnonzero(cand)
        run_start = np.ones(len(idx), dtype=bool)
        run_start[1:] = idx[1:] != idx[:-1] + 1
        run_id = np.cumsum(run_start) - 1
        run_first = idx[run_start][run_id]
        kept = idx[(idx - run_first) % 2 == 0]
        out_flat = flat.copy()
        out_flat[kept] = left_sym + right_sym
        drop = np.zeros(len(flat), dtype=bool)
        drop[kept + 1] = True
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        new_lens = lens - np.add.reduceat(drop.astype(np.int64), starts)
        kept_flat = out_flat[~drop]
        offs = np.concatenate(([0], np.cumsum(new_lens)))
        new_syms = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(kept_flat, pa.string())
        )
        return pa.table(
            {"syms": new_syms, "freq": batch["freq"]}
        ).cast(BPE_SYM_SCHEMA)

    return _apply


def bpe_train_merges(sf_dir: str, n_merges: int = 20) -> pd.DataFrame:
    """Distributed BPE vocabulary training (Sennrich et al. 2016,
    arXiv:1508.07909 §3.2 — the tokenizer-training step a corpus
    pipeline runs before tokenize-and-pack; gives the reference's gpt2
    chunker hook, dataset/chunker.py:15-54, a from-corpus vocabulary):
    learn the top-`n_merges` merges by iterated frequency-weighted
    adjacent-pair counting over character symbol sequences. Ties break
    to the lexicographically smaller pair, so the sequence is fully
    deterministic.

    Output (rank, left, right, merged, pair_count), one row per learned
    merge. NOT SQL-expressible (round t's pair counts depend on round
    t-1's list rewriting), so the driver records a rows-only check;
    exactness is pinned by tests/test_training.py::TestBpeTrainer
    against a sequential in-test reference.

    Scale shape: the only corpus-sized step is the word-count groupby
    (per-batch combiner). Every round then runs over the DISTINCT-WORD
    table — vocab-scale, orders of magnitude smaller than the corpus:
    one pair-count combiner aggregate whose per-block top-1 rows reach
    the driver, one 2-symbol broadcast, one vectorized rewrite pass.
    """
    import polars as pl

    def _words(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch.select(["canonical"]))
            .filter(pl.col("canonical") != "")
            .select(pl.col("canonical").str.split(" ").alias("w"))
            .explode("w")
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("n_partial"))
        )
        return out.to_arrow().cast(
            pa.schema([("w", pa.string()), ("n_partial", pa.int64())])
        )

    def _to_syms(batch: pa.Table) -> pa.Table:
        words_col = batch["w"].to_pylist()
        return pa.table(
            {
                "syms": pa.array([list(w) for w in words_col], pa.list_(pa.string())),
                "freq": batch["freq"].cast(pa.int64()),
            }
        ).cast(BPE_SYM_SCHEMA)

    words = (
        canonical_docs(sf_dir)
        .map_batches(_words, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n_partial", alias_name="freq"))
        .map_batches(_to_syms, batch_format="pyarrow")
        .materialize()
    )

    merges = []
    for rank in range(1, n_merges + 1):
        top = _bpe_pair_top1(words)
        if top.empty:
            break
        top = top.sort_values(["n", "pair"], ascending=[False, True])
        pair, n = str(top["pair"].iloc[0]), int(top["n"].iloc[0])
        left_sym, right_sym = pair.split("\x00", 1)
        merges.append(
            {
                "rank": rank,
                "left": left_sym,
                "right": right_sym,
                "merged": left_sym + right_sym,
                "pair_count": n,
            }
        )
        words = words.map_batches(
            _bpe_apply_merge(left_sym, right_sym), batch_format="pyarrow"
        ).materialize()
    out = pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_count"]
    )
    return out.astype({"rank": "int64", "pair_count": "int64"})


def source_quality_regression(sf_dir: str) -> "rd.Dataset":
    """Per-source OLS trend of quality on document length — the
    corpus-diagnostic regression a curation run uses to see whether a
    source's quality systematically rises or falls with length (e.g.
    boilerplate-heavy sources trend negative). One combiner aggregate:
    per-batch integer partial sums (n, Sx, Sy, Sxy, Sxx) per source,
    one source-keyed groupby, then the division-free OLS pair

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    with x = canonical length (chars), y = quality in exact 1e-6
    micro-units (the same floor-rounded score as quality_score_docs).
    All sums are int64; magnitudes stay under 2^63 for corpora below
    ~1e5 docs/source at 50k chars (the oracle runs at the sf0.01 gate).

    Output (source, n_docs, sum_len, sum_q_micro, slope_num, slope_den)
    — all int64, bit-exact against the DuckDB twin.
    """
    from ..functions.textstats import quality_scores
    from .documents import _docs as _docs_tbl

    def _canon(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "canonical", normalize_whitespace_array(batch["text"])
        ).drop_columns(["text"])

    def _partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        batch = quality_scores(batch)
        x = pc.utf8_length(batch["canonical"]).cast(pa.int64())
        y = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["quality"], 1_000_000.0), 0.5)),
            pa.int64(),
        )
        df = pl.DataFrame(
            {
                "source": pl.from_arrow(batch["source"].combine_chunks()),
                "x": pl.from_arrow(x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x),
                "y": pl.from_arrow(y.combine_chunks() if isinstance(y, pa.ChunkedArray) else y),
            }
        )
        out = df.group_by("source").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("x").sum().alias("sx"),
            pl.col("y").sum().alias("sy"),
            (pl.col("x") * pl.col("y")).sum().alias("sxy"),
            (pl.col("x") * pl.col("x")).sum().alias("sxx"),
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("source", pa.string()),
                    ("n", pa.int64()),
                    ("sx", pa.int64()),
                    ("sy", pa.int64()),
                    ("sxy", pa.int64()),
                    ("sxx", pa.int64()),
                ]
            )
        )

    agg = (
        _docs_tbl(sf_dir, ["source", "text"])
        .map_batches(_canon, batch_format="pyarrow")
        .map_batches(_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("sx", alias_name="sum_len"),
            Sum("sy", alias_name="sum_q_micro"),
            Sum("sxy", alias_name="t_sxy"),
            Sum("sxx", alias_name="t_sxx"),
        )
    )

    def _final(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_docs"], dtype=np.int64)
        sx = np.asarray(batch["sum_len"], dtype=np.int64)
        sy = np.asarray(batch["sum_q_micro"], dtype=np.int64)
        sxy = np.asarray(batch["t_sxy"], dtype=np.int64)
        sxx = np.asarray(batch["t_sxx"], dtype=np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(n, pa.int64()),
                "sum_len": pa.array(sx, pa.int64()),
                "sum_q_micro": pa.array(sy, pa.int64()),
                "slope_num": pa.array(n * sxy - sx * sy, pa.int64()),
                "slope_den": pa.array(n * sxx - sx * sx, pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def source_quality_audit(sf_dir: str) -> "rd.Dataset":
    """Per-source curation audit: how many documents each source
    contributes and how many pass the Gopher rules and the reference
    quality gate (>= 0.6) — the per-provider health dashboard a corpus
    team reviews before re-weighting sources.

    ONE stateless pass computes BOTH predicates per batch (shared
    canonicalization, the exact `gopher_stats_batch` /
    `quality_scores` kernels other queries oracle individually), and
    per-batch (source, counts) combiner partials feed a tiny groupby —
    zero joins, zero extra reads.
    Output (source, n_docs, n_gopher_pass, n_quality_pass)."""
    from ..pipelines.documents import quality_scores
    from ..text import normalize_whitespace_array

    def _audit(batch: pa.Table) -> pa.Table:
        import polars as pl

        canonical = normalize_whitespace_array(batch["text"])
        q = quality_scores(
            pa.table({"doc_id": batch["doc_id"], "canonical": canonical})
        )
        g = gopher_stats_batch(
            pa.table({"doc_id": batch["doc_id"], "text": batch["text"]})
        )
        df = pl.DataFrame(
            {
                "source": np.asarray(batch["source"]),
                "gopher": np.asarray(g["keep"], dtype=np.int64),
                "quality": (
                    np.asarray(q["quality"], dtype=np.float64) >= 0.6
                ).astype(np.int64),
            }
        )
        out = df.group_by("source").agg(
            pl.len().cast(pl.Int64).alias("n_docs"),
            pl.col("gopher").sum().alias("n_gopher_pass"),
            pl.col("quality").sum().alias("n_quality_pass"),
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("n_gopher_pass", pa.int64()),
                    ("n_quality_pass", pa.int64()),
                ]
            )
        )

    return (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(_audit, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_gopher_pass", alias_name="n_gopher_pass"),
            Sum("n_quality_pass", alias_name="n_quality_pass"),
        )
    )


#: top-N checkpoints for the vocabulary coverage curve
COVERAGE_NS = (100, 1000, 10000)


def vocab_coverage_curve(
    sf_dir: str, ns: tuple[int, ...] = COVERAGE_NS
) -> pd.DataFrame:
    """Vocabulary coverage curve: for each N, the fraction of corpus
    token MASS covered by the top-N tokens (count desc, token asc) —
    the question a tokenizer/vocab designer asks before fixing a vocab
    size, and the head-heaviness check that complements
    `zipf_profile_docs`'s slope with actual budget points.

    Output (n_top, covered_tokens, total_tokens), one row per N, all
    int64 — the coverage ratio is the caller's division, so the oracle
    comparison is exact. A vocab smaller than N yields full coverage.

    Scale shape: per-batch token-count combiner -> ONE token-keyed
    groupby (shuffle volume = distinct tokens per block); after the
    groupby every token appears exactly once globally, so per-block
    top-max(N) combiners contain the global top-N (same containment
    argument as `documents.top_terms`), and only O(blocks * maxN) rows
    plus two scalar partials per block reach the driver.
    """
    import polars as pl

    max_n = max(ns)

    def _partial(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch.select(["canonical"]))
            .filter(pl.col("canonical") != "")
            .select(pl.col("canonical").str.split(" ").alias("token"))
            .explode("token")
            .group_by("token")
            .agg(pl.len().cast(pl.Int64).alias("n_partial"))
        )
        return out.to_arrow().cast(
            pa.schema([("token", pa.string()), ("n_partial", pa.int64())])
        )

    counts = (
        canonical_docs(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()  # reused: total partials + top-k combiner
    )

    def _total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return pa.table({"tt": pa.array([0], pa.int64())})
        n = np.asarray(batch["n"], dtype=np.int64)
        return pa.table({"tt": pa.array([int(n.sum())], pa.int64())})

    def _topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return pa.schema(
                [("token", pa.string()), ("n", pa.int64())]
            ).empty_table()
        df = pl.from_arrow(batch.select(["token", "n"]))
        return (
            df.sort(["n", "token"], descending=[True, False])
            .head(max_n)
            .to_arrow()
            .cast(pa.schema([("token", pa.string()), ("n", pa.int64())]))
        )

    tt = counts.map_batches(_total, batch_format="pyarrow").to_pandas()
    total = int(tt["tt"].sum()) if "tt" in tt.columns else 0
    hd = counts.map_batches(_topk, batch_format="pyarrow").to_pandas()
    if "n" not in hd.columns:  # fully-empty corpus: 0-column frame
        hd = pd.DataFrame({"token": pd.Series(dtype="string"),
                           "n": pd.Series(dtype="int64")})
    head = (
        hd.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(max_n)
        .reset_index(drop=True)
    )
    cum = head["n"].cumsum()
    rows = []
    for n_top in sorted(ns):
        covered = int(cum.iloc[min(n_top, len(cum)) - 1]) if len(cum) else 0
        rows.append((n_top, covered, total))
    return pd.DataFrame(
        rows, columns=["n_top", "covered_tokens", "total_tokens"]
    ).astype("int64")


def coverage_oracle_sql(ns: tuple[int, ...] = COVERAGE_NS) -> str:
    """DuckDB twin of `vocab_coverage_curve` (same tokenization as
    top_terms; rank by count desc, token asc)."""
    from . import documents as _docs  # noqa: F401  (same _CANON contract)

    selects = "\n            UNION ALL\n".join(
        f"""            SELECT {n} AS n_top,
                   CAST(COALESCE(SUM(n) FILTER (rk <= {n}), 0) AS BIGINT)
                       AS covered_tokens,
                   CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total_tokens
            FROM ranked"""
        for n in sorted(ns)
    )
    return f"""
        WITH c AS (SELECT {{canon}} AS canonical FROM documents),
        w AS (SELECT unnest(string_split(canonical, ' ')) AS token FROM c
              WHERE canonical != ''),
        cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM w
                GROUP BY token),
        ranked AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk
            FROM cnt
        )
{selects}
    """
