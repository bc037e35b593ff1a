"""Incremental dedup: new batch vs. a historical seen-hashes corpus.

Reference analog: the production exact layer keeps an ever-growing
SQLite `hash_dedup` table probed per document
(`/root/reference/src/quarrycore/dedup/hash_db.py:136-176`). The
dataflow form: the historical state is a Parquet *seen-hashes* table;
new documents are anti-joined against it. The small-side summary
travels as a broadcast — exact hash set when it fits, Bloom filter
pre-filter + exact confirmation otherwise (semi/anti-join pattern,
SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import DedupConfig
from ..state.bloom import BloomFilter
from ..stages.exact import add_content_hash


def write_seen_hashes(conversations: "rd.Dataset", path: str) -> None:
    """Persist content hashes of a processed corpus (one shuffle-free pass)."""
    hashes = conversations.map_batches(add_content_hash, batch_format="pyarrow")
    hashes.select_columns(["content_hash"]).write_parquet(path)


def incremental_new_only(
    new_conversations: "rd.Dataset",
    seen_hashes_path: str,
    use_bloom: bool = False,
    confirm: str = "broadcast",
) -> "rd.Dataset":
    """Anti-join: rows of `new_conversations` whose canonical text hash
    is NOT in the historical table.

    `use_bloom=True` broadcasts a Bloom summary instead of the exact
    set — constant memory per worker; Bloom false positives would drop
    novel docs, so positives are confirmed against the exact set.
    `confirm` picks how:

    - "broadcast": confirm against a broadcast exact set (fine while
      the seen table fits the object store).
    - "partitioned" (requires use_bloom): the 100 TB shape — ONLY the
      constant-size Bloom blob is broadcast; the Bloom-positive
      minority is confirmed with a partitioned hash anti-join against
      the seen-hashes Dataset (stages/grouped.py:attach_lookup), so no
      worker ever holds the exact set.
    """
    if confirm == "partitioned":
        if not use_bloom:
            raise ValueError("confirm='partitioned' requires use_bloom=True")
        return _incremental_partitioned(new_conversations, seen_hashes_path)

    seen = pq.read_table(seen_hashes_path).column("content_hash").to_pylist()
    if use_bloom:
        bf = BloomFilter(capacity=max(len(seen), 1024))
        bf.add_many(seen)
        summary_ref = ray.put((bf.to_bytes(), set(seen)))
    else:
        summary_ref = ray.put((None, set(seen)))

    def _filter(batch: pa.Table) -> pa.Table:
        blob, exact = ray.get(summary_ref)
        hashes = batch["content_hash"].to_pylist()
        if blob is not None:
            bf_local = BloomFilter.from_bytes(blob, copy=False)
            maybe_seen = bf_local.contains_many(hashes)
            keep = [
                not (m and h in exact) for m, h in zip(maybe_seen, hashes)
            ]
        else:
            keep = [h not in exact for h in hashes]
        return batch.filter(pa.array(keep))

    return new_conversations.map_batches(add_content_hash, batch_format="pyarrow").map_batches(
        _filter, batch_format="pyarrow"
    )


def _incremental_partitioned(
    new_conversations: "rd.Dataset", seen_hashes_path: str
) -> "rd.Dataset":
    """Bloom pre-filter + partitioned anti-join confirmation.

    Definitely-new rows (Bloom negative) stream through untouched; only
    the Bloom-positive minority is shuffled against the seen table.
    """
    from ..stages.grouped import attach_lookup

    # the Bloom summary derives from the seen table in one streaming pass
    seen_ds = rd.read_parquet(seen_hashes_path)
    n_seen = seen_ds.count()
    bf = BloomFilter(capacity=max(n_seen, 1024))
    for b in seen_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        bf.add_many(b["content_hash"].to_pylist())
    blob_ref = ray.put(bf.to_bytes())

    hashed = new_conversations.map_batches(
        add_content_hash, batch_format="pyarrow"
    ).materialize()
    schema = hashed.schema().base_schema

    def _split(positive: bool):
        def _f(batch: pa.Table) -> pa.Table:
            bf_local = BloomFilter.from_bytes(ray.get(blob_ref), copy=False)
            maybe = bf_local.contains_many(batch["content_hash"].to_pylist())
            mask = maybe if positive else [not m for m in maybe]
            return batch.filter(pa.array(mask))

        return _f

    negatives = hashed.map_batches(_split(False), batch_format="pyarrow")
    positives = hashed.map_batches(_split(True), batch_format="pyarrow")

    def _mark(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": batch["content_hash"],
                "_seen": pa.array([1] * batch.num_rows, pa.int8()),
            }
        )

    confirmed = attach_lookup(
        positives, schema, ["content_hash"],
        seen_ds.map_batches(_mark, batch_format="pyarrow"),
        "content_hash", "_seen", pa.int8(), ["_seen"],
    )

    def _novel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_null(batch["_seen"])).drop_columns(["_seen"])

    return negatives.union(confirmed.map_batches(_novel, batch_format="pyarrow"))


# --- Incremental NEAR-duplicate detection vs a historical signature index ---
#
# The continuous-crawl shape of the north rule: a 100 TB corpus is
# processed in arriving batches, and each batch must be near-dedup'd
# against everything already accepted WITHOUT re-signaturing history.
# The historical state is a Parquet *signature index* (conv_id,
# minhash_sig, simhash, thr) written by `write_signature_index` — at
# 10^12-turn scale it is orders of magnitude smaller than the corpus
# (132 bytes/doc vs KBs of text) and streams through the same LSH band
# shuffle as the flagship. Reference analog: the ever-growing Redis
# MinHashLSH index probed per new document
# (`/root/reference/src/quarrycore/dedup/minhash_redis.py:204-255`),
# re-expressed as a two-sided band-bucket join instead of a shared
# mutable store.

_LEFT = "h|"  # historical-side id prefix ('h' sorts before 'n')
_RIGHT = "n|"


def _prefix_ids(tag: str):
    def _f(batch: pa.Table) -> pa.Table:
        col = pc.binary_join_element_wise(
            pa.scalar(tag), batch["conv_id"].cast(pa.string()), ""
        )
        return batch.set_column(
            batch.column_names.index("conv_id"), "conv_id", col
        )

    return _f


def write_signature_index(
    conversations: "rd.Dataset", path: str, config: DedupConfig | None = None
) -> None:
    """Persist the MinHash+SimHash signature index of a processed corpus.

    `conversations` are assembled docs (conv_id, canonical_text[, domain]).
    One streaming actor-pool pass; output columns (conv_id, minhash_sig,
    simhash, thr) — `thr` is the per-row domain verification threshold
    so future probes verify at the strictest of both sides' domains.
    """
    from ..stages.minhash_stage import MinHashSimHashStage

    cfg = config or DedupConfig()
    conc = cfg.resolved_minhash_concurrency()
    schema = conversations.schema()  # None when the corpus is empty
    if schema is None:
        rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "minhash_sig": pa.array([], pa.binary()),
                    "simhash": pa.array([], pa.int64()),
                    "thr": pa.array([], pa.float64()),
                }
            )
        ).write_parquet(path)
        return
    has_domain = "domain" in schema.names
    cols = ["conv_id", "canonical_text"] + (["domain"] if has_domain else [])
    sigs = conversations.select_columns(cols).map_batches(
        MinHashSimHashStage,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        # fixed pre-started pool (see config.sig_pool_size): the input
        # may be lazy so its row count is unknown — use the full
        # CPU-proportional size rather than an autoscale ramp
        concurrency=conc,
    )

    def _thr(batch: pa.Table) -> pa.Table:
        if "domain" in batch.column_names:
            thr = [cfg.threshold_for(d) for d in batch["domain"].to_pylist()]
        else:
            thr = [cfg.threshold] * batch.num_rows
        return batch.append_column("thr", pa.array(thr, pa.float64()))

    sigs.map_batches(_thr, batch_format="pyarrow").select_columns(
        ["conv_id", "minhash_sig", "simhash", "thr"]
    ).write_parquet(path)


@dataclass
class IncrementalNearDupResult:
    new_only: "rd.Dataset"  # new docs with no verified historical twin
    matches: "rd.Dataset"   # (hist_id, new_id, jaccard, hamming)


def incremental_near_dup(
    new_conversations: "rd.Dataset",
    index_path: str,
    config: DedupConfig | None = None,
    num_partitions: int | None = None,
) -> IncrementalNearDupResult:
    """Near-dup probe of a new batch against a historical signature index.

    Two-sided LSH: both sides band-explode into light (band_key, conv_id)
    rows (ids prefixed 'h|'/'n|' so sides never collide and split
    contiguously inside a sorted bucket), one hash shuffle co-buckets
    them, and only CROSS pairs are emitted (hist x new; skew-capped on
    the historical side — see `make_cross_pair_emitter`). Signatures are
    joined back via the partitioned attach and pairs are verified by the
    standard actor-pool predicate (sig-Jaccard >= max(thr) OR SimHash
    Hamming <= strict). New-batch-internal duplicates are out of scope —
    run the flagship `dedup_conversations` over the batch first, then
    probe its representatives here.

    Nothing is broadcast and nothing materializes on the driver: the
    index streams from Parquet, so the accepted-corpus state can grow
    without bound (the Redis-index scale cliff the reference hits).
    """
    from ..stages.grouped import attach_lookup, partitioned_group_map
    from ..stages.lsh import (
        BandExplode,
        attach_signatures,
        make_cross_pair_emitter,
    )
    from ..stages.minhash_stage import MinHashSimHashStage
    from ..stages.verify import PairVerifier

    cfg = config or DedupConfig()
    conc = cfg.resolved_minhash_concurrency()

    if new_conversations.schema() is None:  # empty probe batch
        empty_matches = rd.from_arrow(
            pa.table(
                {
                    "hist_id": pa.array([], pa.string()),
                    "new_id": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        )
        return IncrementalNearDupResult(
            new_only=new_conversations, matches=empty_matches
        )

    new_sigs = (
        new_conversations.select_columns(["conv_id", "canonical_text"])
        .map_batches(
            MinHashSimHashStage,
            fn_constructor_kwargs={"config": cfg},
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            concurrency=conc,
        )
        .drop_columns(["canonical_text"])
    )

    def _default_thr(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "thr", pa.array([cfg.threshold] * batch.num_rows, pa.float64())
        )

    new_sigs = (
        new_sigs.map_batches(_default_thr, batch_format="pyarrow")
        .map_batches(_prefix_ids(_RIGHT), batch_format="pyarrow")
        .materialize()  # feeds band explode + attach + anti-join
    )
    hist_sigs = rd.read_parquet(
        index_path, columns=["conv_id", "minhash_sig", "simhash", "thr"]
    ).map_batches(_prefix_ids(_LEFT), batch_format="pyarrow")

    sig_cols = ["conv_id", "minhash_sig"]
    banded = (
        hist_sigs.select_columns(sig_cols)
        .union(new_sigs.select_columns(sig_cols))
        .map_batches(BandExplode(cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
    )
    pairs = partitioned_group_map(
        banded, "band_key", make_cross_pair_emitter(cfg.bucket_cap, _LEFT),
        num_partitions, arrow=True,
    )
    # staged execution: the probe DAG unions three parquet re-reads
    # with three all-to-all exchanges; run one exchange per executor
    # stage (materialized barriers — pairs are light id-only rows, the
    # a-side attach spills if it must) so Ray's per-operator store
    # reservations never fall below a block under a small object store
    # (see attach_signatures docstring; 10x smoke livelocked otherwise)
    pairs = pairs.materialize()
    # the attach dedups (a_id, b_id) globally inside its a_id-keyed pass
    with_sigs = attach_signatures(
        pairs, hist_sigs.union(new_sigs), num_partitions, staged=True
    )
    verified = with_sigs.map_batches(
        PairVerifier,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.resolved_verify_concurrency(),
    )

    def _strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hist_id": pc.utf8_slice_codeunits(batch["a_id"], len(_LEFT)),
                "new_id": pc.utf8_slice_codeunits(batch["b_id"], len(_RIGHT)),
                "jaccard": batch["jaccard"],
                "hamming": batch["hamming"],
            }
        )

    matches = verified.map_batches(_strip, batch_format="pyarrow").materialize()

    # anti-semi-join: new docs with no verified match stream through a
    # partitioned lookup (no driver set, no broadcast of matched ids)
    new_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("minhash_sig", pa.binary()),
            ("simhash", pa.int64()),
            ("thr", pa.float64()),
        ]
    )

    def _unprefix(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("conv_id"),
            "conv_id",
            pc.utf8_slice_codeunits(batch["conv_id"], len(_RIGHT)),
        )

    flagged = attach_lookup(
        new_sigs, new_schema, ["conv_id"],
        matches.map_batches(
            lambda b: pa.table(
                {
                    "new_id": pc.binary_join_element_wise(
                        pa.scalar(_RIGHT), b["new_id"], ""
                    ),
                    "_dup": pa.array([1] * b.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        ),
        "new_id", "_dup", pa.int8(), ["_dup"],
        num_partitions,
    )

    def _novel(batch: pa.Table) -> pa.Table:
        keep = pc.is_null(batch["_dup"])
        return batch.filter(keep).drop_columns(["_dup", "minhash_sig", "simhash", "thr"])

    new_only = flagged.map_batches(_novel, batch_format="pyarrow").map_batches(
        _unprefix, batch_format="pyarrow"
    )
    return IncrementalNearDupResult(new_only=new_only, matches=matches)


# ---------------------------------------------------------------------------
# Corpus snapshot diff (versioned-ingest maintenance)
# ---------------------------------------------------------------------------

_DIFF_SCHEMA = pa.schema([("doc_id", pa.int64()), ("change", pa.string())])

#: deterministic version rules for the driver fixtures: docs with
#: doc_id % 17 == 3 are "added" after snapshot v1; docs with
#: doc_id % 19 == 4 are "removed" before snapshot v2; docs with
#: doc_id % 13 == 2 are edited in v2 (text + ' [edited]').
DIFF_ADD_MOD, DIFF_REM_MOD, DIFF_EDIT_MOD = (17, 3), (19, 4), (13, 2)


def _snapshot_versions(sf_dir: str) -> tuple["rd.Dataset", "rd.Dataset"]:
    """Derive the two deterministic snapshot versions of `documents`.

    At 100 TB these are two real Parquet snapshot directories; the
    fixtures derive both from the shipped table so the oracle can
    rebuild them in SQL (same modular rules) and compare TEXTS directly
    — proving the engine's hash-based comparison faithful."""
    import os

    import numpy as np

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    (am, ar), (rm, rr), (em, er) = DIFF_ADD_MOD, DIFF_REM_MOD, DIFF_EDIT_MOD

    def _v1(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return batch.filter(pa.array(ids % am != ar))

    def _v2(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        kept = batch.filter(pa.array(ids % rm != rr))
        ids2 = np.asarray(kept["doc_id"], dtype=np.int64)
        texts = kept["text"].to_pylist()
        edited = [
            (t or "") + " [edited]" if i % em == er else t
            for i, t in zip(ids2, texts)
        ]
        return pa.table(
            {"doc_id": kept["doc_id"], "text": pa.array(edited, pa.string())}
        )

    return (
        docs.map_batches(_v1, batch_format="pyarrow"),
        docs.map_batches(_v2, batch_format="pyarrow"),
    )


def snapshot_diff(old: "rd.Dataset", new: "rd.Dataset") -> "rd.Dataset":
    """Diff two corpus snapshots by content: (doc_id, change) with
    change in {'added', 'removed', 'changed'} — unchanged docs are
    dropped, so output size tracks the churn, not the corpus.

    Scale shape: each side is hashed per batch (sha256 of text — 64
    bytes/doc crosses the shuffle, never the payload), tagged, and
    unioned; ONE hash partition on doc_id classifies every doc with a
    vectorized polars pass. No broadcast (both sides are corpus-scale)
    and nothing driver-side. This is the maintenance pass an
    incremental ingest runs to decide what to re-embed / re-dedup."""
    from ..stages.grouped import partitioned_group_map
    from ..text import sha256_hex_array

    def _tag(side: str):
        def _f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "h": sha256_hex_array(batch["text"]),
                    "side": pa.array([side] * batch.num_rows, pa.string()),
                }
            )

        return _f

    tagged = old.map_batches(_tag("o"), batch_format="pyarrow").union(
        new.map_batches(_tag("n"), batch_format="pyarrow")
    )

    def _classify(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(tb)
            .group_by("doc_id")
            .agg(
                pl.col("h").filter(pl.col("side") == "o").first().alias("ho"),
                pl.col("h").filter(pl.col("side") == "n").first().alias("hn"),
            )
            .with_columns(
                pl.when(pl.col("ho").is_null())
                .then(pl.lit("added"))
                .when(pl.col("hn").is_null())
                .then(pl.lit("removed"))
                .when(pl.col("ho") != pl.col("hn"))
                .then(pl.lit("changed"))
                .otherwise(pl.lit(""))
                .alias("change")
            )
            .filter(pl.col("change") != "")
            .select(["doc_id", "change"])
        )
        return df.to_arrow().cast(_DIFF_SCHEMA)

    return partitioned_group_map(tagged, "doc_id", _classify, arrow=True)


def corpus_snapshot_diff(sf_dir: str) -> "rd.Dataset":
    """Driver query: diff the two deterministic snapshot versions."""
    v1, v2 = _snapshot_versions(sf_dir)
    return snapshot_diff(v1, v2)


def snapshot_diff_oracle_sql() -> str:
    """DuckDB twin: rebuilds both versions with the same modular rules
    and FULL OUTER JOINs them comparing texts directly."""
    (am, ar), (rm, rr), (em, er) = DIFF_ADD_MOD, DIFF_REM_MOD, DIFF_EDIT_MOD
    return f"""
        WITH v1 AS (
            SELECT doc_id, text FROM documents WHERE doc_id % {am} != {ar}
        ),
        v2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {em} = {er}
                        THEN COALESCE(text, '') || ' [edited]'
                        ELSE text END AS text
            FROM documents WHERE doc_id % {rm} != {rr}
        )
        SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS change
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL
           OR COALESCE(v1.text, '') != COALESCE(v2.text, '')
    """


#: top-K drifted terms reported by `snapshot_vocab_drift`
VOCAB_DRIFT_K = 50

_DRIFT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("cnt_v1", pa.int64()),
        ("cnt_v2", pa.int64()),
        ("delta", pa.int64()),
    ]
)


def snapshot_vocab_drift(sf_dir: str, k: int = VOCAB_DRIFT_K) -> "pd.DataFrame":
    """Token-frequency drift between the two snapshot versions: the
    top-`k` terms by |count_v2 - count_v1| — the distribution-shift
    monitor an ingest pipeline runs before retraining decisions.

    Tokens are `\\S+` runs (no case folding — locale-free, identical in
    the SQL twin). Scale shape: per-batch polars token counts act as
    the combiner (only (term, partial-count) rows cross the wire), ONE
    hash partition on term sums both versions and keeps its local
    top-`k`; the driver merges `partitions x k` rows. The (delta DESC,
    term ASC) order is total, so the boundary of the top-`k` is
    deterministic on both sides."""
    import pandas as pd
    import polars as pl

    from ..stages.grouped import partitioned_group_map

    v1, v2 = _snapshot_versions(sf_dir)

    def _cnt(side: int):
        def _f(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["text"]))
            g = (
                df.select(
                    pl.col("text").fill_null("").str.extract_all(r"\S+").alias("t")
                )
                .explode("t")
                .drop_nulls()
                .group_by("t")
                .agg(pl.len().cast(pl.Int64).alias("c"))
            )
            zero = pl.lit(0, dtype=pl.Int64)
            g = g.select(
                pl.col("t").alias("term"),
                (pl.col("c") if side == 1 else zero).alias("cnt_v1"),
                (pl.col("c") if side == 2 else zero).alias("cnt_v2"),
            )
            return g.to_arrow().cast(
                pa.schema(
                    [
                        ("term", pa.string()),
                        ("cnt_v1", pa.int64()),
                        ("cnt_v2", pa.int64()),
                    ]
                )
            )

        return _f

    tagged = v1.map_batches(_cnt(1), batch_format="pyarrow").union(
        v2.map_batches(_cnt(2), batch_format="pyarrow")
    )

    def _topk(tb: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(tb)
            .group_by("term")
            .agg(pl.col("cnt_v1").sum(), pl.col("cnt_v2").sum())
            .with_columns(
                (pl.col("cnt_v2") - pl.col("cnt_v1")).abs().alias("delta")
            )
            .filter(pl.col("delta") > 0)
            .sort(["delta", "term"], descending=[True, False])
            .head(k)
        )
        return out.to_arrow().cast(_DRIFT_SCHEMA)

    parts = partitioned_group_map(tagged, "term", _topk, arrow=True).to_pandas()
    if parts.empty:  # zero-row corpus: blocks never reach _topk
        return _DRIFT_SCHEMA.empty_table().to_pandas()
    return (
        parts.sort_values(["delta", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def vocab_drift_oracle_sql(k: int = VOCAB_DRIFT_K) -> str:
    """DuckDB twin of `snapshot_vocab_drift` (same versions, same
    tokenization, same total order at the top-k boundary)."""
    (am, ar), (rm, rr), (em, er) = DIFF_ADD_MOD, DIFF_REM_MOD, DIFF_EDIT_MOD
    return f"""
        WITH v1 AS (
            SELECT doc_id, text FROM documents WHERE doc_id % {am} != {ar}
        ),
        v2 AS (
            SELECT doc_id,
                   CASE WHEN doc_id % {em} = {er}
                        THEN COALESCE(text, '') || ' [edited]'
                        ELSE text END AS text
            FROM documents WHERE doc_id % {rm} != {rr}
        ),
        t1 AS MATERIALIZED (
            SELECT u.t AS term, COUNT(*) AS c
            FROM v1, unnest(list_filter(
                string_split_regex(COALESCE(v1.text, ''), '\\s+'),
                x -> x != '')) AS u(t)
            GROUP BY u.t
        ),
        t2 AS MATERIALIZED (
            SELECT u.t AS term, COUNT(*) AS c
            FROM v2, unnest(list_filter(
                string_split_regex(COALESCE(v2.text, ''), '\\s+'),
                x -> x != '')) AS u(t)
            GROUP BY u.t
        ),
        j AS (
            SELECT COALESCE(t1.term, t2.term) AS term,
                   COALESCE(t1.c, 0) AS c1, COALESCE(t2.c, 0) AS c2
            FROM t1 FULL OUTER JOIN t2 ON t1.term = t2.term
        )
        SELECT term,
               CAST(c1 AS BIGINT) AS cnt_v1,
               CAST(c2 AS BIGINT) AS cnt_v2,
               CAST(abs(c2 - c1) AS BIGINT) AS delta
        FROM j
        WHERE c1 != c2
        ORDER BY delta DESC, term
        LIMIT {k}
    """
