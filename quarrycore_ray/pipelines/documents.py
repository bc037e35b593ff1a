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

from ..config import DedupConfig, fixed_probe_pool
from ..exactmath import floor_round, floor_round_np
from ..functions.textstats import (
    LangIdStage,
    add_fingerprint,
    add_regex_token_count,
    add_token_counts,
    quality_scores,
)
from ..sources.io import typed_pandas
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
    semantics, dedup/hash_db.py) — (doc_id, canonical).

    Scale shape (stages/exact.py): hash FIRST so the shuffle key is a
    64-char digest rather than the document text itself, then one
    vectorized polars pass per coarse hash partition — no per-group
    Python dispatch. The text rides along as payload, never as key.
    """
    from ..stages.grouped import partitioned_group_map
    from ..text import sha256_hex_array

    def _hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "content_hash", sha256_hex_array(batch["canonical"])
        )

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["content_hash", "doc_id"])
            .unique(["content_hash"], keep="first", maintain_order=True)
            .select(["doc_id", "canonical"])
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("canonical", pa.string())])
        )

    hashed = canonical_docs(sf_dir).map_batches(_hash, batch_format="pyarrow")
    return partitioned_group_map(hashed, "content_hash", _part, arrow=True)


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


def dedup_cluster_size_hist(sf_dir: str) -> "rd.Dataset":
    """Cluster-size distribution of the flagship dedup — the standard
    post-dedup diagnostic (how much mass sits in giant near-dup
    clusters vs singletons; the reference logs the analogous duplicate
    counts per level, `deduplicator/deduplicator.py` stats).

    Two partial-agg groupbys over the clusters table (already tiny
    relative to the corpus) — no new shuffle over raw text. All-integer
    output (size, n_clusters); the oracle reruns the full generated
    SHA-1 dedup SQL and aggregates identically."""
    clusters = minhash_dedup_docs(sf_dir)
    sizes = clusters.groupby("cluster_id").aggregate(
        Count(alias_name="size")
    )
    hist = sizes.groupby("size").aggregate(Count(alias_name="n_clusters"))
    return rd.from_pandas(
        typed_pandas(hist, {"size": "int64", "n_clusters": "int64"})
    )


def dedup_rate_by_source(sf_dir: str) -> "rd.Dataset":
    """Per-source dedup lineage: documents in, cluster representatives
    kept, duplicates removed — the per-partition lineage rollup of the
    north rule projected onto the `source` column (which source feeds
    the most duplicate mass is the first question a 100 TB curation run
    asks of its dedup stage).

    The source attach is a broadcast lookup (documents' doc_id->source
    at driver scale; `attach_lookup` auto-switches to the partitioned
    join above 1M rows). All-integer (n_docs = n_kept + n_removed)."""
    from ..stages.grouped import attach_lookup

    clusters = minhash_dedup_docs(sf_dir)

    def _doc_ids(batch: pa.Table) -> pa.Table:
        # conv_id is 'doc-XXXXXXXX' (pipelines/documents
        # ._docs_as_conversations)
        did = pc.cast(
            pc.utf8_slice_codeunits(batch["conv_id"], 4, 64), pa.int64()
        )
        kept = pc.cast(
            pc.equal(batch["conv_id"], batch["cluster_id"]), pa.int64()
        )
        return pa.table({"doc_id": did, "kept": kept})

    flat = clusters.map_batches(_doc_ids, batch_format="pyarrow")
    flat_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("kept", pa.int64())]
    )
    with_src = attach_lookup(
        flat,
        flat_schema,
        ["doc_id"],
        _docs(sf_dir, ["doc_id", "source"]),
        "doc_id",
        "source",
        pa.string(),
        ["source"],
    )
    agg = with_src.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("kept", alias_name="n_kept")
    )
    out = typed_pandas(
        agg, {"source": "object", "n_docs": "int64", "n_kept": "int64"}
    )
    out["n_removed"] = out["n_docs"] - out["n_kept"]
    return rd.from_pandas(out)


def cross_source_dup_matrix(sf_dir: str) -> "rd.Dataset":
    """Cross-source near-duplicate contamination matrix: for every
    unordered source pair (a < b), the number of flagship dedup
    clusters containing at least one document from EACH — the
    source-mixing / train-test-leakage diagnostic a multi-source
    corpus runs right after dedup (exact-text overlap is zero on this
    corpus; near-dup clusters are where cross-source contamination
    actually shows up).

    Shuffles: the source attach (broadcast at lookup scale), then one
    hash partition on cluster_id where the per-cluster distinct-source
    pair explosion happens vectorized (polars self-join within the
    partition — each cluster is wholly local), then an integer combiner
    groupby on the ~|sources|^2 pair table. All-integer output
    (source_a, source_b, n_clusters)."""
    import polars as pl

    from ..stages.grouped import attach_lookup, partitioned_group_map

    clusters = minhash_dedup_docs(sf_dir)

    def _doc_ids(batch: pa.Table) -> pa.Table:
        did = pc.cast(
            pc.utf8_slice_codeunits(batch["conv_id"], 4, 64), pa.int64()
        )
        return pa.table(
            {"doc_id": did, "cluster_id": batch["cluster_id"]}
        )

    flat = clusters.map_batches(_doc_ids, batch_format="pyarrow")
    flat_schema = pa.schema(
        [pa.field("doc_id", pa.int64()),
         pa.field("cluster_id", pa.string())]
    )
    with_src = attach_lookup(
        flat,
        flat_schema,
        ["doc_id"],
        _docs(sf_dir, ["doc_id", "source"]),
        "doc_id",
        "source",
        pa.string(),
        ["source"],
    )

    def _pairs(tb: pa.Table) -> pa.Table:
        u = (
            pl.from_arrow(tb)
            .select("cluster_id", "source")
            .unique()
        )
        pairs = (
            u.join(u, on="cluster_id", suffix="_b")
            .filter(pl.col("source") < pl.col("source_b"))
            .group_by(["source", "source_b"])
            .len()
            .rename({"source": "source_a", "source_b": "source_b",
                     "len": "n_p"})
        )
        return pairs.to_arrow().cast(
            pa.schema(
                [pa.field("source_a", pa.string()),
                 pa.field("source_b", pa.string()),
                 pa.field("n_p", pa.int64())]
            )
        )

    parts = partitioned_group_map(
        with_src.select_columns(["cluster_id", "source"]),
        "cluster_id",
        _pairs,
        arrow=True,
    )
    agg = parts.groupby(["source_a", "source_b"]).aggregate(
        Sum("n_p", alias_name="n_clusters")
    )
    return rd.from_pandas(
        typed_pandas(
            agg,
            {"source_a": "object", "source_b": "object",
             "n_clusters": "int64"},
        )
    )


SWEEP_THRESHOLDS = (0.75, 0.8, 0.85, 0.9, 0.95)


def dedup_threshold_sweep(
    sf_dir: str, thresholds: tuple = SWEEP_THRESHOLDS
) -> "rd.Dataset":
    """Threshold-sensitivity sweep for the flagship dedup: how many
    edges and clusters each candidate verification threshold would
    produce — the tuning curve an operator reads before committing a
    100 TB dedup run to one threshold.

    Signatures, banding and candidate generation run ONCE (the banding
    plan stays pinned to the production 0.85 via
    `DedupConfig.band_threshold`); the verifier emits every candidate
    with its Jaccard estimate (threshold 0, Hamming clause disabled),
    and each sweep point is a driver-side filter + union-find over the
    small candidate-pair table (the same O(duplicate-pairs) fast path
    as the flagship; the label-propagation path applies unchanged if a
    corpus ever makes candidates driver-hostile). Edges here are
    est-only — the flagship's Hamming rescue clause is intentionally
    excluded so the sweep isolates one variable. Output per threshold:
    (threshold, n_candidates, n_edges, n_clusters)."""
    from ..stages.cluster import driver_union_find
    from ..stages.exact import exact_dedup
    from ..stages.lsh import candidate_pairs
    from ..stages.minhash_stage import MinHashSimHashStage
    from ..stages.verify import PairVerifier

    cfg = DedupConfig(threshold=0.0, strict_hamming=-1, band_threshold=0.85)
    out_schema = pa.schema(
        [
            pa.field("threshold", pa.float64()),
            pa.field("n_candidates", pa.int64()),
            pa.field("n_edges", pa.int64()),
            pa.field("n_clusters", pa.int64()),
        ]
    )
    reps = exact_dedup(_docs_as_conversations(sf_dir)).materialize()
    n_reps = reps.count()
    if n_reps == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "threshold": pa.array(
                        [float(t) for t in thresholds], pa.float64()
                    ),
                    "n_candidates": pa.array([0] * len(thresholds)),
                    "n_edges": pa.array([0] * len(thresholds)),
                    "n_clusters": pa.array([0] * len(thresholds)),
                }
            ).cast(out_schema)
        )

    mh_conc = cfg.resolved_minhash_concurrency()
    sig_input = reps.select_columns(
        ["conv_id", "canonical_text"]
    ).repartition(mh_conc * 4)
    with_sigs = sig_input.map_batches(
        MinHashSimHashStage,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        # fixed pool sized to the known rep count (config.sig_pool_size)
        concurrency=cfg.sig_pool_size(n_reps),
    )
    est = (
        candidate_pairs(with_sigs.drop_columns(["canonical_text"]), cfg)
        .map_batches(
            PairVerifier,
            fn_constructor_kwargs={"config": cfg},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.resolved_verify_concurrency(),
        )
        .materialize()
    )
    df = typed_pandas(
        est.select_columns(["a_id", "b_id", "jaccard"]),
        {"a_id": "object", "b_id": "object", "jaccard": "float64"},
    )
    rows = []
    for t in thresholds:
        sel = df[df["jaccard"] >= float(t)]
        assign = driver_union_find(list(zip(sel["a_id"], sel["b_id"])))
        merged = len(assign) - len(set(assign.values()))
        rows.append(
            (float(t), len(df), len(sel), int(n_reps - merged))
        )
    return rd.from_arrow(
        pa.table(
            {
                "threshold": pa.array([r[0] for r in rows], pa.float64()),
                "n_candidates": pa.array(
                    [r[1] for r in rows], pa.int64()
                ),
                "n_edges": pa.array([r[2] for r in rows], pa.int64()),
                "n_clusters": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


def cluster_rep_by_quality(sf_dir: str) -> "rd.Dataset":
    """Quality-aware representative selection: per flagship-dedup
    cluster, keep the member with the highest composite quality score
    (tie: smallest doc_id) instead of the min-id default — "keep the
    best copy, not the first copy", composing the dedup and quality
    operators on one table (the reference scores quality and dedups in
    the same pipeline pass; this is the policy their combination
    enables).

    Quality scores attach by broadcast/partitioned lookup; the argmax
    runs vectorized inside a cluster_id hash partition (each cluster is
    wholly local). Output (cluster_id, rep_doc_id, quality, n_members);
    quality is already 1e-6-floor-rounded by the scorer, so the oracle
    comparison stays exact."""
    import polars as pl

    from ..stages.grouped import attach_lookup, partitioned_group_map

    clusters = minhash_dedup_docs(sf_dir)

    def _doc_ids(batch: pa.Table) -> pa.Table:
        did = pc.cast(
            pc.utf8_slice_codeunits(batch["conv_id"], 4, 64), pa.int64()
        )
        return pa.table(
            {"doc_id": did, "cluster_id": batch["cluster_id"]}
        )

    flat = clusters.map_batches(_doc_ids, batch_format="pyarrow")
    flat_schema = pa.schema(
        [pa.field("doc_id", pa.int64()),
         pa.field("cluster_id", pa.string())]
    )
    q = quality_score_docs(sf_dir).select_columns(["doc_id", "quality"])
    with_q = attach_lookup(
        flat, flat_schema, ["doc_id"], q, "doc_id", "quality",
        pa.float64(), ["quality"],
    )

    def _best(tb: pa.Table) -> pa.Table:
        df = pl.from_arrow(tb)
        out = (
            df.sort(["cluster_id", "quality", "doc_id"],
                    descending=[False, True, False])
            .group_by("cluster_id", maintain_order=True)
            .agg(
                pl.col("doc_id").first().alias("rep_doc_id"),
                pl.col("quality").first().alias("quality"),
                pl.len().cast(pl.Int64).alias("n_members"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [pa.field("cluster_id", pa.string()),
                 pa.field("rep_doc_id", pa.int64()),
                 pa.field("quality", pa.float64()),
                 pa.field("n_members", pa.int64())]
            )
        )

    return partitioned_group_map(with_q, "cluster_id", _best, arrow=True)


def html_pages(sf_dir: str) -> "rd.Dataset":
    """(doc_id, html): each document wrapped in a deterministic page
    template with REAL boilerplate (nav, breadcrumbs, ad block, footer).
    The synthetic-HTML source shared by the extraction-cascade query
    and the composed HTML->curate->dedup pipeline
    (curation.html_curate_dedup_docs)."""

    def _page(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        pages = [
            (
                f"<html><head><title>doc {i}</title>"
                "<style>.x{color:red}</style></head><body>"
                "<header><nav><a href='/'>Home</a> <a href='/a'>About</a>"
                " <a href='/c'>Contact</a></nav></header>"
                "<div class='breadcrumb'><a href='/'>Home</a> &gt; Docs</div>"
                f"<main><p>{t}</p></main>"
                "<div class='ad-break'>Subscribe to our newsletter now!</div>"
                "<footer><p>Copyright 2026 Example Inc. All rights "
                "reserved.</p></footer></body></html>"
            )
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "html": pa.array(pages, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _page, batch_format="pyarrow"
    )


def extract_html_docs(sf_dir: str) -> "rd.Dataset":
    """Extraction-cascade driver query: wrap each document in the
    deterministic boilerplate page template (`html_pages`) and run the
    full cascade (stages/extract.py). The DOM-tree strategy must win
    and strip every planted boilerplate fragment, leaving exactly the
    document's normalized text — which makes the result SQL-expressible:
    the oracle asserts extractor/title/reject_reason AND the recovered
    text against the canonical column (documents contain no [&<>], so
    entity decoding is the identity; pinned by the sqlgen precondition
    tests)."""
    from ..stages.extract import extract_html

    return extract_html(html_pages(sf_dir)).select_columns(
        ["doc_id", "text", "title", "extractor", "reject_reason"]
    )


def extract_metadata_docs(sf_dir: str) -> "rd.Dataset":
    """Metadata extraction (OG/Twitter/author/date,
    functions/metadata.py; reference metadata_extractor.py:152-592)
    exact-checked: deterministic pages carry meta tags derived from doc
    columns — alternating attribute order (name-first vs content-first)
    by doc parity so BOTH regex directions are exercised — and the
    oracle recomputes every field arithmetically."""
    from ..functions.metadata import metadata_stage

    def _page(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        pages = []
        for i, s in zip(ids, srcs):
            day = 1 + i % 28
            if i % 2 == 0:
                metas = (
                    f"<meta property='og:title' content='Doc {i} from {s}'>"
                    f"<meta name='description' content='{s} document {i}'>"
                    f"<meta property='og:image' content='https://img.example/{i}.png'>"
                    f"<meta name='twitter:card' content='summary'>"
                    f"<meta name='author' content='author-{i % 7}'>"
                )
            else:  # content-first attribute order
                metas = (
                    f"<meta content='Doc {i} from {s}' property='og:title'>"
                    f"<meta content='{s} document {i}' name='description'>"
                    f"<meta content='https://img.example/{i}.png' property='og:image'>"
                    f"<meta content='summary' name='twitter:card'>"
                    f"<meta content='author-{i % 7}' name='author'>"
                )
            pages.append(
                f"<html><head><title>Doc {i}</title>{metas}</head>"
                f"<body><span>published 2026-01-{day:02d}</span></body></html>"
            )
        return pa.table(
            {"doc_id": batch["doc_id"], "html": pa.array(pages, pa.string())}
        )

    return metadata_stage(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            _page, batch_format="pyarrow"
        )
    ).drop_columns(["html"])


def audio_decode_stats(sf_dir: str) -> "rd.Dataset":
    """WAV decode through the REAL stdlib-wave codec, exact-checked:
    each document becomes a deterministic int16 ramp WAV
    (samples ((doc_id + i) % 256) - 128, n = 64 + doc_id % 32,
    sample_rate 8000), DecodeAudioStage decodes it, and the oracle
    recomputes n_samples/duration/rms arithmetically — the sum of
    squares is integer-exact on both sides and sqrt/divide are
    correctly-rounded IEEE ops, so the float compare is exact.
    Output: (doc_id, sample_rate, n_samples, duration_s, rms)."""
    from ..exactmath import floor_round
    from ..multimodal import DecodeAudioStage, encode_wav

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            n = 64 + d % 32
            samples = ((np.arange(n, dtype=np.int64) + d) % 256 - 128).astype(
                np.int16
            )
            out.append(encode_wav(samples, sample_rate=8000))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sample_rate": pc.cast(batch["sample_rate"], pa.int64()),
                "n_samples": batch["n_samples"],
                "duration_s": floor_round(batch["duration_s"], 6),
                "rms": floor_round(batch["rms"], 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            DecodeAudioStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=fixed_probe_pool(),
        )
        .map_batches(_round, batch_format="pyarrow")
    )


def video_frame_stats(sf_dir: str) -> "rd.Dataset":
    """Video frame-sampling through the REAL from-spec YUV4MPEG2
    parser, exact-checked: each document becomes a deterministic Y4M
    stream (`multimodal.encode_y4m` — C420jpeg when dims are even,
    Cmono otherwise, so both plane layouts are exercised across the
    corpus), FrameSampleStage parses the container and emits every 2nd
    frame's luma plane as an image payload, DecodeImageStage computes
    per-frame stats, and the oracle recomputes them arithmetically.
    Luma pixel (f, i) of doc d = (d + f * 7 + i) % 256 over a
    (8 + d%4) x (6 + d%3) raster, n_frames = 3 + d % 4.
    Output: (doc_id, frame_idx, width, height, mean_intensity)."""
    from ..exactmath import floor_round
    from ..multimodal import DecodeImageStage, FrameSampleStage, encode_y4m

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w, h = 8 + d % 4, 6 + d % 3
            nf = 3 + d % 4
            i = np.arange(w * h, dtype=np.int64)
            f = np.arange(nf, dtype=np.int64)[:, None]
            frames = ((d + f * 7 + i) % 256).astype(np.uint8).reshape(nf, h, w)
            out.append(encode_y4m(frames))
        return pa.table(
            {
                "media_id": pc.cast(batch["doc_id"], pa.int64()),
                "payload": pa.array(out, pa.binary()),
            }
        )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
                "mean_intensity": floor_round(batch["mean_intensity"], 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"every": 2},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=fixed_probe_pool(),
        )
        .map_batches(
            DecodeImageStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=fixed_probe_pool(),
        )
        .map_batches(_round, batch_format="pyarrow")
    )


HOTBAND_VARIANTS = 150


def dedup_docs_hotband(sf_dir: str) -> "rd.Dataset":
    """Flagship dedup with the SKEW CAP GENUINELY BINDING, exact-checked:
    150 suffix variants of document 0 are planted (appending ' v{k}'
    only ADDS shingles, so the variants keep most 16-slot band slices
    identical and pile >64 members into hot LSH buckets — at sf0.01 the
    cap drops >30k of the naive pairs, visible in lineage). The engine's
    capped pair generation + bridge links must still produce the SAME
    connected components as the oracle's uncapped full transitive
    closure — the north-rule skew-splitting connectivity guarantee,
    verified bit-for-bit by the driver gate (the SQL side knows nothing
    about the cap). tests/test_dedup_pipeline.py asserts via lineage
    that the cap actually binds on this input, so this query cannot
    silently degrade into a no-skew case."""
    import pyarrow.parquet as _pq

    from ..text import normalize_whitespace

    tb = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    seed_texts = tb.filter(pc.equal(tb["doc_id"], pa.scalar(0)))["text"].to_pylist()
    rows = (
        [
            (f"hot-{k:04d}", f"{normalize_whitespace(seed_texts[0])} v{k}")
            for k in range(HOTBAND_VARIANTS)
        ]
        if seed_texts  # empty corpus: nothing to plant a hot band on
        else []
    )
    vt = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "canonical_text": pa.array([r[1] for r in rows], pa.string()),
            "n_turns": pa.array(np.ones(len(rows), dtype=np.int32)),
        }
    )
    convs = _docs_as_conversations(sf_dir).union(rd.from_arrow(vt))
    return dedup_conversations(convs).clusters


def dedup_docs_domain_thresholds(sf_dir: str) -> "rd.Dataset":
    """Flagship dedup with PER-DOMAIN verification thresholds, end to
    end from raw content: documents -> DomainClassifyStage (inferred
    DomainType, functions/domains.py) -> dedup_conversations, where the
    pair verifier applies greatest(thr_a, thr_b) from
    config.domain_minhash_thresholds (reference per-content-type rule,
    deduplicator/deduplicator.py:84-91). Exact DuckDB oracle: the
    generated flagship SQL with a per-representative thr CTE
    (sqlgen.dedup_clusters_sql(thr_body=...)).

    On the driver corpus no candidate pair's estimate falls between the
    domain thresholds, so this query proves engine==oracle under the
    per-domain rule; THRESHOLD DISCRIMINATION (a borderline pair
    merging under ecommerce 0.75 but not medical 0.85) is pinned by
    tests/test_domains.py::TestDomainInference."""
    from ..functions.domains import DomainClassifyStage

    convs = _docs_as_conversations(sf_dir).map_batches(
        DomainClassifyStage,
        fn_constructor_kwargs={"text_col": "canonical_text"},
        batch_format="pyarrow",
        concurrency=fixed_probe_pool(),
    )
    return dedup_conversations(convs).clusters


def simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming <= 3 via 16-bit-band LSH.

    Pigeonhole: two 64-bit fingerprints within Hamming distance 3 share
    at least one of four 16-bit bands. Bucket by each band, verify
    exact Hamming within buckets (Manku et al., WWW 2007); buckets
    process as one vectorized pass per coarse hash partition
    (stages/grouped.py). At much larger corpora the 4x16-bit split must
    widen (more bands / extra permuted tables, as in Manku) because
    each 16-bit table has only 65536 buckets.

    The feature hash is the MD5 variant (simhash.md5_feature_hash64) so
    the full fingerprint, banding, and Hamming filter are reproducible
    in DuckDB SQL — this query is exact-oracle-checked. The dedup core's
    verification fingerprints stay SHA-1 (shared-digest optimization,
    minhash.py).
    """
    from ..simhash import SimHasher, md5_feature_hash64
    from ..stages.grouped import partitioned_group_map, run_bounds
    from ..stages.verify import _popcount64

    cfg = DedupConfig()

    class _Sim:
        def __init__(self):
            self.sh = SimHasher(cfg.shingle_size, feature_hash=md5_feature_hash64)

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

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(tb)
            .sort(["band_key", "doc_id"])
            .unique(["band_key", "doc_id"], keep="first", maintain_order=True)
        )
        keys = df["band_key"].to_numpy()
        ids = df["doc_id"].to_numpy()
        fps = df["simhash"].to_numpy().view(np.uint64)
        bounds = run_bounds(keys)
        all_a: list[np.ndarray] = []
        all_b: list[np.ndarray] = []
        all_h: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            ham = _popcount64(np.bitwise_xor(fps[ai + s], fps[bi + s]))
            keep = ham <= 3
            all_a.append(ids[ai[keep] + s])
            all_b.append(ids[bi[keep] + s])
            all_h.append(ham[keep])
        if not all_a:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(all_a), pa.int64()),
                "b_id": pa.array(np.concatenate(all_b), pa.int64()),
                "hamming": pa.array(np.concatenate(all_h), pa.int64()),
            }
        )

    def _dedup(tb: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(tb)
            .unique(["a_id", "b_id"])
            .to_arrow()
            .cast(_SIMHASH_PAIR_SCHEMA)
        )

    exploded = (
        canonical_docs(sf_dir)
        .map_batches(_Sim, batch_format="pyarrow", concurrency=fixed_probe_pool())
        .map_batches(_explode, batch_format="pyarrow")
    )
    pairs = partitioned_group_map(exploded, "band_key", _pairs_part, arrow=True)
    pairs = partitioned_group_map(pairs, "a_id", _dedup, arrow=True)
    return (
        typed_pandas(pairs, {"a_id": "int64", "b_id": "int64", "hamming": "int64"})
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


_SIMHASH_PAIR_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("hamming", pa.int64())]
)


NGRAM_DF_CAP = 1000  # grams in more docs than this are boilerplate: excluded
# from BOTH the intersection and the per-doc gram counts (a well-defined
# "Jaccard over non-ubiquitous grams" — the SQL oracle applies the same
# document-frequency cap, so parity is exact). This is the skew guard: the
# worst gram bucket emits df_cap^2/2 pairs instead of O(corpus^2).


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5, df_cap: int = NGRAM_DF_CAP
) -> pd.DataFrame:
    """Word n-gram Jaccard >= threshold pairs over grams with document
    frequency <= df_cap, as a distributed gram-inverted-index join.

    Scale shape (all coarse partitioned passes, stages/grouped.py — no
    per-gram Python dispatch, no driver-side count dict):

        grams (distinct per doc)                         [materialized]
          -> key=gram:   df-capped co-occurrence pairs   (skew-guarded)
          -> key=a_id:   count pair multiplicity = |intersection|
        grams -> key=gram: surviving (doc, gram) partial counts
              -> key=doc:  per-doc surviving-gram counts
        pairs + counts -> partitioned lookup join (na, nb)
          -> jaccard = nb/(na+nb-nb); filter on the UNROUNDED ratio,
             round only the emitted column (oracle WHERE-order parity).
    """
    from ..stages.grouped import attach_lookup, partitioned_group_map

    def _grams(batch: pa.Table) -> pa.Table:
        out_doc: list[int] = []
        out_gram: list[str] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["canonical"].to_pylist()
        ):
            words = text.split(" ") if text else []
            grams = {
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            }
            out_doc.extend([doc_id] * len(grams))
            out_gram.extend(grams)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "gram": pa.array(out_gram, pa.string()),
            }
        )

    grams = (
        canonical_docs(sf_dir)
        .map_batches(_grams, batch_format="pyarrow")
        .materialize()  # feeds the pair pass and the count pass
    )

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.grouped import run_bounds

        df = pl.from_arrow(tb).sort(["gram", "doc_id"])
        keys = df["gram"].to_numpy()
        ids = df["doc_id"].to_numpy()
        bounds = run_bounds(keys)
        all_a: list[np.ndarray] = []
        all_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2 or m > df_cap:
                continue
            ai, bi = np.triu_indices(m, k=1)
            all_a.append(ids[ai + s])
            all_b.append(ids[bi + s])
        if not all_a:
            return pa.table(
                {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(all_a), pa.int64()),
                "b_id": pa.array(np.concatenate(all_b), pa.int64()),
            }
        )

    def _count_pairs(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by(["a_id", "b_id"])
            .agg(pl.len().cast(pl.Int64).alias("n_both"))
        )
        return out.to_arrow().cast(_NGRAM_INTER_SCHEMA)

    pairs = partitioned_group_map(grams, "gram", _pairs_part, arrow=True)
    inter = partitioned_group_map(pairs, "a_id", _count_pairs, arrow=True)

    def _doc_partials(tb: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.grouped import run_bounds

        df = pl.from_arrow(tb).sort(["gram", "doc_id"])
        keys = df["gram"].to_numpy()
        ids = df["doc_id"].to_numpy()
        bounds = run_bounds(keys)
        keep = np.zeros(len(ids), dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            if int(e - s) <= df_cap:
                keep[s:e] = True
        surv = pl.DataFrame({"doc_id": ids[keep]})
        out = surv.group_by("doc_id").agg(pl.len().cast(pl.Int64).alias("n_part"))
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("n_part", pa.int64())])
        )

    def _doc_totals(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("doc_id")
            .agg(pl.col("n_part").sum().alias("n_grams"))
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64())])
        )

    partials = partitioned_group_map(grams, "gram", _doc_partials, arrow=True)
    counts = partitioned_group_map(partials, "doc_id", _doc_totals, arrow=True)

    with_counts = attach_lookup(
        inter,
        _NGRAM_INTER_SCHEMA,
        ["a_id", "b_id"],
        counts.materialize(),
        "doc_id",
        "n_grams",
        pa.int64(),
        ["na", "nb"],
    )

    def _jaccard(batch: pa.Table) -> pa.Table:
        nb = np.asarray(batch["n_both"], dtype=np.float64)
        union = (
            np.asarray(batch["na"], dtype=np.float64)
            + np.asarray(batch["nb"], dtype=np.float64)
            - nb
        )
        jac_raw = nb / union
        out = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "jaccard": pa.array(floor_round_np(jac_raw, 6), pa.float64()),
            }
        )
        return out.filter(pa.array(jac_raw >= threshold))

    return (
        typed_pandas(
            with_counts.map_batches(_jaccard, batch_format="pyarrow"),
            {"a_id": "int64", "b_id": "int64", "jaccard": "float64"},
        )
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


_NGRAM_INTER_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("n_both", pa.int64())]
)


# token-set Jaccard threshold for setsim_join_docs as an EXACT rational
# (9/10): both the engine predicate and the DuckDB oracle compare
# integers (10*inter >= 9*union), so no float threshold boundary exists.
SETSIM_T_NUM = 9
SETSIM_T_DEN = 10

_SETSIM_TOK_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("token", pa.string()), ("n", pa.int64())]
)
_SETSIM_PAIR_SCHEMA = pa.schema(
    [
        ("a_id", pa.int64()),
        ("b_id", pa.int64()),
        ("na", pa.int64()),
        ("nb", pa.int64()),
    ]
)


#: vocab-size bound for the dense-id fast path of setsim_join_docs.
#: Under it, the (token, df) table is assembled into ONE zero-copy
#: Arrow broadcast inside a Ray task (never a Python dict on the
#: driver — same discipline as stages/lsh.attach_signatures); above
#: it, the string-keyed partitioned path runs instead.
SETSIM_VOCAB_BROADCAST_LIMIT = 1_000_000

_SETSIM_SETS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n", pa.int64()),
        ("ids", pa.list_(pa.int64())),
        ("prefix", pa.list_(pa.int64())),
        ("set_key", pa.string()),
    ]
)
_SETSIM_GROUP_SCHEMA = pa.schema(
    [
        ("rep_id", pa.int64()),
        ("n", pa.int64()),
        ("ids", pa.list_(pa.int64())),
        ("prefix", pa.list_(pa.int64())),
        ("members", pa.list_(pa.int64())),
    ]
)
_SETSIM_REP_PAIR_SCHEMA = pa.schema(
    [
        ("a_id", pa.int64()),
        ("b_id", pa.int64()),
        ("inter_size", pa.int64()),
        ("union_size", pa.int64()),
    ]
)
_SETSIM_OUT_SCHEMA = pa.schema(
    [
        ("a_id", pa.int64()),
        ("b_id", pa.int64()),
        ("inter_size", pa.int64()),
        ("union_size", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def setsim_join_docs(sf_dir: str) -> pd.DataFrame:
    """Set-similarity self-join at token-set Jaccard >= 9/10 via
    PPJoin-style prefix filtering (Xiao, Wang, Lin, Yu: "Efficient
    Similarity Joins for Near Duplicate Detection", WWW 2008, §3).

    Each doc's DISTINCT tokens are ordered by ascending global document
    frequency (ties by token) and only the first
    ``n - ceil(t*n) + 1`` tokens are indexed: any pair with Jaccard >= t
    must collide on at least one prefix token, so the inverted index —
    and the all-to-all shuffle behind it — carries a small fraction of
    the corpus posting mass, unlike the full-index n-gram join above.
    Candidates also pass the length bound ``t * |longer| <= |shorter|``
    before verification, and the verify predicate is integer-exact
    (``10*inter >= 9*union``); the prefix filter is lossless by the
    PPJoin theorem, so a brute-force SQL join is an exact oracle.

    Two execution paths, switched on corpus vocabulary size (counted by
    the df combiner aggregate that both paths need anyway):

    **Dense-id path** (vocab <= SETSIM_VOCAB_BROADCAST_LIMIT): the
    (token, df) table is sorted by (df, token) inside a Ray task and
    broadcast as a token -> dense-id Arrow map, so global frequency
    order becomes integer order. One stateless pass re-tokenizes each
    doc into a SORTED int64 id list whose head IS the PPJoin prefix —
    no df-attach join and no doc_id shuffle of the exploded posting
    table. Docs with IDENTICAL token sets are then grouped (one
    partitioned pass on the exact id-list key) and only group
    REPRESENTATIVES enter candidate generation and verification;
    verified rep pairs expand back to member pairs at the end
    (intersection/union sizes depend only on the token sets, so the
    expansion is exact), and intra-group pairs are emitted directly
    with Jaccard 1. Near-duplicate-heavy corpora — the only corpora
    where a 0.9-Jaccard self-join produces meaningful output — collapse
    quadratic clique verification into linear expansion this way.

    **Partitioned path** (unbounded vocab, the 100-TB shape): the
    original string-keyed plan; see _setsim_join_partitioned.
    """
    canonical = canonical_docs(sf_dir).materialize()

    def _df_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch.select(["doc_id", "canonical"]))
            .with_columns(
                pl.col("canonical").str.split(" ").list.unique().alias("token")
            )
            .drop("canonical")
            .explode("token")
            .group_by("token")
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("_part"))
            .select(["token", "_part"])
        )
        return out.to_arrow().cast(
            pa.schema([("token", pa.string()), ("_part", pa.int64())])
        )

    dfs = (
        canonical.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("_part", alias_name="df"))
        .materialize()
    )
    if dfs.count() > SETSIM_VOCAB_BROADCAST_LIMIT:
        return _setsim_join_partitioned(canonical)
    return _setsim_join_dense(canonical, dfs)


def _setsim_join_dense(
    canonical: "rd.Dataset", dfs: "rd.Dataset"
) -> pd.DataFrame:
    """Dense-id fast path of setsim_join_docs (see its docstring)."""
    import ray

    from ..stages.grouped import attach_lookup, partitioned_group_map, run_bounds

    _VOCAB_SCHEMA = pa.schema([("token", pa.string()), ("tid", pa.int64())])

    @ray.remote(num_returns=1)
    def _build_vocab(*tbls) -> pa.Table:
        import polars as pl

        parts = [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t, preserve_index=False)
            for t in tbls
        ]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return _VOCAB_SCHEMA.empty_table()
        cat = pa.concat_tables(
            [t.select(["token", "df"]).cast(
                pa.schema([("token", pa.string()), ("df", pa.int64())])
            ) for t in parts]
        )
        return (
            pl.from_arrow(cat)
            .sort(["df", "token"])
            .with_row_index("tid")
            .select(["token", pl.col("tid").cast(pl.Int64)])
            .to_arrow()
            .cast(_VOCAB_SCHEMA)
        )

    vocab_ref = _build_vocab.remote(*dfs.to_arrow_refs())

    def _encode(batch: pa.Table) -> pa.Table:
        import polars as pl

        vocab = pl.from_arrow(ray.get(vocab_ref))
        df = pl.from_arrow(batch.select(["doc_id", "canonical"]))
        toks = (
            df.with_columns(
                pl.col("canonical").str.split(" ").list.unique().alias("token")
            )
            .drop("canonical")
            .explode("token")
            .join(vocab, on="token", how="inner")
        )
        out = (
            toks.group_by("doc_id")
            .agg(pl.col("tid").sort().alias("ids"))
            .with_columns(pl.col("ids").list.len().cast(pl.Int64).alias("n"))
            .with_columns(
                (
                    pl.col("n")
                    - (SETSIM_T_NUM * pl.col("n") + SETSIM_T_DEN - 1)
                    // SETSIM_T_DEN
                    + 1
                ).alias("_p")
            )
            .with_columns(
                pl.col("ids").list.head(pl.col("_p")).alias("prefix"),
                pl.col("ids")
                .cast(pl.List(pl.String))
                .list.join(",")
                .alias("set_key"),
            )
            .select(["doc_id", "n", "ids", "prefix", "set_key"])
        )
        return out.to_arrow().cast(_SETSIM_SETS_SCHEMA)

    sets = canonical.map_batches(_encode, batch_format="pyarrow")

    def _group(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["set_key", "doc_id"])
            .group_by("set_key", maintain_order=True)
            .agg(
                pl.col("doc_id").first().alias("rep_id"),
                pl.col("n").first(),
                pl.col("ids").first(),
                pl.col("prefix").first(),
                pl.col("doc_id").alias("members"),
            )
            .select(["rep_id", "n", "ids", "prefix", "members"])
        )
        return out.to_arrow().cast(_SETSIM_GROUP_SCHEMA)

    groups = partitioned_group_map(sets, "set_key", _group, arrow=True).materialize()

    _POST_SCHEMA = pa.schema(
        [("tid", pa.int64()), ("rep_id", pa.int64()), ("n", pa.int64())]
    )

    def _post(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch.select(["rep_id", "n", "prefix"]))
            .rename({"prefix": "tid"})
            .explode("tid")
            .drop_nulls("tid")  # zero-token docs have an empty prefix
            .select(["tid", "rep_id", "n"])
        )
        return out.to_arrow().cast(_POST_SCHEMA)

    post = groups.map_batches(_post, batch_format="pyarrow")

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["tid", "rep_id"])
        ids = df["rep_id"].to_numpy()
        ns = df["n"].to_numpy()
        bounds = run_bounds(df["tid"].to_numpy())
        all_cols: list[tuple[np.ndarray, ...]] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a, b = ids[ai + s], ids[bi + s]
            na, nb = ns[ai + s], ns[bi + s]
            # Jaccard >= 9/10 requires 10*min(n) >= 9*max(n)
            lo = np.minimum(na, nb)
            hi = np.maximum(na, nb)
            keep = SETSIM_T_DEN * lo >= SETSIM_T_NUM * hi
            all_cols.append((a[keep], b[keep], na[keep], nb[keep]))
        if not all_cols:
            return _SETSIM_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "a_id": pa.array(np.concatenate([c[0] for c in all_cols]), pa.int64()),
                "b_id": pa.array(np.concatenate([c[1] for c in all_cols]), pa.int64()),
                "na": pa.array(np.concatenate([c[2] for c in all_cols]), pa.int64()),
                "nb": pa.array(np.concatenate([c[3] for c in all_cols]), pa.int64()),
            }
        )

    raw_pairs = partitioned_group_map(post, "tid", _pairs_part, arrow=True)

    def _distinct(tb: pa.Table) -> pa.Table:
        import polars as pl

        # all rows of a given a_id land in this partition, so a
        # per-partition unique is globally distinct
        return (
            pl.from_arrow(tb)
            .unique(["a_id", "b_id"], keep="any")
            .to_arrow()
            .cast(_SETSIM_PAIR_SCHEMA)
        )

    cand = partitioned_group_map(raw_pairs, "a_id", _distinct, arrow=True)

    with_ids = attach_lookup(
        cand,
        _SETSIM_PAIR_SCHEMA,
        ["a_id", "b_id"],
        groups.select_columns(["rep_id", "ids"]),
        "rep_id",
        "ids",
        pa.list_(pa.int64()),
        ["ids_a", "ids_b"],
    )

    def _verify(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .with_columns(
                pl.col("ids_a")
                .list.set_intersection(pl.col("ids_b"))
                .list.len()
                .cast(pl.Int64)
                .alias("inter_size")
            )
            .with_columns(
                (pl.col("na") + pl.col("nb") - pl.col("inter_size")).alias(
                    "union_size"
                )
            )
            .filter(
                SETSIM_T_DEN * pl.col("inter_size")
                >= SETSIM_T_NUM * pl.col("union_size")
            )
            .select(["a_id", "b_id", "inter_size", "union_size"])
        )
        return out.to_arrow().cast(_SETSIM_REP_PAIR_SCHEMA)

    rep_pairs = with_ids.map_batches(_verify, batch_format="pyarrow")

    expanded = attach_lookup(
        rep_pairs,
        _SETSIM_REP_PAIR_SCHEMA,
        ["a_id", "b_id"],
        groups.select_columns(["rep_id", "members"]),
        "rep_id",
        "members",
        pa.list_(pa.int64()),
        ["ma", "mb"],
    )

    def _cross(batch: pa.Table) -> pa.Table:
        import polars as pl

        # identical-set groups are disjoint, so each member pair appears
        # exactly once; sizes carry over because they depend only on the
        # two token sets
        out = (
            pl.from_arrow(batch)
            .explode("ma")
            .explode("mb")
            .select(
                pl.min_horizontal("ma", "mb").alias("a_id"),
                pl.max_horizontal("ma", "mb").alias("b_id"),
                "inter_size",
                "union_size",
                (
                    pl.col("inter_size").cast(pl.Float64)
                    / pl.col("union_size").cast(pl.Float64)
                ).alias("jaccard"),
            )
        )
        return out.to_arrow().cast(_SETSIM_OUT_SCHEMA)

    cross = expanded.map_batches(_cross, batch_format="pyarrow")

    def _intra(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["n", "members"])).filter(
            pl.col("members").list.len() > 1
        )
        if df.height == 0:
            return _SETSIM_OUT_SCHEMA.empty_table()
        a_all, b_all, n_all = [], [], []
        for m, n in zip(df["members"].to_list(), df["n"].to_numpy()):
            arr = np.sort(np.asarray(m, dtype=np.int64))
            ai, bi = np.triu_indices(len(arr), k=1)
            a_all.append(arr[ai])
            b_all.append(arr[bi])
            n_all.append(np.full(len(ai), n, dtype=np.int64))
        ns = np.concatenate(n_all)
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(a_all), pa.int64()),
                "b_id": pa.array(np.concatenate(b_all), pa.int64()),
                "inter_size": pa.array(ns, pa.int64()),
                "union_size": pa.array(ns, pa.int64()),
                "jaccard": pa.array(np.ones(len(ns)), pa.float64()),
            }
        )

    intra = groups.map_batches(_intra, batch_format="pyarrow")

    return (
        typed_pandas(
            cross.union(intra),
            {
                "a_id": "int64",
                "b_id": "int64",
                "inter_size": "int64",
                "union_size": "int64",
                "jaccard": "float64",
            },
        )
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


def _setsim_join_partitioned(canonical: "rd.Dataset") -> pd.DataFrame:
    """String-keyed partitioned path of setsim_join_docs — the
    unbounded-vocab (100-TB) shape.

    Scale shape (coarse partitioned passes, stages/grouped.py):

        distinct (doc, token) + set size        [materialized]
          -> token-keyed df combiner aggregate (token, df)
          -> attach df   (broadcast under 1M vocab, partitioned above)
          -> key=doc_id: df-ascending sort, emit PREFIX postings only
          -> key=token:  length-filtered candidate pairs
          -> key=a_id:   distinct candidates
          -> attach both token lists (partitioned lookup join)
          -> vectorized polars set-intersection verify

    Boilerplate-heavy corpora should run exact dedup first (identical
    docs make even rare prefix tokens hot); the near-dup tier here is
    meant to run on exact-dedup survivors, same as the LSH tier.
    """
    from ..stages.grouped import attach_lookup, partitioned_group_map, run_bounds

    def _toksets(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "canonical"]))
        out = (
            df.with_columns(
                pl.col("canonical").str.split(" ").list.unique().alias("token")
            )
            .drop("canonical")
            .with_columns(pl.col("token").list.len().cast(pl.Int64).alias("n"))
            .explode("token")
        )
        return out.to_arrow().cast(_SETSIM_TOK_SCHEMA)

    toks = (
        canonical.map_batches(_toksets, batch_format="pyarrow")
        .materialize()  # feeds df aggregate, prefix pass, and verify lists
    )

    def _df_partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch.select(["token"]))
            .group_by("token")
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("_part"))
            .select(["token", "_part"])
        )
        return out.to_arrow().cast(
            pa.schema([("token", pa.string()), ("_part", pa.int64())])
        )

    dfs = (
        toks.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("_part", alias_name="df"))
    )

    with_df = attach_lookup(
        toks,
        _SETSIM_TOK_SCHEMA,
        ["token"],
        dfs,
        "token",
        "df",
        pa.int64(),
        ["df"],
    )

    def _prefix(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["doc_id", "df", "token"])
        out = (
            df.with_columns(
                pl.int_range(pl.len()).over("doc_id").alias("_i"),
                # prefix length n - ceil(9n/10) + 1, all-integer
                (
                    pl.col("n")
                    - (SETSIM_T_NUM * pl.col("n") + SETSIM_T_DEN - 1)
                    // SETSIM_T_DEN
                    + 1
                ).alias("_p"),
            )
            .filter(pl.col("_i") < pl.col("_p"))
            .select(["token", "doc_id", "n"])
        )
        return out.to_arrow().cast(
            pa.schema([("token", pa.string()), ("doc_id", pa.int64()), ("n", pa.int64())])
        )

    prefix = partitioned_group_map(with_df, "doc_id", _prefix, arrow=True)

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["token", "doc_id"])
        keys = df["token"].to_numpy()
        ids = df["doc_id"].to_numpy()
        ns = df["n"].to_numpy()
        bounds = run_bounds(keys)
        all_cols: list[tuple[np.ndarray, ...]] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a, b = ids[ai + s], ids[bi + s]
            na, nb = ns[ai + s], ns[bi + s]
            # Jaccard >= 9/10 requires 10*min(n) >= 9*max(n)
            lo = np.minimum(na, nb)
            hi = np.maximum(na, nb)
            keep = SETSIM_T_DEN * lo >= SETSIM_T_NUM * hi
            all_cols.append((a[keep], b[keep], na[keep], nb[keep]))
        if not all_cols:
            return _SETSIM_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "a_id": pa.array(np.concatenate([c[0] for c in all_cols]), pa.int64()),
                "b_id": pa.array(np.concatenate([c[1] for c in all_cols]), pa.int64()),
                "na": pa.array(np.concatenate([c[2] for c in all_cols]), pa.int64()),
                "nb": pa.array(np.concatenate([c[3] for c in all_cols]), pa.int64()),
            }
        )

    raw_pairs = partitioned_group_map(prefix, "token", _pairs_part, arrow=True)

    def _distinct(tb: pa.Table) -> pa.Table:
        import polars as pl

        # all rows of a given a_id land in this partition, so a
        # per-partition unique is globally distinct
        return (
            pl.from_arrow(tb)
            .unique(["a_id", "b_id"], keep="any")
            .to_arrow()
            .cast(_SETSIM_PAIR_SCHEMA)
        )

    cand = partitioned_group_map(raw_pairs, "a_id", _distinct, arrow=True)

    def _lists(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["doc_id", "token"])
            .group_by("doc_id", maintain_order=True)
            .agg(pl.col("token").alias("toks"))
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("toks", pa.list_(pa.string()))])
        )

    lists = partitioned_group_map(
        toks.select_columns(["doc_id", "token"]), "doc_id", _lists, arrow=True
    )

    with_lists = attach_lookup(
        cand,
        _SETSIM_PAIR_SCHEMA,
        ["a_id", "b_id"],
        lists,
        "doc_id",
        "toks",
        pa.list_(pa.string()),
        ["toks_a", "toks_b"],
    )

    def _verify(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = (
            df.with_columns(
                pl.col("toks_a")
                .list.set_intersection(pl.col("toks_b"))
                .list.len()
                .cast(pl.Int64)
                .alias("inter_size")
            )
            .with_columns(
                (pl.col("na") + pl.col("nb") - pl.col("inter_size")).alias(
                    "union_size"
                )
            )
            .filter(
                SETSIM_T_DEN * pl.col("inter_size")
                >= SETSIM_T_NUM * pl.col("union_size")
            )
            .with_columns(
                (
                    pl.col("inter_size").cast(pl.Float64)
                    / pl.col("union_size").cast(pl.Float64)
                ).alias("jaccard")
            )
            .select(["a_id", "b_id", "inter_size", "union_size", "jaccard"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("a_id", pa.int64()),
                    ("b_id", pa.int64()),
                    ("inter_size", pa.int64()),
                    ("union_size", pa.int64()),
                    ("jaccard", pa.float64()),
                ]
            )
        )

    return (
        typed_pandas(
            with_lists.map_batches(_verify, batch_format="pyarrow"),
            {
                "a_id": "int64",
                "b_id": "int64",
                "inter_size": "int64",
                "union_size": "int64",
                "jaccard": "float64",
            },
        )
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


SUBSTRING_MIN_LEN = 30  # chars; must be >= winnowing t = W_GRAM + WINDOW - 1


def substring_containment(sf_dir: str, min_len: int = SUBSTRING_MIN_LEN) -> pd.DataFrame:
    """Pairs where one canonical text (>= min_len chars) is a strict
    substring of a longer one (reference fuzzy partial-match semantics,
    fuzzy_matcher.py:213-236) — via a distributed winnowing
    fingerprint index (functions/winnowing.py), not an all-pairs scan.

    Scale shape: every doc emits its winnowed fingerprint set
    (haystack side, ~2L/window keys) and ONE needle key (its global-min
    gram hash; guaranteed to appear in any containing doc's winnowed
    set). A partitioned groupby on the fingerprint brings true
    candidates together; texts are attached with a partitioned lookup
    join and the exact `text in other` check runs per candidate pair.
    Bucket fan-out is bounded by the number of docs genuinely sharing a
    16-byte gram with a needle's minimum — boilerplate-heavy corpora
    should pre-dedup exact/near duplicates first (pipelines/dedup.py),
    which is also where the intra-cluster variant lives
    (stages/substring.py).
    """
    from ..functions.winnowing import gram_hashes, needle_key, winnow
    from ..stages.grouped import attach_lookup, partitioned_group_map

    def _index_rows(batch: pa.Table) -> pa.Table:
        keys: list[np.ndarray] = []
        ids: list[np.ndarray] = []
        sides: list[np.ndarray] = []
        lens: list[np.ndarray] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["canonical"].to_pylist()
        ):
            text = text or ""
            gh = gram_hashes(text)
            if len(gh) == 0:
                continue
            sel = winnow(gh).astype(np.int64)
            n_h = len(sel)
            n_n = 1 if len(text) >= min_len else 0
            k = np.concatenate([sel, [np.int64(needle_key(gh))]]) if n_n else sel
            keys.append(k)
            ids.append(np.full(n_h + n_n, doc_id, dtype=np.int64))
            side = np.zeros(n_h + n_n, dtype=np.int8)
            if n_n:
                side[-1] = 1
            sides.append(side)
            lens.append(np.full(n_h + n_n, len(text), dtype=np.int64))
        if not keys:
            return _SUBSTR_INDEX_SCHEMA.empty_table()
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "side": pa.array(np.concatenate(sides), pa.int8()),
                "n_chars": pa.array(np.concatenate(lens), pa.int64()),
            }
        )

    index = canonical_docs(sf_dir).map_batches(_index_rows, batch_format="pyarrow")

    def _candidates(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        needles = df.filter(pl.col("side") == 1).select(
            pl.col("key"),
            pl.col("doc_id").alias("a_id"),
            pl.col("n_chars").alias("a_len"),
        )
        hays = df.filter(pl.col("side") == 0).select(
            pl.col("key"),
            pl.col("doc_id").alias("b_id"),
            pl.col("n_chars").alias("b_len"),
        )
        cand = (
            needles.join(hays, on="key")
            .filter(
                (pl.col("a_id") != pl.col("b_id"))
                & (pl.col("a_len") < pl.col("b_len"))
            )
            .select(["a_id", "b_id"])
            .unique(["a_id", "b_id"])
        )
        return cand.to_arrow().cast(_SUBSTR_PAIR_SCHEMA)

    def _dedup(tb: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(tb)
            .unique(["a_id", "b_id"])
            .to_arrow()
            .cast(_SUBSTR_PAIR_SCHEMA)
        )

    cand = partitioned_group_map(index, "key", _candidates, arrow=True)
    cand = partitioned_group_map(cand, "a_id", _dedup, arrow=True)

    texts = canonical_docs(sf_dir).materialize()
    with_texts = attach_lookup(
        cand,
        _SUBSTR_PAIR_SCHEMA,
        ["a_id", "b_id"],
        texts,
        "doc_id",
        "canonical",
        pa.string(),
        ["a_text", "b_text"],
    )

    def _verify(batch: pa.Table) -> pa.Table:
        keep = [
            a in b
            for a, b in zip(batch["a_text"].to_pylist(), batch["b_text"].to_pylist())
        ]
        return batch.filter(pa.array(keep)).select(["a_id", "b_id"])

    out = typed_pandas(
        with_texts.map_batches(_verify, batch_format="pyarrow"),
        {"a_id": "int64", "b_id": "int64"},
    )
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


_SUBSTR_INDEX_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("doc_id", pa.int64()),
        ("side", pa.int8()),
        ("n_chars", pa.int64()),
    ]
)
_SUBSTR_PAIR_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])


# --- structured extraction ----------------------------------------------------


def extract_structured(sf_dir: str) -> "rd.Dataset":
    """Structured content extraction over deterministic synthetic HTML
    (functions/structured.py — the reference's tables/code/links surface,
    cascade_extractor.py:193-860).

    Each document row is wrapped into an HTML page whose code blocks /
    links / tables derive arithmetically from doc_id, the engine runs
    the REAL DOM extractors, and the DuckDB oracle recomputes the
    expected scalars from the same construction — extraction output is
    therefore exact-checked by construction.
    """
    from ..functions.structured import structured_extract_batch

    def _make_html(batch: pa.Table) -> pa.Table:
        htmls: list[str] = []
        for d, s in zip(batch["doc_id"].to_pylist(), batch["source"].to_pylist()):
            code = (
                f'<pre><code class="language-python">def fn_{d}(x):\n'
                f"    return x * {d % 7}</code></pre>"
            ) * (d % 3)
            link = (
                f'<a href="https://example.com/d/{d}" title="t">doc link</a>'
                if d % 2 == 0
                else ""
            )
            table = (
                f"<table><caption>c{d}</caption><tr><th>k</th><th>v</th></tr>"
                f"<tr><td>a</td><td>{d}</td></tr></table>"
                if d % 5 == 0
                else ""
            )
            htmls.append(
                f"<html><head><title>Doc {d}</title></head><body>"
                f"<p>{s} document {d}</p>{code}{link}{table}</body></html>"
            )
        return pa.table(
            {"doc_id": batch["doc_id"], "html": pa.array(htmls, pa.string())}
        )

    def _derive(batch: pa.Table) -> pa.Table:
        codes = batch["code_blocks"].to_pylist()
        links = batch["links"].to_pylist()
        tables = batch["tables"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_code_blocks": pa.array([len(c) for c in codes], pa.int64()),
                "code_language": pa.array(
                    [c[0]["language"] if c else "none" for c in codes], pa.string()
                ),
                "n_code_lines": pa.array(
                    [sum(b["n_lines"] for b in c) for c in codes], pa.int64()
                ),
                "first_code": pa.array(
                    [c[0]["content"] if c else "none" for c in codes], pa.string()
                ),
                "n_links": pa.array([len(ls) for ls in links], pa.int64()),
                "first_href": pa.array(
                    [ls[0]["href"] if ls else "none" for ls in links], pa.string()
                ),
                "first_link_type": pa.array(
                    [ls[0]["link_type"] if ls else "none" for ls in links],
                    pa.string(),
                ),
                "n_tables": pa.array([len(ts) for ts in tables], pa.int64()),
                "table_caption": pa.array(
                    [ts[0]["caption"] if ts else "none" for ts in tables], pa.string()
                ),
                "table_n_rows": pa.array(
                    [ts[0]["n_rows"] if ts else 0 for ts in tables], pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(_make_html, batch_format="pyarrow")
        .map_batches(
            lambda b: structured_extract_batch(b, base_url="https://corpus.local"),
            batch_format="pyarrow",
        )
        .map_batches(_derive, batch_format="pyarrow")
    )


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
        .map_batches(LangIdStage, batch_format="pyarrow", concurrency=fixed_probe_pool())
        .drop_columns(["text"])
    )


def domain_classify_docs(sf_dir: str) -> "rd.Dataset":
    """(doc_id, domain, domain_keyword_matches) — the DomainType
    producer (functions/domains.py; reference protocols.py:68-78 +
    extractor/domain_extractors.py keyword scoring). Feeds the
    per-domain dedup thresholds (config.domain_minhash_thresholds)."""
    from ..functions.domains import DomainClassifyStage

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            DomainClassifyStage,
            fn_constructor_kwargs={"with_matches": True},
            batch_format="pyarrow",
            concurrency=fixed_probe_pool(),
        )
        .drop_columns(["text"])
    )


def fingerprint_docs(sf_dir: str) -> "rd.Dataset":
    """(doc_id, fingerprint) rolling-hash content fingerprints."""
    return (
        canonical_docs(sf_dir)
        .map_batches(add_fingerprint, batch_format="pyarrow")
        .drop_columns(["canonical"])
    )


def media_decode_stats(sf_dir: str) -> "rd.Dataset":
    """Multimodal binary-column plumbing, exact-checked THROUGH THE REAL
    CODEC: each document row becomes a genuine PNG (gray raster of
    bytes (doc_id + i) % 256 over a doc_id-derived size, written by
    multimodal.encode_png), the actor-pool decode stage runs the
    from-spec PNG decoder (decode_stub=False — no stub anywhere on this
    path), and the DuckDB oracle recomputes width/height/mean
    arithmetically. Output: (doc_id, width, height, mean_intensity).
    """
    from ..exactmath import floor_round
    from ..multimodal import DecodeImageStage, encode_png

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w = 8 + d % 5
            h = 8 + d % 3
            raster = (
                (np.arange(w * h, dtype=np.int64) + d) % 256
            ).astype(np.uint8).reshape(h, w)
            out.append(encode_png(raster))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
                "mean_intensity": floor_round(batch["mean_intensity"], 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"decode_stub": False},
            batch_format="pyarrow",
            batch_size=64,  # binary rows are wide; small batches
            concurrency=fixed_probe_pool(),
        )
        .map_batches(_round, batch_format="pyarrow")
    )


SCENE_THR_MICRO = 3_000_000  # mean-intensity jump > 3.0 = scene cut


def video_scene_changes(sf_dir: str) -> "rd.Dataset":
    """Scene-change detection through the REAL YUV4MPEG2 parser: each
    document becomes the same deterministic Y4M stream as
    `video_frame_stats`, an actor-pool stage parses EVERY frame's luma
    plane and counts cuts — consecutive frames whose mean intensity
    jumps by more than 3.0 — via the exact integer cross-multiplied
    test |sum_f - sum_{f-1}| * 1e6 > thr_micro * n_pixels (no division,
    bit-identical in SQL). The shot-boundary pass a video curation
    pipeline runs before frame sampling.
    Output (doc_id, n_frames, n_scene_changes)."""
    from ..multimodal import encode_y4m, iter_y4m_frames

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w, h = 8 + d % 4, 6 + d % 3
            nf = 3 + d % 4
            i = np.arange(w * h, dtype=np.int64)
            f = np.arange(nf, dtype=np.int64)[:, None]
            frames = ((d + f * 7 + i) % 256).astype(np.uint8).reshape(nf, h, w)
            out.append(encode_y4m(frames))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    class _SceneStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids: list[int] = []
            nfs: list[int] = []
            ncs: list[int] = []
            for d, p in zip(
                batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
            ):
                sums: list[int] = []
                npix = 0
                for w, h, luma in iter_y4m_frames(p):
                    a = np.frombuffer(luma, dtype=np.uint8).astype(np.int64)
                    sums.append(int(a.sum()))
                    npix = w * h
                s = np.asarray(sums, dtype=np.int64)
                cuts = (
                    int(
                        (
                            np.abs(np.diff(s)) * 1_000_000
                            > SCENE_THR_MICRO * npix
                        ).sum()
                    )
                    if len(s) > 1
                    else 0
                )
                ids.append(int(d))
                nfs.append(len(s))
                ncs.append(cuts)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_frames": pa.array(nfs, pa.int64()),
                    "n_scene_changes": pa.array(ncs, pa.int64()),
                }
            )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            _SceneStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=fixed_probe_pool(),
        )
    )


def audio_fingerprint_dedup(sf_dir: str) -> "rd.Dataset":
    """Audio near-dup grouping THROUGH THE REAL CODEC: every document
    row becomes the same deterministic int16 ramp WAV as
    `audio_decode_stats`, an actor-pool stage decodes it with the
    stdlib-wave codec and computes the 15-bit energy-envelope
    fingerprint (`multimodal.audio_fp15`, exact int64 sums of squares),
    and clips are grouped by exact fingerprint — the audio analog of
    `image_dhash_dedup`. Output (doc_id, afp, rep_id, group_size)."""
    from ..multimodal import AudioFingerprintStage, encode_wav
    from ..stages.grouped import partitioned_group_map

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            n = 64 + d % 32
            samples = ((np.arange(n, dtype=np.int64) + d) % 256 - 128).astype(
                np.int16
            )
            out.append(encode_wav(samples, sample_rate=8000))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    fps = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            AudioFingerprintStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=fixed_probe_pool(),
        )
    )

    def _group(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("doc_id").min().over("afp").alias("rep_id"),
                pl.len().over("afp").cast(pl.Int64).alias("group_size"),
            )
            .select(["doc_id", "afp", "rep_id", "group_size"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("afp", pa.int64()),
                    ("rep_id", pa.int64()),
                    ("group_size", pa.int64()),
                ]
            )
        )

    return partitioned_group_map(fps, "afp", _group, arrow=True)


def image_dhash_dedup(sf_dir: str) -> "rd.Dataset":
    """Perceptual-hash image dedup THROUGH THE REAL CODEC: every
    document row becomes a genuine PNG (the same doc_id-derived
    gradient raster as `media_decode_stats`), an actor-pool stage
    decodes it with the from-spec PNG decoder and computes the 16-bit
    difference hash (`multimodal.dhash16` — grid means compared by
    exact integer cross multiplication), and images are grouped by
    exact dHash: constant-intensity-shifted gradients collide (the
    perceptual property), mod-256 wraparound splits others — a
    non-trivial grouping the oracle reproduces arithmetically.

    Output (doc_id, dhash, rep_id, group_size); one hash shuffle on
    dhash. The multimodal near-dup tier: at scale the same stage runs
    over a real image column and the groupby key is the hash band.
    """
    from ..multimodal import DHashStage, encode_png
    from ..stages.grouped import partitioned_group_map

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w = 8 + d % 5
            h = 8 + d % 3
            raster = (
                (np.arange(w * h, dtype=np.int64) + d) % 256
            ).astype(np.uint8).reshape(h, w)
            out.append(encode_png(raster))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    hashes = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            DHashStage,
            batch_format="pyarrow",
            batch_size=64,  # binary rows are wide; small batches
            concurrency=fixed_probe_pool(),
        )
    )

    def _group(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("doc_id").min().over("dhash").alias("rep_id"),
                pl.len().over("dhash").cast(pl.Int64).alias("group_size"),
            )
            .select(["doc_id", "dhash", "rep_id", "group_size"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("dhash", pa.int64()),
                    ("rep_id", pa.int64()),
                    ("group_size", pa.int64()),
                ]
            )
        )

    return partitioned_group_map(hashes, "dhash", _group, arrow=True)


def jpeg_decode_stats(sf_dir: str) -> "rd.Dataset":
    """Baseline-JPEG decode exercised end-to-end through the REAL codec
    (jpeg.py: ITU-T T.81 marker parse, canonical Huffman, dequantize,
    IDCT) with an EXACT oracle despite JPEG being lossy: each document
    becomes a constant grayscale JPEG of EVEN value v = (2*doc_id) % 256
    over a (8*(1+d%3)) x (8*(1+d%2)) raster. For a constant block the
    only nonzero coefficient is DC = 8*(v-128); with the Annex K
    luminance table (Q[0]=16) the quantized DC is (v-128)/2 — an exact
    integer for even v, so round-half-up has no tie and float noise
    (~1e-14) cannot flip it — and the decoded constant is
    2*((v-128)/2) + 128 = v. The oracle therefore predicts
    mean_intensity = v arithmetically; any Huffman/DCT/scaling bug in
    either codec direction breaks the equality. Odd values are excluded
    on purpose: their quantized DC is a .5 tie whose direction under
    FP noise is not reproducible in SQL (see tests/test_jpeg.py for the
    lossy-path coverage).

    Output: (doc_id, width, height, mean_intensity).
    """
    from ..exactmath import floor_round
    from ..jpeg import encode_jpeg
    from ..multimodal import DecodeImageStage

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w = 8 * (1 + d % 3)
            h = 8 * (1 + d % 2)
            v = (2 * d) % 256
            out.append(encode_jpeg(np.full((h, w), v, dtype=np.uint8)))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
                "mean_intensity": floor_round(batch["mean_intensity"], 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"decode_stub": False},
            batch_format="pyarrow",
            batch_size=64,  # binary rows are wide; small batches
            concurrency=fixed_probe_pool(),
        )
        .map_batches(_round, batch_format="pyarrow")
    )


def gif_decode_stats(sf_dir: str) -> "rd.Dataset":
    """GIF decode exercised end-to-end through the REAL codec (gif.py:
    GIF89a color tables + variable-width LZW), exact-checked: each
    document becomes a single-frame gray-palette GIF whose pixel i is
    (doc_id + i) % 256 over a (8 + d%5) x (6 + d%4) raster. GIF is
    LOSSLESS, so the decoded RGB raster's mean equals the integer pixel
    sum over the pixel count: both sides compute the correctly-rounded
    IEEE division of the same exact rational (numpy's float64 sum of
    small integers is exact; DuckDB's HUGEINT sum likewise), making the
    float compare exact after the shared floor-round. Any LZW
    width-transition or palette bug breaks the equality.

    Output: (doc_id, width, height, mean_intensity)."""
    from ..exactmath import floor_round
    from ..gif import encode_gif
    from ..multimodal import DecodeImageStage

    def _payloads(batch: pa.Table) -> pa.Table:
        out: list[bytes] = []
        for d in batch["doc_id"].to_pylist():
            w, h = 8 + d % 5, 6 + d % 4
            px = ((d + np.arange(w * h, dtype=np.int64)) % 256).astype(np.uint8)
            out.append(encode_gif(px.reshape(h, w)))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(out, pa.binary())}
        )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
                "mean_intensity": floor_round(batch["mean_intensity"], 6),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_payloads, batch_format="pyarrow")
        .map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"decode_stub": False},
            batch_format="pyarrow",
            batch_size=64,  # binary rows are wide; small batches
            concurrency=fixed_probe_pool(),
        )
        .map_batches(_round, batch_format="pyarrow")
    )


def fuzzy_match_docs(
    sf_dir: str,
    threshold: float = 0.3,
    prefix: int = 100,
    per_source: int = 32,
) -> "rd.Dataset":
    """Fuzzy pair scoring with reference match classification
    (fuzzy_matcher.py:107-125 normalized Levenshtein, :200-211
    near_exact/very_similar/contains/contained_in/similar) over bounded
    per-source candidate sets — (a_id, b_id, similarity, match_type).

    Scale shape: candidates are the first `per_source` docs of each
    source (deterministic by doc_id) scored on a `prefix`-char canonical
    prefix, so pair count is O(sources * per_source^2) and per-pair cost
    is O(prefix * distance) regardless of corpus size; sources hash into
    coarse partitions (one vectorized pass per partition, not per
    source). Exact DuckDB oracle via `levenshtein()` over the same
    construction (the engine's distance is code-point exact; DuckDB's
    is byte-based, so oracle equivalence holds on ASCII corpora like
    the fixture — they diverge only on multi-byte characters).
    """
    from ..functions.fuzzy import classify_match, levenshtein
    from ..stages.grouped import partitioned_group_map

    def _prep(batch: pa.Table) -> pa.Table:
        canon = normalize_whitespace_array(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "prefix": pc.utf8_slice_codeunits(canon, 0, prefix),
            }
        )

    ds = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        _prep, batch_format="pyarrow"
    )

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        from ..stages.grouped import run_bounds

        df = pl.from_arrow(tb).sort(["source", "doc_id"])
        srcs = df["source"].to_numpy()
        ids = df["doc_id"].to_numpy()
        texts = df["prefix"].to_list()
        bounds = run_bounds(srcs)
        out_a: list[int] = []
        out_b: list[int] = []
        out_sim: list[float] = []
        out_kind: list[str] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            e = min(e, s + per_source)
            for i in range(s, e):
                for j in range(i + 1, e):
                    a, b = texts[i], texts[j]
                    m = max(len(a), len(b), 1)
                    sim = 1.0 - levenshtein(a, b) / m
                    if sim >= threshold:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
                        out_sim.append(sim)
                        out_kind.append(classify_match(sim, len(a), len(b)))
        return pa.table(
            {
                "a_id": pa.array(out_a, pa.int64()),
                "b_id": pa.array(out_b, pa.int64()),
                "similarity": pa.array(floor_round_np(np.asarray(out_sim)), pa.float64()),
                "match_type": pa.array(out_kind, pa.string()),
            }
        )

    return partitioned_group_map(ds, "source", _pairs_part, arrow=True)


def search_docs(
    sf_dir: str, query: str = "data pipeline processing", k: int = 20
) -> pd.DataFrame:
    """Full-text keyword search over the corpus (the reference's FTS5
    virtual table, storage/schema.py:59-67, as a dataflow scan).

    Score = number of distinct query terms present in the document's
    lowercased word set; top-k by (score desc, doc_id). At scale this
    is a single streaming map + small top-k — no index server; a
    pre-built inverted index (gram table keyed by term) is the
    alternative when query volume is high.
    """
    terms = [t for t in query.lower().split() if t]

    def _score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        out_id: list[int] = []
        out_score: list[int] = []
        for i, t in enumerate(batch["canonical"].to_pylist()):
            words = set((t or "").lower().split(" "))
            s = sum(1 for term in terms if term in words)
            if s > 0:
                out_id.append(ids[i])
                out_score.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_score, pa.int64()),
            }
        )

    out = (
        canonical_docs(sf_dir)
        .map_batches(_score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


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
    max_samples_per_domain semantics, deterministic variant). One
    vectorized pass per coarse partition — no per-source dispatch."""
    from ..stages.grouped import partitioned_group_map

    def _head_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["source", "doc_id"])
            .group_by("source", maintain_order=True)
            .head(k)
        )
        return out.to_arrow().cast(
            pa.schema([("source", pa.string()), ("doc_id", pa.int64())])
        )

    return partitioned_group_map(
        _docs(sf_dir, ["source", "doc_id"]), "source", _head_part, arrow=True
    )


def vocab_stats(sf_dir: str) -> pd.DataFrame:
    """Single row: (n_docs, total_tokens, vocab_size) over canonical text.

    vocab_size is an exact distinct count via a token groupby (the
    sketch path would be an HLL per batch; exact here so the SQL oracle
    matches bit-for-bit)."""

    def _partial(batch: pa.Table) -> pa.Table:
        # per-batch combiner: shuffle distinct-tokens-per-block, not
        # every token occurrence (same shape as top_terms)
        import polars as pl

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

    token_counts = (
        canonical_docs(sf_dir)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_partial", alias_name="n"))
        .materialize()
    )
    vocab_size = token_counts.count()
    total_tokens = int(token_counts.sum("n")) if vocab_size else 0
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    return pd.DataFrame(
        {
            "n_docs": pd.array([n_docs], dtype="int64"),
            "total_tokens": pd.array([total_tokens], dtype="int64"),
            "vocab_size": pd.array([vocab_size], dtype="int64"),
        }
    )


def top_terms(sf_dir: str, k: int = 20, method: str = "exact") -> pd.DataFrame:
    """Heavy hitters: the k most frequent whitespace tokens over
    canonical text, ties broken by token ascending. Output: (token, n).

    method="exact" (the oracle-checked path): a per-batch combiner
    collapses each block to its distinct (token, partial-count) pairs
    before the groupby — shuffle volume is distinct-tokens-per-block,
    not total tokens — then a per-batch top-k combiner reduces the
    vocab-sized count table to k rows per block before the driver sort.

    method="sketch" (the shuffle-free scale path): one weighted
    Misra-Gries sketch per batch (functions/sketches.MisraGries),
    merged on the driver into a candidate set of <= capacity tokens;
    a second pass recounts ONLY candidates exactly (broadcast set,
    per-batch filtered combiner). Output equals the exact path whenever
    the true k-th count exceeds totalTokens/capacity — the standard
    two-pass distributed heavy-hitter guarantee, asserted in tests.
    """
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

    docs = canonical_docs(sf_dir)

    if method == "sketch":
        from ..functions.sketches import MisraGries

        def _sketch(batch: pa.Table) -> pa.Table:
            part = _partial(batch)
            mg = MisraGries()
            mg.update_many(part["token"].to_pylist(), part["n_partial"].to_pylist())
            import pickle

            return pa.table(
                {"sketch": pa.array([pickle.dumps(mg.counters)], pa.binary())}
            )

        import pickle

        merged = MisraGries()
        for b in docs.map_batches(_sketch, batch_format="pyarrow").iter_batches(
            batch_size=1024, batch_format="pyarrow"
        ):
            for blob in b["sketch"].to_pylist():
                other = MisraGries()
                other.counters = pickle.loads(blob)
                merged = merged.merge(other)
        cand_ref = ray.put(set(merged.candidates()))

        def _recount(batch: pa.Table) -> pa.Table:
            part = _partial(batch)
            cand = ray.get(cand_ref)
            mask = pa.array([t in cand for t in part["token"].to_pylist()])
            return part.filter(mask)

        counts = (
            docs.map_batches(_recount, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("n_partial", alias_name="n"))
        )
    else:
        counts = (
            docs.map_batches(_partial, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("n_partial", alias_name="n"))
        )

    def _topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch, sort_keys=[("n", "descending"), ("token", "ascending")]
        )
        return batch.take(order[:k])

    best = typed_pandas(
        counts.map_batches(_topk, batch_format="pyarrow"),
        {"token": "object", "n": "int64"},
    )
    best = best.sort_values(["n", "token"], ascending=[False, True]).head(k)
    best["n"] = best["n"].astype("int64")
    return best[["token", "n"]].reset_index(drop=True)


def length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact quantiles of document length: for each q the value at
    0-indexed position floor((n-1)*q) of (n_chars, doc_id) ascending
    order. Output: (q, n_chars).

    Scale shape: a global sort is NOT needed for exact quantiles of a
    low-cardinality integer column — one `groupby(n_chars).count()`
    shuffle builds the value histogram (distinct lengths are O(10^4)
    regardless of row count), and the driver walks the cumulative sum.
    This is the exact-counting analog of a quantile sketch; for
    high-cardinality doubles the same plan runs over binned values with
    a per-bin refinement pass.
    """
    hist = (
        _docs(sf_dir, ["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if hist.empty:  # quantiles of an empty corpus are an empty table
        return pd.DataFrame({"q": pd.array([], dtype="float64"),
                             "n_chars": pd.array([], dtype="int64")})
    hist = hist.sort_values("n_chars").reset_index(drop=True)
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    rows = []
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        target = int(np.floor((n - 1) * q))
        idx = int(np.searchsorted(cum.to_numpy(), target + 1))
        rows.append({"q": q, "n_chars": int(hist["n_chars"].iloc[idx])})
    out = pd.DataFrame(rows)
    out["q"] = out["q"].astype("float64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out


def length_quantiles_by_source(
    sf_dir: str, qs: "tuple[float, ...] | None" = None
) -> "rd.Dataset":
    """Exact per-group quantiles: for each source, the n_chars value at
    0-indexed position floor((n-1)*q) of that source's ascending length
    order, q in {0.25, 0.5, 0.75, 0.9}. Output: (source, q, n_chars).

    Scale shape: the grouped analog of `length_quantiles` — one
    `groupby(source, n_chars).count()` shuffle collapses 10^12 rows to
    per-source value histograms (distinct lengths are O(10^4) per
    source), then a second hash-partition on source walks each group's
    cumulative counts vectorized. No global sort, no per-group
    dispatch, and nothing row-shaped ever reaches the driver.
    """
    from ..stages.grouped import partitioned_group_map

    QS = qs if qs is not None else (0.25, 0.5, 0.75, 0.9)

    hist = (
        _docs(sf_dir, ["source", "n_chars"])
        .groupby(["source", "n_chars"])
        .aggregate(Count(alias_name="n"))
    )

    out_schema = pa.schema(
        [("source", pa.string()), ("q", pa.float64()), ("n_chars", pa.int64())]
    )

    def _walk(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["source", "n_chars"])
        srcs, qs, vals = [], [], []
        for (src,), g in df.group_by("source", maintain_order=True):
            counts = g["n"].to_numpy()
            lengths = g["n_chars"].to_numpy()
            cum = np.cumsum(counts)
            n = int(cum[-1])
            for q in QS:
                target = int(np.floor((n - 1) * q))
                srcs.append(src)
                qs.append(q)
                vals.append(int(lengths[np.searchsorted(cum, target + 1)]))
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "q": pa.array(qs, pa.float64()),
                "n_chars": pa.array(vals, pa.int64()),
            }
        ).cast(out_schema)

    return partitioned_group_map(hist, "source", _walk, arrow=True)


def winsorize_lengths_by_source(sf_dir: str) -> "rd.Dataset":
    """Robust per-source winsorization: clip every document's length at
    its source's exact p05/p95 rank values (the same
    value-at-floor((n-1)*q) rule as `length_quantiles_by_source`) —
    the outlier-taming transform applied before computing
    length-sensitive statistics or sampling weights.

    Scale shape: per-source cutoffs come from the existing histogram
    quantile walk (one (source, n_chars) groupby — never a sort), land
    as a tiny (source, lo, hi) table, and attach back via ONE broadcast
    lookup; clipping is a stateless vectorized map.
    Output (doc_id, n_chars, n_chars_winsorized)."""
    from ..stages.grouped import attach_lookup

    cuts = length_quantiles_by_source(sf_dir, qs=(0.05, 0.95))

    def _pivot(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .with_columns((pl.col("q") * 100).round().cast(pl.Int64).alias("qi"))
            .pivot(on="qi", index="source", values="n_chars")
            .rename({"5": "lo", "95": "hi"})
            # pack lo/hi into one int64 so a single attach resolves both
            .with_columns((pl.col("lo") * 10_000_000 + pl.col("hi")).alias("lohi"))
            .select(["source", "lohi"])
        )
        return out.to_arrow().cast(
            pa.schema([("source", pa.string()), ("lohi", pa.int64())])
        )

    cut_tbl = cuts.map_batches(_pivot, batch_format="pyarrow")

    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])
    _D_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    attached = attach_lookup(
        docs, _D_SCHEMA, ["source"], cut_tbl, "source", "lohi",
        pa.int64(), ["lohi"],
    )

    def _clip(batch: pa.Table) -> pa.Table:
        lohi = np.asarray(batch["lohi"], dtype=np.int64)
        lo = lohi // 10_000_000
        hi = lohi % 10_000_000
        n = np.asarray(batch["n_chars"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_chars": pa.array(n, pa.int64()),
                "n_chars_winsorized": pa.array(
                    np.minimum(np.maximum(n, lo), hi), pa.int64()
                ),
            }
        )

    return attached.map_batches(_clip, batch_format="pyarrow")


def winsorize_oracle_sql() -> str:
    """DuckDB twin of `winsorize_lengths_by_source` (same
    value-at-floor((n-1)*q) rank rule, same clip)."""
    return """
        WITH h AS (
            SELECT source, n_chars, COUNT(*) AS n
            FROM documents GROUP BY 1, 2
        ),
        c AS (
            SELECT source, n_chars,
                   SUM(n) OVER (PARTITION BY source ORDER BY n_chars
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(n) OVER (PARTITION BY source) AS tot
            FROM h
        ),
        lo AS (
            SELECT source, MIN(n_chars) AS v FROM c
            WHERE cum >= floor((tot - 1) * 0.05) + 1 GROUP BY source
        ),
        hi AS (
            SELECT source, MIN(n_chars) AS v FROM c
            WHERE cum >= floor((tot - 1) * 0.95) + 1 GROUP BY source
        )
        SELECT d.doc_id,
               CAST(d.n_chars AS BIGINT) AS n_chars,
               CAST(least(greatest(d.n_chars, lo.v), hi.v) AS BIGINT)
                   AS n_chars_winsorized
        FROM documents d
        JOIN lo ON lo.source = d.source
        JOIN hi ON hi.source = d.source
    """


def length_outliers(sf_dir: str, k_mad: int = 3) -> "rd.Dataset":
    """Robust per-group outlier filter (Gopher-style): documents whose
    length deviates from their source's median by more than `k_mad` x
    that source's MAD (median absolute deviation). All-integer exact —
    no float statistics. Output: (doc_id, source, n_chars, dev).

    Scale shape: medians come from per-source VALUE HISTOGRAMS (one
    groupby collapse + one tiny partitioned walk each — same plan as
    `length_quantiles_by_source`), never a global sort; the per-source
    median/MAD tables attach back to the row stream via `attach_lookup`
    (broadcast under 1M sources, partitioned join above). Two
    histogram rounds + two attaches, each row crossing each shuffle
    once.
    """
    from ..stages.grouped import attach_lookup, partitioned_group_map

    med_schema = pa.schema([("source", pa.string()), ("med", pa.int64())])

    def _grouped_median(hist: "rd.Dataset", value_col: str) -> "rd.Dataset":
        def _walk(tb: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(tb).sort(["source", value_col])
            srcs, meds = [], []
            for (src,), g in df.group_by("source", maintain_order=True):
                counts = g["n"].to_numpy()
                vals = g[value_col].to_numpy()
                cum = np.cumsum(counts)
                target = int(np.floor((int(cum[-1]) - 1) * 0.5))
                srcs.append(src)
                meds.append(int(vals[np.searchsorted(cum, target + 1)]))
            return pa.table(
                {"source": pa.array(srcs, pa.string()),
                 "med": pa.array(meds, pa.int64())}
            ).cast(med_schema)

        return partitioned_group_map(hist, "source", _walk, arrow=True)

    docs_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("n_chars", pa.int64())]
    )
    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    med = _grouped_median(
        docs.groupby(["source", "n_chars"]).aggregate(Count(alias_name="n")),
        "n_chars",
    )
    with_med = attach_lookup(
        docs, docs_schema, ["source"], med, "source", "med", pa.int64(), ["med"]
    )

    def _dev(batch: pa.Table) -> pa.Table:
        dev = pc.abs(pc.subtract(batch["n_chars"], batch["med"]))
        return batch.drop_columns(["med"]).append_column("dev", dev)

    devs = with_med.map_batches(_dev, batch_format="pyarrow").materialize()
    mad = _grouped_median(
        devs.groupby(["source", "dev"]).aggregate(Count(alias_name="n")), "dev"
    )
    dev_schema = pa.schema(list(docs_schema) + [pa.field("dev", pa.int64())])
    flagged = attach_lookup(
        devs, dev_schema, ["source"], mad, "source", "med", pa.int64(), ["mad"]
    )

    def _filter(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["dev"], pc.multiply(batch["mad"], pa.scalar(k_mad)))
        return batch.filter(keep).drop_columns(["mad"])

    return flagged.map_batches(_filter, batch_format="pyarrow")


def top_docs_per_source(sf_dir: str, k: int = 2) -> "rd.Dataset":
    """Group top-k: the k longest documents per source by
    (n_chars desc, doc_id asc), with a per-source rank. Output:
    (source, doc_id, n_chars, rank).

    Scale shape: sources are unbounded (domains), so this is the
    coarse-partitioned plan — hash-partition on source, ONE vectorized
    polars pass ranks every source in the partition. No global sort and
    no per-group dispatch; each partition emits <= k rows per source, so
    output stays small even when one source holds 10^9 docs.
    """
    from ..stages.grouped import partitioned_group_map

    def _rank_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["source", "n_chars", "doc_id"], descending=[False, True, False])
            .with_columns(
                (pl.int_range(pl.len()).over("source") + 1).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return out.select(["source", "doc_id", "n_chars", "rank"]).to_arrow().cast(
            pa.schema(
                [
                    ("source", pa.string()),
                    ("doc_id", pa.int64()),
                    ("n_chars", pa.int64()),
                    ("rank", pa.int64()),
                ]
            )
        )

    return partitioned_group_map(
        _docs(sf_dir, ["source", "doc_id", "n_chars"]), "source", _rank_part,
        arrow=True,
    )


def global_length_rank(sf_dir: str) -> "rd.Dataset":
    """Dense global rank of every document by (n_chars asc, doc_id asc)
    — the distributed ROW_NUMBER() over a full-corpus ordering, WITHOUT
    a global sort: (1) per-value counts (one bounded groupby over the
    value histogram); (2) driver cumsum of the (small) histogram is
    broadcast and each hash partition ranks its values locally — rank =
    values-before offset + position within the value group. Same
    two-phase scan as `training.pack_sequences`; all-integer.

    Output (doc_id, n_chars, rank), rank 1-based."""
    import polars as pl

    from ..stages.grouped import partitioned_group_map

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).materialize()
    hist = typed_pandas(
        ds.groupby("n_chars").aggregate(Count(alias_name="n")),
        {"n_chars": "int64", "n": "int64"},
    ).sort_values("n_chars")
    offs = hist["n"].cumsum().shift(fill_value=0)
    offsets_ref = ray.put(dict(zip(hist["n_chars"].astype(int), offs.astype(int))))

    def _rank(tb: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        df = pl.from_arrow(tb).sort(["n_chars", "doc_id"])
        df = df.with_columns(
            (pl.int_range(1, pl.len() + 1).over("n_chars")).alias("_local"),
            pl.col("n_chars")
            .replace_strict(offsets, return_dtype=pl.Int64)
            .alias("_off"),
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    df["_off"].to_numpy() + df["_local"].to_numpy(), pa.int64()
                ),
            }
        )

    return partitioned_group_map(ds, "n_chars", _rank, arrow=True)


def skyline_docs(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto-optimal set) over (n_chars max, quality max):
    documents not dominated by any other on both dimensions (see
    PAPERS.md, "Marrying Top-k with Skyline Queries", SIGMOD 2021, for
    the operator family).

    Skylines are distributive — the global skyline is contained in the
    union of per-block skylines — so each batch prunes its dominated
    rows locally with an O(n log n) sort-scan (no n^2 anywhere), and
    only the tiny local skylines travel to the final single-partition
    pass that runs the same kernel once over their union. Quality rides
    as exact micro-units; equal points are mutually non-dominating and
    all survive. Output (doc_id, n_chars, quality)."""
    import polars as pl

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
                "n_chars": batch["n_chars"],
                "q_u": pa.array(q_u, pa.int64()),
            }
        )

    def _local_skyline(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        # per-x group max, then running max of y over strictly-greater x
        gmax = (
            df.group_by("n_chars")
            .agg(pl.col("q_u").max().alias("_gmax"))
            .sort("n_chars", descending=True)
            .with_columns(
                pl.col("_gmax").cum_max().shift(1).alias("_better_x_max")
            )
        )
        out = df.join(gmax, on="n_chars")
        keep = (pl.col("q_u") == pl.col("_gmax")) & (
            pl.col("_better_x_max").is_null()
            | (pl.col("q_u") > pl.col("_better_x_max"))
        )
        return (
            out.filter(keep)
            .select(["doc_id", "n_chars", "q_u"])
            .to_arrow()
            .cast(batch.schema)
        )

    local = (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(_scored, batch_format="pyarrow")
        .map_batches(_local_skyline, batch_format="pyarrow")
        .repartition(1)
    )
    # final pass over the union of local skylines (batch_size=None ->
    # the whole single block in one call)
    sky = typed_pandas(
        local.map_batches(_local_skyline, batch_format="pyarrow", batch_size=None),
        {"doc_id": "int64", "n_chars": "int64", "q_u": "int64"},
    )
    sky["quality"] = sky.pop("q_u") / 1e6
    return sky.sort_values("doc_id").reset_index(drop=True)


# spam keyword list verbatim from the reference heuristic scorer
# (/root/reference/src/quarrycore/quality/heuristic_scorer.py:47-59)
SPAM_KEYWORDS = (
    "free", "win", "winner", "cash", "prize", "limited time",
    "offer", "subscribe", "buy now", "click here", "urgent",
)
# full ASCII whitespace of str.strip() incl. vertical-tab/form-feed
# (reference scorers use str.strip(); SQL oracles trim the same set)
_WS = " \n\t\r\x0b\x0c"


def heuristic_quality_docs(sf_dir: str) -> "rd.Dataset":
    """Reference heuristic + grammar-fallback quality scores, fully
    vectorized (one stateless map_batches, no shuffle):

    spam_score — /root/reference/src/quarrycore/quality/heuristic_scorer.py:111-136:
      mean of min(spam_kw_hits/5, 1), min(upper_ratio/0.3, 1),
      min((n_excl/(n_dot+1))/0.1, 1); 0.0 for empty docs.
    grammar_score — .../quality/grammar_scorer.py:93-148 (the
      LanguageTool-absent fallback, the one this env would run):
      1 - 0.05 * penalties, clamped to [0,1]; penalties = sentences not
      starting with a capital + sentences with <3 or >50 words
      + 2*(double space) + 2*(missing space after punctuation)
      + (repeated punctuation). Uppercase/capital checks are ASCII
      [A-Z] (reference uses str.isupper(); identical on this corpus).

    Output (doc_id, spam_score, grammar_score), floor-rounded 6 dp.
    """
    import polars as pl

    from ..exactmath import floor_round_np

    def _score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        lower = pc.utf8_lower(text)
        n_words = np.asarray(
            pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64())
        )
        n_chars = np.asarray(pc.cast(pc.utf8_length(text), pa.int64()))

        kw_hits = np.zeros(batch.num_rows, dtype=np.int64)
        for k in SPAM_KEYWORDS:
            kw_hits += np.asarray(
                pc.cast(pc.match_substring(lower, pattern=k), pa.int64())
            )
        upper = np.asarray(
            pc.cast(pc.count_substring_regex(text, pattern="[A-Z]"), pa.int64())
        )
        n_excl = np.asarray(
            pc.cast(pc.count_substring(text, pattern="!"), pa.int64())
        )
        n_dot = np.asarray(
            pc.cast(pc.count_substring(text, pattern="."), pa.int64())
        )
        s_kw = np.minimum(kw_hits / 5.0, 1.0)
        with np.errstate(invalid="ignore"):
            s_up = np.minimum(
                np.where(n_chars > 0, upper / np.maximum(n_chars, 1), 0.0) / 0.3,
                1.0,
            )
        s_ex = np.minimum((n_excl / (n_dot + 1)) / 0.1, 1.0)
        spam = np.where(n_words == 0, 0.0, (s_kw + s_up + s_ex) / 3)

        # grammar fallback: per-sentence penalties via one polars pass
        sent = (
            pl.from_arrow(pa.table({"t": text}))
            .with_row_index("_i")
            .with_columns(pl.col("t").str.split(".").alias("s"))
            .explode("s")
            .with_columns(pl.col("s").str.strip_chars(_WS).alias("s"))
            .filter(pl.col("s") != "")
            .with_columns(
                (~pl.col("s").str.contains(r"^[A-Z]")).cast(pl.Int64).alias("cap"),
                pl.col("s").str.count_matches(r"\S+").alias("nw"),
            )
            .with_columns(
                ((pl.col("nw") < 3) | (pl.col("nw") > 50))
                .cast(pl.Int64)
                .alias("ln")
            )
            .group_by("_i")
            .agg(pl.col("cap").sum(), pl.col("ln").sum())
        )
        pen = np.zeros(batch.num_rows, dtype=np.int64)
        idx = sent["_i"].to_numpy().astype(np.int64)
        pen[idx] += sent["cap"].to_numpy().astype(np.int64)
        pen[idx] += sent["ln"].to_numpy().astype(np.int64)
        pen += 2 * np.asarray(
            pc.cast(pc.match_substring(text, pattern="  "), pa.int64())
        )
        pen += 2 * np.asarray(
            pc.cast(
                pc.match_substring_regex(text, pattern=r"[,.!?][a-zA-Z]"),
                pa.int64(),
            )
        )
        pen += np.asarray(
            pc.cast(
                pc.match_substring_regex(text, pattern=r"[.!?]{2,}"), pa.int64()
            )
        )
        grammar = np.maximum(0.0, np.minimum(1.0, 1.0 - pen * 0.05))

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "spam_score": pa.array(floor_round_np(spam), pa.float64()),
                "grammar_score": pa.array(floor_round_np(grammar), pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


def lexical_quality_docs(sf_dir: str) -> "rd.Dataset":
    """Reference lexical scorer metrics
    (/root/reference/src/quarrycore/quality/lexical_scorer.py:12-60),
    vectorized, one stateless map_batches:

      lexical_diversity    type-token ratio over the single-space split
                           of canonical text (calculate_lexical_diversity)
      avg_sentence_length  \\S+ words / non-empty '.'-split sentences
      flesch               206.835 - 1.015*ASL - 84.6*(syllables/word),
                           syllables = lowercase [aeiouy]+ vowel groups —
                           a deterministic proxy for textstat's counter
                           (library absent in this env; formula is the
                           published Flesch reading-ease)

    All 0.0 for docs with no words. Output (doc_id, lexical_diversity,
    avg_sentence_length, flesch), floor-rounded 6 dp."""
    import polars as pl

    from ..exactmath import floor_round_np

    def _score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        canon = normalize_whitespace_array(text)
        n_words = np.asarray(
            pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64())
        )
        syll = np.asarray(
            pc.cast(
                pc.count_substring_regex(
                    pc.utf8_lower(text), pattern=r"[aeiouy]+"
                ),
                pa.int64(),
            )
        )
        df = pl.from_arrow(pa.table({"t": text, "c": canon}))
        n_sent = (
            df.select(
                pl.col("t")
                .str.split(".")
                .list.eval(
                    pl.element().str.strip_chars(_WS).ne("").cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        n_distinct = (
            df.select(
                pl.col("c").str.split(" ").list.n_unique().alias("u")
            )["u"]
            .to_numpy()
            .astype(np.int64)
        )
        n_canon_words = np.asarray(
            pc.cast(pc.list_value_length(pc.split_pattern(canon, " ")), pa.int64())
        )
        has = n_words > 0
        div = np.where(has, n_distinct / np.maximum(n_canon_words, 1), 0.0)
        asl = np.where(
            has, n_words / np.maximum(n_sent, 1), 0.0
        )
        flesch = np.where(
            has,
            206.835
            - 1.015 * asl
            - 84.6 * (syll / np.maximum(n_words, 1)),
            0.0,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lexical_diversity": pa.array(floor_round_np(div), pa.float64()),
                "avg_sentence_length": pa.array(
                    floor_round_np(asl), pa.float64()
                ),
                "flesch": pa.array(floor_round_np(flesch), pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


# verbatim pattern lists from the reference extraction-confidence scorer
# (/root/reference/src/quarrycore/extractor/confidence_scorer.py:57-73)
_GOOD_PATTERNS = (
    r"\b(article|paragraph|section|content)\b",
    r"\b(introduction|conclusion|summary)\b",
    r"\b(first|second|third|finally|however|therefore)\b",
)
_BAD_PATTERNS = (
    r"\b(click here|read more|advertisement|sponsored)\b",
    r"\b(cookie|privacy|terms|conditions)\b",
    r"\b(loading|error|404|not found)\b",
)
_NAV_PATTERNS = (
    r"\b(home|about|contact|menu|navigation)\b",
    r"\b(previous|next|back|forward)\b",
    r"\b(login|register|sign up|sign in)\b",
)


def extraction_confidence_docs(sf_dir: str) -> "rd.Dataset":
    """Reference extraction-confidence score for text-only inputs
    (/root/reference/src/quarrycore/extractor/confidence_scorer.py:77-129
    weights; component formulas 134-235), one vectorized map_batches:

      content_length  bucketed by len(text) (134-152)
      structure       +0.3 words>50, +0.2 sentences>3, +0.2 paragraphs>1,
                      +0.3 type-token ratio>0.3, capped 1.0 (154-175)
      text_quality    base 0.5 + good-pattern boost - bad/nav penalties
                      (per-100-char densities), +0.1 sentence-length
                      bonus, -0.2 high-repetition penalty, clamped
                      (177-235)
      method          0.60 ('heuristic_fallback' — our regex cascade's
                      reliability class, 44-53)
      html/domain     0.5 each (no original HTML / no crawl URL, the
                      reference's no-context defaults, 249/310)

      confidence = 0.15*cl + 0.20*st + 0.25*tq + 0.15*0.6 + 0.15*0.5
                   + 0.10*0.5, clamped to [0,1] (34-41, 118-129).

    Sentence/paragraph counts (the reference takes them from upstream
    extraction) are defined here as non-empty '.'-split segments and
    non-empty blank-line blocks. Output (doc_id, content_length_score,
    structure_score, text_quality_score, confidence), 6 dp."""
    import polars as pl

    from ..exactmath import floor_round_np

    def _score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        lower = pc.utf8_lower(text)
        n_chars = np.asarray(pc.cast(pc.utf8_length(text), pa.int64()))
        n_words = np.asarray(
            pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64())
        )

        # content length buckets (confidence_scorer.py:134-152)
        cl = np.select(
            [
                n_chars < 50,
                n_chars < 200,
                n_chars < 500,
                n_chars <= 5000,
                n_chars <= 10000,
                n_chars <= 20000,
            ],
            [0.0, 0.3, 0.6, 1.0, 0.9, 0.7],
            default=0.5,
        )

        df = pl.from_arrow(pa.table({"t": text, "lt": lower}))
        n_sent = (
            df.select(
                pl.col("t")
                .str.split(".")
                .list.eval(
                    pl.element().str.strip_chars(_WS).ne("").cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        n_para = (
            df.select(
                pl.col("t")
                .str.split("\n\n")
                .list.eval(
                    pl.element().str.strip_chars(_WS).ne("").cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        wstats = df.select(
            pl.col("lt")
            .str.extract_all(r"\S+")
            .list.n_unique()
            .alias("u"),
        )
        n_uniq = wstats["u"].to_numpy().astype(np.int64)
        diversity = np.where(n_words > 0, n_uniq / np.maximum(n_words, 1), 0.0)

        st = (
            np.where(n_words > 50, 0.3, 0.0)
            + np.where(n_sent > 3, 0.2, 0.0)
            + np.where(n_para > 1, 0.2, 0.0)
            + np.where(diversity > 0.3, 0.3, 0.0)
        )
        st = np.minimum(1.0, st)

        # text quality (confidence_scorer.py:177-235)
        def _count(patterns) -> np.ndarray:
            tot = np.zeros(len(n_chars), dtype=np.int64)
            for p in patterns:
                tot += np.asarray(
                    pc.cast(pc.count_substring_regex(lower, pattern=p), pa.int64())
                )
            return tot

        good, bad, nav = _count(_GOOD_PATTERNS), _count(_BAD_PATTERNS), _count(_NAV_PATTERNS)
        ln = np.maximum(n_chars, 1)
        tq = 0.5 + np.minimum(0.3, (good * 100) / ln * 10)
        tq = tq - np.minimum(0.4, (bad * 100) / ln * 20)
        tq = tq - np.minimum(0.2, (nav * 100) / ln * 15)
        # sentence-structure bonus: [.!?]+ split, stripped len > 10
        n_valid = (
            df.select(
                pl.col("t")
                .str.extract_all(r"[^.!?]+")
                .list.eval(
                    (pl.element().str.strip_chars(_WS).str.len_chars() > 10)
                    .cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        avg_sl = np.where(n_valid > 0, n_chars / np.maximum(n_valid, 1), 0.0)
        tq = tq + np.where((n_valid > 0) & (avg_sl >= 50) & (avg_sl <= 150), 0.1, 0.0)
        tq = tq - np.where((n_words > 20) & (diversity < 0.3), 0.2, 0.0)
        tq = np.where(n_chars == 0, 0.0, np.maximum(0.0, np.minimum(1.0, tq)))

        conf = (
            cl * 0.15 + st * 0.20 + tq * 0.25 + 0.6 * 0.15 + 0.5 * 0.15 + 0.5 * 0.10
        )
        conf = np.maximum(0.0, np.minimum(1.0, conf))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_length_score": pa.array(floor_round_np(cl), pa.float64()),
                "structure_score": pa.array(floor_round_np(st), pa.float64()),
                "text_quality_score": pa.array(floor_round_np(tq), pa.float64()),
                "confidence": pa.array(floor_round_np(conf), pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


# stop-word set verbatim from the reference content analyzer
# (/root/reference/src/quarrycore/metadata/content_analyzer.py:139-218)
ANALYZER_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with this but they have had what said each which she do how "
    "their if up out many then them these so some her would make like into him "
    "time two more go no way could my than first been call who oil sit now "
    "find down day did get come made may part".split()
)


def reading_metrics_docs(sf_dir: str, mattr_window: int = 100) -> "rd.Dataset":
    """Reference content-analyzer reading + lexical metrics
    (/root/reference/src/quarrycore/metadata/content_analyzer.py:438-533,
    683-743), one stateless map_batches (per-doc O(tokens) kernels):

      word/sentence/paragraph counts, reading time (200 WPM), average
      words-per-sentence and characters-per-word, syllable estimate
      (vowel groups, silent trailing 'e', min 1/word), Flesch reading
      ease (clamped 0..100) and Flesch-Kincaid grade, complex-word
      count (>= 3 syllables), stopword-filtered type-token ratio,
      MATTR (window 100), and vocabulary richness (1 - Simpson
      concentration).

    MATTR and richness are reformulated to mathematically-equal exact
    integer forms so the floats are reduction-order-free: MATTR =
    (sum over windows of distinct counts) / (100 * n_windows), with the
    per-token contribution counted via previous-occurrence positions in
    O(n); richness = 1 - sum(freq^2)/total^2. Tokens are \\b\\w+\\b over
    lowercased text (ASCII corpus; reference uses the same regex),
    filtered to length > 1; 'content words' further drop the
    reference's 68-word stoplist."""
    import re as _re

    word_re = _re.compile(r"\b\w+\b")
    vowel_re = _re.compile(r"[aeiouy]+")
    sent_re = _re.compile(r"[.!?]+")

    from ..exactmath import floor_round_np

    from ..functions.textstats import syllables_word as _syl

    def _one(text: str) -> tuple:
        words_all = word_re.findall(text.lower())
        words = [w for w in words_all if len(w) > 1]
        wc = len(words)
        sc = sum(1 for s in sent_re.split(text) if s.strip())
        pc_ = sum(1 for p in text.split("\n\n") if p.strip())
        syll = sum(_syl(w) for w in words_all)
        n_complex = sum(1 for w in words if _syl(w) >= 3)
        sum_chars = sum(len(w) for w in words)
        content = [w for w in words if w not in ANALYZER_STOPWORDS]
        n = len(content)
        uniq = len(set(content))
        from ..functions.textstats import mattr_fraction

        mattr_num, mattr_den = mattr_fraction(content, mattr_window)
        freq: dict = {}
        for w in content:
            freq[w] = freq.get(w, 0) + 1
        sq = sum(v * v for v in freq.values())
        return (wc, sc, pc_, syll, n_complex, sum_chars, n, uniq,
                mattr_num, mattr_den, sq)

    def _score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        # reshape keeps the 11-way unpack valid on zero-row batches
        # (np.array([]) is shape (0,), not (0, 11))
        rows = np.array([_one(t) for t in texts], dtype=np.float64).reshape(-1, 11)
        (wc, sc, pc_, syll, n_complex, sum_chars, n, uniq,
         m_num, m_den, sq) = rows.T
        chars = np.asarray(pc.cast(pc.utf8_length(batch["text"]), pa.int64()))
        ok = (sc > 0) & (wc > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            wps = np.where(sc > 0, wc / np.maximum(sc, 1), 0.0)
            cpw = np.where(wc > 0, sum_chars / np.maximum(wc, 1), 0.0)
            rt = np.where(wc > 0, wc / 200, 0.0)
            flesch = np.where(
                ok,
                np.maximum(
                    0.0,
                    np.minimum(
                        100.0,
                        206.835
                        - (1.015 * (wc / np.maximum(sc, 1)))
                        - (84.6 * (syll / np.maximum(wc, 1))),
                    ),
                ),
                0.0,
            )
            fk = np.where(
                ok,
                np.maximum(
                    0.0,
                    (0.39 * (wc / np.maximum(sc, 1)))
                    + (11.8 * (syll / np.maximum(wc, 1)))
                    - 15.59,
                ),
                0.0,
            )
            ttr = np.where(n > 0, uniq / np.maximum(n, 1), 0.0)
            mattr = np.where(n > 0, m_num / np.maximum(m_den, 1), 0.0)
            rich = np.where(
                n > 0, 1.0 - sq / np.maximum(n * n, 1), 0.0
            )
        ints = {
            "word_count": wc, "sentence_count": sc, "paragraph_count": pc_,
            "syllables": syll, "complex_words": n_complex,
        }
        out = {"doc_id": batch["doc_id"]}
        out.update(
            {k: pa.array(v.astype(np.int64), pa.int64()) for k, v in ints.items()}
        )
        for k, v in (
            ("reading_time", rt), ("avg_words_per_sentence", wps),
            ("avg_chars_per_word", cpw), ("flesch", flesch),
            ("fk_grade", fk), ("ttr", ttr), ("mattr", mattr),
            ("vocab_richness", rich),
        ):
            out[k] = pa.array(floor_round_np(v), pa.float64())
        _ = chars  # character_count available upstream; not emitted
        return pa.table(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


def quality_indicators_docs(sf_dir: str) -> "rd.Dataset":
    """Reference content-analyzer quality indicators
    (/root/reference/src/quarrycore/metadata/content_analyzer.py:744-838),
    one vectorized map_batches:

      proper_capitalization  >80% of [.!?]+-split segments start with a
                             capital (ratio test done as 5*proper > 4*n —
                             exact integers, mathematically equal)
      proper_punctuation     the reference path reduces to "text
                             contains '.'" (757-768)
      spelling_ok            long-word/digit-word/camelCase pattern count
                             under 5% of words (20*errors < words)
      coherent               mean words per non-empty sentence in [10,25]
                             (10*n <= sum <= 25*n)
      completeness           bucketed length/structure/paragraph/depth/
                             info score, computed in integer tenths then
                             divided once (803-838)

    Flags are int64 0/1; completeness is float (exact tenths)."""
    import polars as pl

    def _score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        lower = pc.utf8_lower(text)
        n_seg = (
            np.asarray(
                pc.cast(
                    pc.count_substring_regex(text, pattern=r"[.!?]+"), pa.int64()
                )
            )
            + 1
        )
        df = pl.from_arrow(pa.table({"t": text}))
        seg = df.select(
            pl.col("t")
            .str.extract_all(r"[^.!?]+")
            .list.eval(pl.element().str.strip_chars(_WS))
            .alias("s")
        )
        proper = (
            seg.select(
                pl.col("s")
                .list.eval(
                    (pl.element().ne("") & pl.element().str.contains(r"^[A-Z]"))
                    .cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        n_nonempty = (
            seg.select(
                pl.col("s")
                .list.eval(pl.element().ne("").cast(pl.Int64))
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        cap_ok = (5 * proper > 4 * n_seg).astype(np.int64)

        punct_ok = np.asarray(
            pc.cast(pc.match_substring(text, pattern="."), pa.int64())
        )

        wc = np.asarray(
            pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64())
        )
        errors = np.zeros(batch.num_rows, dtype=np.int64)
        for p in (r"\b\w*\w\w\w\w+\b", r"\b\w*[0-9]+\w*\b", r"[a-z][A-Z]"):
            errors += np.asarray(
                pc.cast(pc.count_substring_regex(text, pattern=p), pa.int64())
            )
        spelling_ok = ((wc > 0) & (20 * errors < wc)).astype(np.int64)

        sent_words = np.asarray(
            pc.cast(
                pc.count_substring_regex(text, pattern=r"[^\s.!?]+"), pa.int64()
            )
        )
        coherent = (
            (n_nonempty > 0)
            & (10 * n_nonempty <= sent_words)
            & (sent_words <= 25 * n_nonempty)
        ).astype(np.int64)

        n_para = (
            df.select(
                pl.col("t")
                .str.split("\n\n")
                .list.eval(
                    pl.element().str.strip_chars(_WS).ne("").cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        depth = np.zeros(batch.num_rows, dtype=bool)
        for w in ("because", "therefore", "however", "although"):
            depth |= np.asarray(pc.match_substring(lower, pattern=w))
        info = np.zeros(batch.num_rows, dtype=bool)
        for w in ("study", "research", "analysis", "data", "results"):
            info |= np.asarray(pc.match_substring(lower, pattern=w))
        tenths = (
            np.select([wc >= 300, wc >= 100, wc >= 50], [3, 2, 1], default=0)
            + np.select([n_seg >= 5, n_seg >= 3], [2, 1], default=0)
            + np.select([n_para >= 3, n_para >= 2], [2, 1], default=0)
            + np.where(depth, 2, 0)
            + np.where(info, 1, 0)
        )
        completeness = np.minimum(tenths, 10) / 10.0

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "proper_capitalization": pa.array(cap_ok, pa.int64()),
                "proper_punctuation": pa.array(punct_ok, pa.int64()),
                "spelling_ok": pa.array(spelling_ok, pa.int64()),
                "coherent": pa.array(coherent, pa.int64()),
                "completeness": pa.array(completeness, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


def content_composite_scores(sf_dir: str) -> "rd.Dataset":
    """Reference composite content scores — the content analyzer's
    final quality / readability / engagement rollups
    (/root/reference/src/quarrycore/metadata/content_analyzer.py:852-953)
    over text-only input (all HTML-derived flags are False and
    meta_completeness 0, the reference's own no-HTML defaults):

      quality_score      word-count + Flesch-band + diversity +
                         richness bonuses, text-flag structure share
                         (k/7*0.25) and completeness*0.1, capped 1.0
      readability_score  bucketed Flesch (0.5 when Flesch is 0/undefined)
      engagement_score   length band + reading-time band +
                         readability*0.2, capped 1.0

    Sub-metrics reuse the exact ported definitions (reading_metrics /
    quality_indicators); comparisons run on UNROUNDED values with
    integer-exact ratio tests where the reference divides. One
    stateless map_batches. Output (doc_id, quality_score,
    readability_score, engagement_score), 6 dp."""
    import re as _re

    from ..exactmath import floor_round_np
    from ..functions.textstats import mattr_fraction, syllables_word

    word_re = _re.compile(r"\b\w+\b")
    sent_re = _re.compile(r"[.!?]+")
    ws_re = _re.compile(r"\S+")
    seg_ws = " \n\t\r"

    def _one(text: str) -> tuple:
        words_all = word_re.findall(text.lower())
        words = [w for w in words_all if len(w) > 1]
        wc = len(words)
        segs = sent_re.split(text)
        sc = sum(1 for s in segs if s.strip(seg_ws))
        syll = sum(syllables_word(w) for w in words_all)
        ok = sc > 0 and wc > 0
        flesch = (
            max(0.0, min(100.0, 206.835 - (1.015 * (wc / sc)) - (84.6 * (syll / wc))))
            if ok
            else 0.0
        )
        content = [w for w in words if w not in ANALYZER_STOPWORDS]
        n = len(content)
        uniq = len(set(content))
        ttr = uniq / n if n else 0.0
        m_num, m_den = mattr_fraction(content, 100)
        mattr = m_num / m_den if n else 0.0
        diversity = (ttr + mattr) / 2
        freq: dict = {}
        for w in content:
            freq[w] = freq.get(w, 0) + 1
        sq = sum(v * v for v in freq.values())
        richness = 1.0 - sq / (n * n) if n else 0.0
        return (wc, sc, syll, ok, flesch, diversity, richness)

    def _score(batch: pa.Table) -> pa.Table:
        import polars as pl

        text_col = batch["text"]
        texts = text_col.to_pylist()
        rows = [_one(t) for t in texts]
        wc = np.array([r[0] for r in rows], dtype=np.int64)
        ok = np.array([r[3] for r in rows], dtype=bool)
        flesch = np.array([r[4] for r in rows], dtype=np.float64)
        diversity = np.array([r[5] for r in rows], dtype=np.float64)
        richness = np.array([r[6] for r in rows], dtype=np.float64)

        # text-flag indicators, identical to quality_indicators_docs
        n_seg = (
            np.asarray(
                pc.cast(
                    pc.count_substring_regex(text_col, pattern=r"[.!?]+"),
                    pa.int64(),
                )
            )
            + 1
        )
        df = pl.from_arrow(pa.table({"t": text_col}))
        seg = df.select(
            pl.col("t")
            .str.extract_all(r"[^.!?]+")
            .list.eval(pl.element().str.strip_chars(_WS))
            .alias("s")
        )
        proper = (
            seg.select(
                pl.col("s")
                .list.eval(
                    (pl.element().ne("") & pl.element().str.contains(r"^[A-Z]"))
                    .cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        n_nonempty = (
            seg.select(
                pl.col("s")
                .list.eval(pl.element().ne("").cast(pl.Int64))
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        cap = 5 * proper > 4 * n_seg
        punct = np.asarray(pc.match_substring(text_col, pattern="."))
        wc_ws = np.asarray(
            pc.cast(pc.count_substring_regex(text_col, pattern=r"\S+"), pa.int64())
        )
        errors = np.zeros(batch.num_rows, dtype=np.int64)
        for p in (r"\b\w*\w\w\w\w+\b", r"\b\w*[0-9]+\w*\b", r"[a-z][A-Z]"):
            errors += np.asarray(
                pc.cast(pc.count_substring_regex(text_col, pattern=p), pa.int64())
            )
        typos_ok = (wc_ws > 0) & (20 * errors < wc_ws)
        sent_words = np.asarray(
            pc.cast(
                pc.count_substring_regex(text_col, pattern=r"[^\s.!?]+"),
                pa.int64(),
            )
        )
        coherent = (
            (n_nonempty > 0)
            & (10 * n_nonempty <= sent_words)
            & (sent_words <= 25 * n_nonempty)
        )
        n_para = (
            df.select(
                pl.col("t")
                .str.split("\n\n")
                .list.eval(
                    pl.element().str.strip_chars(_WS).ne("").cast(pl.Int64)
                )
                .list.sum()
                .alias("n")
            )["n"]
            .to_numpy()
            .astype(np.int64)
        )
        lower = pc.utf8_lower(text_col)
        depth = np.zeros(batch.num_rows, dtype=bool)
        for w in ("because", "therefore", "however", "although"):
            depth |= np.asarray(pc.match_substring(lower, pattern=w))
        info = np.zeros(batch.num_rows, dtype=bool)
        for w in ("study", "research", "analysis", "data", "results"):
            info |= np.asarray(pc.match_substring(lower, pattern=w))
        tenths = (
            np.select([wc_ws >= 300, wc_ws >= 100, wc_ws >= 50], [3, 2, 1], default=0)
            + np.select([n_seg >= 5, n_seg >= 3], [2, 1], default=0)
            + np.select([n_para >= 3, n_para >= 2], [2, 1], default=0)
            + np.where(depth, 2, 0)
            + np.where(info, 1, 0)
        )
        completeness = np.minimum(tenths, 10) / 10.0

        # quality composite (content_analyzer.py:852-899)
        flesch_truthy = ok & (flesch != 0.0)
        q = np.where(wc >= 100, 0.1, 0.0)
        q = q + np.where(
            flesch_truthy & (flesch >= 30) & (flesch <= 70),
            0.2,
            np.where(flesch_truthy & (flesch >= 20) & (flesch <= 80), 0.1, 0.0),
        )
        q = q + np.where(diversity > 0.3, 0.15, np.where(diversity > 0.2, 0.1, 0.0))
        q = q + np.where(richness > 0.7, 0.1, np.where(richness > 0.5, 0.05, 0.0))
        k = (
            cap.astype(np.int64)
            + punct.astype(np.int64)
            + typos_ok.astype(np.int64)
            + coherent.astype(np.int64)
        )
        struct = k / 7 * 0.25
        q = q + ((struct + 0.0) + completeness * 0.1)
        quality = np.minimum(1.0, q)

        # readability buckets (902-920)
        readability = np.select(
            [
                ~flesch_truthy,
                (flesch >= 40) & (flesch <= 60),
                (flesch >= 30) & (flesch <= 70),
                (flesch >= 20) & (flesch <= 80),
                (flesch >= 10) & (flesch <= 90),
            ],
            [0.5, 1.0, 0.8, 0.6, 0.4],
            default=0.2,
        )

        # engagement (922-953): length band + reading-time band +
        # readability*0.2 (HTML flags all False for text input)
        rt = np.where(wc > 0, wc / 200, 0.0)
        e = np.select(
            [(wc >= 300) & (wc <= 1500), (wc >= 150) & (wc <= 2500), wc >= 100],
            [0.3, 0.2, 0.1],
            default=0.0,
        )
        e = e + np.select(
            [(rt >= 2) & (rt <= 8), (rt >= 1) & (rt <= 12)], [0.2, 0.1], default=0.0
        )
        e = e + readability * 0.2
        engagement = np.minimum(1.0, e)

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality_score": pa.array(floor_round_np(quality), pa.float64()),
                "readability_score": pa.array(
                    floor_round_np(readability), pa.float64()
                ),
                "engagement_score": pa.array(
                    floor_round_np(engagement), pa.float64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _score, batch_format="pyarrow"
    )


# boilerplate-removal cascade verbatim from the reference TextProcessor
# (/root/reference/src/quarrycore/extractor/content_processors.py:50-67)
BOILERPLATE_PATTERNS = (
    r"\b(home|about|contact|menu|navigation|nav|sidebar)\b.*?(?:\n|$)",
    r"\b(login|register|sign up|sign in|logout)\b.*?(?:\n|$)",
    r"\b(previous|next|back|forward|continue)\b.*?(?:\n|$)",
    r"\b(advertisement|sponsored|ads?|promotion)\b.*?(?:\n|$)",
    r"\b(click here|read more|learn more|view all)\b.*?(?:\n|$)",
    r"\b(copyright|©|\(c\)|privacy|terms|conditions|policy)\b.*?(?:\n|$)",
    r"\b(all rights reserved|disclaimer|legal)\b.*?(?:\n|$)",
    r"\b(share|tweet|like|follow|subscribe)\b.*?(?:\n|$)",
    r"\b(facebook|twitter|instagram|linkedin|youtube)\b.*?(?:\n|$)",
    r"\b(loading|please wait|error|404|not found)\b.*?(?:\n|$)",
    r"\b(javascript|cookies?|enable|disable)\b.*?(?:\n|$)",
)


def clean_text_docs(sf_dir: str) -> "rd.Dataset":
    """Reference TextProcessor.clean_text
    (/root/reference/src/quarrycore/extractor/content_processors.py:79-144)
    as a stateless map_batches: the 11-pattern boilerplate-line removal
    cascade (case-insensitive, line-anchored), structure-preserving
    whitespace normalization (per-line strip + collapse, paragraph
    breaks kept), excess-blank-line squeeze, final strip. Output
    (doc_id, cleaned).

    The per-line split/strip/rejoin of the reference is expressed as an
    equivalent regex chain (collapse non-newline whitespace runs, strip
    line edges) so the DuckDB oracle can mirror it operator-for-operator
    with the same RE2 semantics."""
    import re as _re

    pats = [
        _re.compile(p, _re.IGNORECASE | _re.MULTILINE)
        for p in BOILERPLATE_PATTERNS
    ]
    inline_ws = _re.compile(r"[^\S\n]+")
    edge_ws = _re.compile(r"(?m)^ +| +$")
    para = _re.compile(r"\n\s*\n")
    blanks = _re.compile(r"\n{3,}")

    def _clean_one(text: str) -> str:
        if not text:
            return ""
        for p in pats:
            text = p.sub("", text)
        text = inline_ws.sub(" ", text)
        text = edge_ws.sub("", text)
        text = para.sub("\n\n", text)
        text = blanks.sub("\n\n", text)
        return text.strip()

    def _clean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "cleaned": pa.array(
                    [_clean_one(t) for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _clean, batch_format="pyarrow"
    )


def clean_text_oracle_sql(table: str = "documents") -> str:
    """The DuckDB twin of `clean_text_docs`, built from the same
    pattern list — one regexp_replace per cascade step."""
    expr = "text"
    for p in BOILERPLATE_PATTERNS:
        expr = f"regexp_replace({expr}, '{p}', '', 'gim')"
    expr = f"regexp_replace({expr}, '[^\\S\\n]+', ' ', 'g')"
    expr = f"regexp_replace({expr}, '(?m)^ +| +$', '', 'g')"
    expr = f"regexp_replace({expr}, '\\n\\s*\\n', chr(10) || chr(10), 'g')"
    expr = f"regexp_replace({expr}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return (
        f"SELECT doc_id, CASE WHEN text = '' THEN '' ELSE "
        f"trim({expr}, ' ' || chr(10) || chr(9) || chr(13)) END AS cleaned "
        f"FROM {table}"
    )


def markdown_structure_docs(sf_dir: str) -> "rd.Dataset":
    """Reference TextProcessor.extract_structured_content
    (/root/reference/src/quarrycore/extractor/content_processors.py:146-186):
    classify each stripped non-empty line as header (#{1,6} ), list item
    ('-•* ' or 'N. '), quote ('> '), or paragraph (len > 20), in that
    precedence order. Emitted as counts plus first-of-kind columns so
    the DuckDB oracle compares scalars, not nested lists. Output
    (doc_id, n_headers, n_lists, n_quotes, n_paragraphs, first_header,
    first_list_item)."""
    import re as _re

    hdr = _re.compile(r"^#{1,6}\s+(.+)$")
    li = _re.compile(r"^[-•*]\s+(.+)$")
    nli = _re.compile(r"^\d+\.\s+(.+)$")
    qt = _re.compile(r"^>\s+(.+)$")

    def _one(text: str) -> tuple:
        nh = nl = nq = np_ = 0
        fh = fl = ""
        for line in text.split("\n"):
            line = line.strip()
            if not line:
                continue
            m = hdr.match(line)
            if m:
                nh += 1
                if not fh:
                    fh = m.group(1)
                continue
            m = li.match(line) or nli.match(line)
            if m:
                nl += 1
                if not fl:
                    fl = m.group(1)
                continue
            if qt.match(line):
                nq += 1
                continue
            if len(line) > 20:
                np_ += 1
        return nh, nl, nq, np_, fh, fl

    def _extract(batch: pa.Table) -> pa.Table:
        rows = [_one(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_headers": pa.array([r[0] for r in rows], pa.int64()),
                "n_lists": pa.array([r[1] for r in rows], pa.int64()),
                "n_quotes": pa.array([r[2] for r in rows], pa.int64()),
                "n_paragraphs": pa.array([r[3] for r in rows], pa.int64()),
                "first_header": pa.array([r[4] for r in rows], pa.string()),
                "first_list_item": pa.array([r[5] for r in rows], pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _extract, batch_format="pyarrow"
    )


def lang_confusion_matrix(sf_dir: str) -> pd.DataFrame:
    """Language-ID evaluation: confusion counts of the heuristic
    predictor (`langid_docs`) against the table's labeled `lang` column
    — the accuracy readout the reference logs for its fasttext detector
    (extractor/language_detector.py confidence stats), as an operator.

    Scale: predictions are a stateless actor-pool pass; the true label
    is attached with the doc_id-keyed `attach_lookup` (broadcast under
    1M docs, partitioned join above) and the confusion matrix is a
    (true_lang, pred_lang) combiner groupby whose cardinality is
    n_langs^2, independent of corpus size. Output (true_lang,
    pred_lang, n) sorted."""
    from ..stages.grouped import attach_lookup

    pred = langid_docs(sf_dir)
    _P_SCHEMA = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("pred_lang", pa.string()),
            pa.field("lang_conf", pa.float64()),
        ]
    )
    with_true = attach_lookup(
        pred,
        _P_SCHEMA,
        ["doc_id"],
        _docs(sf_dir, ["doc_id", "lang"]),
        "doc_id",
        "lang",
        pa.string(),
        ["true_lang"],
    )
    out = typed_pandas(
        with_true.groupby(["true_lang", "pred_lang"]).aggregate(
            Count(alias_name="n")
        ),
        {"true_lang": "object", "pred_lang": "object", "n": "int64"},
    )
    return (
        out[["true_lang", "pred_lang", "n"]]
        .sort_values(["true_lang", "pred_lang"])
        .reset_index(drop=True)
    )


# --- hybrid lexical + vector retrieval ----------------------------------------

HS_TERMS = ("table", "scan", "merge")
HS_TOP_N = 100
HS_RRF_K = 60


def hybrid_search_docs(
    sf_dir: str,
    terms: tuple[str, ...] = HS_TERMS,
    top_n: int = HS_TOP_N,
    k: int = 20,
) -> pd.DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the RAG-serving
    query shape (BM25 lexical + embedding cosine, RRF fusion; Cormack,
    Clarke & Buettcher, SIGIR 2009) over the documents + embeddings
    tables joined on id. The reference exposes lexical search through
    SQLite FTS5 and vector search through FAISS
    (storage/sqlite_manager.py FTS schema, deduplicator/semantic_dedup
    .py:377); this composes both sides with the standard fusion rule.

    Lexical: BM25 (k1=1.2, b=0.75) over whitespace tokens of canonical
    text for a fixed deterministic query-term list; per-term
    contributions are floored to integer micro-units and summed as
    ints, with the IEEE sequence mirrored verbatim in the oracle.
    Vector: cosine vs the vec_id=0 embedding (the knn_cosine pattern).
    Fusion: RRF over the two top-`top_n` lists with integer
    floor(1e6/(60+rank)) contributions — all-integer output.

    Scale shape: one stats pass over the corpus (dl + per-term tf,
    emitted as a compact int table), driver scalars (N, total length,
    per-term df) from per-batch combiner partials, one scoring pass
    with a per-batch top-`top_n` combiner per modality — only
    O(top_n x blocks) rows ever reach the driver. Output
    (doc_id, lex_rank, sem_rank, fused_micro), ranks 0 when the doc is
    outside that modality's top list.
    """
    import math

    import polars as pl

    from ..functions.similarity import _normalize, _to_matrix

    k1, b = 1.2, 0.75
    nt = len(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "canonical"])).with_columns(
            pl.col("canonical").str.split(" ").alias("toks")
        )
        cols = [
            pl.col("doc_id"),
            pl.col("toks").list.len().cast(pl.Int64).alias("dl"),
        ]
        for i, t in enumerate(terms):
            cols.append(
                pl.col("toks").list.count_matches(t).cast(pl.Int64).alias(f"tf{i}")
            )
        out = df.select(cols)
        return out.to_arrow().cast(
            pa.schema(
                [("doc_id", pa.int64()), ("dl", pa.int64())]
                + [(f"tf{i}", pa.int64()) for i in range(nt)]
            )
        )

    stats = canonical_docs(sf_dir).map_batches(_stats, batch_format="pyarrow")
    stats = stats.materialize()

    def _gpart(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch["dl"], dtype=np.int64)
        cols = {
            "n": pa.array([batch.num_rows], pa.int64()),
            "total": pa.array([int(dl.sum())], pa.int64()),
        }
        for i in range(nt):
            tf = np.asarray(batch[f"tf{i}"], dtype=np.int64)
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    g = stats.map_batches(_gpart, batch_format="pyarrow").to_pandas()
    n_docs = int(g["n"].sum()) if "n" in g.columns else 0
    out_cols = ["doc_id", "lex_rank", "sem_rank", "fused_micro"]
    if n_docs == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in out_cols})
    total_len = int(g["total"].sum())
    dfs = [int(g[f"df{i}"].sum()) for i in range(nt)]
    idfs = [
        math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0) for d in dfs
    ]

    def _lex_score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        dl = np.asarray(batch["dl"], dtype=np.int64)
        score = np.zeros(len(ids), dtype=np.int64)
        for i in range(nt):
            tf = np.asarray(batch[f"tf{i}"], dtype=np.int64)
            # IEEE sequence mirrored in the oracle SQL, term by term —
            # literal constants (2.2, 1.2, 0.25, 0.75) on BOTH sides so
            # no computed constant can differ by an ulp
            tfn = (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * ((dl * n_docs) / total_len))
            )
            contrib = np.floor((idfs[i] * tfn) * 1_000_000.0 + 0.5).astype(np.int64)
            score += np.where(tf > 0, contrib, 0)
        out = (
            pl.DataFrame({"doc_id": ids, "lex_micro": score})
            .sort(["lex_micro", "doc_id"], descending=[True, False])
            .head(top_n)
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("lex_micro", pa.int64())])
        )

    lex_top = (
        stats.map_batches(_lex_score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["lex_micro", "doc_id"], ascending=[False, True])
        .head(top_n)
        .reset_index(drop=True)
    )

    import ray as _ray
    import ray.data as _rd

    emb_ds = _rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qdf = emb_ds.filter(expr="vec_id == 0").to_pandas()
    sem_top = pd.DataFrame({"doc_id": [], "cos": []})
    if not qdf.empty:
        qv = _normalize(
            np.asarray([qdf["embedding"].iloc[0]], dtype=np.float64)
        )[0]
        q_ref = _ray.put(qv)

        def _sem_score(batch: pa.Table) -> pa.Table:
            qv = _ray.get(q_ref)
            ids, emb = _to_matrix(batch)
            cos = _normalize(emb) @ qv
            out = (
                pl.DataFrame({"doc_id": ids, "cos": cos})
                .sort(["cos", "doc_id"], descending=[True, False])
                .head(top_n)
            )
            return out.to_arrow().cast(
                pa.schema([("doc_id", pa.int64()), ("cos", pa.float64())])
            )

        sem_top = (
            emb_ds.map_batches(_sem_score, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["cos", "doc_id"], ascending=[False, True])
            .head(top_n)
            .reset_index(drop=True)
        )

    lex_rank = {int(d): i + 1 for i, d in enumerate(lex_top["doc_id"])}
    sem_rank = {int(d): i + 1 for i, d in enumerate(sem_top["doc_id"])}
    fused = []
    for d in sorted(set(lex_rank) | set(sem_rank)):
        lr, sr = lex_rank.get(d, 0), sem_rank.get(d, 0)
        f = (1_000_000 // (HS_RRF_K + lr) if lr else 0) + (
            1_000_000 // (HS_RRF_K + sr) if sr else 0
        )
        fused.append((d, lr, sr, f))
    out = (
        pd.DataFrame(fused, columns=out_cols)
        .sort_values(["fused_micro", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out.astype("int64")


#: review-sample size per Jaccard-estimate decile bucket
REVIEW_PER_BUCKET = 5

_REVIEW_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("rank", pa.int64()),
        ("a_id", pa.string()),
        ("b_id", pa.string()),
        ("jaccard", pa.float64()),
        ("hamming", pa.int64()),
    ]
)


def dedup_review_sample(
    sf_dir: str, per_bucket: int = REVIEW_PER_BUCKET
) -> "rd.Dataset":
    """Stratified dup-pair review sample: the flagship's VERIFIED
    near-dup edges bucketed by Jaccard-estimate decile, `per_bucket`
    pairs per bucket picked by deterministic md5 order — the
    human-review slate a dedup operator pulls before trusting a
    threshold on a new corpus (borderline deciles get eyes, not just
    the easy 0.9+ pairs).

    Determinism: the decile is all-integer (eq recovered exactly from
    the power-of-two jaccard = eq/num_perm), and md5(a_id|'|'|b_id)
    ordering is reproducible across engines, block layouts and reruns —
    the same sample every time, unlike a random_sample. The edge table
    is already tiny relative to the corpus; bucketing is one
    `partitioned_group_map` on the <= 10 bucket keys.
    """
    import hashlib

    from ..config import DedupConfig
    from ..stages.grouped import partitioned_group_map

    num_perm = DedupConfig().num_perm
    res = dedup_conversations(_docs_as_conversations(sf_dir))
    edges = res.edges
    if isinstance(edges, pa.Table):
        edges_ds = rd.from_arrow(edges)
    else:
        edges_ds = edges
    if edges_ds.count() == 0:
        return rd.from_arrow(_REVIEW_SCHEMA.empty_table())

    def _bucketize(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["a_id", "b_id", "jaccard", "hamming"]))
        df = df.with_columns(
            (
                (pl.col("jaccard") * num_perm).round(0).cast(pl.Int64) * 10
                // num_perm
            ).alias("bucket"),
            (pl.col("a_id") + "|" + pl.col("b_id"))
            .map_elements(
                lambda s: hashlib.md5(s.encode()).hexdigest(),
                return_dtype=pl.String,
            )
            .alias("mk"),
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("a_id", pa.string()),
                    ("b_id", pa.string()),
                    ("jaccard", pa.float64()),
                    ("hamming", pa.int64()),
                    ("bucket", pa.int64()),
                    ("mk", pa.string()),
                ]
            )
        )

    def _topk(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["bucket", "mk", "a_id", "b_id"])
            .with_columns(
                (pl.int_range(pl.len()).over("bucket") + 1)
                .cast(pl.Int64)
                .alias("rank")
            )
            .filter(pl.col("rank") <= per_bucket)
            .select(["bucket", "rank", "a_id", "b_id", "jaccard", "hamming"])
        )
        return out.to_arrow().cast(_REVIEW_SCHEMA)

    return partitioned_group_map(
        edges_ds.map_batches(_bucketize, batch_format="pyarrow"),
        "bucket",
        _topk,
        arrow=True,
    )


# --- suffix-array longest repeat (north-rule substring-dedup machinery) -------


def longest_repeat_docs(sf_dir: str) -> "rd.Dataset":
    """Per-document longest repeated word-sequence via a WORD-LEVEL
    suffix array + Kasai LCP (`functions/suffix.py` — Manber-Myers
    prefix doubling; the max LCP over all suffix pairs is attained by
    an SA-adjacent pair). The suffix-array machinery the north rule's
    substring-dedup tier names; the repeated-span curation ops
    (`curation.exact_substr_*`) consume the same signal at fixed gram
    length — this operator finds the MAXIMAL repeat length exactly.

    Output: (doc_id, n_words, repeat_len, repeat_pos) — repeat_pos is
    the minimal 0-based word index starting a maximal repeat, -1 when
    every word is unique. The DuckDB oracle replays it with a
    recursive-CTE extension of equal-word position pairs, so the
    exotic-algorithm side (SA + LCP) is checked against a first-
    principles quadratic definition.

    Scale shape: one stateless map_batches pass; per-doc work is
    O(n log n) numpy (docs are KB-sized — the per-doc loop is the same
    discipline as the codecs). No shuffle at all.
    """
    import numpy as np

    from ..functions.suffix import longest_repeat

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_words", pa.int64()),
            ("repeat_len", pa.int64()),
            ("repeat_pos", pa.int64()),
        ]
    )

    import re as _re

    # RE2-equivalent ASCII whitespace split, matching the oracle's
    # string_split_regex(text, '\s+') exactly: DuckDB's RE2 \s is
    # [\t\n\f\r\v ] only, while Python str.split()/\s are
    # Unicode-aware — NBSP/U+2028-bounded words must tokenize the
    # same way on both sides
    ascii_ws = _re.compile(r"[ \t\n\r\f\v]+")

    def _f(batch: pa.Table) -> pa.Table:
        n_words: list[int] = []
        lens: list[int] = []
        poss: list[int] = []
        for text in batch["text"].to_pylist():
            words = [w for w in ascii_ws.split(text)] if text else []
            words = [w for w in words if w]
            n_words.append(len(words))
            if not words:
                lens.append(0)
                poss.append(-1)
                continue
            _, tokens = np.unique(np.asarray(words, object), return_inverse=True)
            ln, pos = longest_repeat(tokens.astype(np.int64))
            lens.append(ln)
            poss.append(pos)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "repeat_len": pa.array(lens, pa.int64()),
                "repeat_pos": pa.array(poss, pa.int64()),
            }
        ).cast(out_schema)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _f, batch_format="pyarrow"
    )


# --- URL canonicalization dedup (crawl-frontier / recrawl dedup) --------------


def url_canonical_dedup(sf_dir: str) -> "rd.Dataset":
    """URL-level duplicate grouping through the REAL canonicalizer
    (`functions/strings.canonicalize_url` — RFC 3986 §6 normalization +
    tracking-param stripping): every document gets a deterministically
    NOISY raw URL (scheme/host case, default port, trailing slash,
    utm/fbclid params, fragments — all as doc_id functions, mirrored by
    the oracle), the engine normalizes it by parsing, and documents are
    grouped by canonical URL. The crawl-side dedup tier: at 100 TB this
    is the recrawl/frontier filter that runs BEFORE any content hash.

    Planted group structure: the path item id is doc_id % 50, so ~10
    docs per (source, item, has-query) share a canonical URL.

    Output: (doc_id, canon_url, rep_id, group_size); one hash shuffle
    keyed by the canonical URL string (bounded: URLs, not documents).
    """
    from ..functions.strings import canonicalize_url
    from ..stages.grouped import partitioned_group_map

    def _noisy(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        raw = []
        for d, s in zip(ids, srcs):
            scheme = "HTTPS" if d % 4 == 0 else "https"
            host = (s.upper() if d % 4 == 0 else s) + (
                ".EXAMPLE.ORG" if d % 4 == 0 else ".example.org"
            )
            port = ":443" if d % 2 == 0 else ""
            path = f"/articles/item-{d % 50}" + ("/" if d % 6 == 0 else "")
            query = (
                f"?utm_source=feed&lang=en&fbclid=x{d}" if d % 3 == 0 else ""
            )
            frag = f"#sec-{d % 5}" if d % 5 == 0 else ""
            raw.append(f"{scheme}://{host}{port}{path}{query}{frag}")
        canon = [canonicalize_url(u) for u in raw]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canon_url": pa.array(canon, pa.string()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("canon_url", pa.string()),
            ("rep_id", pa.int64()),
            ("group_size", pa.int64()),
        ]
    )

    def _group(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("doc_id").min().over("canon_url").alias("rep_id"),
                pl.len().over("canon_url").cast(pl.Int64).alias("group_size"),
            )
            .select(["doc_id", "canon_url", "rep_id", "group_size"])
        )
        return out.to_arrow().cast(out_schema)

    keyed = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        _noisy, batch_format="pyarrow"
    )
    return partitioned_group_map(keyed, "canon_url", _group, arrow=True)


def url_dedup_oracle_sql() -> str:
    """DuckDB twin of `url_canonical_dedup`: recomputes the EXPECTED
    canonical URL directly from the noise construction (the engine must
    parse its way back to this) and replays the grouping."""
    return """
        WITH c AS (
            SELECT doc_id,
                   'https://' || lower(source) || '.example.org/articles/item-'
                   || (doc_id % 50)
                   || CASE WHEN doc_id % 3 = 0 THEN '?lang=en' ELSE '' END
                       AS canon_url
            FROM documents
        )
        SELECT doc_id, canon_url,
               min(doc_id) OVER (PARTITION BY canon_url) AS rep_id,
               CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT)
                   AS group_size
        FROM c
    """
