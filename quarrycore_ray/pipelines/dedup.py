"""The flagship pipeline: multi-level transcript deduplication.

Ray-Data-native re-expression of the reference's hybrid dedup flow
(`/root/reference/src/quarrycore/dedup/hybrid_dedup.py:131-187` and the
legacy multi-level orchestration
`/root/reference/src/quarrycore/deduplicator/deduplicator.py:202-251`):

    read_parquet(transcripts)
      -> S1 canonical   per-turn normalize + sort-within-group assembly
      -> S2 exact       sha256 groupby, reps carry member lists
      -> S3 minhash     MinHash+SimHash actor pool (unique texts only)
      -> S4 lsh         band explode -> bucket groupby -> candidate pairs
      -> S5 verify      actor-pool Jaccard/Hamming predicate
      -> S6 cluster     union-find -> cluster_id = min(conv_id)
      -> S7 substring   intra-cluster containment scan (optional)
      -> clusters / deduped corpus / metrics

The exact layer short-circuits ahead of the expensive stages exactly as
the reference's L1 does: only distinct canonical texts reach MinHash.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

import ray
import ray.data

from ..config import DedupConfig
from ..oracle import UnionFind
from ..stages.canonical import assemble_conversations
from ..stages.exact import exact_dedup
from ..stages.lsh import candidate_pairs
from ..stages.minhash_stage import MinHashSimHashStage
from ..stages.substring import substring_matches
from ..stages.verify import PairVerifier


@dataclass
class DedupResult:
    clusters: "ray.data.Dataset"  # conv_id, cluster_id, is_representative, dup_kind
    unique_conversations: "ray.data.Dataset"  # representatives with canonical_text
    # verified near-dup edges (a_id, b_id, jaccard, hamming). A pa.Table
    # on the driver union-find path (edge set is O(duplicate-pairs));
    # stays a Dataset when the label-propagation path was taken (the
    # whole point of that path is never materializing edges driver-side).
    edges: "pa.Table | ray.data.Dataset"
    substring: "ray.data.Dataset | None"
    metrics: dict[str, Any] = field(default_factory=dict)


# schema of the exact-dedup reps table (stages/exact.py output), needed
# by the partitioned lookup joins on the label-propagation path
_REPS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("canonical_text", pa.string()),
        ("n_turns", pa.int32()),
        ("content_hash", pa.string()),
        ("exact_members", pa.list_(pa.string())),
        ("exact_group_size", pa.int64()),
    ]
)


def dedup_transcripts(
    transcripts: "ray.data.Dataset",
    config: DedupConfig | None = None,
    with_substring: bool = False,
    lineage: bool = False,
) -> DedupResult:
    """Full pipeline over transcript rows (conv_id/turn_idx/text...)."""
    return dedup_conversations(
        assemble_conversations(transcripts, lineage=lineage),
        config,
        with_substring,
        lineage=lineage,
    )


def dedup_conversations(
    conversations: "ray.data.Dataset",
    config: DedupConfig | None = None,
    with_substring: bool = False,
    lineage: bool = False,
) -> DedupResult:
    """Dedup pre-assembled documents: (conv_id, canonical_text, n_turns).

    Also the entry point for plain document tables — map each document
    to one row of this shape and the whole multi-level stack applies.
    """
    cfg = config or DedupConfig()
    metrics: dict[str, Any] = {}
    t0 = time.perf_counter()

    # S2: exact dedup. `reps` has one row per distinct canonical text.
    # Materialized once: it feeds the minhash stage AND the final
    # cluster assembly.
    reps = exact_dedup(conversations, lineage=lineage).materialize()
    metrics["distinct_texts"] = reps.count()

    if metrics["distinct_texts"] == 0:
        # zero-row corpus (fully-filtered shard, already-done resume
        # partition): return typed empties with the regular schemas so
        # downstream consumers never see a schema-less dataset
        metrics.update(
            verified_edges=0, cluster_path="empty_short_circuit",
            total_conversations=0, n_clusters=0,
            wall_s=time.perf_counter() - t0,
        )
        empty_clusters = ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.string()),
                    "is_representative": pa.array([], pa.bool_()),
                    "dup_kind": pa.array([], pa.string()),
                }
            )
        )
        empty_edges = pa.table(
            {
                "a_id": pa.array([], pa.string()),
                "b_id": pa.array([], pa.string()),
                "jaccard": pa.array([], pa.float64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        return DedupResult(
            clusters=empty_clusters,
            unique_conversations=ray.data.from_arrow(_REPS_SCHEMA.empty_table()),
            edges=empty_edges,
            substring=None,
            metrics=metrics,
        )

    # S3: signatures on unique texts only (actor pool, stateful caches).
    # Repartition first: the exact-dedup groupby emits few fat blocks,
    # which would starve the actor pool (1 task per block). The block
    # count adapts to the known rep count — a small corpus gets a few
    # batch-sized blocks instead of mh_conc*4 near-empty ones (each
    # empty block still costs a scheduled task against the pool).
    mh_conc = cfg.resolved_minhash_concurrency()
    n_sig_blocks = max(
        1, min(mh_conc * 4, metrics["distinct_texts"] // cfg.sig_batch_size + 1)
    )
    reps_schema = reps.schema()  # None when the corpus is empty
    has_domain = reps_schema is not None and "domain" in reps_schema.names
    sig_cols = ["conv_id", "canonical_text"] + (["domain"] if has_domain else [])
    sig_input = reps.select_columns(sig_cols).repartition(n_sig_blocks)
    with_sigs = sig_input.map_batches(
        MinHashSimHashStage,
        fn_constructor_kwargs={"config": cfg, "lineage": lineage},
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        # fixed pool sized to the known rep count: an autoscaling (1, N)
        # pool ramps one actor at a time and measured 2.2x the wall of a
        # pre-started pool on this stage (config.sig_pool_size)
        concurrency=cfg.sig_pool_size(metrics["distinct_texts"]),
    )
    sig_ds = with_sigs.drop_columns(["canonical_text"])

    sig_ds = sig_ds.map_batches(
        add_threshold_column(cfg), batch_format="pyarrow"
    )

    # S4: LSH shuffle -> candidate pairs (skew-capped). Streams straight
    # from the signature stage — one execution covers S3-S5.
    pairs = candidate_pairs(sig_ds, cfg, lineage=lineage)

    # S5: verification actor pool. NOT materialized: the S3->S5 stream
    # feeds union-find incrementally below, so the whole signature ->
    # LSH -> verify pipeline executes as ONE streaming pass with no
    # edge barrier (verified edges are O(duplicates), tiny next to the
    # corpus — the driver folds each block into the component map as it
    # arrives and the executor keeps all stages busy concurrently).
    edges_stream = pairs.map_batches(
        PairVerifier,
        fn_constructor_kwargs={"config": cfg, "lineage": lineage},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # small fixed pool (CPU/8): pre-started, no autoscale ramp
        concurrency=cfg.resolved_verify_concurrency(),
    )

    # S6: connected components. Auto-switch: edge sets up to the
    # threshold are union-found on the driver (O(duplicate-pairs),
    # the fast path); an adversarially huge edge set (high-duplication
    # corpus, the 100 TB north case) takes the distributed label-
    # propagation path with partitioned-join cluster assignment —
    # nothing edge- or label-shaped ever lands on the driver. The
    # switch is decided MID-STREAM: if the edge count passes the
    # threshold the driver abandons union-find (discarding the partial
    # component map) and re-executes S3->S5 into the distributed path —
    # one extra pass paid only on adversarially duplicate-heavy
    # corpora, in exchange for a barrier-free fast path everywhere else.
    uf = UnionFind()
    edge_tables: list[pa.Table] = []
    n_edges = 0
    overflow = False
    for tb in edges_stream.iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        if tb.num_rows == 0:
            continue
        edge_tables.append(tb)
        n_edges += tb.num_rows
        if n_edges > cfg.labelprop_edge_threshold:
            overflow = True
            break
        for a, b in zip(tb["a_id"].to_pylist(), tb["b_id"].to_pylist()):
            uf.union(a, b)

    if overflow:
        del uf, edge_tables
        if lineage:
            # the partially-consumed first pass already reported
            # lsh_pairs / verify lineage rows for its completed
            # partitions; re-executing below would double-count them in
            # metrics.parquet / the Prometheus export. Drain the actor
            # and put back every OTHER stage's rows (canonical, exact,
            # minhash — the signature stage is materialized inside
            # candidate_pairs and is NOT re-executed — plus anything
            # another pipeline reported): exactly the abandoned pass is
            # discarded.
            from ..state.metrics import get_metrics_actor

            _actor = get_metrics_actor()
            _rerun = {"lsh_pairs", "verify"}
            for _row in ray.get(_actor.drain.remote()):
                if _row[0] not in _rerun:
                    _actor.add.remote(*_row)
        edges_ds = edges_stream.materialize()
        metrics["verified_edges"] = edges_ds.count()
        metrics["cluster_path"] = "label_propagation"
        return _finish_distributed(
            reps, edges_ds, cfg, with_substring, metrics, t0
        )
    metrics["verified_edges"] = n_edges
    metrics["cluster_path"] = "driver_union_find"

    if edge_tables:
        edges = pa.concat_tables(edge_tables)
    else:
        edges = pa.table(
            {
                "a_id": pa.array([], pa.string()),
                "b_id": pa.array([], pa.string()),
                "jaccard": pa.array([], pa.float64()),
                "hamming": pa.array([], pa.int64()),
            }
        )

    near_assign = uf.components()
    # ship the assignment as an Arrow table: zero-copy for workers, and
    # the per-batch explode below joins against it vectorized
    near_ref = near_label_ref(near_assign)

    # Final assignment per conversation: exact members inherit their
    # representative's near-dup cluster. dup_kind semantics follow the
    # reference's DuplicationResult.duplicate_type: exact | near | unique.
    # A rep appears in `near_assign` iff it had >= 1 verified near edge.
    # NOT materialized: callers that only write stream straight from the
    # already-materialized reps through the assign map; repeat consumers
    # re-run one cheap vectorized map over cached blocks
    clusters = reps.map_batches(
        cluster_assign_map(near_ref), batch_format="pyarrow"
    )
    # total conversations = sum of exact-group sizes over reps — an
    # aggregate over the materialized reps blocks, not a clusters barrier
    metrics["total_conversations"] = int(reps.sum("exact_group_size") or 0)
    # distinct cluster labels among reps = distinct_texts minus the reps
    # merged into another rep's component (no extra shuffle needed)
    n_merged = len(near_assign) - len(set(near_assign.values()))
    metrics["n_clusters"] = metrics["distinct_texts"] - n_merged

    unique_conversations = reps.map_batches(
        _filter_unique_reps(near_ref), batch_format="pyarrow"
    )

    sub = None
    if with_substring:
        text_by_rep = reps.select_columns(["conv_id", "canonical_text"])
        joined = _attach_cluster(text_by_rep, near_ref)
        sub = substring_matches(joined, cfg.min_substring_overlap)

    metrics["wall_s"] = time.perf_counter() - t0
    return DedupResult(
        clusters=clusters,
        unique_conversations=unique_conversations,
        edges=edges,
        substring=sub,
        metrics=metrics,
    )


def explode_members_with_label(batch: pa.Table) -> pa.Table:
    """reps rows with a joined `near_label` column -> per-conversation
    cluster rows. A rep had >= 1 verified near edge iff near_label is
    non-null; its exact members inherit the cluster. Shared by the
    driver-union-find and label-propagation paths of
    `dedup_conversations` and the job runner. One vectorized polars
    explode — no per-member Python (row order matches the old loop:
    reps in batch order, members in list order).
    """
    import polars as pl

    df = pl.from_arrow(batch.select(["conv_id", "exact_members", "near_label"]))
    out = (
        df.rename({"conv_id": "_rep"})
        .with_columns(
            pl.coalesce([pl.col("near_label"), pl.col("_rep")]).alias("cluster_id"),
            pl.col("near_label").is_not_null().alias("_has_edge"),
        )
        .explode("exact_members")
        .rename({"exact_members": "conv_id"})
        .with_columns(
            (pl.col("conv_id") == pl.col("cluster_id")).alias("is_representative"),
            pl.when(pl.col("conv_id") != pl.col("_rep"))
            .then(pl.lit("exact"))
            .when(pl.col("_has_edge"))
            .then(pl.lit("near"))
            .otherwise(pl.lit("unique"))
            .alias("dup_kind"),
        )
        .select(["conv_id", "cluster_id", "is_representative", "dup_kind"])
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("cluster_id", pa.string()),
                ("is_representative", pa.bool_()),
                ("dup_kind", pa.string()),
            ]
        )
    )


def add_threshold_column(cfg: DedupConfig):
    """Batch map appending the per-row verification threshold `thr`
    from the optional content-domain tag (reference per-content-type
    thresholds, deduplicator/deduplicator.py:84-91 ->
    config.threshold_for); vectorized: one if_else kernel per
    configured domain. Shared by `dedup_conversations` and the
    checkpointed job runner (pipelines/job.py)."""

    def _f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "domain" in batch.column_names:
            thr = pa.array([cfg.threshold] * batch.num_rows, pa.float64())
            for dom, t in cfg.domain_minhash_thresholds:
                thr = pc.if_else(
                    pc.equal(batch["domain"], pa.scalar(dom)),
                    pa.scalar(t, pa.float64()),
                    thr,
                )
            batch = batch.drop_columns(["domain"])
        else:
            thr = pa.array([cfg.threshold] * batch.num_rows, pa.float64())
        return batch.append_column("thr", thr)

    return _f


def near_label_ref(assign: dict):
    """ray.put the union-find assignment as a broadcast (conv_id,
    near_label) Arrow table — the input `cluster_assign_map` /
    `_filter_unique_reps` / `_attach_cluster` consume. Shared by
    `dedup_conversations` and the checkpointed job runner."""
    return ray.put(
        pa.table(
            {
                "conv_id": pa.array(list(assign.keys()), pa.string()),
                "near_label": pa.array(list(assign.values()), pa.string()),
            }
        )
    )


def cluster_assign_map(near_ref):
    """Batch map: reps rows -> exploded per-conversation cluster rows.
    `near_ref` is the broadcast ray.put (conv_id, near_label) Arrow
    table from union-find; the join + explode are fully vectorized
    (polars join, `explode_members_with_label`). Shared by
    `dedup_conversations` and the checkpointed job runner."""

    def _f(batch: pa.Table) -> pa.Table:
        import polars as pl

        assign = pl.from_arrow(ray.get(near_ref))
        joined = (
            pl.from_arrow(batch.select(["conv_id", "exact_members"]))
            .join(assign, on="conv_id", how="left")
            .to_arrow()
        )
        return explode_members_with_label(joined)

    return _f


def keep_root_reps(batch: pa.Table) -> pa.Table:
    """Filter reps with a joined `near_label` column down to component
    roots (no verified edge, or the component's own min label) and drop
    the helper column — the vectorized anti-join kernel of the deduped
    output, shared by `_finish_distributed` and the job runner."""
    import pyarrow.compute as pc

    keep = pc.or_kleene(
        pc.is_null(batch["near_label"]),
        pc.equal(batch["near_label"], batch["conv_id"]),
    )
    return batch.filter(keep).drop_columns(["near_label"])


def _finish_distributed(
    reps: "ray.data.Dataset",
    edges_ds: "ray.data.Dataset",
    cfg: DedupConfig,
    with_substring: bool,
    metrics: dict[str, Any],
    t0: float,
) -> DedupResult:
    """S6 at adversarial edge scale: distributed min-label propagation +
    partitioned-join cluster assignment. Output-identical to the driver
    union-find path (same cluster labels: min conv_id of the component);
    edges stay a Dataset end to end.
    """
    from ..stages.cluster import label_propagation
    from ..stages.grouped import attach_lookup
    from ..stages.substring import substring_matches as _substr

    labels = label_propagation(edges_ds).materialize()

    def _merged_count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.sum(
            pc.cast(pc.not_equal(batch["node"], batch["label"]), pa.int64())
        ).as_py() or 0
        return pa.table({"c": pa.array([n], pa.int64())})

    n_merged = (
        labels.map_batches(_merged_count, batch_format="pyarrow").sum("c") or 0
    )

    # label join: a rep appears in `labels` iff it had >= 1 verified edge
    # (extra optional columns like `domain` are dropped — the join needs
    # an exact schema for its unioned blocks)
    with_label = attach_lookup(
        reps.select_columns([f.name for f in _REPS_SCHEMA]),
        _REPS_SCHEMA, ["conv_id"], labels, "node", "label",
        pa.string(), ["near_label"],
    ).materialize()

    # lazy: consumers stream from the materialized with_label table
    clusters = with_label.map_batches(
        explode_members_with_label, batch_format="pyarrow"
    )
    metrics["total_conversations"] = int(reps.sum("exact_group_size") or 0)
    metrics["n_clusters"] = metrics["distinct_texts"] - n_merged

    unique_conversations = with_label.map_batches(
        keep_root_reps, batch_format="pyarrow"
    )

    sub = None
    if with_substring:

        def _with_cluster(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "canonical_text": batch["canonical_text"],
                    "cluster_id": pc.coalesce(
                        batch["near_label"], batch["conv_id"]
                    ),
                }
            )

        sub = _substr(
            with_label.map_batches(_with_cluster, batch_format="pyarrow"),
            cfg.min_substring_overlap,
        )

    metrics["wall_s"] = time.perf_counter() - t0
    return DedupResult(
        clusters=clusters,
        unique_conversations=unique_conversations,
        edges=edges_ds,
        substring=sub,
        metrics=metrics,
    )


def _label_column(batch: pa.Table, near_ref) -> "pa.ChunkedArray":
    """Vectorized per-row label lookup: left-join the broadcast
    (conv_id, near_label) table and coalesce misses to the row's own
    conv_id. Row-index sort pins the join back to batch order (polars
    left joins don't guarantee it)."""
    import polars as pl
    import pyarrow.compute as pc

    assign = pl.from_arrow(ray.get(near_ref))
    joined = (
        pl.from_arrow(batch.select(["conv_id"]))
        .with_row_index("_i")
        .join(assign, on="conv_id", how="left")
        .sort("_i")
        .to_arrow()
    )
    return pc.coalesce(joined["near_label"], joined["conv_id"])


def _filter_unique_reps(near_ref):
    """Keep only cluster representatives (conv_id == its cluster label).
    `near_ref` is the ray.put (conv_id, near_label) Arrow table."""

    def _f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.equal(_label_column(batch, near_ref), batch["conv_id"])
        )

    return _f


def _attach_cluster(text_ds: "ray.data.Dataset", near_ref):
    """Append cluster_id = assigned label (own conv_id when unassigned);
    `near_ref` is the ray.put (conv_id, near_label) Arrow table."""

    def _f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cluster_id", _label_column(batch, near_ref)
        )

    return text_ds.map_batches(_f, batch_format="pyarrow")


def duplicate_turns(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Turn-level exact dedup: turn texts that appear in MORE THAN ONE
    conversation, with the number of distinct conversations sharing
    them. Output: (turn_text, n_convs).

    The turn-granularity analog of the conversation-level exact stage
    (stages/exact.py) — the operator a segment/citation-dedup pass runs
    before conversation clustering. Scale shape: rows are keyed by the
    turn-text SHA-256 (never the text itself, which would ship the
    corpus as a shuffle KEY; the text rides along as a value column
    once per distinct (turn, conv) pair after per-batch dedup), then
    ONE hash partition counts distinct conversations per digest
    vectorized (stages/grouped.partitioned_group_map).
    """
    from ..stages.grouped import partitioned_group_map
    from ..text import sha256_hex_array

    def _keyed(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = pa.table(
            {
                "h": sha256_hex_array(batch["text"]),
                "conv_id": batch["conv_id"],
                "turn_text": batch["text"],
            }
        )
        # per-batch dedup: a turn repeated inside one conversation
        # crosses the shuffle once
        return (
            pl.from_arrow(out)
            .unique(["h", "conv_id"])
            .to_arrow()
            .cast(out.schema)
        )

    out_schema = pa.schema([("turn_text", pa.string()), ("n_convs", pa.int64())])

    def _count(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .unique(["h", "conv_id"])
            .group_by("h")
            .agg(
                pl.col("turn_text").first(),
                pl.len().cast(pl.Int64).alias("n_convs"),
            )
            .filter(pl.col("n_convs") > 1)
            .select(["turn_text", "n_convs"])
        )
        return out.to_arrow().cast(out_schema)

    keyed = transcripts.select_columns(["conv_id", "text"]).map_batches(
        _keyed, batch_format="pyarrow"
    )
    return partitioned_group_map(keyed, "h", _count, arrow=True)
