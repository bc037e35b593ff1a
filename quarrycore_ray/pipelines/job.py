"""Checkpointed, resumable dedup job — the `ray job submit` entry point.

Runs the flagship pipeline with stage-boundary Parquet checkpoints
(state/checkpoint.py) and per-partition lineage metrics
(state/metrics.py), writing a self-describing output tree:

    <out_root>/
      conversations/   data/part-*.parquet + _MANIFEST.json
      reps/            "
      edges/           "
      clusters/        "
      deduped/         "
      metrics/metrics.parquet
      job.json         summary counters

A rerun with the same out_root skips every completed stage (its
manifest is present), so an interrupted job resumes from the last
finished stage — the batch analog of the reference's checkpoint/resume
e2e semantics (`/root/reference/tests/e2e/test_resume.py:171-260`).

CLI:  python -m quarrycore_ray.pipelines.job INPUT_DIR OUT_ROOT
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import DedupConfig
from ..stages.canonical import assemble_conversations
from ..stages.cluster import driver_union_find
from ..stages.exact import exact_dedup
from ..stages.lsh import candidate_pairs
from ..stages.minhash_stage import MinHashSimHashStage
from ..stages.verify import PairVerifier
from ..state.checkpoint import CheckpointManager
from ..state.metrics import drain_metrics


def run_dedup_job(
    input_path: str,
    out_root: str,
    config: DedupConfig | None = None,
    lineage: bool = True,
    dead_letter: bool = True,
    segment_tier: bool = False,
    segment_max_hamming: int = 3,
) -> dict[str, Any]:
    """Run the checkpointed production dedup job.

    ``segment_tier=True`` inserts the turn-level SimHash removal tier
    (`transcripts.apply_turn_dedup`) between input hygiene and
    conversation assembly, giving the job the reference's full
    multi-level stack — turn near-dup removal, then conversation exact,
    then conversation near (deduplicator/deduplicator.py:202-251's
    L1-L4 orchestration). The tier is checkpointed like every other
    stage (`turns/`), so interrupt/resume replays nothing.
    """
    cfg = config or DedupConfig()
    ckpt = CheckpointManager(out_root)
    t0 = time.perf_counter()

    import shutil

    from ..stages.deadletter import ERROR_COL

    dead_dir = os.path.join(out_root, "dead_letter")
    n_dead = 0
    # input hygiene is decided before the FIRST checkpointed stage —
    # the segment tier when enabled, conversation assembly otherwise
    first_stage = "turns" if segment_tier else "conversations"
    if not ckpt.is_complete(first_stage):
        # a fresh first-stage attempt invalidates any previous
        # attempt's routed table REGARDLESS of the dead_letter flag —
        # the on-disk artifact must never outlive the run that made it
        shutil.rmtree(dead_dir, ignore_errors=True)
    if dead_letter and not ckpt.is_complete(first_stage):
        # input hygiene tier (reference DeadLetterQueue, recovery/
        # dead_letter.py, enqueue at pipeline.py:859-877): structurally
        # broken turn rows — null conv_id / null turn_idx, which the
        # sort-within-group assembly cannot place — are routed to a
        # queryable parquet side table (the stages/deadletter ERROR_COL
        # convention) instead of poisoning or crashing the run. Decided
        # once, before the conversations checkpoint. Cost: the DEAD pass
        # is one extra column-pruned scan + filter (its survivors — the
        # rare broken rows — are the only thing materialized); the clean
        # stream then feeds assembly directly, so the input is never
        # materialized whole.
        import pyarrow.compute as pc

        def _split(keep: bool):
            def _f(batch: pa.Table) -> pa.Table:
                bad = pc.or_kleene(
                    pc.is_null(batch["conv_id"]), pc.is_null(batch["turn_idx"])
                )
                if keep:
                    return batch.filter(pc.invert(bad))
                dead = batch.filter(bad)
                why = pc.if_else(
                    pc.is_null(dead["conv_id"]),
                    pa.scalar("null_conv_id"),
                    pa.scalar("null_turn_idx"),
                )
                return dead.append_column(ERROR_COL, why)

            return _f

        raw = rd.read_parquet(input_path)
        dead_mat = raw.map_batches(
            _split(False), batch_format="pyarrow"
        ).materialize()  # dead rows only — tiny
        n_dead = dead_mat.count()
        if n_dead:
            dead_mat.write_parquet(dead_dir)
        clean = raw.map_batches(_split(True), batch_format="pyarrow")
    else:
        if os.path.isdir(dead_dir):
            # resume past the first checkpoint: recover the
            # counter from the routed table (regardless of this run's
            # dead_letter flag) so job.json never contradicts the
            # on-disk artifact
            n_dead = rd.read_parquet(dead_dir).count()
        clean = rd.read_parquet(input_path)

    if segment_tier:
        # turn-level SimHash near-dup REMOVAL before assembly (the
        # reference's segment tier): surviving turn rows are
        # checkpointed so a resume never recomputes the pair search
        from .transcripts import apply_turn_dedup

        turns = ckpt.stage(
            "turns",
            lambda: apply_turn_dedup(clean, max_hamming=segment_max_hamming),
            empty_schema=rd.read_parquet(input_path).schema().base_schema,
        )
        if lineage and "turns" in ckpt.stages_run:
            from ..state.metrics import report as _report

            # one driver-side lineage row for the whole tier. Both
            # counts are parquet-metadata reads: clean rows = raw input
            # rows minus the dead-lettered ones (the only filter applied
            # upstream of this tier), turns rows come from the fresh
            # checkpoint — no data re-scan.
            n_turns_in = rd.read_parquet(input_path).count() - n_dead
            _report("turn_dedup", n_turns_in, turns.count(), 0.0)
        clean = turns

    from .dedup import _REPS_SCHEMA

    _conv_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("canonical_text", pa.string()),
            ("n_turns", pa.int32()),
        ]
    )
    conversations = ckpt.stage(
        "conversations",
        lambda: assemble_conversations(clean, lineage=lineage),
        empty_schema=_conv_schema,
    )
    reps = ckpt.stage(
        "reps",
        lambda: exact_dedup(conversations, lineage=lineage),
        empty_schema=_REPS_SCHEMA,
    )

    def _edges() -> "rd.Dataset":
        from .dedup import add_threshold_column

        mh_conc = cfg.resolved_minhash_concurrency()
        reps_schema = reps.schema()
        has_domain = reps_schema is not None and "domain" in reps_schema.names
        sig_cols = ["conv_id", "canonical_text"] + (
            ["domain"] if has_domain else []
        )
        sig_input = reps.select_columns(sig_cols).repartition(mh_conc * 4)
        sig_ds = sig_input.map_batches(
            MinHashSimHashStage,
            fn_constructor_kwargs={"config": cfg, "lineage": lineage},
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            # fixed pool sized to the checkpointed rep count — reps is
            # parquet-backed here so count() is metadata-cheap
            concurrency=cfg.sig_pool_size(reps.count()),
        ).drop_columns(["canonical_text"])
        # per-domain verification thresholds (reference per-content-type
        # rule) ride to the verifier exactly as in dedup_conversations
        sig_ds = sig_ds.map_batches(
            add_threshold_column(cfg), batch_format="pyarrow"
        )
        pairs = candidate_pairs(sig_ds, cfg, lineage=lineage)
        return pairs.map_batches(
            PairVerifier,
            fn_constructor_kwargs={"config": cfg, "lineage": lineage},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.resolved_verify_concurrency(),
        )

    _edges_schema = pa.schema(
        [
            ("a_id", pa.string()),
            ("b_id", pa.string()),
            ("jaccard", pa.float64()),
            ("hamming", pa.int64()),
        ]
    )
    edges = ckpt.stage("edges", _edges, empty_schema=_edges_schema)

    # clustering scale switch (see DedupConfig.labelprop_edge_threshold):
    # small edge sets are union-found on the driver; huge ones take the
    # distributed label-propagation path, checkpointed like any stage.
    n_edges = edges.count()
    labels = None
    if n_edges > cfg.labelprop_edge_threshold:
        from ..stages.cluster import label_propagation

        labels = ckpt.stage(
            "labels",
            lambda: label_propagation(edges),
            empty_schema=pa.schema([("node", pa.string()), ("label", pa.string())]),
        )

    # union-find over the checkpointed edges, broadcast ONCE as an
    # Arrow (conv_id, near_label) table and shared by the clusters and
    # deduped stages (memoized: a resume that skips one stage still
    # computes it at most once)
    _near_cache: dict[str, Any] = {}

    def _near_label_ref(edges_ds: "rd.Dataset"):
        if "ref" not in _near_cache:
            from .dedup import near_label_ref

            _near_cache["ref"] = near_label_ref(driver_union_find(edges_ds))
        return _near_cache["ref"]

    def _clusters() -> "rd.Dataset":
        if labels is not None:
            from ..stages.grouped import attach_lookup
            from .dedup import _REPS_SCHEMA, explode_members_with_label

            with_label = attach_lookup(
                reps.select_columns([f.name for f in _REPS_SCHEMA]),
                _REPS_SCHEMA, ["conv_id"], labels, "node", "label",
                pa.string(), ["near_label"],
            )
            return with_label.map_batches(
                explode_members_with_label, batch_format="pyarrow"
            )
        # broadcast the union-find assignment as an Arrow table and
        # explode members fully vectorized — the library path's kernel
        # (dedup.cluster_assign_map / explode_members_with_label); reps
        # is corpus-scale, so no per-row Python may run here
        from .dedup import cluster_assign_map

        near_ref = _near_label_ref(edges)
        return reps.map_batches(
            cluster_assign_map(near_ref), batch_format="pyarrow"
        )

    clusters = ckpt.stage(
        "clusters",
        _clusters,
        empty_schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("cluster_id", pa.string()),
                ("is_representative", pa.bool_()),
                ("dup_kind", pa.string()),
            ]
        ),
    )

    def _deduped() -> "rd.Dataset":
        from .dedup import keep_root_reps

        if labels is not None:
            # pure-dataflow anti-join: attach the propagated label and
            # keep reps that root their own component (or have no edge)
            from ..stages.grouped import attach_lookup

            slim_schema = pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("canonical_text", pa.string()),
                    ("n_turns", pa.int32()),
                ]
            )
            with_label = attach_lookup(
                reps.select_columns(["conv_id", "canonical_text", "n_turns"]),
                slim_schema, ["conv_id"], labels, "node", "label",
                pa.string(), ["near_label"],
            )
            return with_label.map_batches(
                keep_root_reps, batch_format="pyarrow"
            )

        # Anti-join of exact reps against the merged reps (reps whose
        # near-dup component has a smaller representative): attach the
        # broadcast union-find label per batch with a vectorized join
        # (dedup._label_column semantics) and keep component roots —
        # no per-row Python, no driver-side frozenset.
        from .dedup import _filter_unique_reps

        near_ref = _near_label_ref(edges)
        return reps.select_columns(
            ["conv_id", "canonical_text", "n_turns"]
        ).map_batches(_filter_unique_reps(near_ref), batch_format="pyarrow")

    deduped = ckpt.stage("deduped", _deduped, empty_schema=_conv_schema)

    summary: dict[str, Any] = {
        "input": input_path,
        "out_root": out_root,
        "segment_tier": segment_tier,
        **(
            {"surviving_turns": clean.count()} if segment_tier else {}
        ),
        "conversations": conversations.count(),
        "distinct_texts": reps.count(),
        "verified_edges": n_edges,
        "cluster_path": "label_propagation" if labels is not None else "driver_union_find",
        "cluster_rows": clusters.count(),
        "deduped": deduped.count(),
        "dead_letter_rows": n_dead,
        "stages_run": ckpt.stages_run,
        "stages_skipped": ckpt.stages_skipped,
        "wall_s": round(time.perf_counter() - t0, 3),
    }

    if lineage and ckpt.stages_run:
        mdir = os.path.join(out_root, "metrics")
        os.makedirs(mdir, exist_ok=True)
        mt = drain_metrics()
        pq.write_table(mt, os.path.join(mdir, "metrics.parquet"))
        summary["lineage_rows"] = mt.num_rows
        # Prometheus textfile-collector export of the same rows
        # (reference observability/metrics.py parity; state/observability)
        from ..state.observability import export_prometheus_textfile

        export_prometheus_textfile(
            os.path.join(mdir, "quarrycore.prom"), mt
        )

    with open(os.path.join(out_root, "job.json.tmp"), "w") as f:
        json.dump(summary, f, indent=2)
    os.rename(os.path.join(out_root, "job.json.tmp"), os.path.join(out_root, "job.json"))
    return summary


if __name__ == "__main__":
    import sys

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out = run_dedup_job(sys.argv[1], sys.argv[2])
    print(json.dumps(out))
    ray.shutdown()
