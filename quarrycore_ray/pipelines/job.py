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
) -> dict[str, Any]:
    cfg = config or DedupConfig()
    ckpt = CheckpointManager(out_root)
    t0 = time.perf_counter()

    import shutil

    from ..stages.deadletter import ERROR_COL

    dead_dir = os.path.join(out_root, "dead_letter")
    n_dead = 0
    if not ckpt.is_complete("conversations"):
        # a fresh conversations attempt invalidates any previous
        # attempt's routed table REGARDLESS of the dead_letter flag —
        # the on-disk artifact must never outlive the run that made it
        shutil.rmtree(dead_dir, ignore_errors=True)
    if dead_letter and not ckpt.is_complete("conversations"):
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
            # resume past the conversations checkpoint: recover the
            # counter from the routed table (regardless of this run's
            # dead_letter flag) so job.json never contradicts the
            # on-disk artifact
            n_dead = rd.read_parquet(dead_dir).count()
        clean = rd.read_parquet(input_path)

    conversations = ckpt.stage(
        "conversations",
        lambda: assemble_conversations(clean, lineage=lineage),
    )
    reps = ckpt.stage("reps", lambda: exact_dedup(conversations, lineage=lineage))

    def _edges() -> "rd.Dataset":
        mh_conc = cfg.resolved_minhash_concurrency()
        sig_input = reps.select_columns(["conv_id", "canonical_text"]).repartition(
            mh_conc * 4
        )
        sig_ds = sig_input.map_batches(
            MinHashSimHashStage,
            fn_constructor_kwargs={"config": cfg, "lineage": lineage},
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            # fixed pool sized to the checkpointed rep count — reps is
            # parquet-backed here so count() is metadata-cheap
            concurrency=cfg.sig_pool_size(reps.count()),
        ).drop_columns(["canonical_text"])
        pairs = candidate_pairs(sig_ds, cfg, lineage=lineage)
        return pairs.map_batches(
            PairVerifier,
            fn_constructor_kwargs={"config": cfg, "lineage": lineage},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.resolved_verify_concurrency(),
        )

    edges = ckpt.stage("edges", _edges)

    # clustering scale switch (see DedupConfig.labelprop_edge_threshold):
    # small edge sets are union-found on the driver; huge ones take the
    # distributed label-propagation path, checkpointed like any stage.
    n_edges = edges.count()
    labels = None
    if n_edges > cfg.labelprop_edge_threshold:
        from ..stages.cluster import label_propagation

        labels = ckpt.stage("labels", lambda: label_propagation(edges))

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
        assign = driver_union_find(edges)
        assign_ref = ray.put(assign)

        def _assign(batch: pa.Table) -> pa.Table:
            amap = ray.get(assign_ref)
            out_conv: list[str] = []
            out_cluster: list[str] = []
            out_kind: list[str] = []
            for rep, members in zip(
                batch["conv_id"].to_pylist(), batch["exact_members"].to_pylist()
            ):
                cluster = amap.get(rep, rep)
                rep_kind = "near" if rep in amap else "unique"
                for m in members:
                    out_conv.append(m)
                    out_cluster.append(cluster)
                    out_kind.append(rep_kind if m == rep else "exact")
            return pa.table(
                {
                    "conv_id": pa.array(out_conv, pa.string()),
                    "cluster_id": pa.array(out_cluster, pa.string()),
                    "is_representative": pa.array(
                        [c == v for v, c in zip(out_conv, out_cluster)], pa.bool_()
                    ),
                    "dup_kind": pa.array(out_kind, pa.string()),
                }
            )

        return reps.map_batches(_assign, batch_format="pyarrow")

    clusters = ckpt.stage("clusters", _clusters)

    def _deduped() -> "rd.Dataset":
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

            def _keep_roots(batch: pa.Table) -> pa.Table:
                keep = [
                    lab is None or lab == cid
                    for cid, lab in zip(
                        batch["conv_id"].to_pylist(),
                        batch["near_label"].to_pylist(),
                    )
                ]
                return batch.filter(pa.array(keep)).drop_columns(["near_label"])

            return with_label.map_batches(_keep_roots, batch_format="pyarrow")

        # Anti-join of exact reps against the merged reps (reps whose
        # near-dup component has a smaller representative). The
        # broadcast set is O(near-duplicate reps) — derived from the
        # edge list, never a take_all of the corpus (a rep survives iff
        # union-find leaves it as its own component root).
        assign = driver_union_find(edges)
        merged = frozenset(k for k, v in assign.items() if k != v)
        merged_ref = ray.put(merged)

        def _f(batch: pa.Table) -> pa.Table:
            drop = ray.get(merged_ref)
            mask = [c not in drop for c in batch["conv_id"].to_pylist()]
            return batch.filter(pa.array(mask))

        return reps.select_columns(["conv_id", "canonical_text", "n_turns"]).map_batches(
            _f, batch_format="pyarrow"
        )

    deduped = ckpt.stage("deduped", _deduped)

    summary: dict[str, Any] = {
        "input": input_path,
        "out_root": out_root,
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
