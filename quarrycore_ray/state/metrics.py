"""Per-partition lineage / metrics collection.

The batch analog of the reference's Prometheus counters
(`/root/reference/src/quarrycore/dedup/hybrid_dedup.py:32-39`
`dedup_exact_hits_total` / `dedup_near_hits_total` /
`dedup_latency_seconds{layer}`) and stage timings
(`/root/reference/src/quarrycore/pipeline.py:882-886`): every
instrumented batch task reports (stage, partition, rows_in, rows_out,
wall_ms, extras) to a zero-CPU named actor; the pipeline drains it into
an Arrow table written alongside the outputs.

A single counter actor is not a throughput bottleneck: calls are
fire-and-forget (one tiny message per *batch*, not per row), which is
why this is the one piece of shared mutable state the engine keeps.
"""

from __future__ import annotations

import time

import pyarrow as pa

import ray

ACTOR_NAME = "qc_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.rows: list[tuple] = []

    def add(
        self,
        stage: str,
        partition_id: int,
        rows_in: int,
        rows_out: int,
        wall_ms: float,
        candidate_pairs: int = 0,
        dropped_pairs_skew_cap: int = 0,
    ) -> None:
        self.rows.append(
            (stage, partition_id, rows_in, rows_out, wall_ms, candidate_pairs,
             dropped_pairs_skew_cap)
        )

    def drain(self) -> list[tuple]:
        rows, self.rows = self.rows, []
        return rows

    def peek(self) -> list[tuple]:
        """Copy without clearing — live scrapes must not steal rows
        from the end-of-job lineage export."""
        return list(self.rows)


def get_metrics_actor():
    """Get or create the named metrics actor for this Ray session."""
    return MetricsActor.options(name=ACTOR_NAME, get_if_exists=True).remote()


def metrics_table(rows: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "stage": pa.array([r[0] for r in rows], pa.string()),
            "partition_id": pa.array([r[1] for r in rows], pa.int32()),
            "rows_in": pa.array([r[2] for r in rows], pa.int64()),
            "rows_out": pa.array([r[3] for r in rows], pa.int64()),
            "wall_ms": pa.array([r[4] for r in rows], pa.float64()),
            "candidate_pairs": pa.array([r[5] for r in rows], pa.int64()),
            "dropped_pairs_skew_cap": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


def drain_metrics() -> pa.Table:
    """Collect everything reported so far (and clear the buffer)."""
    actor = get_metrics_actor()
    return metrics_table(ray.get(actor.drain.remote()))


_WORKER_ACTOR = None
_WORKER_ORDINAL = 0


def report(
    stage: str,
    rows_in: int,
    rows_out: int,
    wall_ms: float,
    candidate_pairs: int = 0,
    dropped_pairs_skew_cap: int = 0,
) -> None:
    """Fire-and-forget lineage report from inside a worker task/actor."""
    import os

    global _WORKER_ACTOR, _WORKER_ORDINAL
    if _WORKER_ACTOR is None:
        _WORKER_ACTOR = get_metrics_actor()
    pid = (os.getpid() % 10_000) * 1000 + (_WORKER_ORDINAL % 1000)
    _WORKER_ORDINAL += 1
    _WORKER_ACTOR.add.remote(
        stage, pid, rows_in, rows_out, wall_ms, candidate_pairs, dropped_pairs_skew_cap
    )


class Instrumented:
    """Wrap a batch/partition function to report lineage per call."""

    def __init__(self, fn, stage: str, count_pair_cols: bool = False):
        self.fn = fn
        self.stage = stage
        self.count_pair_cols = count_pair_cols

    def __call__(self, batch):
        t0 = time.perf_counter()
        out = self.fn(batch)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        rows_in = batch.num_rows if hasattr(batch, "num_rows") else len(batch)
        rows_out = out.num_rows if hasattr(out, "num_rows") else len(out)
        cand = dropped = 0
        if (
            self.count_pair_cols
            and hasattr(out, "column_names")
            and "dropped_pairs" in out.column_names
        ):
            import pyarrow.compute as pc

            cand = rows_out
            dropped = int(pc.sum(out["dropped_pairs"]).as_py() or 0)
        report(self.stage, rows_in, rows_out, wall_ms, cand, dropped)
        return out
