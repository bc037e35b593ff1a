"""Coarse-partitioned grouped execution.

`Dataset.groupby(key).map_groups(fn)` dispatches a Python call (plus a
batch-format conversion) per group — ruinous when groups number in the
tens of thousands and hold a handful of rows each (LSH buckets,
conversations, hash groups). The scalable shape is the classic
two-level plan:

    partition by hash(key) % P  ->  P grouped tasks
    inside each task: one *vectorized* pass over all of its groups
    (pandas sort + groupby(sort=False) aggregation, or numpy
    run-boundary splitting)

P is a small multiple of the cluster's parallelism, so Ray dispatch
cost is O(P) while per-group work stays in C. All rows of one key land
in one partition, so results equal the per-group formulation exactly.
This mirrors how the reference shards its Bloom filter by hash
(`/root/reference/src/quarrycore/deduplicator/bloom_filter.py:167-174`)
— same partitioning idea, applied to dataflow instead of locks.
"""

from __future__ import annotations

import zlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

PART_COL = "_part"


def _crc32_array(values: list[str]) -> np.ndarray:
    crc = zlib.crc32
    return np.fromiter(
        (crc(v.encode("utf-8")) for v in values), dtype=np.uint32, count=len(values)
    )


def add_partition_column(
    batch: pa.Table, key: str, num_partitions: int
) -> pa.Table:
    """Append deterministic `_part` = hash(key) % P (string or int key)."""
    col = batch[key]
    if pa.types.is_integer(col.type):
        vals = np.asarray(col, dtype=np.int64).astype(np.uint64)
        # Fibonacci multiplicative mix so band keys with shared low bits
        # spread evenly across partitions
        mixed = (vals * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        part = (mixed % np.uint64(num_partitions)).astype(np.int64)
    else:
        part = (_crc32_array(col.to_pylist()) % num_partitions).astype(np.int64)
    return batch.append_column(PART_COL, pa.array(part, pa.int64()))


def partitioned_group_map(
    ds: "ray.data.Dataset",
    key: str,
    partition_fn: Callable[[pd.DataFrame], "pa.Table | pd.DataFrame"],
    num_partitions: int = 64,
    lineage_stage: str | None = None,
    arrow: bool = False,
) -> "ray.data.Dataset":
    """Hash-partition on `key`, then run `partition_fn` once per partition.

    `partition_fn` receives all rows of all keys mapped to that
    partition (the `_part` column removed) and must perform its own
    vectorized per-key grouping: as a pandas DataFrame by default, or a
    zero-copy Arrow table with `arrow=True` (preferred for hot stages —
    the whole-partition pandas conversion is pure overhead when the fn
    works in polars/numpy). With `lineage_stage` set, each partition
    call reports (rows_in, rows_out, wall_ms) to the metrics actor.
    """
    if lineage_stage is not None:
        from ..state.metrics import Instrumented

        partition_fn = Instrumented(
            partition_fn, lineage_stage, count_pair_cols=True
        )

    def _add(batch: pa.Table) -> pa.Table:
        return add_partition_column(batch, key, num_partitions)

    if arrow:
        def _run(group: pa.Table) -> "pa.Table":
            return partition_fn(group.drop_columns([PART_COL]))

        fmt = "pyarrow"
    else:
        def _run(group: pd.DataFrame) -> "pa.Table | pd.DataFrame":
            return partition_fn(group.drop(columns=[PART_COL]))

        fmt = "pandas"

    return (
        ds.map_batches(_add, batch_format="pyarrow")
        .groupby(PART_COL)
        .map_groups(_run, batch_format=fmt)
    )


def run_bounds(sorted_keys: np.ndarray) -> np.ndarray:
    """Boundary indices of equal-key runs in a sorted array.

    Returns b with runs [b[i], b[i+1]) — the vectorized split used by
    partition functions to iterate groups without pandas overhead.
    """
    n = len(sorted_keys)
    if n == 0:
        return np.array([0], dtype=np.int64)
    neq = sorted_keys[1:] != sorted_keys[:-1]
    return np.concatenate(([0], np.flatnonzero(neq) + 1, [n])).astype(np.int64)
