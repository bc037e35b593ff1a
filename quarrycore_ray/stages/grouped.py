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


def default_num_partitions(factor: int = 2, lo: int = 16, hi: int = 512) -> int:
    """CPU-proportional partition count for coarse grouped execution.

    A fixed count (64 in round 1) over-partitions small sessions and
    under-partitions big ones — `factor` partitions per CPU keeps every
    core busy through one wave of stragglers without drowning the
    scheduler. On a multi-node cluster `ray.cluster_resources()` counts
    all nodes' CPUs, so the count scales with the cluster.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover - ray not importable
        cpus = 8
    return max(lo, min(hi, factor * cpus))


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
    num_partitions: int | None = None,
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
    if num_partitions is None:
        num_partitions = default_num_partitions()
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


def per_group_in_partition(
    group_fn: Callable[[pd.DataFrame], pa.Table], key: str
) -> Callable[[pd.DataFrame], pa.Table]:
    """Adapt a one-group pandas fn into a partition fn for
    `partitioned_group_map`: iterate the partition's groups in-process
    and concat their typed Arrow outputs.

    For group bodies that are inherently per-pair Python (SequenceMatcher
    scans, fuzzy ratios) the per-group cost is unchanged — the win is
    that Ray dispatch, block creation, and batch-format conversion drop
    from once-per-group (unbounded: one per duplicate cluster) to
    once-per-partition (bounded: O(CPUs))."""

    def _part(df: pd.DataFrame) -> pa.Table:
        outs = [group_fn(g) for _, g in df.groupby(key, sort=False)]
        return pa.concat_tables(outs)

    return _part


def attach_lookup(
    left: "ray.data.Dataset",
    left_schema: pa.Schema,
    key_cols: list[str],
    lookup: "ray.data.Dataset",
    lookup_key: str,
    value_col: str,
    value_type: pa.DataType,
    out_names: list[str],
    num_partitions: int | None = None,
    broadcast_limit: int = 1_000_000,
) -> "ray.data.Dataset":
    """Hash join: attach `lookup[value_col]` to `left` once per entry of
    `key_cols` (e.g. both endpoints of a pair table).

    Strategy switch (same rule as the LSH signature attach,
    stages/lsh.py): a lookup under `broadcast_limit` rows is collected
    once, `ray.put`, and resolved for every key column in a SINGLE
    map_batches — zero shuffles. Above the limit, the scale path: each
    pass UNIONs typed left rows with typed lookup rows under a shared
    join key `_k`, hash-partitions on it (`partitioned_group_map`), and
    resolves the join with one vectorized polars pass per partition.
    Lookup rows are flagged with `_lu` so null values on the left never
    masquerade as lookup entries.

    `left_schema` must describe `left` exactly (unioned blocks need
    identical schemas); each pass appends `(out_names[i], value_type)`.
    """
    import polars as pl

    lookup = lookup.materialize()
    n_lookup = lookup.count()
    if n_lookup <= broadcast_limit:
        key_type = left_schema.field(key_cols[0]).type
        lut_schema = pa.schema([("_jk", key_type), ("_lv", value_type)])
        if n_lookup == 0:
            # an empty lookup has no schema — every left key misses
            ref = ray.put(lut_schema.empty_table())
        else:
            # assemble the broadcast table INSIDE a task (one zero-copy
            # Arrow table in the object store; nothing payload-sized on
            # the driver). Duplicate keys keep the last occurrence —
            # the dict(zip(...)) semantics this path always had.
            @ray.remote(num_returns=1)
            def _build(*tbls) -> pa.Table:
                import polars as pl

                # blocks arrive as Arrow tables or pandas frames
                # depending on the upstream stage's batch format
                parts = [
                    t if isinstance(t, pa.Table)
                    else pa.Table.from_pandas(t, preserve_index=False)
                    for t in tbls
                ]
                parts = [
                    t.rename_columns(["_jk", "_lv"]).cast(lut_schema)
                    for t in parts
                    if t.num_rows
                ]
                cat = pa.concat_tables(parts)
                return (
                    pl.from_arrow(cat)
                    .unique("_jk", keep="last", maintain_order=True)
                    .to_arrow()
                    .cast(lut_schema)
                )

            ref = _build.remote(
                *lookup.select_columns([lookup_key, value_col]).to_arrow_refs()
            )

        def _attach(batch: pa.Table) -> pa.Table:
            import polars as pl

            lut = pl.from_arrow(ray.get(ref))
            df = pl.from_arrow(batch).with_row_index("_ri")
            for key_col, out_name in zip(key_cols, out_names):
                df = df.join(
                    lut.rename({"_jk": key_col, "_lv": out_name}),
                    on=key_col,
                    how="left",
                )
            out = df.sort("_ri").drop("_ri").to_arrow()
            # polars may emit large_string/large_list — cast back to the
            # input batch's exact types (+ the appended value columns)
            schema = pa.schema(
                list(batch.schema)
                + [pa.field(n, value_type) for n in out_names]
            )
            return out.cast(schema)

        return left.map_batches(_attach, batch_format="pyarrow")

    for key_col, out_name in zip(key_cols, out_names):
        schema = pa.schema(
            list(left_schema)
            + [pa.field("_k", left_schema.field(key_col).type),
               pa.field("_lv", value_type),
               pa.field("_lu", pa.int8())]
        )

        def _left_rows(batch: pa.Table, _schema=schema, _key=key_col) -> pa.Table:
            n = batch.num_rows
            batch = batch.append_column("_k", batch[_key])
            batch = batch.append_column("_lv", pa.nulls(n, _schema.field("_lv").type))
            batch = batch.append_column("_lu", pa.array(np.zeros(n, dtype=np.int8)))
            return batch.cast(_schema)

        def _lookup_rows(batch: pa.Table, _schema=schema) -> pa.Table:
            n = batch.num_rows
            cols = {
                f.name: pa.nulls(n, f.type) for f in _schema
            }
            cols["_k"] = batch[lookup_key].cast(_schema.field("_k").type)
            cols["_lv"] = batch[value_col].cast(_schema.field("_lv").type)
            cols["_lu"] = pa.array(np.ones(n, dtype=np.int8))
            return pa.table(cols).cast(_schema)

        out_schema = pa.schema(list(left_schema) + [pa.field(out_name, value_type)])

        def _join(tb: pa.Table, _out=out_schema, _name=out_name) -> pa.Table:
            df = pl.from_arrow(tb)
            lut = (
                df.filter(pl.col("_lu") == 1)
                .select(["_k", "_lv"])
                .unique("_k", keep="any")
                .rename({"_k": "_jk", "_lv": _name})
            )
            rows = df.filter(pl.col("_lu") == 0).drop(["_lv", "_lu"])
            if rows.height == 0:
                return _out.empty_table()
            joined = rows.join(lut, left_on="_k", right_on="_jk", how="left").drop(["_k"])
            return joined.select([f.name for f in _out]).to_arrow().cast(_out)

        unioned = left.map_batches(_left_rows, batch_format="pyarrow").union(
            lookup.map_batches(_lookup_rows, batch_format="pyarrow")
        )
        left = partitioned_group_map(unioned, "_k", _join, num_partitions, arrow=True)
        left_schema = out_schema
    return left


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
