"""Relational-shaped operators over the events/orders/customer/lineitem
test tables — the aggregation / sort / join / windowed-aggregate surface
of SURVEY.md §2.6-2.7.

The reference has no relational joins (§2.5) — its cross-record
correlation runs through shared indexes. These operators demonstrate
the Ray-Data-native equivalents the engine uses internally: multi-key
groupby aggregations with vectorized pre-processing, broadcast
(small-side) joins via `ray.put`, and deterministic sorted top-k.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..sources.io import typed_pandas

from ..exactmath import floor_round


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _round_col(batch: pa.Table, col: str, digits: int = 6) -> pa.Table:
    return batch.set_column(
        batch.schema.get_field_index(col), col, floor_round(batch[col], digits)
    )


def _micros(arr: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Value -> int64 micro-units: floor(x * 1e6 + 0.5).

    Float sums are association-dependent (Ray reduces blocks in
    nondeterministic order), so post-hoc rounding of a double sum can
    disagree with a sequential oracle in the last bits. Summing exact
    per-row integers is order-independent; both engine and oracle apply
    this identical per-row quantization, making aggregates bit-equal.
    """
    return pc.cast(
        pc.floor(pc.add(pc.multiply(arr, pa.scalar(1e6)), pa.scalar(0.5))), pa.int64()
    )


_MICROS_SQL = "CAST(floor({x} * 1000000 + 0.5) AS BIGINT)"


def events_hourly(sf_dir: str) -> "rd.Dataset":
    """Tumbling-window aggregate: (event_type, hour, n_events, avg_value).

    The batch-engine expression of a streaming tumbling window
    (SURVEY.md §2.10): event-time bucketing is a vectorized
    `floor_temporal`, the window reduce is a multi-key groupby.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def _bucket(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("hour", pc.floor_temporal(batch["ts"], unit="hour"))
        return batch.append_column("value_u", _micros(batch["value"]))

    agg = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .drop_columns(["ts", "value"])
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value_u", alias_name="sum_u"))
    )

    def _derive(batch: pa.Table) -> pa.Table:
        avg = floor_round(
            pc.divide(
                pc.divide(pc.cast(batch["sum_u"], pa.float64()), pa.scalar(1e6)),
                pc.cast(batch["n_events"], pa.float64()),
            ),
            6,
        )
        return batch.drop_columns(["sum_u"]).append_column("avg_value", avg)

    return agg.map_batches(_derive, batch_format="pyarrow")


def events_window_dedup(sf_dir: str) -> "rd.Dataset":
    """Streaming-shaped tumbling-window DEDUP: within each (user_id,
    event_type, 1-hour event-time window), keep only the earliest event
    (min ts, ties by min event_id) — the compaction step an
    at-least-once delivery pipeline runs before aggregation, expressed
    as a batch operator (SURVEY.md §2.10 streaming concerns; same
    dedup-tier keep-first semantics as the exact text layer,
    stages/exact.py).

    Scale shape: per-batch polars partial keep-first (a combiner — at
    most one candidate row per key leaves any batch, so duplicate mass
    drops BEFORE the shuffle), then one hash-partitioned keep-first on
    user_id (all of a user's partials co-locate; stages/grouped.py).
    Output: (user_id, event_type, window_start, event_id); the kept
    event's exact ts rides only through the reduce (it is the ORDER
    key) and is recoverable by joining event_id — emitting a second,
    micro-aligned timestamp column next to the hour-aligned window
    label would trip pandas' per-block datetime string formatting in
    the driver's frame hash.
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    _SCHEMA = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("window_start", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
        ]
    )
    _OUT = pa.schema([f for f in _SCHEMA if f.name != "ts"])

    def _first(df: "object") -> "object":
        import polars as pl

        return (
            df.sort(["user_id", "event_type", "window_start", "ts", "event_id"])
            .unique(
                ["user_id", "event_type", "window_start"],
                keep="first",
                maintain_order=True,
            )
        )

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        batch = batch.append_column(
            "window_start", pc.floor_temporal(batch["ts"], unit="hour")
        )
        out = _first(pl.from_arrow(batch))
        return out.to_arrow().select([f.name for f in _SCHEMA]).cast(_SCHEMA)

    def _final(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = _first(pl.from_arrow(tb))
        return out.to_arrow().select([f.name for f in _OUT]).cast(_OUT)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partitioned_group_map(partials, "user_id", _final, arrow=True)


def events_user_sessions(sf_dir: str, gap_minutes: int = 30) -> "rd.Dataset":
    """Session windows per user: count sessions and events per user.

    Sessionization = sort-within-group by ts, then a gap-based cumulative
    session id — the `groupby(key).map_groups(sorted window fn)` pattern
    for streaming-shaped workloads. Output: (user_id, n_events,
    n_sessions, first_ts, last_ts).
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _sessions_part(tb: pa.Table) -> pa.Table:
        # one vectorized pass over ALL users hashed into this partition
        # (stages/grouped.py): sort by (user, ts), per-user gap breaks via
        # a shifted diff masked at user boundaries
        import polars as pl

        df = pl.from_arrow(tb).sort(["user_id", "ts"])
        out = (
            df.group_by("user_id", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                (
                    # exact integer micros (polars total_seconds truncates)
                    (
                        pl.col("ts").diff().dt.total_microseconds()
                        > gap_minutes * 60 * 1_000_000
                    )
                    .sum()
                    .cast(pl.Int64)
                    + 1
                ).alias("n_sessions"),
                pl.col("ts").first().alias("first_ts"),
                pl.col("ts").last().alias("last_ts"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("n_events", pa.int64()),
                    ("n_sessions", pa.int64()),
                    ("first_ts", pa.timestamp("us")),
                    ("last_ts", pa.timestamp("us")),
                ]
            )
        )

    return partitioned_group_map(ds, "user_id", _sessions_part, arrow=True)


def temporal_split(sf_dir: str) -> pd.DataFrame:
    """Time-ordered 80/10/10 train/val/test split (the reference's
    `temporal_split=True` mode, protocols.py:429-432): the earliest 80%
    of events by (ts, event_id) are train, the next 10% val, the rest
    test. Output (split, n_events, min_ts, max_ts).

    Scale shape: prunes to (ts, event_id) at the read; ONE global sort
    (the unavoidable shuffle for temporal ordering) followed by
    `split_at_indices` — per-split counts/extrema come from distributed
    aggregates, nothing row-shaped lands on the driver. The cutoff
    indices use the same float expression as the DuckDB oracle
    (floor(n*0.8) / floor(n*0.9)) so both engines bucket identically.
    """
    import math

    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["ts", "event_id"])
    n = ds.count()
    k1, k2 = math.floor(n * 0.8), math.floor(n * 0.9)
    parts = ds.sort(["ts", "event_id"]).split_at_indices([k1, k2])
    rows = []
    for name, part in zip(("train", "val", "test"), parts):
        agg = part.aggregate(
            Count(alias_name="n_events"),
            Min("ts", alias_name="min_ts"),
            Max("ts", alias_name="max_ts"),
        ) or {"n_events": 0, "min_ts": pd.NaT, "max_ts": pd.NaT}
        rows.append({"split": name, **agg})
    return pd.DataFrame(rows, columns=["split", "n_events", "min_ts", "max_ts"])


def orders_by_status(sf_dir: str) -> "rd.Dataset":
    """(o_orderstatus, n_orders, total_price, avg_price, max_price).

    Money sums run over per-row micro-unit integers (see `_micros`) so
    the distributed reduce is bit-equal to the sequential oracle."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return batch.append_column("price_u", _micros(batch["o_totalprice"]))

    agg = (
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_u", alias_name="sum_u"),
            Max("o_totalprice", alias_name="max_raw"),
        )
    )

    def _derive(batch: pa.Table) -> pa.Table:
        total = pc.divide(pc.cast(batch["sum_u"], pa.float64()), pa.scalar(1e6))
        avg = pc.divide(total, pc.cast(batch["n_orders"], pa.float64()))
        out = batch.drop_columns(["sum_u", "max_raw"])
        out = out.append_column("total_price", floor_round(total, 2))
        out = out.append_column("avg_price", floor_round(avg, 2))
        return out.append_column("max_price", floor_round(batch["max_raw"], 2))

    return agg.map_batches(_derive, batch_format="pyarrow")


def customer_order_totals(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value, with names.

    Broadcast-join pattern: orders aggregate per custkey (shuffle), the
    small `customer` dimension is `ray.put` once and mapped in per
    batch — no second shuffle. Output: (c_custkey, c_name, total_spent,
    n_orders)."""
    def _prep(batch: pa.Table) -> pa.Table:
        return batch.append_column("price_u", _micros(batch["o_totalprice"]))

    totals = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("price_u", alias_name="sum_u"),
            Count(alias_name="n_orders"),
        )
    )
    cust = typed_pandas(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        {"c_custkey": "int64", "c_name": "object"},
    )
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    def _attach(batch: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        keys = batch["o_custkey"].to_pylist()
        batch = batch.append_column(
            "c_name", pa.array([names.get(key1) for key1 in keys], pa.string())
        )
        total = floor_round(
            pc.divide(pc.cast(batch["sum_u"], pa.float64()), pa.scalar(1e6)), 2
        )
        return batch.drop_columns(["sum_u"]).append_column("total_spent", total)

    joined = totals.map_batches(_attach, batch_format="pyarrow")
    top = typed_pandas(
        joined.sort(["total_spent", "o_custkey"], descending=[True, False]).limit(k),
        {"o_custkey": "int64", "c_name": "object",
         "total_spent": "float64", "n_orders": "int64"},
    )
    top = top.rename(columns={"o_custkey": "c_custkey"})
    return top[["c_custkey", "c_name", "total_spent", "n_orders"]]


def lineitem_pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H-Q1-shaped pricing summary over lineitem (vectorized revenue
    computation inside map_batches, then multi-key groupby).

    (l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
    avg_qty, avg_price, n_rows)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _rev(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        batch = batch.append_column("qty_u", _micros(batch["l_quantity"]))
        batch = batch.append_column("base_u", _micros(batch["l_extendedprice"]))
        return batch.append_column("disc_u", _micros(disc))

    agg = (
        ds.map_batches(_rev, batch_format="pyarrow")
        .select_columns(["l_returnflag", "l_linestatus", "qty_u", "base_u", "disc_u"])
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_u", alias_name="squ"),
            Sum("base_u", alias_name="sbu"),
            Sum("disc_u", alias_name="sdu"),
            Count(alias_name="n_rows"),
        )
    )

    def _derive(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["n_rows"], pa.float64())
        sq = pc.divide(pc.cast(batch["squ"], pa.float64()), pa.scalar(1e6))
        sb = pc.divide(pc.cast(batch["sbu"], pa.float64()), pa.scalar(1e6))
        sd = pc.divide(pc.cast(batch["sdu"], pa.float64()), pa.scalar(1e6))
        out = batch.drop_columns(["squ", "sbu", "sdu"])
        out = out.append_column("sum_qty", floor_round(sq, 2))
        out = out.append_column("sum_base_price", floor_round(sb, 2))
        out = out.append_column("sum_disc_price", floor_round(sd, 2))
        out = out.append_column("avg_qty", floor_round(pc.divide(sq, n), 2))
        return out.append_column("avg_price", floor_round(pc.divide(sb, n), 2))

    return agg.map_batches(_derive, batch_format="pyarrow")


def events_props_extract(sf_dir: str) -> "rd.Dataset":
    """JSON parse of the `props` column -> per-k aggregation.

    The §2.9 scalar-parser surface (the reference stores JSON columns in
    SQLite, storage/schema.py): parse per row inside map_batches, then a
    groupby. Output: (k_bucket, n_events) where k_bucket = props.k // 10.
    """
    import json

    from ray.data.aggregate import Count as _Count

    def _parse(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            try:
                ks.append(int(json.loads(p)["k"]) // 10)
            except (ValueError, KeyError, TypeError):
                ks.append(-1)
        return pa.table({"k_bucket": pa.array(ks, pa.int64())})

    return (
        _read(sf_dir, "events", ["props"])
        .map_batches(_parse, batch_format="pyarrow")
        .groupby("k_bucket")
        .aggregate(_Count(alias_name="n_events"))
    )


def supplier_nation_counts(sf_dir: str) -> pd.DataFrame:
    """Suppliers per nation name — two-level broadcast join
    (supplier -> nation). Output: (n_name, n_suppliers)."""
    nation = typed_pandas(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
        {"n_nationkey": "int32", "n_name": "object"},
    )
    nref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def _attach(batch: pa.Table) -> pa.Table:
        names = ray.get(nref)
        return pa.table(
            {
                "n_name": pa.array(
                    [names.get(key1) for key1 in batch["s_nationkey"].to_pylist()],
                    pa.string(),
                )
            }
        )

    out = (
        _read(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(_attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )
    return (
        typed_pandas(out, {"n_name": "object", "n_suppliers": "int64"})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def events_asof_join(sf_dir: str) -> "rd.Dataset":
    """As-of join: each 'click' event picks up the value of the latest
    'view' event by the same user at or before its timestamp (ties on
    ts broken by max event_id). Output: (event_id, user_id, ts,
    last_view_value) — null when the user has no prior view.

    Ray Data has no as-of join primitive; the streaming-safe
    composition is the tagged-union merge: both sides union into one
    dataset, hash-partition on user_id (`partitioned_group_map`), and
    inside each partition ONE vectorized polars pass sorts by
    (user_id, ts, side, event_id) — views ordered before clicks at
    equal ts — and forward-fills the last view value within each user
    run. No broadcast, no per-user dispatch, and each row crosses the
    shuffle exactly once, so the plan holds when users number 10^9.
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def _tag(batch: pa.Table) -> pa.Table:
        etype = batch["event_type"]
        keep = pc.is_in(etype, value_set=pa.array(["view", "click"]))
        batch = batch.filter(keep)
        is_click = pc.equal(batch["event_type"], pa.scalar("click"))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                # views (0) sort before clicks (1) at equal ts, so a
                # same-instant view is visible to the click
                "_side": pc.cast(is_click, pa.int8()),
                "value": batch["value"],
            }
        )

    def _merge(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["user_id", "ts", "_side", "event_id"])
        df = df.with_columns(
            pl.when(pl.col("_side") == 0)
            .then(pl.col("value"))
            .otherwise(None)
            .forward_fill()
            .over("user_id")
            .alias("last_view_value")
        )
        out = df.filter(pl.col("_side") == 1).select(
            ["event_id", "user_id", "ts", "last_view_value"]
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("last_view_value", pa.float64()),
                ]
            )
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return partitioned_group_map(tagged, "user_id", _merge, arrow=True)


def events_sliding_window(sf_dir: str) -> "rd.Dataset":
    """Sliding-window aggregate: per event_type, 3-row moving average of
    hourly event counts (current + 2 preceding hours with data).
    Output: (event_type, hour, n_events, ma3) with ma3 floor-rounded at
    1e-6 — identical to the oracle's
    `avg(n) OVER (... ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)`.

    Scale shape: the tumbling hourly aggregate is the only full-data
    shuffle (same plan as `events_hourly`); the window pass then runs
    per event_type inside one hash partition with a vectorized polars
    rolling mean — window state never leaves the partition, so the plan
    is the streaming-safe "aggregate then window over the much smaller
    keyed series" decomposition.
    """
    from ..exactmath import floor_round
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _bucket(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.floor_temporal(batch["ts"], unit="hour"),
            }
        )

    hourly = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"))
    )

    def _window(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(tb)
            .sort(["event_type", "hour"])
            .with_columns(
                pl.col("n_events")
                .cast(pl.Float64)
                .rolling_mean(window_size=3, min_samples=1)
                .over("event_type")
                .alias("ma3")
            )
        )
        out = df.to_arrow().cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("hour", pa.timestamp("us")),
                    ("n_events", pa.int64()),
                    ("ma3", pa.float64()),
                ]
            )
        )
        return out.set_column(3, "ma3", floor_round(out["ma3"], 6))

    return partitioned_group_map(hourly, "event_type", _window, arrow=True)


def events_hopping_window(sf_dir: str) -> "rd.Dataset":
    """Hopping-window aggregate: 2-hour windows hopping every hour
    (each event belongs to exactly two windows). Output: (event_type,
    window_start, n_events).

    The batch-engine expression of an overlapping streaming window:
    window membership is a vectorized per-event EXPANSION (each event
    emits one row per covering window — here 2, computed as
    floor_temporal(ts) and floor_temporal(ts) - 1h) inside map_batches,
    then the window reduce is the same multi-key groupby as the
    tumbling case. Expansion factor = window/hop is a constant, so
    shuffle volume stays linear in events.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    hour_us = 3_600_000_000

    def _expand(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        prev = pc.cast(
            pc.subtract(pc.cast(hour, pa.int64()), pa.scalar(hour_us)),
            pa.timestamp("us"),
        )
        etype = batch["event_type"]
        return pa.concat_tables(
            [
                pa.table({"event_type": etype, "window_start": hour}),
                pa.table({"event_type": etype, "window_start": prev}),
            ]
        )

    return (
        ds.map_batches(_expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"))
    )


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE aggregate: order counts and exact price sums at all four
    grouping levels of (status, priority) — fine, status-only,
    priority-only, grand total — NULL marking rolled-up dimensions
    (ANSI GROUP BY CUBE). Output: (o_orderstatus, o_orderpriority,
    n_orders, sum_price).

    Scale shape: identical to `orders_rollup` — ONE full-data shuffle
    at the finest level, then every coarser grouping set re-aggregates
    the tiny (statuses x priorities)-row table on the driver.
    """
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_u": _micros(batch["o_totalprice"]),
            }
        )

    fine = typed_pandas(
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"), Sum("price_u", alias_name="sum_u")),
        {"o_orderstatus": "object", "o_orderpriority": "object",
         "n_orders": "int64", "sum_u": "int64"},
    )
    by_status = (
        fine.groupby("o_orderstatus", as_index=False)[["n_orders", "sum_u"]]
        .sum()
        .assign(o_orderpriority=None)
    )
    by_priority = (
        fine.groupby("o_orderpriority", as_index=False)[["n_orders", "sum_u"]]
        .sum()
        .assign(o_orderstatus=None)
    )
    grand = pd.DataFrame(
        {
            "o_orderstatus": [None],
            "o_orderpriority": [None],
            "n_orders": [fine["n_orders"].sum()],
            "sum_u": [fine["sum_u"].sum()],
        }
    )
    out = pd.concat([fine, by_status, by_priority, grand], ignore_index=True)[
        ["o_orderstatus", "o_orderpriority", "n_orders", "sum_u"]
    ]
    out["sum_price"] = out.pop("sum_u") / 1e6
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"], na_position="first"
    ).reset_index(drop=True)


def customers_without_recent_orders(
    sf_dir: str, cutoff: str = "2001-01-01"
) -> "rd.Dataset":
    """Anti-join: customers with NO order on/after `cutoff`. Output:
    (c_custkey, c_name, c_acctbal).

    Both sides are fact-scale at 10^12 rows, so no broadcast: the
    tagged-union anti-join unions typed customer rows (_side=0) with
    date-filtered, per-batch-deduped order custkeys (_side=1),
    hash-partitions ONCE on custkey (`partitioned_group_map`), and each
    partition drops customers whose key appears on the order side with
    one vectorized polars anti-join. Every row crosses the shuffle
    exactly once; the order side ships only distinct keys.
    """
    import numpy as np

    cut = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))
    schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_acctbal", pa.float64()),
            ("_side", pa.int8()),
        ]
    )

    def _cust(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        ).cast(schema)

    def _orders(batch: pa.Table) -> pa.Table:
        keys = pc.unique(
            batch.filter(pc.greater_equal(batch["o_orderdate"], cut))["o_custkey"]
        )
        n = len(keys)
        return pa.table(
            {
                "c_custkey": keys,
                "c_name": pa.nulls(n, pa.string()),
                "c_acctbal": pa.nulls(n, pa.float64()),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
            }
        ).cast(schema)

    out_schema = pa.schema(list(schema)[:3])

    def _anti(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        cust = df.filter(pl.col("_side") == 0).drop("_side")
        seen = df.filter(pl.col("_side") == 1).select("c_custkey").unique()
        if cust.height == 0:
            return out_schema.empty_table()
        return (
            cust.join(seen, on="c_custkey", how="anti")
            .to_arrow()
            .cast(out_schema)
        )

    unioned = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        .map_batches(_cust, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
                _orders, batch_format="pyarrow"
            )
        )
    )
    from ..stages.grouped import partitioned_group_map

    return partitioned_group_map(unioned, "c_custkey", _anti, arrow=True)


def top_revenue_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> pd.DataFrame:
    """TPC-H-Q3-shaped multi-way join: revenue of orders placed before
    `cutoff` by customers in `segment`, counting only lineitems shipped
    after `cutoff`; top-k by revenue. Output: (o_orderkey, o_orderdate,
    o_orderpriority, revenue).

    Join strategy by side size: `customer` is the dimension table — the
    filtered segment's custkeys broadcast once via `ray.put` and orders
    semi-join against them per batch (numpy isin, no shuffle).
    `lineitem`, the 10^12-row fact side, pre-aggregates revenue per
    orderkey FIRST (micro-unit integer sums, one shuffle) so the join
    input shrinks from line-items to orders. The two order-keyed sides
    then meet in a tagged-union partitioned inner join — one more
    shuffle, each row crossing once. Top-k runs as a per-batch combiner
    (each block keeps its k best) before a driver sort of the k-sized
    remnants, never a global sort.
    """
    import numpy as np

    cut = pa.scalar(pd.Timestamp(cutoff), pa.timestamp("us"))

    cust = typed_pandas(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        {"c_custkey": "int64", "c_mktsegment": "object"},
    )
    seg_keys = cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy()
    seg_ref = ray.put(np.sort(seg_keys))

    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("rev_u", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
            ("_side", pa.int8()),
        ]
    )

    def _orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["o_orderdate"], cut))
        keys = ray.get(seg_ref)
        ck = np.asarray(batch["o_custkey"], dtype=np.int64)
        if len(keys) == 0:
            batch = batch.slice(0, 0)
        else:
            idx = np.searchsorted(keys, ck)
            idx[idx == len(keys)] = 0
            batch = batch.filter(pa.array(keys[idx] == ck))
        n = batch.num_rows
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "rev_u": pa.nulls(n, pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
                "_side": pa.array(np.ones(n, dtype=np.int8)),
            }
        ).cast(schema)

    def _rev(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cut))
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {"o_orderkey": batch["l_orderkey"], "rev_u": _micros(disc)}
        )

    lineitem_rev = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(_rev, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
    )

    def _lrows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "rev_u": batch["rev_u"],
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        ).cast(schema)

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
            ("revenue", pa.float64()),
        ]
    )

    def _join(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        rev = df.filter(pl.col("_side") == 0).select(["o_orderkey", "rev_u"])
        ords = df.filter(pl.col("_side") == 1).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )
        j = ords.join(rev, on="o_orderkey", how="inner")
        if j.height == 0:
            return out_schema.empty_table()
        j = j.with_columns(
            (pl.col("rev_u").cast(pl.Float64) / 1e6).alias("revenue")
        ).drop("rev_u")
        return j.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    unioned = lineitem_rev.map_batches(_lrows, batch_format="pyarrow").union(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(_orders, batch_format="pyarrow")
    )
    from ..stages.grouped import partitioned_group_map

    joined = partitioned_group_map(unioned, "o_orderkey", _join, arrow=True)

    def _topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch,
            sort_keys=[("revenue", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(order[:k])

    best = typed_pandas(
        joined.map_batches(_topk, batch_format="pyarrow"),
        {"o_orderkey": "int64", "revenue": "float64",
         "o_orderdate": "datetime64[us]"},
    )
    best = best.sort_values(
        ["revenue", "o_orderkey"], ascending=[False, True]
    ).head(k)
    best["revenue"] = (np.floor(best["revenue"] * 100 + 0.5) / 100.0).astype("float64")
    return best.reset_index(drop=True)


def events_interarrival(sf_dir: str) -> "rd.Dataset":
    """Lag window: per event, microseconds since the same user's previous
    event (null for the user's first). Output: (event_id, user_id, ts,
    gap_us) — one row per input event, exact int64 arithmetic.

    The window never crosses a user, so the scale plan is
    hash-partition on user_id + ONE vectorized polars pass per
    partition (sort by user_id, ts, event_id; diff masked at user
    boundaries via `over`). No global sort, no per-user dispatch.
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _lag(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            pl.col("ts")
            .diff()
            .dt.total_microseconds()
            .over("user_id")
            .alias("gap_us")
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("gap_us", pa.int64()),
                ]
            )
        )

    return partitioned_group_map(ds, "user_id", _lag, arrow=True)


def event_type_distinct_users(sf_dir: str) -> "rd.Dataset":
    """COUNT(DISTINCT user_id) per event_type, exactly. Output:
    (event_type, n_users).

    Distinct-count is shuffle-heavy done naively (all rows keyed by
    type). This plan dedups (type, user) pairs per batch first, then
    hash-partitions on user_id — every (type, user) pair lands in
    exactly one partition, so per-partition distinct-pair counts are
    disjoint and the final per-type Sum over P partial rows is exact.
    Shuffle volume is distinct pairs, not events; the final aggregate
    moves O(P x types) rows.
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def _localdedup(batch: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(batch).unique().to_arrow().cast(
            pa.schema([("event_type", pa.string()), ("user_id", pa.int64())])
        )

    def _count(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .unique()
            .group_by("event_type")
            .agg(pl.len().cast(pl.Int64).alias("n_partial"))
        )
        return out.to_arrow().cast(
            pa.schema([("event_type", pa.string()), ("n_partial", pa.int64())])
        )

    partial = partitioned_group_map(
        ds.map_batches(_localdedup, batch_format="pyarrow"), "user_id", _count,
        arrow=True,
    )
    return (
        partial.groupby("event_type")
        .aggregate(Sum("n_partial", alias_name="n_users"))
    )


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP aggregate: order counts and exact price sums at three
    grouping levels — (status, priority), (status), and grand total —
    with NULL marking the rolled-up dimension (ANSI GROUP BY ROLLUP).
    Output: (o_orderstatus, o_orderpriority, n_orders, sum_price).

    Scale shape: ONE full-data shuffle computes the finest-level
    aggregate (micro-unit integer sums, order-independent); the coarser
    levels re-aggregate the tiny finest-level table (statuses x
    priorities rows) on the driver — the standard rollup decomposition,
    where each level is a reduction of the previous one, not a rescan.
    """
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_u": _micros(batch["o_totalprice"]),
            }
        )

    fine = typed_pandas(
        ds.map_batches(_prep, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"), Sum("price_u", alias_name="sum_u")),
        {"o_orderstatus": "object", "o_orderpriority": "object",
         "n_orders": "int64", "sum_u": "int64"},
    )
    lv1 = (
        fine.groupby("o_orderstatus", as_index=False)[["n_orders", "sum_u"]]
        .sum()
        .assign(o_orderpriority=None)
    )
    lv0 = pd.DataFrame(
        {
            "o_orderstatus": [None],
            "o_orderpriority": [None],
            "n_orders": [fine["n_orders"].sum()],
            "sum_u": [fine["sum_u"].sum()],
        }
    )
    out = pd.concat([fine, lv1, lv0], ignore_index=True)[
        ["o_orderstatus", "o_orderpriority", "n_orders", "sum_u"]
    ]
    out["sum_price"] = out.pop("sum_u") / 1e6
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(
        ["o_orderstatus", "o_orderpriority"], na_position="first"
    ).reset_index(drop=True)


def customer_order_totals_full(sf_dir: str) -> "rd.Dataset":
    """LEFT OUTER join + aggregate: EVERY customer with order count and
    total spend, zeros for customers who never ordered (the outer-join
    complement of `customer_order_totals`'s inner top-10).

    Same tagged-union shape as the anti-join above — both sides
    fact-scale, no broadcast: customer rows (_side 0) union per-batch
    pre-aggregated order partials (_side 1; only (custkey, sum_u, n)
    partial rows cross the shuffle), one hash partitioning on custkey,
    then a vectorized polars left join per partition. Money sums ride
    exact integer micro-units. Output
    (c_custkey, c_name, n_orders, total_spent)."""
    import numpy as np
    import polars as pl

    schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("_su", pa.int64()),
            ("_n", pa.int64()),
            ("_side", pa.int8()),
        ]
    )

    def _cust(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": batch["c_name"],
                "_su": pa.nulls(n, pa.int64()),
                "_n": pa.nulls(n, pa.int64()),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        ).cast(schema)

    def _orders(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table(
                {
                    "c_custkey": batch["o_custkey"],
                    "_su": _micros(batch["o_totalprice"]),
                }
            )
        )
        part = df.group_by("c_custkey").agg(
            pl.col("_su").sum(), pl.len().cast(pl.Int64).alias("_n")
        )
        n = part.height
        return (
            part.with_columns(
                pl.lit(None, dtype=pl.String).alias("c_name"),
                pl.lit(1, dtype=pl.Int8).alias("_side"),
            )
            .select(["c_custkey", "c_name", "_su", "_n", "_side"])
            .to_arrow()
            .cast(schema)
        )

    out_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("n_orders", pa.int64()),
            ("total_spent", pa.float64()),
        ]
    )

    def _join(tb: pa.Table) -> pa.Table:
        df = pl.from_arrow(tb)
        cust = df.filter(pl.col("_side") == 0).select(["c_custkey", "c_name"])
        if cust.height == 0:
            return out_schema.empty_table()
        agg = (
            df.filter(pl.col("_side") == 1)
            .group_by("c_custkey")
            .agg(pl.col("_su").sum(), pl.col("_n").sum())
        )
        joined = cust.join(agg, on="c_custkey", how="left")
        su = joined["_su"].fill_null(0).to_numpy().astype(np.float64)
        n = joined["_n"].fill_null(0).to_numpy().astype(np.int64)
        spent = np.where(
            n > 0, np.floor((su / 1e6) * 100 + 0.5) / 100.0, 0.0
        )
        return pa.table(
            {
                "c_custkey": pa.array(
                    joined["c_custkey"].to_numpy(), pa.int64()
                ),
                "c_name": pa.array(joined["c_name"].to_list(), pa.string()),
                "n_orders": pa.array(n, pa.int64()),
                "total_spent": pa.array(spent, pa.float64()),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        _cust, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _orders, batch_format="pyarrow"
    )
    from ..stages.grouped import partitioned_group_map

    return partitioned_group_map(
        cust.union(orders), "c_custkey", _join, arrow=True
    )


def funnel_conversions(sf_dir: str, window_minutes: int = 30) -> "rd.Dataset":
    """Behavioral funnel: per user, how many 'click' events were
    conversions — preceded by a 'view' from the same user within
    `window_minutes` (a bounded time-range join, the asof-join shape
    with a recency predicate on top).

    Same tagged-union merge as `events_asof_join`: one hash
    partitioning on user_id, one vectorized polars pass per partition
    (sort, forward-fill last view timestamp within each user run, then
    an integer-microsecond recency test), and the per-user aggregate
    falls out inside the same partition — users are co-located by
    construction, so no second shuffle. Output
    (user_id, n_clicks, n_converted)."""
    from ..stages.grouped import partitioned_group_map

    import numpy as np

    window_us = window_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(["view", "click"]))
        batch = batch.filter(keep)
        is_click = pc.equal(batch["event_type"], pa.scalar("click"))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "_side": pc.cast(is_click, pa.int8()),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_clicks", pa.int64()),
            ("n_converted", pa.int64()),
        ]
    )

    def _merge(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["user_id", "ts", "_side", "event_id"])
        df = df.with_columns(
            pl.when(pl.col("_side") == 0)
            .then(pl.col("ts"))
            .otherwise(None)
            .fill_null(strategy="forward")
            .over("user_id")
            .alias("_last_view")
        ).filter(pl.col("_side") == 1)
        if df.height == 0:
            return out_schema.empty_table()
        click_us = df["ts"].cast(pl.Int64).to_numpy()
        view_us = df["_last_view"].cast(pl.Int64).to_numpy()
        has_view = df["_last_view"].is_not_null().to_numpy()
        conv = has_view & (click_us - np.where(has_view, view_us, 0) < window_us)
        agg = (
            df.select("user_id")
            .with_columns(pl.Series("_conv", conv.astype(np.int64)))
            .group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_clicks"),
                pl.col("_conv").sum().alias("n_converted"),
            )
        )
        return agg.to_arrow().cast(out_schema)

    return partitioned_group_map(
        ds.map_batches(_tag, batch_format="pyarrow"), "user_id", _merge, arrow=True
    )


def cohort_retention(sf_dir: str) -> "rd.Dataset":
    """Weekly cohort retention: users grouped by their first-event week
    (cohort), counted distinctly per week offset since that first event
    — the classic product-analytics matrix, composed from the engine's
    existing distributed shapes.

    Plan: (1) per-user first-event timestamp (one groupby min over
    per-batch minima); (2) cohort week attached back to every event
    via `attach_lookup` (broadcast under 1M users, partitioned join
    above); (3) exact COUNT(DISTINCT user) per (cohort_week,
    week_offset) with the disjoint-partials pattern of
    `event_type_distinct_users` — per-batch pair dedup, one hash
    partitioning on user_id, exact Sum of disjoint partials. Weeks are
    integer µs // 604800e6 since the epoch. Output
    (cohort_week, week_offset, n_users)."""
    import numpy as np

    from ray.data.aggregate import Min, Sum
    from ..stages.grouped import attach_lookup, partitioned_group_map

    WEEK_US = 604_800_000_000

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    events = ds.map_batches(_us, batch_format="pyarrow").materialize()
    first = (
        events.groupby("user_id").aggregate(Min("ts_us", alias_name="first_us"))
    )

    with_first = attach_lookup(
        events,
        pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64())]),
        ["user_id"],
        first,
        "user_id",
        "first_us",
        pa.int64(),
        ["first_us"],
    )

    def _weeks(batch: pa.Table) -> pa.Table:
        import polars as pl

        ts = np.asarray(batch["ts_us"], dtype=np.int64)
        fu = np.asarray(batch["first_us"], dtype=np.int64)
        cohort = fu // WEEK_US
        offset = ts // WEEK_US - cohort
        out = pa.table(
            {
                "user_id": batch["user_id"],
                "cohort_week": pa.array(cohort, pa.int64()),
                "week_offset": pa.array(offset, pa.int64()),
            }
        )
        return pl.from_arrow(out).unique().to_arrow().cast(out.schema)

    def _count(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .unique()
            .group_by(["cohort_week", "week_offset"])
            .agg(pl.len().cast(pl.Int64).alias("n_partial"))
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("cohort_week", pa.int64()),
                    ("week_offset", pa.int64()),
                    ("n_partial", pa.int64()),
                ]
            )
        )

    partial = partitioned_group_map(
        with_first.map_batches(_weeks, batch_format="pyarrow"),
        "user_id",
        _count,
        arrow=True,
    )
    agg = (
        partial.groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_partial", alias_name="n_users"))
    )

    def _cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch["cohort_week"],
                "week_offset": batch["week_offset"],
                "n_users": pc.cast(batch["n_users"], pa.int64()),
            }
        )

    return agg.map_batches(_cast, batch_format="pyarrow")


def promo_revenue_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14-shaped promotion-revenue share: the percentage of
    discounted lineitem revenue on parts of type 'PROMO'. Output one row
    (promo_revenue, total_revenue, promo_share).

    Shape: lineitem revenue is quantized to exact micro-units per row;
    the part side collapses to a partkey -> is_promo lookup attached via
    `attach_lookup` (broadcast under 1M parts, tagged-union partitioned
    join above — the two-fact-table join path); per-batch partial sums
    reduce to two integers, so the share is one exact division."""
    import numpy as np

    from ..exactmath import floor_round_np
    from ..stages.grouped import attach_lookup

    def _flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "is_promo": pc.cast(
                    pc.equal(batch["p_type"], pa.scalar("PROMO")), pa.int64()
                ),
            }
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        _flag, batch_format="pyarrow"
    )

    def _rev(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        return pa.table(
            {"l_partkey": batch["l_partkey"], "disc_u": _micros(disc)}
        )

    line = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(_rev, batch_format="pyarrow")

    joined = attach_lookup(
        line,
        pa.schema([("l_partkey", pa.int64()), ("disc_u", pa.int64())]),
        ["l_partkey"],
        part,
        "p_partkey",
        "is_promo",
        pa.int64(),
        ["is_promo"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["disc_u"], dtype=np.int64)
        p = np.asarray(batch["is_promo"], dtype=np.int64)
        return pa.table(
            {
                "promo_u": pa.array([int((d * p).sum())], pa.int64()),
                "total_u": pa.array([int(d.sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = joined.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("promo_u", alias_name="p"), Sum("total_u", alias_name="t")
    )
    if not agg or agg.get("t") is None or pd.isna(agg["t"]) or not agg["t"]:
        # empty lineitem slice: no revenue to report
        return pd.DataFrame(
            {"promo_revenue": pd.Series([], dtype="float64"),
             "total_revenue": pd.Series([], dtype="float64"),
             "promo_share": pd.Series([], dtype="float64")}
        )
    p_u, t_u = int(agg["p"]), int(agg["t"])
    return pd.DataFrame(
        {
            "promo_revenue": [
                float(floor_round_np(np.array([p_u / 1e6]), 2)[0])
            ],
            "total_revenue": [
                float(floor_round_np(np.array([t_u / 1e6]), 2)[0])
            ],
            "promo_share": [
                float(floor_round_np(np.array([100.0 * p_u / t_u]))[0])
            ],
        }
    )


def region_supplier_counts(sf_dir: str) -> "rd.Dataset":
    """Supplier counts per region through the two-hop dimension chain
    supplier -> nation -> region: both dimension tables are tiny by
    construction (25 / 5 rows), so they broadcast once via ray.put and
    resolve inside a single map_batches — zero shuffles before the
    final 5-group aggregate. Output (r_name, n_suppliers)."""
    nation = typed_pandas(
        _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
        {"n_nationkey": "int32", "n_regionkey": "int32"},
    )
    region = typed_pandas(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        {"r_regionkey": "int32", "r_name": "object"},
    )
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lut_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    def _attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        names = [lut[k] for k in batch["s_nationkey"].to_pylist()]
        return pa.table({"r_name": pa.array(names, pa.string())})

    return (
        _read(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(_attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )


def events_range_join(sf_dir: str) -> "rd.Dataset":
    """Range (interval) join: each 'purchase' event collects every
    event by the same user in the preceding one-hour attribution
    window [purchase.ts - 1h, purchase.ts). Output: (purchase_id,
    event_id, user_id) — one row per qualifying pair.

    Ray Data has no inequality-join primitive; the streaming-safe
    composition mirrors `events_asof_join`: hash-partition the events
    table ONCE on user_id (`partitioned_group_map`), then inside each
    partition a single vectorized polars `join_where` (IEJoin) pairs
    purchases with their window — every row crosses the shuffle
    exactly once and the window bound keeps per-user output linear in
    events-per-hour, so the plan holds at 10^9 users. Skew note: a
    single pathological user lands in one partition; the window bound
    (not the partitioning) is what caps that partition's output.
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _pairs(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        pur = (
            df.filter(pl.col("event_type") == "purchase")
            .select(
                pl.col("event_id").alias("purchase_id"),
                pl.col("user_id"),
                pl.col("ts").alias("p_ts"),
            )
            .with_columns(
                (pl.col("p_ts") - pl.duration(hours=1)).alias("w_lo")
            )
        )
        out = (
            pur.join_where(
                df.select("event_id", pl.col("user_id").alias("u2"), "ts"),
                pl.col("user_id") == pl.col("u2"),
                pl.col("ts") >= pl.col("w_lo"),
                pl.col("ts") < pl.col("p_ts"),
            )
            .select("purchase_id", "event_id", "user_id")
            .sort(["purchase_id", "event_id"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("purchase_id", pa.int64()),
                    ("event_id", pa.int64()),
                    ("user_id", pa.int64()),
                ]
            )
        )

    return partitioned_group_map(ds, "user_id", _pairs, arrow=True)


def events_trending_types(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Trending event types: per day, the top-`k` event types by count
    with their rank — the leaderboard view a streaming pipeline keeps
    per window, expressed as a batch operator (§2.10 + the group top-k
    pattern of `top_docs_per_source`).

    Rank order (count DESC, event_type ASC) is total, so the top-k
    boundary is deterministic. Scale shape: per-batch (day, type)
    combiner counts -> one groupby sum -> one hash partition by day
    ranks each day's handful of types with a vectorized polars window.
    Output (day, event_type, n_events, rank).
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _bucket(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(
                pa.table(
                    {
                        "day": pc.floor_temporal(batch["ts"], unit="day"),
                        "event_type": batch["event_type"],
                    }
                )
            )
            .group_by(["day", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("_part"))
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("day", pa.timestamp("us")),
                    ("event_type", pa.string()),
                    ("_part", pa.int64()),
                ]
            )
        )

    agg = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("_part", alias_name="n_events"))
    )

    out_schema = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("n_events", pa.int64()),
            ("rank", pa.int64()),
        ]
    )

    def _rank(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["day", "n_events", "event_type"], descending=[False, True, False])
            .with_columns(
                (pl.int_range(pl.len()).over("day") + 1).alias("rank")
            )
            .filter(pl.col("rank") <= k)
            .select(["day", "event_type", "n_events", "rank"])
        )
        return out.to_arrow().cast(out_schema)

    def _daykey(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "day_key", pc.cast(batch["day"], pa.int64())
        )

    keyed = agg.map_batches(_daykey, batch_format="pyarrow")
    ranked = partitioned_group_map(keyed, "day_key", _rank, arrow=True)
    return ranked


def trending_oracle_sql(k: int = 3) -> str:
    """DuckDB twin of `events_trending_types`."""
    return f"""
        WITH c AS (
            SELECT date_trunc('day', ts) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, n_events,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY day ORDER BY n_events DESC, event_type
               ) AS BIGINT) AS rank
        FROM c
        QUALIFY rank <= {k}
    """


def returned_orders_by_priority(sf_dir: str) -> "rd.Dataset":
    """EXISTS semi-join + rollup (TPC-H Q4 shape on the available
    columns): count orders per (year, quarter, priority) that had at
    least one RETURNED lineitem (l_returnflag = 'R') — the
    order-priority health check a fulfilment pipeline runs per window.

    Scale shape: returned lineitems reduce to per-batch-distinct
    orderkeys (only keys cross the wire), `attach_lookup` resolves the
    EXISTS (broadcast under its byte threshold, partitioned tagged-
    union join above — both sides fact-scale safe), and the count is a
    (year, quarter, priority) groupby over per-batch combiner partials.
    Output (o_year, o_quarter, o_orderpriority, n_orders).
    """
    from ..stages.grouped import attach_lookup

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def _returned_keys(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .filter(pl.col("l_returnflag") == "R")
            .select(pl.col("l_orderkey").cast(pl.Int64).alias("k"))
            .unique()
            .with_columns(pl.lit(1, dtype=pl.Int64).alias("one"))
        )
        return out.to_arrow().cast(
            pa.schema([("k", pa.int64()), ("one", pa.int64())])
        )

    returned = li.map_batches(_returned_keys, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    _O_SCHEMA = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    )
    marked = attach_lookup(
        orders, _O_SCHEMA, ["o_orderkey"], returned, "k", "one",
        pa.int64(), ["has_return"],
    )

    def _partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch)
            .filter(pl.col("has_return").is_not_null())
            .with_columns(
                pl.col("o_orderdate").dt.year().cast(pl.Int64).alias("o_year"),
                ((pl.col("o_orderdate").dt.month().cast(pl.Int64) - 1) // 3 + 1)
                .alias("o_quarter"),
            )
            .group_by(["o_year", "o_quarter", "o_orderpriority"])
            .agg(pl.len().cast(pl.Int64).alias("_part"))
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("o_year", pa.int64()),
                    ("o_quarter", pa.int64()),
                    ("o_orderpriority", pa.string()),
                    ("_part", pa.int64()),
                ]
            )
        )

    return (
        marked.map_batches(_partials, batch_format="pyarrow")
        .groupby(["o_year", "o_quarter", "o_orderpriority"])
        .aggregate(Sum("_part", alias_name="n_orders"))
    )


def returned_orders_oracle_sql() -> str:
    """DuckDB twin of `returned_orders_by_priority`."""
    return """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST((EXTRACT(month FROM o_orderdate) - 1) // 3 + 1 AS BIGINT)
                   AS o_quarter,
               o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
        )
        GROUP BY 1, 2, 3
    """


def discount_revenue_q6(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q6 shape: forecast-revenue-change aggregate — the
    canonical predicate-pushdown scan. Revenue = SUM(extendedprice *
    discount) over lineitems shipped in 1997 with discount in
    [0.05, 0.07] and quantity < 24.

    Exactness: the per-row product is quantized to 1e-6 micro-units
    BEFORE the sum (the price and the discount each carry <= 2 dp in
    the synth, so extendedprice * discount is representable and the
    floor-round is boundary-safe); the reduction is an exact int64 sum.
    One column-pruned read + one stateless filter-map + one scalar
    fold: no shuffle at all. Output one row (revenue_u, n_items).
    """
    import pandas as pd

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    def _f(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch)
            .filter(
                (pl.col("l_shipdate") >= pl.datetime(1997, 1, 1))
                & (pl.col("l_shipdate") < pl.datetime(1998, 1, 1))
                & (pl.col("l_discount") >= 0.05)
                & (pl.col("l_discount") <= 0.07)
                & (pl.col("l_quantity") < 24)
            )
            .with_columns(
                (
                    (pl.col("l_extendedprice") * pl.col("l_discount") * 1e6)
                    + 0.5
                )
                .floor()
                .cast(pl.Int64)
                .alias("rev_u")
            )
            .select(
                pl.col("rev_u").sum().alias("revenue_u"),
                pl.len().cast(pl.Int64).alias("n_items"),
            )
        )
        return df.to_arrow().cast(
            pa.schema([("revenue_u", pa.int64()), ("n_items", pa.int64())])
        )

    parts = ds.map_batches(_f, batch_format="pyarrow").to_pandas()
    rev = int(parts["revenue_u"].sum()) if "revenue_u" in parts.columns else 0
    n = int(parts["n_items"].sum()) if "n_items" in parts.columns else 0
    return pd.DataFrame(
        {
            "revenue_u": pd.array([rev], dtype="int64"),
            "n_items": pd.array([n], dtype="int64"),
        }
    )


def q6_oracle_sql() -> str:
    """DuckDB twin of `discount_revenue_q6` (same per-row micro-unit
    quantization before the sum)."""
    return """
        SELECT CAST(COALESCE(SUM(CAST(floor(
                   l_extendedprice * l_discount * 1000000.0 + 0.5)
                   AS BIGINT)), 0) AS BIGINT) AS revenue_u,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """


def customer_rfm_segments(sf_dir: str) -> "rd.Dataset":
    """RFM customer segmentation (the classic marketing-analytics
    rollup): per customer, Recency (last order date), Frequency (order
    count) and Monetary (total spend, exact micro-units), with a
    deterministic segment label from fixed thresholds — frequency >= 8
    and monetary >= 800k micro-million = 'core', frequency >= 4 =
    'active', else 'occasional'.

    One (custkey) groupby over per-batch combiner partials (max date /
    count / int64 sum — all mergeable), then a stateless label map.
    Output (o_custkey, last_order, n_orders, total_spend_u, segment).
    """
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def _partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .with_columns(
                pl.from_arrow(_micros(batch["o_totalprice"])).alias("p_u")
            )
            .group_by("o_custkey")
            .agg(
                pl.col("o_orderdate").max().alias("last_order"),
                pl.len().cast(pl.Int64).alias("n_orders"),
                pl.col("p_u").sum().alias("total_spend_u"),
            )
        )
        return out.to_arrow().cast(_RFM_PART_SCHEMA)

    def _reduce(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("o_custkey")
            .agg(
                pl.col("last_order").max(),
                pl.col("n_orders").sum(),
                pl.col("total_spend_u").sum(),
            )
            .with_columns(
                pl.when(
                    (pl.col("n_orders") >= 8)
                    & (pl.col("total_spend_u") >= 800_000_000_000)
                )
                .then(pl.lit("core"))
                .when(pl.col("n_orders") >= 4)
                .then(pl.lit("active"))
                .otherwise(pl.lit("occasional"))
                .alias("segment")
            )
        )
        return out.to_arrow().cast(_RFM_OUT_SCHEMA)

    from ..stages.grouped import partitioned_group_map

    partials = ds.map_batches(_partials, batch_format="pyarrow")
    return partitioned_group_map(partials, "o_custkey", _reduce, arrow=True)


_RFM_PART_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("last_order", pa.timestamp("us")),
        ("n_orders", pa.int64()),
        ("total_spend_u", pa.int64()),
    ]
)
_RFM_OUT_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("last_order", pa.timestamp("us")),
        ("n_orders", pa.int64()),
        ("total_spend_u", pa.int64()),
        ("segment", pa.string()),
    ]
)


def rfm_oracle_sql() -> str:
    """DuckDB twin of `customer_rfm_segments`."""
    return """
        WITH a AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(floor(o_totalprice * 1000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS total_spend_u
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, last_order, n_orders, total_spend_u,
               CASE WHEN n_orders >= 8 AND total_spend_u >= 800000000000
                    THEN 'core'
                    WHEN n_orders >= 4 THEN 'active'
                    ELSE 'occasional' END AS segment
        FROM a
    """


def events_dau_wau(sf_dir: str) -> "rd.Dataset":
    """DAU / WAU engagement: per calendar day, the exact count of
    distinct active users that day (DAU) and over the trailing 7 days
    (WAU, days d-6..d) — the stickiness dashboard metric, expressed
    with the same disjoint-partial distinct-count plan as
    `event_type_distinct_users` composed with the hopping-window
    per-row bounded expansion.

    Per batch: dedup to (user, day) pairs, expand each into its <= 7
    trailing windows tagged DAU (offset 0) or WAU (all offsets), dedup
    again; ONE hash partition on user_id makes per-partition distinct
    counts disjoint, so the final per-day Sum is exact. Shuffle volume
    is <= 8x the distinct (user, day) pairs — bounded by the window
    width, never by event count. Output (day, dau, wau); only days
    with >= 1 event that day appear (dau >= 1).
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    _PAIR = pa.schema(
        [
            ("user_id", pa.int64()),
            ("day", pa.timestamp("us")),
            ("is_dau", pa.int8()),
        ]
    )

    def _expand(batch: pa.Table) -> pa.Table:
        import polars as pl

        base = (
            pl.from_arrow(
                pa.table(
                    {
                        "user_id": batch["user_id"],
                        "day": pc.floor_temporal(batch["ts"], unit="day"),
                    }
                )
            )
            .unique()
        )
        outs = []
        for off in range(7):
            outs.append(
                base.select(
                    pl.col("user_id"),
                    (pl.col("day") + pl.duration(days=off)).alias("day"),
                    pl.lit(1 if off == 0 else 0, dtype=pl.Int8).alias(
                        "is_dau"
                    ),
                )
            )
        return (
            pl.concat(outs)
            .unique(["user_id", "day", "is_dau"])
            .to_arrow()
            .cast(_PAIR)
        )

    def _count(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).unique()
        # a user active ON day d also reaches d from earlier days'
        # trailing windows — WAU must count the (user, day) pair once,
        # so dedup ignoring the is_dau tag before counting
        wau = (
            df.unique(["user_id", "day"])
            .group_by("day")
            .agg(pl.len().cast(pl.Int64).alias("wau_partial"))
        )
        dau = (
            df.filter(pl.col("is_dau") == 1)
            .group_by("day")
            .agg(pl.len().cast(pl.Int64).alias("dau_partial"))
        )
        out = wau.join(dau, on="day", how="left").with_columns(
            pl.col("dau_partial").fill_null(0)
        ).select(["day", "dau_partial", "wau_partial"])
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("day", pa.timestamp("us")),
                    ("dau_partial", pa.int64()),
                    ("wau_partial", pa.int64()),
                ]
            )
        )

    partial = partitioned_group_map(
        ds.map_batches(_expand, batch_format="pyarrow"), "user_id", _count,
        arrow=True,
    )
    agg = partial.groupby("day").aggregate(
        Sum("dau_partial", alias_name="dau"),
        Sum("wau_partial", alias_name="wau"),
    )

    def _final(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            # trailing-window days past the last real activity day get
            # wau-only rows; report only days with activity (dau >= 1)
            .filter(pl.col("dau") > 0)
            .select(["day", "dau", "wau"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("day", pa.timestamp("us")),
                    ("dau", pa.int64()),
                    ("wau", pa.int64()),
                ]
            )
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def dau_wau_oracle_sql() -> str:
    """DuckDB twin of `events_dau_wau`."""
    return """
        WITH pairs AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM pairs),
        dau AS (
            SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM pairs GROUP BY day
        ),
        wau AS (
            SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
            FROM days d
            JOIN pairs p ON p.day <= d.day
                        AND p.day >= d.day - INTERVAL 6 DAY
            GROUP BY d.day
        )
        SELECT dau.day, dau.dau, wau.wau
        FROM dau JOIN wau ON wau.day = dau.day
    """


def part_supplier_diversity(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q16 shape on the available tables: per (p_brand, size
    band), how many parts and how many DISTINCT suppliers ship them —
    the supplier-diversity report, with lineitem as the part-supplier
    link (no partsupp table in this corpus). Size bands are
    p_size // 10.

    Plan: lineitem reduces to per-batch-distinct (partkey, suppkey)
    pairs; `attach_lookup` stitches brand+band onto the pairs
    (part is the small side — broadcast under the byte threshold);
    ONE hash partition on suppkey makes per-partition distinct
    (brand, band, supp) counts disjoint, and parts-per-group is a
    separate distinct on partkey counted the same way. Output
    (p_brand, size_band, n_parts, n_suppliers).
    """
    from ..stages.grouped import attach_lookup, partitioned_group_map

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def _pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch)
            .unique()
            .rename({"l_partkey": "pk", "l_suppkey": "sk"})
            .to_arrow()
            .cast(pa.schema([("pk", pa.int64()), ("sk", pa.int64())]))
        )

    pairs = li.map_batches(_pairs, batch_format="pyarrow")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def _key(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .with_columns(
                (
                    pl.col("p_brand")
                    + pl.lit("|")
                    + (pl.col("p_size") // 10).cast(pl.String)
                ).alias("bb")
            )
            .select(
                pl.col("p_partkey").cast(pl.Int64).alias("pk"),
                pl.col("bb"),
            )
        )
        return out.to_arrow().cast(
            pa.schema([("pk", pa.int64()), ("bb", pa.string())])
        )

    keyed = part.map_batches(_key, batch_format="pyarrow")
    _PAIR_SCHEMA = pa.schema([("pk", pa.int64()), ("sk", pa.int64())])
    attached = attach_lookup(
        pairs, _PAIR_SCHEMA, ["pk"], keyed, "pk", "bb", pa.string(), ["bb"]
    )

    _CNT = pa.schema(
        [("bb", pa.string()), ("np_", pa.int64()), ("ns", pa.int64())]
    )

    def _supp_partials(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).unique(["bb", "sk"])
        out = df.group_by("bb").agg(
            pl.lit(0, dtype=pl.Int64).alias("np_"),
            pl.len().cast(pl.Int64).alias("ns"),
        )
        return out.to_arrow().cast(_CNT)

    def _part_partials(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).unique(["bb", "pk"])
        out = df.group_by("bb").agg(
            pl.len().cast(pl.Int64).alias("np_"),
            pl.lit(0, dtype=pl.Int64).alias("ns"),
        )
        return out.to_arrow().cast(_CNT)

    supp = partitioned_group_map(
        attached.select_columns(["bb", "sk"]), "sk", _supp_partials, arrow=True
    )
    prt = partitioned_group_map(
        attached.select_columns(["bb", "pk"]), "pk", _part_partials, arrow=True
    )
    agg = supp.union(prt).groupby("bb").aggregate(
        Sum("np_", alias_name="n_parts"), Sum("ns", alias_name="n_suppliers")
    )

    def _final(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(batch)
            .with_columns(
                pl.col("bb").str.split("|").alias("parts_")
            )
            .with_columns(
                pl.col("parts_").list.get(0).alias("p_brand"),
                pl.col("parts_").list.get(1).cast(pl.Int64).alias("size_band"),
            )
            .select(["p_brand", "size_band", "n_parts", "n_suppliers"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("p_brand", pa.string()),
                    ("size_band", pa.int64()),
                    ("n_parts", pa.int64()),
                    ("n_suppliers", pa.int64()),
                ]
            )
        )

    return agg.map_batches(_final, batch_format="pyarrow")


def part_supplier_diversity_oracle_sql() -> str:
    """DuckDB twin of `part_supplier_diversity`."""
    return """
        WITH pairs AS (
            SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
        ),
        j AS (
            SELECT p.p_brand, p.p_size // 10 AS size_band, pr.pk, pr.sk
            FROM pairs pr JOIN part p ON p.p_partkey = pr.pk
        )
        SELECT p_brand, CAST(size_band AS BIGINT) AS size_band,
               CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_suppliers
        FROM j
        GROUP BY p_brand, size_band
    """


def events_hourly_anomalies(sf_dir: str, k_mad: int = 3) -> "rd.Dataset":
    """Robust stream-monitoring anomaly flags: per (event_type, hour),
    mark hours whose event count deviates from the type's median hourly
    count by more than `k_mad` x MAD (median absolute deviation) — the
    volume-spike / outage detector an ingest pipeline runs per window.
    All-integer exact: medians use the value-at-floor((n-1)/2) rank
    rule (`length_outliers` discipline), the flag test is an integer
    compare, no division anywhere.

    Scale shape: per-batch (type, hour) combiner partials -> one
    groupby sum builds the hourly-count table (rows = types x hours,
    tiny vs events); ONE hash partition on event_type computes each
    type's median/MAD with a vectorized sort over its own hours.
    Output (event_type, hour, n_events, med, mad, is_anomaly).
    """
    from ..stages.grouped import partitioned_group_map

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _bucket(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(
                pa.table(
                    {
                        "event_type": batch["event_type"],
                        "hour": pc.floor_temporal(batch["ts"], unit="hour"),
                    }
                )
            )
            .group_by(["event_type", "hour"])
            .agg(pl.len().cast(pl.Int64).alias("_part"))
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("hour", pa.timestamp("us")),
                    ("_part", pa.int64()),
                ]
            )
        )

    hourly = (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("_part", alias_name="n_events"))
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("med", pa.int64()),
            ("mad", pa.int64()),
            ("is_anomaly", pa.int64()),
        ]
    )

    def _flag(tb: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        df = pl.from_arrow(tb)
        outs = []
        for (et,), g in df.group_by("event_type", maintain_order=False):
            c = np.sort(g["n_events"].to_numpy())
            n = len(c)
            med = int(c[int(np.floor((n - 1) * 0.5))])
            dev = np.sort(np.abs(g["n_events"].to_numpy() - med))
            mad = int(dev[int(np.floor((n - 1) * 0.5))])
            outs.append(
                g.with_columns(
                    pl.lit(med, dtype=pl.Int64).alias("med"),
                    pl.lit(mad, dtype=pl.Int64).alias("mad"),
                    (
                        (pl.col("n_events") - med).abs() > k_mad * mad
                    )
                    .cast(pl.Int64)
                    .alias("is_anomaly"),
                )
            )
        if not outs:
            return out_schema.empty_table()
        return (
            pl.concat(outs)
            .select(
                ["event_type", "hour", "n_events", "med", "mad", "is_anomaly"]
            )
            .to_arrow()
            .cast(out_schema)
        )

    return partitioned_group_map(hourly, "event_type", _flag, arrow=True)


def anomalies_oracle_sql(k_mad: int = 3) -> str:
    """DuckDB twin of `events_hourly_anomalies` (same rank rules)."""
    return f"""
        WITH hc AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        st AS (
            SELECT event_type, c,
                   row_number() OVER (PARTITION BY event_type ORDER BY c) - 1
                       AS r,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM hc
        ),
        med AS MATERIALIZED (
            SELECT event_type, MIN(c) AS m FROM st
            WHERE r >= floor((n - 1) * 0.5) GROUP BY event_type
        ),
        dev AS (
            SELECT hc.event_type, abs(hc.c - med.m) AS d
            FROM hc JOIN med USING (event_type)
        ),
        sd AS (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
                       AS r,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS MATERIALIZED (
            SELECT event_type, MIN(d) AS mad FROM sd
            WHERE r >= floor((n - 1) * 0.5) GROUP BY event_type
        )
        SELECT hc.event_type, hc.hour, hc.c AS n_events,
               CAST(med.m AS BIGINT) AS med,
               CAST(mad.mad AS BIGINT) AS mad,
               CAST(CASE WHEN abs(hc.c - med.m) > {k_mad} * mad.mad
                         THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM hc
        JOIN med USING (event_type)
        JOIN mad USING (event_type)
    """


def customer_order_count_distribution(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING the zero bucket — composed directly on the tagged-union
    LEFT OUTER join of `customer_order_totals_full` (every customer,
    zeros preserved), plus one per-batch combiner count and a tiny
    groupby over the (n_orders, partial) table. The count-of-counts
    histogram a curator reads to spot power users / dead accounts.

    Output (n_orders, n_customers), both int64.
    """
    import polars as pl

    base = customer_order_totals_full(sf_dir)

    def _hist(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch.select(["n_orders"]))
            .group_by("n_orders")
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("_cnt"))
            .select(["n_orders", "_cnt"])
        )
        return out.to_arrow().cast(
            pa.schema([("n_orders", pa.int64()), ("_cnt", pa.int64())])
        )

    return (
        base.map_batches(_hist, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("_cnt", alias_name="n_customers"))
    )


#: TPC-H Q18 parameters: orders whose total line quantity exceeds the
#: threshold, top-k by order value. The quantity sum rides exact
#: integer micro-units; the threshold compare is integer on both sides.
Q18_QTY_THRESHOLD = 300
Q18_TOP_K = 100


def large_volume_orders(
    sf_dir: str,
    qty_threshold: int = Q18_QTY_THRESHOLD,
    k: int = Q18_TOP_K,
) -> pd.DataFrame:
    """TPC-H Q18 shape: large-volume orders — orders whose summed line
    quantity exceeds `qty_threshold`, joined to order value and customer
    name, top `k` by (o_totalprice DESC, o_orderdate, o_orderkey).

    Scale shape: lineitem collapses through a per-batch combiner into
    (orderkey, qty-micros) partials before ONE groupby; the filtered
    heavy-order keys (selective by construction — the threshold sits in
    the distribution tail) broadcast onto a streaming pass over orders
    (semi-join; orders never shuffles), and customer names attach via
    `attach_lookup`'s broadcast/partitioned auto-switch. Only the
    filtered top candidates reach the driver for the final k-sort.
    """
    import polars as pl

    from ..stages.grouped import attach_lookup

    thr_u = qty_threshold * 1_000_000

    def _qty_part(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(
                pa.table(
                    {
                        "o_orderkey": batch["l_orderkey"],
                        "_qu": _micros(batch["l_quantity"]),
                    }
                )
            )
            .group_by("o_orderkey")
            .agg(pl.col("_qu").sum())
        )
        return out.to_arrow().cast(
            pa.schema([("o_orderkey", pa.int64()), ("_qu", pa.int64())])
        )

    heavy = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(_qty_part, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("_qu", alias_name="qty_u"))
        .filter(expr=f"qty_u > {thr_u}")
    )

    _ORD_SCHEMA = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64()),
        ]
    )

    def _cast_orders(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
        ).cast(_ORD_SCHEMA)

    orders = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(_cast_orders, batch_format="pyarrow")

    with_qty = attach_lookup(
        orders, _ORD_SCHEMA, ["o_orderkey"], heavy, "o_orderkey", "qty_u",
        pa.int64(), ["qty_u"],
    )

    def _semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch["qty_u"]))

    hits = with_qty.map_batches(_semi, batch_format="pyarrow")

    s2 = pa.schema(list(_ORD_SCHEMA) + [pa.field("qty_u", pa.int64())])
    with_name = attach_lookup(
        hits, s2, ["o_custkey"],
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_custkey", "c_name", pa.string(), ["c_name"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        # inner-join semantics: drop orders whose customer is missing
        batch = batch.filter(pc.is_valid(batch["c_name"]))
        return pa.table(
            {
                "c_name": batch["c_name"],
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "o_totalprice": batch["o_totalprice"],
                "sum_qty": pc.divide(
                    pc.cast(batch["qty_u"], pa.float64()), 1_000_000.0
                ),
            }
        )

    out = typed_pandas(
        with_name.map_batches(_final, batch_format="pyarrow"),
        {
            "c_name": "string",
            "o_custkey": "int64",
            "o_orderkey": "int64",
            "o_orderdate": "datetime64[us]",
            "o_totalprice": "float64",
            "sum_qty": "float64",
        },
    )
    return (
        out.sort_values(
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True],
        )
        .head(k)
        .reset_index(drop=True)
    )


def q13_oracle_sql() -> str:
    """DuckDB twin of `customer_order_count_distribution`."""
    return """
        WITH o AS (
            SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
        ),
        j AS (
            SELECT c.c_custkey, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
            FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
        )
        SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
        FROM j GROUP BY n_orders
    """


def q18_oracle_sql(
    qty_threshold: int = Q18_QTY_THRESHOLD, k: int = Q18_TOP_K
) -> str:
    """DuckDB twin of `large_volume_orders`: the quantity sum uses the
    same micro-unit rounding, the threshold compare is the same integer
    test, and sum_qty is the same float division of that integer."""
    return f"""
        WITH s AS (
            SELECT l_orderkey,
                   SUM({_MICROS_SQL.format(x="l_quantity")}) AS qu
            FROM lineitem GROUP BY 1
        ),
        f AS (SELECT * FROM s WHERE qu > {qty_threshold * 1_000_000})
        SELECT c.c_name,
               o.o_custkey,
               o.o_orderkey,
               o.o_orderdate,
               o.o_totalprice,
               f.qu / 1000000.0 AS sum_qty
        FROM f
        JOIN orders o ON o.o_orderkey = f.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT {k}
    """


#: completion window for the 3-step funnel (view -> click -> purchase)
FUNNEL3_WINDOW_MIN = 60


def events_funnel3(
    sf_dir: str, window_minutes: int = FUNNEL3_WINDOW_MIN
) -> pd.DataFrame:
    """Three-step ordered funnel: per user, does a view -> click ->
    purchase chain exist with ts_view <= ts_click <= ts_purchase and
    ts_purchase - ts_view <= window? The sequential-pattern report one
    step deeper than `funnel_conversions`' pairwise version.

    EXISTS semantics vectorize as two forward fills per user (events
    sorted by ts, event_id): the latest view time at each row, and —
    carried forward from click rows only — the latest view time at the
    latest click so far. Both are monotone, so a chain through the
    latest qualifying predecessor exists iff ANY chain exists; a
    purchase completes the funnel iff its carried view time is within
    the window. All time arithmetic is exact int64 microseconds; ties
    at identical timestamps resolve by event_id in BOTH engines.

    Scale shape: one user_id hash partition + a vectorized polars pass
    per partition producing three per-partition flag-count partials;
    only (3 ints x partitions) reach the driver. Output
    (step, n_users), steps 'view' / 'view>click' / 'view>click>purchase'.
    """
    import polars as pl

    from ..stages.grouped import partitioned_group_map

    w_us = window_minutes * 60 * 1_000_000

    def _part(tb: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(tb)
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                pl.col("ts").cast(pl.Int64).alias("t")  # exact µs
            )
            .with_columns(
                pl.when(pl.col("event_type") == "view")
                .then(pl.col("t"))
                .otherwise(None)
                .forward_fill()
                .over("user_id")
                .alias("v")
            )
            .with_columns(
                pl.when(pl.col("event_type") == "click")
                .then(pl.col("v"))
                .otherwise(None)
                .forward_fill()
                .over("user_id")
                .alias("cv")
            )
            .with_columns(
                (pl.col("event_type") == "view").alias("is_v"),
                (
                    (pl.col("event_type") == "click")
                    & pl.col("v").is_not_null()
                    & ((pl.col("t") - pl.col("v")) <= w_us)
                ).alias("is_vc"),
                (
                    (pl.col("event_type") == "purchase")
                    & pl.col("cv").is_not_null()
                    & ((pl.col("t") - pl.col("cv")) <= w_us)
                ).alias("is_vcp"),
            )
            .group_by("user_id")
            .agg(
                pl.col("is_v").any().alias("hv"),
                pl.col("is_vc").any().alias("hvc"),
                pl.col("is_vcp").any().alias("hvcp"),
            )
        )
        return pa.table(
            {
                "n_view": pa.array([int(df["hv"].sum())], pa.int64()),
                "n_view_click": pa.array([int(df["hvc"].sum())], pa.int64()),
                "n_full": pa.array([int(df["hvcp"].sum())], pa.int64()),
            }
        )

    parts = typed_pandas(
        partitioned_group_map(
            _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]),
            "user_id",
            _part,
            arrow=True,
        ),
        {"n_view": "int64", "n_view_click": "int64", "n_full": "int64"},
    )
    return pd.DataFrame(
        {
            "step": ["view", "view>click", "view>click>purchase"],
            "n_users": [
                int(parts["n_view"].sum()),
                int(parts["n_view_click"].sum()),
                int(parts["n_full"].sum()),
            ],
        }
    ).astype({"step": "string", "n_users": "int64"})


def funnel3_oracle_sql(window_minutes: int = FUNNEL3_WINDOW_MIN) -> str:
    """DuckDB twin of `events_funnel3` (same forward-fill construction
    via running MAX windows; epoch_us for the exact µs arithmetic)."""
    w_us = window_minutes * 60 * 1_000_000
    return f"""
        WITH e AS (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS t
            FROM events
        ),
        f1 AS (
            SELECT user_id, event_type, event_id, t,
                   MAX(CASE WHEN event_type = 'view' THEN t END) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING) AS v
            FROM e
        ),
        f2 AS (
            SELECT user_id, event_type, t, v,
                   MAX(CASE WHEN event_type = 'click' THEN v END) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING) AS cv
            FROM f1
        ),
        u AS (
            SELECT user_id,
                   bool_or(event_type = 'view') AS hv,
                   bool_or(event_type = 'click' AND v IS NOT NULL
                           AND t - v <= {w_us}) AS hvc,
                   bool_or(event_type = 'purchase' AND cv IS NOT NULL
                           AND t - cv <= {w_us}) AS hvcp
            FROM f2 GROUP BY user_id
        )
        SELECT 'view' AS step,
               CAST(count(*) FILTER (hv) AS BIGINT) AS n_users FROM u
        UNION ALL
        SELECT 'view>click',
               CAST(count(*) FILTER (hvc) AS BIGINT) FROM u
        UNION ALL
        SELECT 'view>click>purchase',
               CAST(count(*) FILTER (hvcp) AS BIGINT) FROM u
    """
