"""Driver-emulating correctness harness.

Runs every ``queries()`` entry at sf=0.01 and compares with the
matching ``oracle_sql()`` through DuckDB: row count, column-name set,
and order-insensitive value equality (columns sorted by name, rows
sorted by all columns). Mirrors the external driver's CORRECTNESS
check so regressions surface before the round boundary.

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    raise TypeError(type(result))


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    import duckdb
    import pandas as pd

    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(res)} rows ({dt:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        if len(res) != len(exp):
            print(f"FAIL  {name}: rows {len(res)} != oracle {len(exp)}")
            n_fail += 1
            continue
        if sorted(res.columns) != sorted(exp.columns):
            print(
                f"FAIL  {name}: columns {sorted(res.columns)} != {sorted(exp.columns)}"
            )
            n_fail += 1
            continue
        a, b = normalize(res), normalize(exp)
        try:
            # exact: the driver hashes values, so floats must match bitwise
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS  {name}: {len(res)} rows ({dt:.1f}s)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch ({dt:.1f}s)")
            diff = (a != b)
            bad_cols = [c for c in a.columns if diff[c].any()]
            print(f"      mismatching columns: {bad_cols}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"      first diff {c}[{idx}]: ray={a[c][idx]!r} oracle={b[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
