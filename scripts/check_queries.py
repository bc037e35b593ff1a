"""Driver-style correctness check: run queries() vs oracle_sql() via DuckDB.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
Mimics the driver: row count + sorted-column value hash comparison.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name}: ENGINE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"{name}: rows={len(mine)} (no_oracle)")
            continue
        oracle = con.execute(sqls[name]).df()
        rows_ok = len(mine) == len(oracle)
        schema_ok = sorted(mine.columns) == sorted(oracle.columns)
        hash_ok = frame_hash(mine) == frame_hash(oracle) if schema_ok else False
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(f"{name}: {status} rows={len(mine)}/{len(oracle)} "
              f"schema={schema_ok} hash={hash_ok}")
        if status == "FAIL":
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
