"""Sources / sinks helpers.

Reference mappings (SURVEY.md §2.2): URL-file CLI input -> read_text;
Parquet warm store -> read_parquet/write_parquet with partitioning;
JSONL exporter -> write_json. Plus transcript-schema validation at the
read boundary (the engine's one enforced schema).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

REQUIRED_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA]


def read_transcripts(path: str) -> "rd.Dataset":
    """read_parquet + schema validation (missing columns fail fast;
    large_string/string width differences are tolerated)."""
    ds = rd.read_parquet(path)
    names = set(ds.schema().names)
    missing = [c for c in REQUIRED_COLUMNS if c not in names]
    if missing:
        raise ValueError(f"transcript input missing columns: {missing}")
    return ds


def read_url_list(path: str) -> "rd.Dataset":
    """URL-file reader (reference cli.py:129-166): one URL per line,
    blank lines and #comments skipped. -> (url) dataset."""
    ds = rd.read_text(path)

    def _clean(batch: pa.Table) -> pa.Table:
        urls = [
            u.strip()
            for u in batch["text"].to_pylist()
            if u.strip() and not u.strip().startswith("#")
        ]
        return pa.table({"url": pa.array(urls, pa.string())})

    return ds.map_batches(_clean, batch_format="pyarrow")


def write_partitioned(
    ds: "rd.Dataset",
    path: str,
    partition_cols: list[str] | None = None,
    date_col: str | None = None,
):
    """Hive-partitioned Parquet warm-store sink (reference
    `storage/parquet_store.py:26-69`: key=value directory layout,
    snappy compression — pyarrow's default; timestamps partition by
    their `YYYY-MM-DD` date, `parquet_store.py:58-69`).

    `date_col` names a timestamp column to derive a string `date`
    partition from (the original timestamp column is preserved in the
    data files). Partitioned output is also the resumable-run layout:
    a re-run can skip finished partitions.
    """
    cols = list(partition_cols or [])
    if date_col is not None:
        import pyarrow.compute as pc

        def _with_date(batch: pa.Table) -> pa.Table:
            day = pc.strftime(batch[date_col], format="%Y-%m-%d")
            return batch.append_column("date", day)

        ds = ds.map_batches(_with_date, batch_format="pyarrow")
        cols.append("date")
    if cols:
        ds.write_parquet(path, partition_cols=cols)
    else:
        ds.write_parquet(path)


def typed_pandas(ds, dtypes: dict[str, str]):
    """`ds.to_pandas()` that survives empty datasets.

    An empty Ray dataset loses its schema — `to_pandas()` returns a
    column-less frame — which crashes any downstream column access. At
    100 TB empties are routine (a fully-filtered shard, an already-done
    resume partition), so every driver-side conversion that goes on to
    index columns routes through here: on an empty result it returns a
    typed empty frame with exactly `dtypes` instead.
    """
    import pandas as pd

    df = ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in dtypes.items()}
        )
    return df


def read_warm_store(path: str, columns: list[str] | None = None) -> "rd.Dataset":
    """Read a hive-partitioned warm store back (partition columns come
    back as regular columns; partition pruning happens via `columns=` /
    downstream filters)."""
    return rd.read_parquet(path, columns=columns)
