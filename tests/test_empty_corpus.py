"""Zero-row-corpus sweep: every registered driver query must run.

At 100 TB scale, empty inputs are routine — a filter that matches
nothing, an empty partition after a split, a resumed job whose
remaining shard is already done. Any map_batches kernel that assumes
len(batch) > 0 (shape-(0,) unpacks, take(1) probes, max() of nothing)
crashes the whole pipeline, so EVERY `queries()` entry is swept
against a corpus where all ten tables exist with the real schemas and
zero rows. The contract is "no exception, a well-formed (possibly
empty) result" — not any particular row count.
"""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_REF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for p in sorted(glob.glob(os.path.join(SF_REF, "*.parquet"))):
        schema = pq.read_schema(p)
        pq.write_table(schema.empty_table(), str(d / os.path.basename(p)))
    return str(d)


def _names():
    import __ray_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_survives_empty_corpus(name, empty_sf_dir, ray_session):
    import ray.data as rd

    import __ray_entry__ as entry

    result = entry.queries()[name](empty_sf_dir)
    if isinstance(result, rd.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    assert isinstance(result, pd.DataFrame)
