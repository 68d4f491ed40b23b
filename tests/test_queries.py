"""Driver-style correctness harness: run each queries() entry at sf0.001 and
compare against its oracle_sql() in DuckDB (row count + column names +
order-insensitive values), mirroring the external correctness gate."""
import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.splitext(os.path.basename(f))[0]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    return con


def _oracle_names():
    from sievedata.queries import oracle_sql

    return sorted(oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, ducks, name):
    from sievedata.queries import oracle_sql, queries

    got = _canon(_to_pandas(queries()[name](SF_DIR)))
    want = _canon(ducks.sql(oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=0, atol=1e-9, err_msg=f"{name}.{c}"
            )
        else:
            assert (g.astype(str).to_numpy() == w.astype(str).to_numpy()).all(), f"{name}.{c}"


def test_rows_only_queries_run(ray_session):
    from sievedata.queries import oracle_sql, queries

    rows_only = sorted(set(queries()) - set(oracle_sql()))
    assert rows_only  # there are non-SQL-expressible ops
    for name in rows_only:
        df = _to_pandas(queries()[name](SF_DIR))
        assert df is not None and len(df.columns) > 0, name
