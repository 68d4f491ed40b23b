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


def test_repetition_filter_fallback_path_matches_fast_path():
    """guard=0 forces the lexsort boundary-count branch (the int64-overflow
    fallback for huge per-batch vocabularies); it must agree bit-for-bit
    with the packed-key np.unique fast path, including the keep verdict,
    NULL-text drop, and empty/1-token docs (0 grams → keep)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sievedata.queries import _repetition_block_stats

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    edge = pa.table({
        "doc_id": pa.array([10_001, 10_002, 10_003, 10_004], type=pa.int64()),
        "text": pa.array(["", "one", "a a a a a", None]),
    })
    t = pa.concat_tables([t, edge])
    fast = _repetition_block_stats(t, 5)
    slow = _repetition_block_stats(t, 5, guard=0)
    assert fast.equals(slow)
    d = {r["doc_id"]: r for r in fast.to_pylist()}
    assert d[10_001]["n_grams"] == 0 and d[10_001]["keep"] == 1
    assert d[10_002]["n_grams"] == 0 and d[10_002]["keep"] == 1
    assert d[10_003] == {"doc_id": 10_003, "n_grams": 4, "n_distinct": 1,
                         "n_dup": 3, "keep": 0}
    assert 10_004 not in d


def test_heavy_hitters_capacity_paths_stay_exact(ray_session, ducks):
    """The MG-pruned top-k must stay EXACT under capacity pressure: tiny
    per-block capacities force real summary drops (E > 0) and, at the
    extreme, the runtime exactness check (E < c_k, >= k provable rows) must
    reject the pruned pass and route through the always-exact fallback.
    Every capacity must reproduce the oracle answer bit-for-bit."""
    from sievedata.queries import SQL_HEAVY_HITTERS, q_heavy_hitters

    want = _canon(ducks.execute(SQL_HEAVY_HITTERS).df())
    for cap in (4096, 64, 8, 1):
        got = _canon(_to_pandas(q_heavy_hitters(SF_DIR, capacity=cap)))
        assert list(got.columns) == list(want.columns), cap
        pd.testing.assert_frame_equal(got, want, check_dtype=False), cap


def test_heavy_hitters_empty_corpus(ray_session, tmp_path):
    """Empty documents table: typed empty frame, no Ray empty-groupby
    schema loss."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sievedata.queries import q_heavy_hitters

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string()),
                      "lang": pa.array([], pa.string()),
                      "source": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64())})
    pq.write_table(empty, tmp_path / "documents.parquet")
    got = _to_pandas(q_heavy_hitters(str(tmp_path)))
    assert list(got.columns) == ["word", "n"] and len(got) == 0


def test_window_drift_empty_events(ray_session, tmp_path):
    """Empty events table: typed empty frame (no FieldRef failure on the
    zero-column empty-aggregate blocks)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sievedata.queries import q_window_drift

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string()),
    })
    pq.write_table(empty, tmp_path / "events.parquet")
    got = _to_pandas(q_window_drift(str(tmp_path)))
    assert len(got) == 0
    assert sorted(got.columns) == ["bin", "hour", "n_cur", "n_prev"]
