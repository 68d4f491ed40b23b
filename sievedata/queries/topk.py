"""Sort / top-k / per-group top-k (K1/K5 family) — split from the single-file catalogue (round 5, pure
mechanical move; see sievedata/queries/__init__.py for the contract)."""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, invnum_norm_array
from sievedata.queries._shared import (_LUT_CACHE, _drop_empty_blocks,
                                       _join_parts, _rp)

# Sort / top-k / per-group top-k (K1/K5 family)
# --------------------------------------------------------------------------

def q_topk_orders(sf_dir: str):
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10).to_pandas()
    return out


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_top_order_per_customer(sf_dir: str):
    """Per-group top-1 (the reference's top-match selection, app/main.py:305)."""

    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def top1_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        out = df.groupby("o_custkey", sort=False).head(1)
        return out[["o_custkey", "o_orderkey", "o_totalprice"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top1_bucket, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
    )


SQL_TOP_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
"""


def q_distinct_parts(sf_dir: str):
    """Distinct-count per group (A4/A5 uniqueness family, exact)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_returnflag": [g["l_returnflag"].iloc[0]],
             "n_parts": [g["l_partkey"].nunique()]}
        )

    return (
        _rp(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
        .map_batches(partial, batch_format="pyarrow")  # per-block pre-dedup combiner
        .groupby("l_returnflag")
        .map_groups(per_group, batch_format="pandas")
    )


SQL_DISTINCT_PARTS = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
