"""Relational core: filter/project/aggregate (M11/A1 family) — split from the single-file catalogue (round 5, pure
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

# --------------------------------------------------------------------------
# Relational core: filter/project/aggregate (M11/A1 family)
# --------------------------------------------------------------------------

def q_returnflag_agg(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate with a vectorized filter+projection."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 5.0))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_revenue"] = out["sum_revenue"].round(2)
    return out


SQL_RETURNFLAG_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       count(*) AS n_rows
FROM lineitem WHERE l_quantity > 5
GROUP BY l_returnflag, l_linestatus
"""


def q_customer_baseline(sf_dir: str):
    """Per-partition sum/sum-of-squares/count baseline — the reference's
    vendor amount baseline job (scripts/train_anomaly.py:31) on
    orders/custkey.

    Emits EXACT integer moments (cents + squared cents): 2-decimal money
    values land on the integer-cents grid regardless of accumulation order,
    so the driver's value-hash compare is association-order-proof and
    immune to stddev ulp/rounding-boundary flips (mean and std are
    derivable: std² = (Σx² − (Σx)²/n)/(n−1) in cents²)."""
    from ray.data.aggregate import Count, Sum

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pa.array(cents),
                "cents_sq": pa.array(cents * cents),
            }
        )

    out = (
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("cents", alias_name="sum_cents"),
            Sum("cents_sq", alias_name="sum_sq_cents"),
            Count(alias_name="sample_count"),
        )
        .to_pandas()
    )
    out["sum_cents"] = out["sum_cents"].astype("int64")
    out["sum_sq_cents"] = out["sum_sq_cents"].astype("int64")
    return out


SQL_CUSTOMER_BASELINE = """
SELECT o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                * CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_sq_cents,
       count(*) AS sample_count
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
