"""Statistical outliers (A2 family) — split from the single-file catalogue (round 5, pure
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
from sievedata.queries.joins import BROADCAST_MAX_ROWS

# Statistical outliers (A2 family)
# --------------------------------------------------------------------------

def q_price_outliers(sf_dir: str):
    """Per-partition z-score outliers: |x−mean|/std ≥ 2.5 within l_partkey
    (app/anomaly.py:77-87).  Fully distributed: per-batch partial (n, Σx,
    Σx²) per key — C-speed pandas combiner — then a native groupby combine
    (O(distinct keys) rows stay in the cluster, never on the driver), then a
    hash-partitioned shuffle join of the stats back onto lineitem.

    Output emits the exact stored l_extendedprice rather than round(z, 2):
    z straddles 0.005 rounding boundaries across engines (Ray sum-of-squares
    vs DuckDB stddev_samp differ in ulps) — the row SELECTION predicate
    stays on unrounded z."""
    from ray.data.aggregate import Sum

    def partial_stats(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"k": t["l_partkey"].to_numpy(zero_copy_only=False),
             "x": t["l_extendedprice"].to_numpy(zero_copy_only=False)}
        )
        df["x2"] = df["x"] * df["x"]
        g = df.groupby("k", sort=False).agg(n=("x", "size"), sx=("x", "sum"), sx2=("x2", "sum"))
        return pa.table(
            {"l_partkey": pa.array(g.index.to_numpy()),
             "n": pa.array(g["n"].to_numpy().astype(np.int64)),
             "sx": pa.array(g["sx"].to_numpy()),
             "sx2": pa.array(g["sx2"].to_numpy())}
        )

    def finish_stats(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(float)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sx2 = t["sx2"].to_numpy(zero_copy_only=False)
        mean = sx / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.where(n > 1, (sx2 - n * mean * mean) / (n - 1), np.nan)
        std = np.sqrt(np.clip(var, 0, None))
        return pa.table(
            {"l_partkey": t["l_partkey"], "m": pa.array(mean), "s": pa.array(std)}
        )

    partials = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]).map_batches(
        partial_stats, batch_format="pyarrow"
    )

    li = _rp(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"])

    # the key domain is the part dimension table: PROVABLY small when the
    # parquet-metadata row count says so → combine the per-block partials in
    # ONE worker task (repartition(1): O(#parts × blocks) rows move to a
    # worker, never the driver; ~7× cheaper than the native hash aggregate
    # at this cardinality) and broadcast the finished O(#parts) stats.
    # Otherwise: native shuffle aggregate + shuffle join (the scale path).
    if _rp(sf_dir, "part", ["p_partkey"]).count() <= BROADCAST_MAX_ROWS:
        import ray

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("l_partkey").sum()
            n = g["n"].to_numpy().astype(float)
            mean = g["sx"].to_numpy() / n
            with np.errstate(invalid="ignore", divide="ignore"):
                var = np.where(n > 1, (g["sx2"].to_numpy() - n * mean * mean) / (n - 1), np.nan)
            return pd.DataFrame(
                {"l_partkey": g.index.to_numpy(), "m": mean,
                 "s": np.sqrt(np.clip(var, 0, None))}
            )

        sdf = (
            partials.repartition(1)
            .map_batches(combine, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        st_ref = ray.put(
            {int(k): (m, s) for k, m, s in zip(sdf["l_partkey"], sdf["m"], sdf["s"])}
        )

        def flag_bcast(t: pa.Table) -> pa.Table:
            st = ray.get(st_ref)
            keys = t["l_partkey"].to_numpy(zero_copy_only=False)
            x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(keys, return_inverse=True)
            m = np.array([st[int(k)][0] for k in uniq])[inv]
            s = np.array([st[int(k)][1] for k in uniq])[inv]
            valid = np.isfinite(s) & (s > 0)
            z = np.where(valid, np.abs(x - m) / np.where(valid, s, 1.0), 0.0)
            return t.filter(pa.array(z >= 2.5))

        return li.map_batches(flag_bcast, batch_format="pyarrow")

    stats = (
        partials.groupby("l_partkey")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sx2", alias_name="sx2"))
        .map_batches(finish_stats, batch_format="pyarrow")
    )
    joined = li.join(stats, join_type="inner",
                     num_partitions=_join_parts(li), on=("l_partkey",))

    def flag(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        valid = np.isfinite(s) & (s > 0)
        z = np.where(valid, np.abs(x - m) / np.where(valid, s, 1.0), 0.0)
        return t.filter(pa.array(z >= 2.5)).select(
            ["l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"]
        )

    return joined.map_batches(flag, batch_format="pyarrow")


SQL_PRICE_OUTLIERS = """
WITH s AS (
  SELECT l_partkey, avg(l_extendedprice) AS m, stddev_samp(l_extendedprice) AS s
  FROM lineitem GROUP BY l_partkey
)
SELECT l_orderkey, l_linenumber, l.l_partkey, l_extendedprice
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE s IS NOT NULL AND s > 0 AND abs(l_extendedprice - m) / s >= 2.5
"""


# --------------------------------------------------------------------------
