"""Joins: broadcast inner, multi-hop, anti (J1/J3 family) — split from the single-file catalogue (round 5, pure
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

# Joins: broadcast inner, multi-hop, anti (J1/J3 family)
# --------------------------------------------------------------------------

# Broadcast-join size guard: a "small side" shipped via ray.put must
# actually be small.  Above this many rows we fall back to the native
# hash-partitioned shuffle join (q_join_native pattern) instead of holding
# an O(rows) python dict on the driver + every worker.
BROADCAST_MAX_ROWS = 2_000_000


def _factorized_lookup(keys: np.ndarray, mapping: dict) -> pa.Array:
    """One dict probe per DISTINCT key (np.unique-factorized), not per row."""
    uniq, inv = np.unique(keys, return_inverse=True)
    vals = np.array([mapping.get(int(k)) for k in uniq], dtype=object)
    return pa.array(vals[inv].tolist(), pa.string())


def q_segment_revenue(sf_dir: str):
    """Small-side-broadcast hash join (ray.put once, factorized per-batch
    lookup) + grouped aggregate; falls back to the native shuffle join when
    the 'small' side exceeds BROADCAST_MAX_ROWS (size guard — the customer
    table grows with sf)."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust_ds = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    if cust_ds.count() > BROADCAST_MAX_ROWS:  # parquet-metadata count, no scan
        joined = orders.join(
            cust_ds, join_type="inner", num_partitions=16,
            on=("o_custkey",), right_on=("c_custkey",),
        )
    else:
        cust = cust_ds.to_pandas()
        seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

        def attach(t: pa.Table) -> pa.Table:
            seg = ray.get(seg_ref)
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            t = t.append_column("c_mktsegment", _factorized_lookup(keys, seg))
            # inner-join semantics: drop orders with no matching customer
            # (same result shape as the shuffle-join path / SQL oracle)
            return t.filter(pc.is_valid(t["c_mktsegment"]))

        joined = orders.map_batches(attach, batch_format="pyarrow")

    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_total"))
        .to_pandas()
    )
    out["sum_total"] = out["sum_total"].round(2)
    return out


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_region_customers(sf_dir: str):
    """Two-hop dimension join (customer → nation → region), both broadcast."""
    import ray
    from ray.data.aggregate import Count

    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _rp(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    def attach(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = t["c_nationkey"].to_numpy(zero_copy_only=False)
        t = t.append_column("r_name", _factorized_lookup(keys, lk))
        # inner-join semantics (match the SQL oracle): drop unmatched keys
        return t.filter(pc.is_valid(t["r_name"]))

    return (
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )


SQL_REGION_CUSTOMERS = """
SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_join_native(sf_dir: str):
    """Native hash-partitioned shuffle join (``Dataset.join``) for the
    both-sides-large case: lineitem ⋈ part on partkey → revenue per brand.
    (The broadcast pattern above is preferred when one side is small.)"""
    from ray.data.aggregate import Count, Sum

    li = _rp(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    part = _rp(sf_dir, "part", ["p_partkey", "p_brand"])
    joined = li.join(
        part, join_type="inner", num_partitions=_join_parts(li, part),
        on=("l_partkey",), right_on=("p_partkey",),
    )
    out = (
        joined.groupby("p_brand")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n_rows"))
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    return out


SQL_JOIN_NATIVE = """
SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_anti_join(sf_dir: str):
    """Broadcast anti semi-join: customers whose nation is NOT in region 0
    (the Bloom/anti-lookup pattern of app/anomaly.py:46-68)."""
    import ray

    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    keys = set(nation.loc[nation["n_regionkey"] == 0, "n_nationkey"].tolist())
    keys_ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = [int(x) not in k for x in t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return t.filter(pa.array(mask)).select(["c_custkey"])

    return _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        anti, batch_format="pyarrow"
    )


SQL_ANTI_JOIN = """
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
"""


# --------------------------------------------------------------------------
