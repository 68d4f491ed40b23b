"""Query catalogue: every SURVEY.md §2 operator family expressed as a Ray
Data pipeline over the driver testdata tables, with a matching DuckDB oracle
SQL string where ANSI-SQL can express the semantics (driver correctness gate
— see __ray_entry__.py).

Conventions:
- every callable takes ``sf_dir`` and returns a Dataset / DataFrame / Table
- computed columns are named identically in Ray and SQL
- float aggregates are rounded identically on both sides (2dp) so
  association-order ulp noise cannot flip the driver's value hash;
  row-selecting float predicates (z ≥ 2.5) operate on unrounded values
- reads prune columns at the source
"""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, invnum_norm_array


def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _join_parts(*datasets, target_bytes: int = 128 << 20,
                lo: int = 8, hi: int = 200) -> int:
    """Size-adaptive hash-join partition count: ~one partition per
    ``target_bytes`` of the larger input (parquet-metadata estimate — no
    execution), clamped to [lo, hi].  Each partition spins an aggregator
    actor, so small inputs shouldn't pay 16 actor start-ups (~1 s/ join on
    this box) and 100-TB inputs shouldn't squeeze through 16 partitions."""
    size = 0
    for ds in datasets:
        try:
            size = max(size, ds.size_bytes() or 0)
        except Exception:
            pass
    return int(np.clip((size + target_bytes - 1) // target_bytes, lo, hi))


# per-worker cache for broadcast lookup dicts (keyed by ObjectRef hex so a
# new broadcast invalidates the old entry; avoids re-deserializing the dict
# for every batch a warm worker processes)
_LUT_CACHE: dict = {}


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
# Dedup / duplicate flagging (D1 family)
# --------------------------------------------------------------------------

def q_dup_orders(sf_dir: str):
    """Exact-key duplicate flagging: all-but-first per (custkey, status)
    group, first = lowest orderkey (RR-001 semantics, app/rules.py:11-12).

    Hash-bucketed shuffle (one vectorized pandas pass per bucket) instead of
    one python UDF call per micro-group — the engine's dedup idiom."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        # batch-independent key hash (same (custkey,status) → same bucket)
        s_codes = np.array([ord(x[0]) if x else 0 for x in s], dtype=np.int64)
        bucket = ((k * 31 + s_codes) % n_buckets).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket))

    def flag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderstatus", "o_orderkey"], kind="mergesort")
        grp = df.groupby(["o_custkey", "o_orderstatus"], sort=False)
        first = grp["o_orderkey"].transform("min")
        keep = df["o_orderkey"] != first
        out = df.loc[keep, ["o_custkey", "o_orderkey"]].copy()
        out["first_orderkey"] = first[keep]
        return out.reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_orderkey"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_bucket, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderkey", "first_orderkey"])
    )


SQL_DUP_ORDERS = """
WITH g AS (
  SELECT o_custkey, o_orderkey,
         min(o_orderkey) OVER (PARTITION BY o_custkey, o_orderstatus) AS first_orderkey,
         count(*) OVER (PARTITION BY o_custkey, o_orderstatus) AS n
  FROM orders
)
SELECT o_custkey, o_orderkey, first_orderkey FROM g
WHERE n > 1 AND o_orderkey != first_orderkey
"""


def q_exact_dedup_docs(sf_dir: str):
    """Global exact-dup stats on documents.text (M6 content-hash dedup).

    Distinct-counts the RAW text values (per-block dedup combiner → shuffle
    groupby → distributed row count), not a 64-bit hash: SQL
    count(DISTINCT) ignores NULLs and is collision-free, and at 10^12 docs
    a 64-bit hash space expects real collisions."""
    ds = _rp(sf_dir, "documents", ["text"])
    n_docs = ds.count()

    def dedup_block(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        distinct = pc.unique(text.drop_null())
        return pa.table({"text": distinct})

    n_distinct = (
        ds.map_batches(dedup_block, batch_format="pyarrow")
        .groupby("text")
        .count()
        .count()
    )
    return pd.DataFrame({"n_docs": [n_docs], "n_distinct_text": [n_distinct]})


SQL_EXACT_DEDUP_DOCS = """
SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct_text FROM documents
"""


# --------------------------------------------------------------------------
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
# String normalization kernels (M1-M4 family)
# --------------------------------------------------------------------------

def q_invnum_norm(sf_dir: str):
    """invnum_norm (NR-001) over synthetic invoice numbers from orderkeys."""

    def norm(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        raw = pa.array([f"INV-{int(k):09d}" for k in keys], pa.string())
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "invnum_norm": invnum_norm_array(raw)}
        )

    return _rp(sf_dir, "orders", ["o_orderkey"]).map_batches(norm, batch_format="pyarrow")


SQL_INVNUM_NORM = """
SELECT o_orderkey,
       CASE WHEN t = '' THEN '0' ELSE t END AS invnum_norm
FROM (
  SELECT o_orderkey,
         regexp_replace(
           regexp_replace(
             regexp_replace(upper(printf('INV-%09d', o_orderkey)), '[\\s\\-_/]', '', 'g'),
             '^(INVOICE|INV|BILL)', ''),
           '^0+', '') AS t
  FROM orders
)
"""


def q_desc_norm(sf_dir: str):
    """desc_norm (NR-003) over order priorities ('1-URGENT' → '1 urgent')."""

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "priority_norm": desc_norm_array(t["o_orderpriority"].combine_chunks()),
            }
        )

    return _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        norm, batch_format="pyarrow"
    )


SQL_DESC_NORM = """
SELECT o_orderkey,
       trim(regexp_replace(regexp_replace(lower(o_orderpriority), '[^a-z0-9\\s]', ' ', 'g'),
                           '\\s+', ' ', 'g')) AS priority_norm
FROM orders
"""


def q_mask_hash(sf_dir: str):
    """PII masking + deterministic hashing (M3/M4) over customer names."""

    def mh(t: pa.Table) -> pa.Table:
        from sievedata.kernels.normalize import hash_account, mask_account_last4

        names = t["c_name"].to_pylist()
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "masked": pa.array([mask_account_last4(x) for x in names], pa.string()),
                "name_hash": pa.array([hash_account(x) for x in names], pa.string()),
            }
        )

    return _rp(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        mh, batch_format="pyarrow"
    )


SQL_MASK_HASH = """
SELECT c_custkey,
       CASE WHEN regexp_replace(c_name, '\\D', '', 'g') = '' THEN '****'
            ELSE '****' || right(regexp_replace(c_name, '\\D', '', 'g'), 4) END AS masked,
       lower(sha256(c_name)) AS name_hash
FROM customer
"""


# --------------------------------------------------------------------------
# Text analysis (training-data pipeline family)
# --------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    """Token/char/punct counting per document — all-integer outputs."""

    def stats(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import token_count_column

        text = t["text"].combine_chunks()
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(token_count_column(text), pa.int64())
        punct = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, r"[a-zA-Z0-9\s]", "")), pa.int64()
        )
        nonspace = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, r"\s+", "")), pa.int64()
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": n_chars, "n_tokens": n_tokens,
             "punct_count": punct, "n_nonspace": nonspace}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def q_bpe_token_count(sf_dir: str):
    """BPE-ish pre-token counting (GPT-2 split pattern, ASCII variant) —
    the token-budget estimate a training-data pipeline runs before a real
    tokenizer; lookahead-free so the python and RE2/DuckDB engines agree
    exactly (functions/text.py::_BPE_RE)."""

    def stats(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import bpe_token_count_column

        return pa.table(
            {"doc_id": t["doc_id"],
             "n_bpe_tokens": bpe_token_count_column(t["text"].combine_chunks())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


SQL_BPE_TOKEN_COUNT = r"""
SELECT doc_id,
       coalesce(len(regexp_extract_all(text,
           '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\f\ra-zA-Z0-9]+|[ \t\n\f\r]+'
       )), 0) AS n_bpe_tokens
FROM documents
"""


SQL_TOKEN_STATS = """
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct_count,
       length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace
FROM documents
"""


def q_quality_filter(sf_dir: str):
    """Quality-score gate: keep docs in a token-count band with no punct."""

    def keep(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import token_count_column

        text = t["text"].combine_chunks()
        n_tokens = pc.cast(token_count_column(text), pa.int64())
        punct = pc.utf8_length(pc.replace_substring_regex(text, r"[a-zA-Z0-9\s]", ""))
        mask = pc.and_(
            pc.and_(pc.greater_equal(n_tokens, 40), pc.less_equal(n_tokens, 90)),
            pc.equal(punct, 0),
        )
        return pa.table({"doc_id": t["doc_id"]}).filter(mask)

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


SQL_QUALITY_FILTER = """
SELECT doc_id FROM documents
WHERE len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 40 AND 90
  AND length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) = 0
  AND trim(text) != ''
"""


# --------------------------------------------------------------------------
# Events: tumbling windows + sessionization (streaming-shaped)
# --------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    def trunc(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {"hour": hour, "event_type": t["event_type"], "value": t["value"]}
        )

    out = (
        _rp(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(trunc, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    # µs resolution to match DuckDB's date_trunc dtype exactly
    # (floor_temporal preserves the source's timestamp[s] unit)
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_window_drift(sf_dir: str, bin_width: float = 100.0):
    """Windowed distribution-drift inputs over the event stream: for every
    (hour, value-bin) present, the bin's event count and the SAME bin's
    count in the previous hour — the integer PSI/KS inputs of the flagship
    drift monitor (A6, sketches/drift.py) as a first-class streaming query.
    Verdict metrics stay float-free per the engine's exactness contract:
    consumers derive PSI from the integer (n_cur, n_prev) pairs.

    Scale shape: per-block (hour, bin) count partials via Arrow group_by
    (the event stream never shuffles), ONE narrow hour×bin groupby, then a
    self LEFT join of that aggregate onto itself shifted one hour.  The
    join consumes aggregate output, so empty zero-column partitions are
    stripped first (_drop_empty_blocks — Ray 2.49 footgun).  Bin ids are
    ``floor(value / width)``, the identical IEEE double op in DuckDB."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        h = (pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us"))
             .cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 3_600_000_000)
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        g = (pa.table({"h": pa.array(h), "bin": pa.array(b)})
             .group_by(["h", "bin"]).aggregate([([], "count_all")]))
        return pa.table({"h": g["h"], "bin": g["bin"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (
        _rp(sf_dir, "events", ["ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["h", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # hour×bin-sized; consumed twice (cur + prev sides)
    )
    stripped = _drop_empty_blocks(agg)
    if stripped is None:  # empty events: typed empty result, no join
        return pd.DataFrame({
            "bin": pd.Series([], dtype="int64"),
            "hour": pd.Series([], dtype="datetime64[us]"),
            "n_cur": pd.Series([], dtype="int64"),
            "n_prev": pd.Series([], dtype="int64"),
        })
    agg = stripped

    def shift(t: pa.Table) -> pa.Table:
        return pa.table({
            "h": t["h"], "bin": t["bin"], "n": t["n"],
            "prev_h": pc.subtract(t["h"], pa.scalar(1, pa.int64())),
        })

    def as_prev(t: pa.Table) -> pa.Table:
        return pa.table({"h_r": t["h"], "bin_r": t["bin"], "n_prev": t["n"]})

    joined = agg.map_batches(shift, batch_format="pyarrow").join(
        agg.map_batches(as_prev, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=_join_parts(agg),
        on=("prev_h", "bin"),
        right_on=("h_r", "bin_r"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        hour = pc.multiply(t["h"], pa.scalar(3_600_000_000, pa.int64())) \
            .cast(pa.timestamp("us"))
        return pa.table({
            "hour": hour,
            "bin": t["bin"],
            "n_cur": t["n"],
            "n_prev": pc.fill_null(pc.cast(t["n_prev"], pa.int64()), 0),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_WINDOW_DRIFT = """
WITH binned AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(floor(value / 100.0) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT c.hour AS hour, c.bin AS bin, c.n AS n_cur,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_prev
FROM binned c
LEFT JOIN binned p ON p.hour = c.hour - INTERVAL 1 HOUR AND p.bin = c.bin
"""


def q_events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user session count with a 30-min inactivity gap
    (groupby(key).map_groups over ts-sorted events — the engine's
    streaming-window idiom)."""

    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = df.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        new_session = (gaps > gap_minutes * 60).astype(int)
        out = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "brk": new_session.to_numpy()})
            .groupby("user_id", sort=False)["brk"].sum().add(1).rename("n_sessions")
            .reset_index()
        )
        return out

    return (
        _rp(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .select_columns(["user_id", "n_sessions"])
    )


SQL_EVENTS_SESSIONS = """
WITH x AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(1 + sum(CASE WHEN prev_ts IS NOT NULL
                     AND ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

def q_ann_topk(sf_dir: str, k: int = 5, n_queries: int = 5):
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul,
    local top-k, final merge (functions/ann.py)."""
    import ray

    from sievedata.functions.ann import make_bruteforce_fn, merge_topk

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


SQL_ANN_TOPK = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# Rows-only operators (no ANSI-SQL equivalent; driver does a rows check)
# --------------------------------------------------------------------------

def q_lang_id(sf_dir: str):
    """Stopword-profile language ID (actor pool, vectorized is_in).  The
    classifier is a deterministic stopword-count argmax (ties → first lang
    in sorted order, zero hits → 'und'), so DuckDB reproduces it exactly:
    same RE2 split, the profile word lists as VALUES literals, argmax as a
    row_number window — the pii_scan RE2↔RE2 parity pattern."""
    from sievedata.functions.text import LangId

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def _lang_profile_values() -> str:
    """_LANG_PROFILES as SQL VALUES literals (the classifier's word lists
    ARE the model — embedding them keeps engine and oracle pinned to the
    same constants, like ann_lsh's hyperplane literals)."""
    from sievedata.functions.text import _LANG_PROFILES

    rows = [f"('{lang}','{tok}')"
            for lang in sorted(_LANG_PROFILES)
            for tok in sorted(_LANG_PROFILES[lang])]
    return ",\n  ".join(rows)


SQL_LANG_ID = f"""
WITH prof(lang, tok) AS (VALUES
  {_lang_profile_values()}),
toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(COALESCE(text, '')),
                                         '[^a-z'']+')) AS tok
        FROM documents)
  WHERE tok <> ''
),
hits AS (
  SELECT t.doc_id, p.lang, count(*) AS h
  FROM toks t JOIN prof p ON t.tok = p.tok
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


def q_fingerprint(sf_dir: str):
    def fp(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import fingerprint_column

        return pa.table(
            {"doc_id": t["doc_id"],
             "fingerprint": fingerprint_column(t["text"].combine_chunks())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    def sh(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import simhash_column

        sig = simhash_column(t["text"].to_pylist())
        return pa.table(
            {"doc_id": t["doc_id"],
             "simhash": pa.array([f"{int(x):016x}" for x in sig], pa.string())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(sh, batch_format="pyarrow")


def q_minhash_near_dups(sf_dir: str, threshold_ppm: int = 500_000):
    """MinHash-LSH near-dup candidate pairs, exact-Jaccard verified.

    shingle→minhash per batch → band-explode → groupby(band) → pairs →
    dedup pairs → verify with exact n-gram Jaccard (broadcast text of
    candidate docs only).  Jaccard is emitted as integer parts-per-million
    (inter·10⁶ ∕∕ union) and the threshold predicate is pure integer
    arithmetic, so the DuckDB oracle reproduces it bit-exactly.

    Oracle contract: because candidates are VERIFIED with the exact
    distinct-char-5-gram Jaccard, the emitted set equals the full
    {pairs : J ≥ τ} set whenever no qualifying pair falls in the LSH
    marginal band.  Measured on the driver corpus (sf0.001/0.01/0.1):
    the J distribution is bimodal — every qualifying pair has J ≥ 0.92,
    where the 16-band × 4-row miss probability is ≤ (1−0.92⁴)¹⁶ ≈ 2e-9 —
    and recall was verified exhaustively to be 1 at each scale."""
    import ray

    from sievedata.functions.dedup import lsh_band_rows, minhash_signature_batch

    n_buckets = 128

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = [str(x) for x in t["doc_id"].to_pylist()]
        sigs = minhash_signature_batch(t["text"].combine_chunks())
        rows = lsh_band_rows(ids, sigs)
        bucket = (rows["band_hash"].to_numpy() % np.uint64(n_buckets)).astype(np.int64)
        return rows.append_column("bucket", pa.array(bucket))

    def pairs_bucket(df: pd.DataFrame, cap: int = 50) -> pd.DataFrame:
        """Candidate pairs from all multi-doc (band_id, band_hash) groups in
        one bucket — vectorized group filter; per-group doc cap bounds the
        O(n²) fan-out like the reference's BR-004 candidate cap."""
        sizes = df.groupby(["band_id", "band_hash"], sort=False)["doc_id"].transform("size")
        multi = df[sizes >= 2]
        rows = []
        for _, g in multi.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g["doc_id"].unique())[:cap]
            rows.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
        return pd.DataFrame(rows, columns=["a", "b"])

    # candidate pairs, deduped DISTRIBUTED: same (a,b) always hashes to the
    # same pair bucket, so one per-bucket drop_duplicates is global.
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from sievedata.sketches.hashing import hash64

        combined = pc.binary_join_element_wise(
            t["a"].combine_chunks(), t["b"].combine_chunks(), "\x1f"
        )
        pb = (hash64(combined, seed=71) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("pair_bucket", pa.array(pb))

    pairs = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(
            lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
            batch_format="pandas",
        )
        .materialize()  # small: candidate pairs only
    )
    if pairs.count() == 0:
        return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                             "jaccard_ppm": pd.Series(dtype="int64")})

    # exact-Jaccard verification as two hash-partitioned shuffle joins
    # (pairs ⋈ shingles on a, then on b).  The candidate-ID set is
    # output-sized (O(pairs), COUNTED small above) so it broadcasts to
    # prune shingle computation to candidate docs only; the shingle ARRAYS
    # themselves never touch the driver (round-1 scale sin).  If the
    # candidate set ever exceeds the guard, skip the pruning broadcast and
    # shingle the full corpus streaming — the joins stay identical.
    prune_ref = None
    if pairs.count() <= 200_000:
        pdf_ids = pairs.to_pandas()
        prune_ref = ray.put(set(pdf_ids["a"]) | set(pdf_ids["b"]))

    def shingle_sets(t: pa.Table) -> pa.Table:
        from sievedata.functions.dedup import shingle_hashes

        ids = [str(x) for x in t["doc_id"].to_pylist()]
        txts = t["text"].to_pylist()
        if prune_ref is not None:
            wanted = ray.get(prune_ref)
            keep = [i for i, d in enumerate(ids) if d in wanted]
            ids = [ids[i] for i in keep]
            txts = [txts[i] for i in keep]
        # serialized (binary) sorted int64 arrays: hash joins don't support
        # list-typed payload columns, binary payloads shuffle fine
        arrs = [np.sort(shingle_hashes(x or "")).astype(np.int64).tobytes() for x in txts]
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()),
             "shingles": pa.array(arrs, pa.binary())}
        )

    shingles = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        shingle_sets, batch_format="pyarrow"
    )

    def _pair_overlap(sa: bytes, sb: bytes) -> tuple[int, int]:
        va = np.frombuffer(sa, dtype=np.int64)
        vb = np.frombuffer(sb, dtype=np.int64)
        inter = np.intersect1d(va, vb, assume_unique=True).size
        return inter, va.size + vb.size - inter

    if prune_ref is not None:
        # both sides are output-sized (counted small above): one worker-task
        # cogroup — the lookup dict lives in a REMOTE task, not the driver —
        # avoids the two hash-join operators' fixed cost on tiny inputs
        def pad_pairs(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": t["a"], "b": t["b"],
                 "doc_id": pa.nulls(t.num_rows, pa.string()),
                 "shingles": pa.nulls(t.num_rows, pa.binary())}
            )

        def pad_sh(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": pa.nulls(t.num_rows, pa.string()),
                 "b": pa.nulls(t.num_rows, pa.string()),
                 "doc_id": t["doc_id"], "shingles": t["shingles"]}
            )

        def verify_all(t: pa.Table) -> pa.Table:
            mask = pc.is_valid(t["doc_id"])
            sh = t.filter(mask)
            pr = t.filter(pc.invert(mask))
            lut = dict(zip(sh["doc_id"].to_pylist(), sh["shingles"].to_pylist()))
            a_l = pr["a"].to_pylist()
            b_l = pr["b"].to_pylist()
            ov = [_pair_overlap(lut[a], lut[b]) for a, b in zip(a_l, b_l)]
            inter = np.array([o[0] for o in ov], dtype=np.int64)
            union = np.maximum(np.array([o[1] for o in ov], dtype=np.int64), 1)
            out = pa.table(
                {"a": pr["a"], "b": pr["b"],
                 "jaccard_ppm": pa.array(inter * 1_000_000 // union)}
            )
            return out.filter(pa.array(inter * 1_000_000 >= threshold_ppm * union))

        out = (
            pairs.map_batches(pad_pairs, batch_format="pyarrow")
            .union(shingles.map_batches(pad_sh, batch_format="pyarrow"))
            .repartition(1)
            .map_batches(verify_all, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    joined = pairs.join(
        shingles, join_type="inner", num_partitions=8,
        on=("a",), right_on=("doc_id",), right_suffix="_a",
    ).join(
        shingles, join_type="inner", num_partitions=8,
        on=("b",), right_on=("doc_id",), right_suffix="_b",
    )

    def verify(t: pa.Table) -> pa.Table:
        sa_col = t["shingles"] if "shingles" in t.column_names else t["shingles_a"]
        sb_col = t["shingles_b"]
        ov = [_pair_overlap(sa, sb)
              for sa, sb in zip(sa_col.to_pylist(), sb_col.to_pylist())]
        inter = np.array([o[0] for o in ov], dtype=np.int64)
        union = np.maximum(np.array([o[1] for o in ov], dtype=np.int64), 1)
        out = pa.table({"a": t["a"], "b": t["b"],
                        "jaccard_ppm": pa.array(inter * 1_000_000 // union)})
        return out.filter(pa.array(inter * 1_000_000 >= threshold_ppm * union))

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


SQL_MINHASH_NEAR_DUPS = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, COALESCE(text, '') AS text
  FROM documents
),
g AS (
  SELECT id, substr(text, i, 5) AS gram
  FROM (SELECT id, text, unnest(generate_series(1, length(text) - 4)) AS i
        FROM d WHERE length(text) >= 5)
  GROUP BY id, gram
  UNION ALL
  SELECT id, text AS gram FROM d WHERE length(text) < 5
),
sz AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
  SELECT ga.id AS a, gb.id AS b, count(*) AS i
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.id < gb.id
  GROUP BY 1, 2
)
SELECT x.a, x.b,
       CAST(x.i * 1000000 // (sa.n + sb.n - x.i) AS BIGINT) AS jaccard_ppm
FROM inter x
JOIN sz sa ON sa.id = x.a
JOIN sz sb ON sb.id = x.b
WHERE x.i * 1000000 >= 500000 * (sa.n + sb.n - x.i)
ORDER BY a, b
"""


def q_simhash_near_dups(sf_dir: str, max_hamming: int = 12, n_tables: int = 4):
    """SimHash near-dup pairs: 64-bit signatures bucketed by rotated 16-bit
    prefixes (a pair within Hamming distance d collides in ≥1 of the
    ``n_tables`` rotations with high probability), Hamming-verified.
    Approximate by design → rows-only; determinism covered in tests."""
    import ray

    def sig_rows(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import simhash_column

        sigs = simhash_column(t["text"].to_pylist())
        ids = [str(x) for x in t["doc_id"].to_pylist()]
        out_ids, out_tables, out_keys, out_sigs = [], [], [], []
        for r in range(n_tables):
            rot = ((sigs << np.uint64(16 * r)) | (sigs >> np.uint64(64 - 16 * r))).astype(np.uint64)
            prefix = (rot >> np.uint64(48)).astype(np.int64)
            out_ids.extend(ids)
            out_tables.extend([r] * len(ids))
            out_keys.extend(prefix.tolist())
            out_sigs.extend(sigs.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "table_id": pa.array(out_tables, pa.int32()),
                "prefix": pa.array(out_keys, pa.int64()),
                "sig": pa.array(out_sigs, pa.int64()),
            }
        )

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from sievedata.functions.text import hamming64

        sizes = df.groupby(["table_id", "prefix"], sort=False)["doc_id"].transform("size")
        multi = df[sizes >= 2]
        rows = []
        for _, g in multi.groupby(["table_id", "prefix"], sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = g["sig"].to_numpy().astype(np.uint64)
            n = len(g)
            if n > 200:
                g = g.head(200)
                ids, sigs, n = ids[:200], sigs[:200], 200
            for i in range(n):
                d = hamming64(np.repeat(sigs[i], n - i - 1), sigs[i + 1:])
                for off in np.flatnonzero(d <= max_hamming):
                    rows.append((ids[i], ids[i + 1 + off], int(d[off])))
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    out = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "bucket", pa.array((t["prefix"].to_numpy(zero_copy_only=False) % 64).astype(np.int64))
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


def _ppjoin_pairs_bucket(df: pd.DataFrame, num: int, den: int) -> pd.DataFrame:
    """Candidate pairs from one prefix-gram hash bucket: for every gram
    shared by ≥2 docs, emit doc pairs surviving the PPJoin LENGTH filter
    (t·|B| ≤ |A|) and POSITIONAL filter (overlap upper bound
    1 + min(|A|−pa−1, |B|−pb−1) must reach α = ⌈t/(1+t)·(|A|+|B|)⌉)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
    for _, g in df[sizes >= 2].groupby("gram", sort=False):
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        nn = g["doc_n"].to_numpy()
        pos = g["pos"].to_numpy()
        i, j = np.triu_indices(len(ids), 1)
        na, nb = nn[i], nn[j]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        alpha = (num * (na + nb) + num + den - 1) // (num + den)
        ubound = 1 + np.minimum(na - pos[i] - 1, nb - pos[j] - 1)
        keep = (lo * den >= num * hi) & (ubound >= alpha)
        out_a.append(ids[i][keep])
        out_b.append(ids[j][keep])
    if not out_a:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.DataFrame(
        {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
    ).drop_duplicates()


def _ppjoin_pair_bucket_col(t: pa.Table, n_buckets: int) -> pa.Table:
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    pb = ((a * np.int64(1_000_003) + b) % n_buckets).astype(np.int64)
    return t.append_column("pair_bucket", pa.array(pb))


def _ppjoin_dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["a", "b"])[["a", "b"]]


_NGRAM_VOCAB_BROADCAST_LIMIT = 4_000_000  # grams; ~64 MB of (gram, df) pairs
_NGRAM_DF_CAP = (1 << 19) - 1  # df saturates here; order stays total via gram tiebreak
_BITSET_BYTES_LIMIT = 64 << 20  # docs × vocab-bitset bytes worth broadcasting


def q_ngram_jaccard_pairs(sf_dir: str, num: int = 4, den: int = 5, n: int = 5):
    """EXACT char n-gram Jaccard near-dup pairs ≥ num/den — the PPJoin
    algorithm (Xiao et al., WWW'08: AllPairs prefix filtering + positional
    and length filters), zero recall loss, no O(N²) candidate generation.

    Fast path (ASCII corpus, gram vocabulary small enough to broadcast):
    1. one vocab-sized document-frequency aggregate — per-batch partial
       counts of packed-uint64 grams → ``groupby(gram).sum`` (output is
       VOCAB-sized, not corpus-sized) → broadcast as two sorted numpy
       arrays (``ray.put`` once, searchsorted lookup in every task).
    2. one map_batches pass re-reads documents and does gramming + df
       lookup + (df, gram)-ordered PPJoin prefix selection entirely
       batch-locally — the two per-key shuffles of the generic path
       disappear.  df saturates at _NGRAM_DF_CAP; the order stays total
       (gram tiebreak), and ANY total order is correct for prefix
       filtering — df-ordering is the recall-friendly heuristic only.
    3. prefix grams shuffle ONCE by gram hash → vectorized candidate pairs
       (length + positional filters) → pair-hash shuffle dedups.
    4. verification: distributed distinct-doc count over candidate pairs;
       if the candidate doc set is provably small, their texts broadcast
       once and pairs verify in map_batches via the indexed searchsorted
       kernel (kernels/grams.py) — no join; else two hash joins ship texts.

    Falls back to :func:`_ngram_pairs_generic` (string grams, shuffle df /
    prefix stages, same semantics) when a non-ASCII batch is detected, the
    vocabulary exceeds the broadcast limit, or n > 5."""
    if n <= 5 and _probably_ascii_corpus(sf_dir):
        res = _ngram_pairs_ascii_fast(sf_dir, num, den, n)
        if res is not None:
            return res
    return _ngram_pairs_generic(sf_dir, num, den, n)


def _drop_empty_blocks(ds):
    """Rebuild a MATERIALIZED dataset from its non-empty Arrow block refs.

    Ray 2.49's hash aggregate emits ZERO-COLUMN empty blocks for empty
    partitions (observed after union-with-join lineage); a later
    ``Dataset.join`` fails FieldRef resolution on any partition that only
    receives them.  Filtering by block METADATA moves no data — refs are
    re-wrapped, never fetched."""
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def _probably_ascii_corpus(sf_dir: str, sample_rows: int = 1024) -> bool:
    """Cheap routing probe: is the FIRST slice of documents.text ASCII?
    Heuristic only — the fast path still detects a late non-ASCII batch
    via its sentinel and falls back with identical results; this probe
    just avoids paying the fast path's full gram pass twice on a corpus
    that is obviously non-ASCII up front."""
    import pyarrow.parquet as pq

    from sievedata.kernels import grams as G

    try:
        pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
        for batch in pf.iter_batches(batch_size=sample_rows, columns=["text"]):
            return G.is_ascii(batch.column(0))
    except Exception:
        return True  # non-file layouts: let the fast path's sentinel decide
    return True


def _ngram_pairs_ascii_fast(sf_dir: str, num: int, den: int, n: int,
                            as_dataset: bool = False):
    import ray

    from sievedata.kernels import grams as G
    from sievedata.sketches.hashing import _splitmix64

    n_buckets = 64
    tag_bits = np.uint64(8 * n + 3)
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        if not G.is_ascii(txt):  # sentinel row → caller falls back
            return pa.table({"gram": pa.array([-1], pa.int64()),
                             "cnt": pa.array([1], pa.int64())})
        _, gram, _ = G.distinct_grams_packed(txt, n)
        uniq, cnt = np.unique(gram, return_counts=True)
        return pa.table({"gram": pa.array(uniq.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    df_tbl = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("gram").sum("cnt")
              .materialize())  # vocab-sized; one execution for count + pull
    if df_tbl.count() > _NGRAM_VOCAB_BROADCAST_LIMIT:
        return None
    pdf = df_tbl.to_pandas()  # vocab-sized (guarded above)
    gram_vals = pdf["gram"].to_numpy()
    if len(gram_vals) and gram_vals.min() < 0:
        return None  # non-ASCII batch seen
    order = np.argsort(gram_vals)
    vocab_u64 = gram_vals[order].astype(np.uint64)  # for bitset verify
    dfs = np.minimum(pdf["sum(cnt)"].to_numpy()[order], _NGRAM_DF_CAP)
    lut_ref = ray.put((gram_vals[order].astype(np.int64),
                       dfs.astype(np.uint64)))

    def prefix_rows(t: pa.Table) -> pa.Table:
        key = lut_ref.hex()
        cached = _LUT_CACHE.get(key)
        if cached is None:
            cached = ray.get(lut_ref)
            _LUT_CACHE.clear()
            _LUT_CACHE[key] = cached
        gs, dfv_tab = cached
        txt = t["text"].combine_chunks()
        doc_idx, gram, doc_n = G.distinct_grams_packed(txt, n)
        dfv = dfv_tab[np.searchsorted(gs, gram.astype(np.int64))]
        okey = (dfv << tag_bits) | gram  # total (df, gram) order
        order = np.lexsort((okey, doc_idx))
        doc_s = doc_idx[order]
        gram_s = gram[order]
        starts = np.concatenate(([0], np.cumsum(doc_n)))
        rank = np.arange(len(gram_s), dtype=np.int64) - np.repeat(
            starts[:-1], doc_n
        )
        dnr = doc_n[doc_s]
        L = dnr - (num * dnr + den - 1) // den + 1
        keep = rank < L
        ids_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g_out = gram_s[keep]
        gb = (_splitmix64(g_out) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "gram": pa.array(g_out.astype(np.int64)),
            "doc_id": pa.array(ids_np[doc_s[keep]]),
            "doc_n": pa.array(dnr[keep]),
            "pos": pa.array(rank[keep]),
            "gbucket": pa.array(gb),
        })

    pairs = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(functools.partial(_ppjoin_pairs_bucket, num=num, den=den),
                    batch_format="pandas")
        .map_batches(functools.partial(_ppjoin_pair_bucket_col,
                                       n_buckets=n_buckets),
                     batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_ppjoin_dedup_group, batch_format="pandas")
        .materialize()  # candidate pairs only (output-sized)
    )

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("a", "b", "inter", "uni")})
    if pairs.count() == 0:
        if as_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
        return empty

    texts = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_docs = texts.count()  # parquet metadata — no data read
    wanted_ids = None
    if n_docs > 50_000:
        # corpus too big to broadcast whole — is the candidate DOC set
        # small?  Distributed distinct over pair endpoints (vocab-sized).
        def emit_ids(t: pa.Table) -> pa.Table:
            both = pa.concat_arrays([
                t["a"].combine_chunks().cast(pa.int64()),
                t["b"].combine_chunks().cast(pa.int64()),
            ])
            return pa.table({"doc": both})

        wanted_ds = (pairs.map_batches(emit_ids, batch_format="pyarrow")
                     .groupby("doc").count()
                     .materialize())  # ≤ one row per candidate doc
        if wanted_ds.count() <= 50_000:
            wanted_ids = np.sort(
                wanted_ds.to_pandas()["doc"].to_numpy().astype(np.int64)
            )

    if n_docs <= 50_000 or wanted_ids is not None:
        # candidate texts are provably small: PRE-PACK their gram sets once
        # (CSR uint64 arrays), broadcast via ray.put, and verify pairs in
        # parallel map_batches — no shuffle join, no per-batch re-packing
        if wanted_ids is not None:
            wanted_ref = ray.put(wanted_ids)

            def keep_wanted(t: pa.Table) -> pa.Table:
                w = ray.get(wanted_ref)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(np.isin(ids, w)))

            texts = texts.map_batches(keep_wanted, batch_format="pyarrow")
        tdf = texts.to_pandas()
        ids_np = tdf["doc_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids_np)
        txt_arr = pa.array(tdf["text"].to_numpy()[order], pa.string())
        gram_p, starts_p, doc_n_p = G.pack_doc_grams(txt_arr, n)
        # templated corpora have tiny GLOBAL vocabularies (the df aggregate
        # already computed it): verify via |vocab|-bit bitsets + popcount —
        # ~100× less memory traffic than gathering per-pair gram lists
        words = (len(vocab_u64) + 63) // 64
        if len(ids_np) * words * 8 <= _BITSET_BYTES_LIMIT:
            bits = G.build_bitsets(gram_p, starts_p, doc_n_p, vocab_u64)
            pack_ref = ray.put(("bits", ids_np[order], bits, doc_n_p))
        else:
            pack_ref = ray.put(
                ("csr", ids_np[order], gram_p, starts_p, doc_n_p))

        def verify_batch(t: pa.Table) -> pa.Table:
            key = pack_ref.hex()
            pack = _LUT_CACHE.get(key)
            if pack is None:
                pack = ray.get(pack_ref)
                _LUT_CACHE.clear()
                _LUT_CACHE[key] = pack
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            if pack[0] == "bits":
                _, ids_s, bits_c, dn_c = pack
                a_idx = np.searchsorted(ids_s, a_ids)
                b_idx = np.searchsorted(ids_s, b_ids)
                inter, uni = G.intersect_bitsets(bits_c, dn_c, a_idx, b_idx)
            else:
                _, ids_s, gram_c, starts_c, dn_c = pack
                a_idx = np.searchsorted(ids_s, a_ids)
                b_idx = np.searchsorted(ids_s, b_ids)
                inter, uni = G.intersect_packed(
                    gram_c, starts_c, dn_c, a_idx, b_idx, n
                )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = pairs.map_batches(verify_batch, batch_format="pyarrow",
                                   batch_size=16384)
    else:
        joined = pairs.join(
            texts, join_type="inner", num_partitions=16,
            on=("a",), right_on=("doc_id",), right_suffix="_a",
        ).join(
            texts, join_type="inner", num_partitions=16,
            on=("b",), right_on=("doc_id",), right_suffix="_b",
        )

        def verify(t: pa.Table) -> pa.Table:
            ta_col = t["text"] if "text" in t.column_names else t["text_a"]
            if isinstance(ta_col, pa.ChunkedArray):
                ta_col = ta_col.combine_chunks()
            tb_col = t["text_b"].combine_chunks() if isinstance(
                t["text_b"], pa.ChunkedArray) else t["text_b"]
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, first, inv = np.unique(ids, return_index=True,
                                         return_inverse=True)
            doc_texts = pa.concat_arrays([ta_col, tb_col]).take(pa.array(first))
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = joined.map_batches(verify, batch_format="pyarrow",
                                    batch_size=8192)

    if as_dataset:
        return out_ds
    out = out_ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _ngram_pairs_generic(sf_dir: str, num: int = 4, den: int = 5,
                         n: int = 5, as_dataset: bool = False):
    """EXACT char n-gram Jaccard near-dup pairs — generic PPJoin path for
    corpora the broadcast fast path can't serve (non-ASCII text or a gram
    vocabulary too large to broadcast): same semantics, with the df and
    prefix stages as hash-partitioned shuffles over string grams:

    1. (gram, doc_id, doc_n) rows over each doc's DISTINCT gram set.
    2. bucket by hash(gram): a gram's rows co-locate, so document frequency
       df is group-local — annotate rows with df (one shuffle, no extra
       aggregate + join round trip).
    3. bucket by doc_id: per-doc ascending (df, gram) order, keep only the
       first |A| − ⌈t·|A|⌉ + 1 grams (the PREFIX) with their position.  Any
       pair with J ≥ t provably shares a prefix gram, so pruning loses
       nothing; prefixes are rare-gram-biased, keeping step-4 fan-out small.
    4. bucket by hash(gram) again: vectorized candidate pairs from multi-doc
       prefix gram groups, pruned by the LENGTH filter (t·|B| ≤ |A|) and the
       POSITIONAL filter (overlap upper bound 1 + min(|A|−pa−1, |B|−pb−1)
       must reach α = ⌈t/(1+t)·(|A|+|B|)⌉ — a true pair passes at its FIRST
       shared prefix gram, so per-gram application is safe); then
       distributed pair dedup (same pair → same pair bucket).
    5. verify candidates against raw TEXT set ops (no gram hashing → no
       collision risk vs the SQL oracle); emit INTEGER intersection/union
       sizes and filter inter·den ≥ num·uni — grid-exact, no float rounding
       boundary (CLAUDE.md rule); prefix length and α via integer ceil.

    Scale notes: shuffled rows are (5-char gram, int64 doc_id) — ~text-sized
    in total; a stop-gram never generates pairs unless it survives into a
    prefix, and even then the positional filter kills pairs that share only
    late-prefix (common) grams.  Verification touches candidate docs only:
    their texts broadcast once when provably small, else two hash joins."""
    import ray

    from sievedata.sketches.hashing import hash64

    n_buckets = 128

    from sievedata.kernels import grams as G

    def gram_rows(t: pa.Table) -> pa.Table:
        txt_col = t["text"].combine_chunks()
        if G.is_ascii(txt_col):
            # vectorized: packed-uint64 windows + one np.unique per batch;
            # decoded back to the exact char grams so ASCII and non-ASCII
            # batches shuffle one consistent string column
            doc_idx, packed, doc_n = G.distinct_grams_packed(txt_col, n)
            ids_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            tbl = pa.table(
                {"gram": G.packed_to_strings(packed, n),
                 "doc_id": pa.array(ids_np[doc_idx], pa.int64()),
                 "doc_n": pa.array(doc_n[doc_idx], pa.int64())}
            )
        else:  # exact scalar fallback for non-ASCII batches
            ids = t["doc_id"].to_pylist()
            txts = txt_col.to_pylist()
            out_g: list[str] = []
            out_id: list[int] = []
            out_n: list[int] = []
            for d, tx in zip(ids, txts):
                if tx is None:  # SQL oracle: WHERE text IS NOT NULL
                    continue
                grams = {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}
                out_g.extend(grams)
                out_id.extend([int(d)] * len(grams))
                out_n.extend([len(grams)] * len(grams))
            tbl = pa.table(
                {"gram": pa.array(out_g, pa.string()),
                 "doc_id": pa.array(out_id, pa.int64()),
                 "doc_n": pa.array(out_n, pa.int64())}
            )
        gb = (hash64(tbl["gram"].combine_chunks(), seed=37) % np.uint64(n_buckets)).astype(np.int64)
        return tbl.append_column("gbucket", pa.array(gb))

    def annotate_df(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["gram", "doc_id", "doc_n"]].copy()
        out["df"] = out.groupby("gram", sort=False)["doc_id"].transform("size")
        out["dbucket"] = out["doc_id"].to_numpy() % n_buckets
        return out

    def prefix_select(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "df", "gram"], kind="mergesort")
        rank = df.groupby("doc_id", sort=False).cumcount().to_numpy()
        nn = df["doc_n"].to_numpy()
        # L = |A| − ⌈t·|A|⌉ + 1, integer ceil (t = num/den — no float ⌈⌉)
        L = nn - (num * nn + den - 1) // den + 1
        keep = rank < L
        out = df.loc[keep, ["gram", "doc_id", "doc_n"]].copy()
        out["pos"] = rank[keep]
        return out

    def regram_bucket(t: pa.Table) -> pa.Table:
        gb = (hash64(t["gram"].combine_chunks(), seed=37) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("gbucket2", pa.array(gb))

    pairs = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(annotate_df, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(prefix_select, batch_format="pandas")
        .map_batches(regram_bucket, batch_format="pyarrow")
        .groupby("gbucket2")
        .map_groups(functools.partial(_ppjoin_pairs_bucket, num=num, den=den),
                    batch_format="pandas")
        .map_batches(functools.partial(_ppjoin_pair_bucket_col,
                                       n_buckets=n_buckets),
                     batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_ppjoin_dedup_group, batch_format="pandas")
        .materialize()  # candidate pairs only (output-sized)
    )

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("a", "b", "inter", "uni")})
    n_pairs = pairs.count()
    if n_pairs == 0:
        if as_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
        return empty

    texts = _rp(sf_dir, "documents", ["doc_id", "text"])
    wanted = None
    if n_pairs <= 200_000:
        pdf_ids = pairs.to_pandas()  # output-sized (counted small above)
        wanted = set(pdf_ids["a"]) | set(pdf_ids["b"])
    if wanted is not None and len(wanted) <= 50_000:
        # candidate texts are provably small (≤50k docs × ~KB): broadcast
        # the id→text dict ONCE (ray.put; cached per worker, not re-shipped
        # per batch) and verify pairs in parallel map_batches — the
        # verification itself stays distributed, only the small side moves
        wanted_ref = ray.put(wanted)

        def keep_wanted(t: pa.Table) -> pa.Table:
            w = ray.get(wanted_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.isin(ids, np.fromiter(w, dtype=np.int64, count=len(w)))
            return t.filter(pa.array(keep))

        tdf = texts.map_batches(keep_wanted, batch_format="pyarrow").to_pandas()
        lut_ref = ray.put(dict(zip(tdf["doc_id"].astype(int), tdf["text"])))

        def verify_batch(t: pa.Table) -> pa.Table:
            key = lut_ref.hex()
            lut = _LUT_CACHE.get(key)
            if lut is None:
                lut = ray.get(lut_ref)
                _LUT_CACHE.clear()
                _LUT_CACHE[key] = lut
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, inv = np.unique(ids, return_inverse=True)
            doc_texts = pa.array([lut[int(d)] for d in uniq], pa.string())
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = pairs.map_batches(verify_batch, batch_format="pyarrow",
                                   batch_size=8192)
    else:
        joined = pairs.join(
            texts, join_type="inner", num_partitions=16,
            on=("a",), right_on=("doc_id",), right_suffix="_a",
        ).join(
            texts, join_type="inner", num_partitions=16,
            on=("b",), right_on=("doc_id",), right_suffix="_b",
        )

        def verify(t: pa.Table) -> pa.Table:
            ta_col = t["text"] if "text" in t.column_names else t["text_a"]
            if isinstance(ta_col, pa.ChunkedArray):
                ta_col = ta_col.combine_chunks()
            tb_col = t["text_b"].combine_chunks() if isinstance(
                t["text_b"], pa.ChunkedArray) else t["text_b"]
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, first, inv = np.unique(ids, return_index=True,
                                         return_inverse=True)
            texts_all = pa.concat_arrays([ta_col, tb_col])
            doc_texts = texts_all.take(pa.array(first))
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": t["a"], "b": t["b"],
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = joined.map_batches(verify, batch_format="pyarrow",
                                    batch_size=8192)

    if as_dataset:
        return out_ds
    out = out_ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _ngram_pairs_dataset(sf_dir: str, num: int = 4, den: int = 5, n: int = 5):
    """Near-dup pairs as a DATASET (for composition into bigger pipelines
    like dedup clustering, where pulling the edge list to the driver would
    be the round-1 scale sin): same routing as q_ngram_jaccard_pairs."""
    if n <= 5 and _probably_ascii_corpus(sf_dir):
        res = _ngram_pairs_ascii_fast(sf_dir, num, den, n, as_dataset=True)
        if res is not None:
            return res
    return _ngram_pairs_generic(sf_dir, num, den, n, as_dataset=True)


SQL_NGRAM_JACCARD_PAIRS = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
)
SELECT a, b, inter, na + nb - inter AS uni FROM (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) AS na, len(b.grams) AS nb
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
WHERE inter * 5 >= 4 * (na + nb - inter)
ORDER BY a, b
"""


def q_media_features(sf_dir: str):
    """Multimodal image pipeline with REAL decode: deterministic BMP and
    PNG payloads (seeded per doc; even ids → BMP, odd → PNG with a mixed
    per-row filter set) → actor-pool decode → 16-dim image features (dims,
    channel stats, luminance histogram).  Both codecs are pure numpy +
    stdlib zlib (functions/codecs.py); JPEG/MP4 stay stubbed."""
    from sievedata.functions.media import (MediaFeatureExtractor, synth_bmp,
                                           synth_png)

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
                "kind": pa.array(["image"] * t.num_rows, pa.string()),
                "payload": pa.array(
                    [synth_bmp(int(d)) if int(d) % 2 == 0
                     else synth_png(int(d)) for d in ids],
                    pa.binary()),
            }
        )

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=256,  # small batches: media payloads are wide rows
            concurrency=(1, 4),
            fn_constructor_kwargs={"fake": False},
        )
    )


def q_media_audio(sf_dir: str):
    """Multimodal audio pipeline with REAL decode: deterministic PCM-16
    WAV payloads (seeded two-tone per doc) → actor-pool decode → 16-dim
    audio features (duration, rms, zero-crossings, rFFT band energies)."""
    from sievedata.functions.media import MediaFeatureExtractor, synth_wav

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
                "kind": pa.array(["audio"] * t.num_rows, pa.string()),
                "payload": pa.array([synth_wav(int(d)) for d in ids],
                                    pa.binary()),
            }
        )

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
            fn_constructor_kwargs={"fake": False},
        )
    )


def q_media_resize(sf_dir: str):
    """Multimodal resize with REAL codec work: deterministic BMP/PNG
    payloads (even/odd doc ids) → actor-pool decode → nearest-neighbor
    resize → re-encode in the SAME container format (pure numpy + stdlib
    zlib, functions/codecs.py).  Returns id, kind, dims and thumbnail size
    — not the raw bytes — so the driver's rows check stays cheap."""
    from sievedata.functions.media import MediaResizer, synth_bmp, synth_png

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            "kind": pa.array(["image"] * t.num_rows, pa.string()),
            "payload": pa.array(
                [synth_bmp(int(d)) if int(d) % 2 == 0 else synth_png(int(d))
                 for d in ids],
                pa.binary()),
        })

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "width": t["width"],
            "height": t["height"],
            "thumb_bytes": pc.binary_length(t["payload"]),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaResizer,
            batch_format="pyarrow",
            batch_size=256,  # small batches: media payloads are wide rows
            concurrency=(1, 4),
            fn_constructor_kwargs={"width": 64, "height": 64, "fake": False},
        )
        .map_batches(summarize, batch_format="pyarrow")
    )


def q_frame_sample(sf_dir: str, n_frames: int = 4):
    """Multimodal frame sampling: video rows → actor-pool 1→N frame explode
    (inside map_batches, bounded blocks) → per-frame feature rows.  Duration
    is synthesized deterministically from the payload length so the fake
    decode is stable across runs."""
    from sievedata.functions.media import FrameSampler

    def to_video(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        dur = pc.cast(pc.multiply(pc.utf8_length(text), pa.scalar(40)), pa.int32())
        return pa.table({
            "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            "payload": pc.cast(text, pa.binary()),
            "duration_ms": dur,
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(to_video, batch_format="pyarrow")
        .map_batches(
            FrameSampler,
            batch_format="pyarrow",
            batch_size=128,  # explode multiplies rows n_frames×
            concurrency=(1, 4),
            fn_constructor_kwargs={"n_frames": n_frames, "fake": True},
        )
    )


def q_embedding_norms(sf_dir: str):
    """L2 norms per embedding (vectorized numpy over Arrow lists)."""

    def norms(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        # offsets are ABSOLUTE into the values buffer (a sliced ListArray
        # keeps the parent's buffer) — rebase them before segment sums.
        # reduceat (sequential left-to-right per segment) keeps float-op
        # association identical to the oracle's list_sum; a cumsum
        # difference would re-associate and drift ~1e-10 near rounding
        # boundaries.  Empty lists (incl. a trailing one, which would push
        # a reduceat index past the end) are masked to 0 explicitly.
        offs = np.asarray(emb.offsets)
        rel = (offs - offs[0]).astype(np.int64)
        vals = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        )[offs[0]:offs[-1]]
        sq_all = vals * vals
        starts, lens = rel[:-1], rel[1:] - rel[:-1]
        nonempty = lens > 0
        sq = np.zeros(len(starts))
        if sq_all.size and nonempty.any():
            # empty segments are excluded from the index list (a trailing
            # empty would be an out-of-range index; a middle empty would
            # shorten its predecessor's segment) — non-empty starts tile
            # the values buffer contiguously, so reduceat over just them
            # is exact
            sq[nonempty] = np.add.reduceat(sq_all, starts[nonempty])
        return pa.table(
            {"vec_id": t["vec_id"], "l2_norm": pa.array(np.round(np.sqrt(sq), 4))}
        )

    return _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        norms, batch_format="pyarrow"
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm
FROM embeddings
"""


def q_text_blob(sf_dir: str):
    """M5 text_blob kernel (app/normalization.py:52-63) as a driver-facing
    gate: lowercased skip-empty concat of vendor_name + po + terms +
    per-line sku+desc over synthetic docs built from orders rows (po is
    NULL for every 3rd key, exercising the skip-empty branch)."""
    from sievedata.kernels.normalize import text_blob

    def blob(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        custs = t["o_custkey"].to_numpy(zero_copy_only=False)
        stats = t["o_orderstatus"].to_pylist()
        prios = t["o_orderpriority"].to_pylist()
        out = [
            text_blob(
                {
                    "vendor_name": f"Vendor-{s}",
                    "po_number": None if int(k) % 3 == 0 else f"PO-{int(k)}",
                    "terms": p,
                    "line_items": [
                        {"sku": f"SKU-{int(k) % 100}", "desc": f"Item-{int(c)}"}
                    ],
                }
            )
            for k, c, s, p in zip(keys, custs, stats, prios)
        ]
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "blob": pa.array(out, pa.string())}
        )

    return _rp(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    ).map_batches(blob, batch_format="pyarrow")


SQL_TEXT_BLOB = """
SELECT o_orderkey,
       lower(concat_ws(' ', 'Vendor-' || o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'PO-' || o_orderkey END,
             o_orderpriority,
             'SKU-' || (o_orderkey % 100),
             'Item-' || o_custkey)) AS blob
FROM orders
"""


def q_systematic_sample(sf_dir: str, modulus: int = 20, residue: int = 7):
    """Deterministic systematic sampling (K4's reproducible-sampling family):
    key-modulo selection, stable across engines."""

    def pick(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((keys % modulus) == residue)).select(
            ["o_orderkey", "o_totalprice"]
        )

    return _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        pick, batch_format="pyarrow"
    )


SQL_SYSTEMATIC_SAMPLE = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 7
"""


def q_row_fingerprint(sf_dir: str):
    """Canonical row content hash (M6 payload-hash family): sha256 over a
    stable field concatenation — the idempotency/dedup key of the reference's
    invoice_payload_hash (app/normalization.py:66-70)."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        tot = t["o_totalprice"].to_numpy(zero_copy_only=False)
        digests = [
            hashlib.sha256(f"{int(k)}|{int(c)}|{x:.2f}".encode()).hexdigest()
            for k, c, x in zip(keys, cust, tot)
        ]
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "row_hash": pa.array(digests, pa.string())}
        )

    return _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        fp, batch_format="pyarrow"
    )


SQL_ROW_FINGERPRINT = """
SELECT o_orderkey,
       lower(sha256(o_orderkey || '|' || o_custkey || '|' || printf('%.2f', o_totalprice))) AS row_hash
FROM orders
"""


def q_dedup_survivors(sf_dir: str):
    """Exact-dedup SURVIVOR set (hash-partition + per-group first): the kept
    row per (custkey, status) group — the materialized complement of
    ``dup_orders``'s flagged rows."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        s_codes = np.array([ord(x[0]) if x else 0 for x in st], dtype=np.int64)
        return t.append_column("bucket", pa.array((k * 31 + s_codes) % n_buckets))

    def first_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderstatus", "o_orderkey"], kind="mergesort")
        out = df.groupby(["o_custkey", "o_orderstatus"], sort=False).head(1)
        return out[["o_custkey", "o_orderstatus", "o_orderkey"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_orderkey"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_bucket, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderstatus", "o_orderkey"])
    )


SQL_DEDUP_SURVIVORS = """
SELECT o_custkey, o_orderstatus, o_orderkey FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderkey) = 1
"""


def q_median_price(sf_dir: str):
    """Exact per-group median (A3 family) via bucketized groupby — the
    quantile aggregate the reference computes per matched-pair diffs."""
    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % 64))

    def med_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # discrete median (lower middle element): an exact data value, so no
        # interpolated .005 midpoints that round differently across engines
        out = (
            df.groupby("l_partkey", sort=False)["l_extendedprice"]
            .quantile(0.5, interpolation="lower").rename("median_price").reset_index()
        )
        return out

    return (
        _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(med_bucket, batch_format="pandas")
        .select_columns(["l_partkey", "median_price"])
    )


SQL_MEDIAN_PRICE = """
SELECT l_partkey, quantile_disc(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_partkey
"""


def q_knn_classify(sf_dir: str, k: int = 5, n_queries: int = 20):
    """k-NN label prediction: majority label among the top-k cosine
    neighbors (deterministic tiebreak: higher count, then smaller label).
    Built on the brute-force broadcast top-k."""
    import ray

    from sievedata.functions.ann import make_bruteforce_fn, merge_topk

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    top = merge_topk(cands, k=k)

    labels = _rp(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    top = top.merge(labels.rename(columns={"vec_id": "neighbor_id"}), on="neighbor_id")
    counts = (
        top.groupby(["query_id", "label"]).size().rename("votes").reset_index()
        .sort_values(["query_id", "votes", "label"], ascending=[True, False, True],
                     kind="mergesort")
    )
    out = counts.groupby("query_id", sort=True).head(1).reset_index(drop=True)
    return out[["query_id", "label", "votes"]].rename(columns={"label": "pred_label"})


SQL_KNN_CLASSIFY = """
WITH ranked AS (
  SELECT q.vec_id AS query_id, c.label,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM ranked WHERE rank <= 5
  GROUP BY query_id, label
)
SELECT query_id, label AS pred_label, votes FROM votes
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) = 1
"""


def q_line_sum_check(sf_dir: str, pct_tol: float = 0.5):
    """DQ-001-style line-sum reconciliation (requirements.md:243-245): flag
    orders whose lineitem revenue sum deviates from o_totalprice by more
    than ``pct_tol`` (fractional).

    Hash-bucketed COGROUP (the engine's shuffle idiom — one sort shuffle of
    skinny (bucket, key, value, side) rows, per-bucket pandas sum+merge):
    per-orderkey sums are O(orders), so no driver dict / broadcast ever
    exists, and it avoids the native hash-aggregate + hash-join operator
    pair (~2× slower at this cardinality, measured)."""
    n_buckets = 64

    def li_rows(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(k % n_buckets), "key": pa.array(k),
             "val": t["l_extendedprice"],
             "side": pa.array(np.zeros(len(k), dtype=np.int8))}
        )

    def o_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(k % n_buckets), "key": pa.array(k),
             "val": t["o_totalprice"],
             "side": pa.array(np.ones(len(k), dtype=np.int8))}
        )

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["side"] == 0]
        orders = df[df["side"] == 1]
        sums = li.groupby("key", sort=False)["val"].sum()
        lsum = orders["key"].map(sums).fillna(0.0).to_numpy()
        totals = orders["val"].to_numpy()
        dev = np.abs(lsum - totals) / np.maximum(np.abs(totals), 1.0)
        keep = dev > pct_tol
        return pd.DataFrame(
            {"o_orderkey": orders["key"].to_numpy()[keep],
             "o_totalprice": totals[keep],
             "line_sum": np.round(lsum[keep], 2)}
        )

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        li_rows, batch_format="pyarrow"
    )
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        o_rows, batch_format="pyarrow"
    )
    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(check_bucket, batch_format="pandas")
        .select_columns(["o_orderkey", "o_totalprice", "line_sum"])
    )


SQL_LINE_SUM_CHECK = """
WITH s AS (SELECT l_orderkey, sum(l_extendedprice) AS line_sum FROM lineitem GROUP BY l_orderkey)
SELECT o_orderkey, o_totalprice, round(coalesce(line_sum, 0), 2) AS line_sum
FROM orders LEFT JOIN s ON o_orderkey = l_orderkey
WHERE abs(coalesce(line_sum, 0) - o_totalprice) / greatest(abs(o_totalprice), 1.0) > 0.5
"""


def q_running_total(sf_dir: str):
    """Per-customer running order total (ordered cumulative window) — the
    streaming-shaped cumulative idiom: bucket shuffle → within-group sorted
    cumsum, vectorized per bucket."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        df["running_total"] = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum().round(2)
        return df[["o_custkey", "o_orderkey", "running_total"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderkey", "running_total"])
    )


SQL_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


def q_sliding_window(sf_dir: str, frame: int = 3):
    """Per-user BOUNDED sliding-frame aggregate (ROWS BETWEEN 2 PRECEDING
    AND CURRENT ROW) — the windowed-aggregate companion to
    q_running_total's unbounded cumsum: bucket shuffle on user hash →
    within-bucket (user, ts, event_id) sort → grouped rolling max.  Max is
    comparison-only (no float accumulation), so the value hash cannot hit a
    rounding boundary regardless of frame arithmetic order."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df["sliding_max"] = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(frame, min_periods=1).max()
            .to_numpy()
        )
        return df[["user_id", "event_id", "sliding_max"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(win, batch_format="pandas")
        .select_columns(["user_id", "event_id", "sliding_max"])
    )


SQL_SLIDING_WINDOW = """
SELECT user_id, event_id,
       max(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sliding_max
FROM events
"""


def q_asof_join(sf_dir: str):
    """As-of join (custom operator — Ray Data has no native ASOF): for each
    event, the latest order of the same customer at-or-before the event
    time.  Both sides hash-bucket on the join key and ONE cogroup per
    bucket runs a vectorized ``pandas.merge_asof`` — the right side sorted
    by (o_orderdate, o_orderkey) so order-date ties resolve to the max
    orderkey, matching the oracle's row_number tiebreak.  Partitioning
    assumption (documented per north_rule): one key's events+orders
    co-locate in a bucket — the same per-key locality every keyed window
    op in this repo relies on; buckets are hash-spread so no key ordering
    is required across groups."""
    n_buckets = 64

    def ev_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"],
             "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
             "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
             "bucket": pa.array(u % n_buckets)}
        )

    def od_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"event_id": pa.nulls(t.num_rows, pa.int64()),
             "user_id": t["o_custkey"],
             "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
             "o_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
             "bucket": pa.array(c % n_buckets)}
        )

    _empty = pd.DataFrame({c: pd.Series(dtype="int64")
                           for c in ("event_id", "user_id", "last_orderkey")})

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["event_id"].notna()]
        od = df[df["event_id"].isna()]
        if not len(ev) or not len(od):
            return _empty
        ev = ev[["event_id", "user_id", "ts"]].sort_values("ts", kind="mergesort")
        od = od[["user_id", "o_orderkey", "o_orderdate"]].sort_values(
            ["o_orderdate", "o_orderkey"], kind="mergesort"
        )
        m = pd.merge_asof(ev, od, left_on="ts", right_on="o_orderdate",
                          by="user_id", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        if not len(m):
            return _empty
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"),
             "user_id": m["user_id"].astype("int64"),
             "last_orderkey": m["o_orderkey"].astype("int64")}
        )

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        ev_rows, batch_format="pyarrow"
    )
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        od_rows, batch_format="pyarrow"
    )
    return (
        ev.union(od)
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
        .select_columns(["event_id", "user_id", "last_orderkey"])
    )


SQL_ASOF_JOIN = """
SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q_range_join(sf_dir: str, days: int = 7):
    """Range (interval) join — custom operator, Ray Data has no native one:
    per order, count + sum of the customer's events with
    ``o_orderdate <= ts < o_orderdate + days``.

    Both sides hash-bucket on the equi-key (customer); ONE cogroup per
    bucket reduces the interval predicate to two vectorized
    ``pandas.merge_asof`` probes against per-user cumulative event stats
    (count, integer-cents sum): events in [start, end) = cum(<end) −
    cum(<start).  Integer cents make the cumsum-difference exact — a float
    cumsum difference would re-associate the sum and drift off the
    oracle's grid (CLAUDE.md exactness rule).  Partitioning assumption
    (documented per north_rule): one key's orders+events co-locate in a
    bucket; buckets are hash-spread, no cross-group ordering needed —
    shuffle volume is O(|orders| + |events|), never the O(n·m) join
    fan-out of the naive interval join."""
    n_buckets = 64
    span = np.timedelta64(days, "D")

    def ev_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "cents": pa.array(cents),
             "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
             "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
             "bucket": pa.array(u % n_buckets)}
        )

    def od_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"user_id": t["o_custkey"],
             "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
             "cents": pa.nulls(t.num_rows, pa.int64()),
             "o_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
             "bucket": pa.array(c % n_buckets)}
        )

    _empty = pd.DataFrame(
        {"o_orderkey": pd.Series(dtype="int64"),
         "n_events": pd.Series(dtype="int64"),
         "sum_value_cents": pd.Series(dtype="int64")}
    )

    def rjoin(df: pd.DataFrame) -> pd.DataFrame:
        od = df[df["o_orderkey"].notna()]
        if not len(od):
            return _empty
        od = od[["o_orderkey", "user_id", "o_orderdate"]].sort_values(
            "o_orderdate", kind="mergesort"
        )
        ev = df[df["o_orderkey"].isna()]
        if not len(ev):
            return pd.DataFrame(
                {"o_orderkey": od["o_orderkey"].astype("int64").to_numpy(),
                 "n_events": np.zeros(len(od), dtype=np.int64),
                 "sum_value_cents": np.zeros(len(od), dtype=np.int64)}
            )
        # merge_asof needs the right side GLOBALLY sorted on the on-key;
        # per-user cumulatives only need ts order within each user, which
        # a global stable ts sort also guarantees
        ev = ev[["user_id", "ts", "cents"]].sort_values("ts", kind="mergesort")
        g = ev.groupby("user_id", sort=False)
        ev["cum_n"] = (g.cumcount() + 1).astype("int64")
        ev["cum_c"] = g["cents"].cumsum().astype("int64")
        cum = ev[["user_id", "ts", "cum_n", "cum_c"]]
        # strictly-before probes: events in [start, end) = cum(ts < end)
        # − cum(ts < start).  end = start + span is monotone in start, so
        # one o_orderdate sort serves both probes and rows stay aligned.
        lo = pd.merge_asof(
            od, cum, left_on="o_orderdate", right_on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        hi = pd.merge_asof(
            od.assign(end=od["o_orderdate"] + span), cum,
            left_on="end", right_on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        n = (hi["cum_n"].fillna(0) - lo["cum_n"].fillna(0)).astype("int64")
        c = (hi["cum_c"].fillna(0) - lo["cum_c"].fillna(0)).astype("int64")
        return pd.DataFrame(
            {"o_orderkey": od["o_orderkey"].astype("int64").to_numpy(),
             "n_events": n.to_numpy(), "sum_value_cents": c.to_numpy()}
        )

    ev = _rp(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        ev_rows, batch_format="pyarrow"
    )
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        od_rows, batch_format="pyarrow"
    )
    return (
        ev.union(od)
        .groupby("bucket")
        .map_groups(rjoin, batch_format="pandas")
        .select_columns(["o_orderkey", "n_events", "sum_value_cents"])
    )


SQL_RANGE_JOIN = """
SELECT o.o_orderkey,
       count(e.user_id) AS n_events,
       CAST(coalesce(sum(CAST(round(e.value * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_value_cents
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
"""


def q_ann_ivf_topk(sf_dir: str, k: int = 5, n_queries: int = 5,
                   n_centroids: int = 16, n_probe: int = 4):
    """IVF top-k with GUARANTEED-EXACT probing (the scale path, now
    driver-hash-checkable): k-means coarse quantizer fit on a driver-side
    sample, corpus assigned to centroids in map_batches, queries probe
    their top-``n_probe`` clusters first — then the angular triangle
    inequality closes the loop: a point x in cluster c satisfies
    angle(q,x) ≥ angle(q,μ_c) − r_c (r_c = cluster max radius, distributed
    max), so any unprobed cluster whose similarity UPPER BOUND
    cos(max(0, θ_qc − r_c)) still beats the current k-th candidate is
    probed in a follow-up filtered pass.  Pruning only skips provably-empty
    clusters → the result is the EXACT top-k, oracle-checked against the
    same brute-force SQL as ``ann_topk``; the IVF machinery is verified by
    that exactness.  Shuffle-free: only (queries × k) candidate rows per
    block leave the workers; each pass streams the probed clusters only."""
    import ray

    from sievedata.functions.ann import (
        _normalize, embedding_matrix, kmeans_fit, make_bruteforce_fn,
        make_ivf_assign_fn, merge_topk,
    )

    sample = (
        _rp(sf_dir, "embeddings", ["embedding"]).limit(10000).to_pandas()
    )
    if len(sample) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    sm = np.vstack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    cent = _normalize(kmeans_fit(sm, k=n_centroids))
    cent_ref = ray.put(cent)

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    assigned = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(make_ivf_assign_fn(cent_ref), batch_format="pyarrow")
        .materialize()  # probed passes below re-filter it without re-reading
    )

    # per-cluster max angular radius — per-batch partials (≤ n_centroids
    # rows each), tiny driver combine
    def radius_partials(t: pa.Table) -> pa.Table:
        emb = embedding_matrix(t["embedding"])
        if emb.size == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "radius": pa.array([], pa.float64())})
        emb = _normalize(emb)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = np.einsum("ij,ij->i", emb, cent[cl])
        ang = np.arccos(np.clip(sims, -1.0, 1.0))
        uniq, inv = np.unique(cl, return_inverse=True)
        rmax = np.zeros(len(uniq))
        np.maximum.at(rmax, inv, ang)
        return pa.table({"cluster": pa.array(uniq, pa.int64()),
                         "radius": pa.array(rmax, pa.float64())})

    rad = (
        assigned.map_batches(radius_partials, batch_format="pyarrow")
        .to_pandas()  # ≤ n_centroids × n_blocks rows
        .groupby("cluster")["radius"].max()
    )
    live = rad.index.to_numpy()  # clusters that actually hold points
    radius = rad.to_numpy()

    # similarity upper bound per (query, live cluster), with float slack so
    # pruning is strictly conservative
    eps = 1e-9
    qn = _normalize(qm)
    theta = np.arccos(np.clip(qn @ cent[live].T, -1.0, 1.0))
    ub = np.cos(np.maximum(0.0, theta - radius[None, :] - eps)) + eps

    def probe_pass(clusters: set) -> pd.DataFrame:
        keep = np.array(sorted(clusters), dtype=np.int64)

        def in_probed(t: pa.Table) -> pa.Table:
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(cl, keep)))

        return (
            assigned.map_batches(in_probed, batch_format="pyarrow")
            .map_batches(
                make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
            )
            .to_pandas()
        )

    order = np.argsort(-ub, axis=1)
    probed = {int(live[c]) for qi in range(len(qids))
              for c in order[qi, : min(n_probe, len(live))]}
    cands = probe_pass(probed)

    for _ in range(len(live)):  # ≤ one expansion per remaining cluster set
        cur = cands[cands["query_id"] != cands["neighbor_id"]]
        cur = cur.drop_duplicates(["query_id", "neighbor_id"])
        top = (cur.sort_values(["query_id", "sim"], ascending=[True, False],
                               kind="mergesort")
               .groupby("query_id").head(k).groupby("query_id")["sim"])
        kmin, kcnt = top.min(), top.count()
        kth = kmin.where(kcnt >= k, -np.inf)  # < k candidates → keep probing
        need: set = set()
        for qi, qid in enumerate(qids):
            skq = kth.get(int(qid), -np.inf)
            for ci, c in enumerate(live):
                if int(c) not in probed and ub[qi, ci] > skq - eps:
                    need.add(int(c))
        if not need:
            break
        probed |= need
        cands = pd.concat([cands, probe_pass(need)], ignore_index=True)

    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    cands = cands.drop_duplicates(["query_id", "neighbor_id"])
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


SQL_ANN_IVF_TOPK = SQL_ANN_TOPK  # exact by construction — same brute-force oracle


def q_ann_lsh_topk(sf_dir: str, k: int = 5, n_queries: int = 5,
                   n_bits: int = 6, hamming_probe: int = 2):
    """Hyperplane-LSH-bucketed ANN (the other scale path, vs IVF): random
    sign-bit signatures bucket the corpus in map_batches; each query multi-
    probes its own bucket plus all buckets within ``hamming_probe`` bit
    flips (flipping the lowest-margin hyperplanes first is the classic
    multi-probe refinement; flipping all is the deterministic superset).
    Corpus rows outside the probed bucket set are dropped BEFORE the matmul
    — per-bucket cost is N/2^bits on balanced data, and the bucket ids
    hash-partition across nodes with no driver-side corpus state.

    Driver-checkable despite being approximate: the planes are a fixed
    seeded constant, so the WHOLE algorithm (signatures → hamming-≤p probe
    set → candidate union → top-k among candidates) is reproduced verbatim
    in SQL with the planes as literals (``SQL_ANN_LSH_TOPK``); recall vs
    brute force is additionally asserted in tests/test_ann.py."""
    import ray

    from sievedata.functions.ann import (
        embedding_matrix, hyperplane_signatures, make_bruteforce_fn,
        make_planes, merge_topk, _normalize,
    )

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    planes = make_planes(qm.shape[1], n_bits=n_bits)
    qsig = hyperplane_signatures(_normalize(qm), planes)

    # multi-probe bucket set: each query signature ± up to hamming_probe flips
    probe = {int(s) for s in qsig}
    frontier = set(probe)
    for _ in range(hamming_probe):
        frontier = {s ^ (1 << b) for s in frontier for b in range(n_bits)}
        probe |= frontier
    probe_ref = ray.put(probe)
    planes_ref = ray.put(planes)
    queries_ref = ray.put((qids, qm))

    def in_probed(t: pa.Table) -> pa.Table:
        keep = ray.get(probe_ref)
        pl = ray.get(planes_ref)
        emb = embedding_matrix(t["embedding"])
        if emb.size == 0:
            return t
        sig = hyperplane_signatures(_normalize(emb), pl)
        mask = np.fromiter((int(s) in keep for s in sig), dtype=bool, count=len(sig))
        return t.filter(pa.array(mask))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(in_probed, batch_format="pyarrow")
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


def _sql_ann_lsh_topk(dim: int = 64, n_bits: int = 6, hamming_probe: int = 2,
                      k: int = 5, n_queries: int = 5) -> str:
    """SQL mirror of q_ann_lsh_topk: the seeded hyperplanes are embedded as
    DOUBLE literals (repr round-trips exactly), signatures are sign bits of
    raw dot products (normalization never flips a sign), the candidate set
    is the UNION over queries of hamming-≤p buckets (the engine filters the
    corpus against the whole probe set, then every query scores every
    survivor), and top-k ties break by neighbor_id like merge_topk."""
    from sievedata.functions.ann import make_planes

    planes = make_planes(dim, n_bits=n_bits)
    rows = ",\n         ".join(
        "({}, [{}]::DOUBLE[])".format(
            b, ", ".join(repr(float(v)) for v in planes[b]))
        for b in range(n_bits)
    )
    return f"""
WITH planes(b, p) AS (VALUES {rows}),
sig AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(e.embedding, p.p) > 0
                       THEN 1 << p.b ELSE 0 END) AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
qsig AS (SELECT vec_id, sig FROM sig WHERE vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT c.vec_id
  FROM sig c JOIN qsig q ON bit_count(xor(c.sig, q.sig)) <= {hamming_probe}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(qe.embedding, ce.embedding) AS sim
  FROM qsig q
  JOIN embeddings qe ON qe.vec_id = q.vec_id
  CROSS JOIN cand c
  JOIN embeddings ce ON ce.vec_id = c.vec_id
  WHERE c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()


def q_embedding_near_dups(sf_dir: str, threshold: float = 0.45, n_clusters: int = 16):
    """Embedding-cosine near-duplicate pairs ≥ threshold — EXACT, via a
    cluster-pruned distributed pair join (no full corpus matrix on the
    driver, no all-pairs broadcast):

    1. k-means coarse clusters (driver fits on a bounded sample; assignment
       is map_batches) + per-cluster max angular radius (distributed Max).
    2. angular triangle inequality prunes cluster PAIRS: members of C_i and
       C_j can only reach angle(x,y) ≥ angle(c_i,c_j) − r_i − r_j, so any
       cluster pair with that bound above arccos(threshold) is skipped
       entirely.  Exact — pruning only removes provably-empty pairs.
    3. each vector is replicated to its cluster's surviving pair groups
       (shuffle volume = N × avg partners, ≤ N×k, ≪ N²); one vectorized
       matmul per (c_i, c_j) group emits qualifying (a < b) pairs.

    Unlike LSH candidate generation this cannot miss a pair: at low
    thresholds (0.45 ≈ 63°) hyperplane-LSH recall is probabilistic, which
    would flake the driver's exact hash gate.  On clustered real data the
    radius bound prunes most groups; on uniform random data it degrades to
    a distributed block-pair brute force — the honest exact baseline."""
    import ray
    from ray.data.aggregate import Max

    from sievedata.functions.ann import (
        _normalize, embedding_matrix, kmeans_fit, make_ivf_assign_fn,
    )

    sample = _rp(sf_dir, "embeddings", ["embedding"]).limit(10000).to_pandas()
    sm = np.vstack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    cent = _normalize(kmeans_fit(sm, k=n_clusters))
    cent_ref = ray.put(cent)

    # plain task fn + worker-cached centroids: this lineage executes twice
    # (radii pass, explode pass) and actor-pool spin-up would double-pay
    assigned = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        make_ivf_assign_fn(cent_ref), batch_format="pyarrow"
    )

    def angle_partial(t: pa.Table) -> pa.Table:
        emb = _normalize(embedding_matrix(t["embedding"]))
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        cos_to_cent = np.einsum("ij,ij->i", emb, cent[cl])
        ang = np.arccos(np.clip(cos_to_cent, -1.0, 1.0))
        df = pd.DataFrame({"cluster": cl, "ang": ang})
        g = df.groupby("cluster", sort=False)["ang"].max().reset_index()
        return pa.table({"cluster": pa.array(g["cluster"].to_numpy()),
                         "ang": pa.array(g["ang"].to_numpy())})

    radii_df = (
        assigned.map_batches(angle_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Max("ang", alias_name="radius"))
        .to_pandas()  # O(n_clusters) rows
    )
    radius = np.zeros(len(cent))
    radius[radii_df["cluster"].to_numpy()] = radii_df["radius"].to_numpy()

    theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    cang = np.arccos(np.clip(cent @ cent.T, -1.0, 1.0))
    k = len(cent)
    partners: dict[int, list[int]] = {i: [] for i in range(k)}
    for i in range(k):
        for j in range(i, k):
            if cang[i, j] - radius[i] - radius[j] <= theta_t:
                pair_key = i * k + j
                partners[i].append(pair_key)
                if j != i:
                    partners[j].append(pair_key)
    partners_ref = ray.put(partners)

    def explode_to_groups(t: pa.Table) -> pa.Table:
        part = ray.get(partners_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        reps = np.array([len(part[int(c)]) for c in cl])
        idx = np.repeat(np.arange(len(cl)), reps)
        group = np.concatenate([part[int(c)] for c in cl]) if len(cl) else np.array([], dtype=np.int64)
        out = t.select(["vec_id", "embedding", "cluster"]).take(pa.array(idx, pa.int64()))
        return out.append_column("pair_group", pa.array(group.astype(np.int64)))

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        gkey = int(df["pair_group"].iloc[0])
        ci, cj = gkey // k, gkey % k
        emb = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]]))
        ids = df["vec_id"].to_numpy()
        cl = df["cluster"].to_numpy()
        if ci == cj:
            sims = emb @ emb.T
            ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
            a_ids, b_ids = ids[ai], ids[bj]
        else:
            mi, mj = cl == ci, cl == cj
            if not mi.any() or not mj.any():
                return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
            sims = emb[mi] @ emb[mj].T
            ai, bj = np.nonzero(sims >= threshold)
            a_ids, b_ids = ids[mi][ai], ids[mj][bj]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a": lo.astype(np.int64), "b": hi.astype(np.int64)})

    return (
        assigned.map_batches(explode_to_groups, batch_format="pyarrow")
        .groupby("pair_group")
        .map_groups(pairs_in_group, batch_format="pandas")
        .select_columns(["a", "b"])
    )


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def _flagship_fixture(n_docs: int, n_vendors: int) -> dict:
    """Cached span-document fixture + profiles for the flagship queries."""
    import os

    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles

    from sievedata.fixtures import FIXTURE_VERSION

    cache = f"/tmp/sievedata_flagship_v{FIXTURE_VERSION}_{n_docs}"
    marker = os.path.join(cache, "documents.parquet")
    if not os.path.exists(marker):
        generate_fixture(cache, n_docs=n_docs, n_vendors=n_vendors, seed=42)
    prof_marker = os.path.join(cache, "profiles", "profiles.parquet")
    if not os.path.exists(prof_marker):
        build_profiles(
            os.path.join(cache, "baseline.parquet"),
            os.path.join(cache, "media_catalog.parquet"),
            os.path.join(cache, "profiles"),
        )
    return {
        "documents": marker,
        "profiles": prof_marker,
        "bloom": os.path.join(cache, "profiles", "media_bloom.bin"),
        "cache": cache,
    }


def q_validate_flagship(sf_dir: str):
    """Flagship constraint validation over the span-documents fixture
    (BASELINE.json input shape); returns the violations table.  Rows-only:
    exact-match correctness vs the pure-python oracle is asserted by
    tests/test_e2e.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.validate import validate_documents

    fx = _flagship_fixture(2000, 20)
    res = validate_documents(
        fx["documents"], fx["profiles"], fx["bloom"],
        os.path.join(fx["cache"], "validate_q"), resume=False,
    )
    return (
        pq.read_table(res["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code"], kind="mergesort")
        .reset_index(drop=True)
    )


def _incremental_fixture() -> dict:
    """Cached doc_id-ordered 75/25 split of the flagship fixture (the
    append-only contract) + a completed BASE validate run over part 0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    fx = _flagship_fixture(2000, 20)
    inc = os.path.join(fx["cache"], "inc")
    hist_dir = os.path.join(inc, "hist")
    grow_dir = os.path.join(inc, "grow")
    if not os.path.exists(os.path.join(grow_dir, "part_1.parquet")):
        os.makedirs(hist_dir, exist_ok=True)
        os.makedirs(grow_dir, exist_ok=True)
        t = pq.read_table(fx["documents"])
        df = t.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        cut = int(len(df) * 0.75)
        for name, frame in (("part_0.parquet", df.iloc[:cut]),
                            ("part_1.parquet", df.iloc[cut:])):
            tbl = pa.Table.from_pandas(frame, preserve_index=False,
                                       schema=t.schema)
            pq.write_table(tbl, os.path.join(grow_dir, name))
        pq.write_table(pa.Table.from_pandas(df.iloc[:cut], preserve_index=False,
                                            schema=t.schema),
                       os.path.join(hist_dir, "part_0.parquet"))
        # base run sees only part 0 of the growing dir
        os.rename(os.path.join(grow_dir, "part_1.parquet"),
                  os.path.join(grow_dir, "part_1.parquet.pending"))
        from sievedata.pipelines.validate import validate_documents

        validate_documents(grow_dir, fx["profiles"], fx["bloom"],
                           os.path.join(inc, "run_base"), resume=True)
        os.rename(os.path.join(grow_dir, "part_1.parquet.pending"),
                  os.path.join(grow_dir, "part_1.parquet"))
    return {"fx": fx, "inc": inc, "hist": hist_dir, "grow": grow_dir,
            "base_run": os.path.join(inc, "run_base")}


def q_validate_incremental(sf_dir: str):
    """Append-only DELTA validation (`--prev-run`): the last 25% of the
    flagship fixture validated against the base run's manifest + persisted
    sketch partials; returns the delta's violations.  Rows-only: the
    3-run-chain ≡ full-run byte-equivalence is asserted by
    tests/test_incremental.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.validate import validate_documents

    fxi = _incremental_fixture()
    res = validate_documents(
        fxi["grow"], fxi["fx"]["profiles"], fxi["fx"]["bloom"],
        os.path.join(fxi["inc"], "run_delta_q"), resume=True,
        prev_run_dir=fxi["base_run"],
    )
    return (
        pq.read_table(res["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code"], kind="mergesort")
        .reset_index(drop=True)
    )


def q_score_incremental(sf_dir: str):
    """Incremental scoring (`score --history`): the last 25% of the
    flagship fixture scored with the first 75% as candidate history;
    returns the delta's decisions.  Rows-only: byte-equivalence with the
    full run restricted to delta docs is asserted by
    tests/test_incremental_score.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.score import score_documents

    fxi = _incremental_fixture()
    delta_dir = os.path.join(fxi["inc"], "delta_only")
    if not os.path.exists(os.path.join(delta_dir, "part_1.parquet")):
        os.makedirs(delta_dir, exist_ok=True)
        os.link(os.path.join(fxi["grow"], "part_1.parquet"),
                os.path.join(delta_dir, "part_1.parquet"))
    res = score_documents(
        delta_dir, fxi["fx"]["profiles"], fxi["fx"]["bloom"],
        os.path.join(fxi["inc"], "score_delta_q"), resume=True,
        history_path=fxi["hist"],
    )
    return (
        pq.read_table(res["decisions"]).to_pandas()
        .sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    )


def q_profile_incremental(sf_dir: str):
    """Incremental profile refresh (the reference's nightly baseline job as
    a sketch merge): profiles learned from the first 75% of the flagship
    baseline, refreshed with the last 25% via update_profiles (Chan moment
    merge, t-digest merge, HLL register max) WITHOUT re-reading history;
    returns the refreshed per-partition profile stats.  Rows-only:
    merge-vs-rebuild parity is asserted by the profile tests."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sievedata.pipelines.profile import build_profiles, update_profiles

    fx = _flagship_fixture(2000, 20)
    inc = os.path.join(fx["cache"], "prof_inc")
    out_marker = os.path.join(inc, "refreshed", "profiles.parquet")
    if not os.path.exists(out_marker):
        os.makedirs(inc, exist_ok=True)
        t = pq.read_table(os.path.join(fx["cache"], "baseline.parquet"))
        df = t.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        cut = int(len(df) * 0.75)
        for name, frame in (("base0.parquet", df.iloc[:cut]),
                            ("delta.parquet", df.iloc[cut:])):
            pq.write_table(
                pa.Table.from_pandas(frame, preserve_index=False,
                                     schema=t.schema),
                os.path.join(inc, name))
        base_prof = build_profiles(
            os.path.join(inc, "base0.parquet"),
            os.path.join(fx["cache"], "media_catalog.parquet"),
            os.path.join(inc, "prof0"))
        update_profiles(base_prof["profiles"],
                        os.path.join(inc, "delta.parquet"),
                        os.path.join(inc, "refreshed"))
    out = pq.read_table(out_marker).to_pandas()
    cols = [c for c in ("partition_key", "sample_count", "mean_total",
                        "std_total", "profile_version") if c in out.columns]
    return (out[cols].sort_values("partition_key", kind="mergesort")
            .reset_index(drop=True))


def q_score_flagship(sf_dir: str):
    """Flagship batch duplicate scoring (the reference's /scoreInvoice flow);
    returns the decisions table.  Rows-only: per-vendor exact-match vs the
    python orchestration oracle is asserted by tests/test_score.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.score import score_documents

    fx = _flagship_fixture(2000, 20)
    res = score_documents(
        fx["documents"], fx["profiles"], fx["bloom"],
        os.path.join(fx["cache"], "score_q"), resume=True,
    )
    return (
        pq.read_table(res["decisions"]).to_pandas()
        .sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# Explode / pivot / rollup / histogram / quantile / semi-join families
# --------------------------------------------------------------------------

def q_word_count(sf_dir: str, k: int = 100):
    """Word-frequency top-k over documents.text (explode/UNNEST family,
    M7-adjacent tokenization).

    The explode happens INSIDE map_batches via Arrow ``split_pattern`` +
    ``list_flatten`` (vectorized — never a per-row ``flat_map``), and each
    block pre-aggregates its own word counts (``value_counts`` combiner), so
    the shuffle moves one row per distinct word per block rather than one
    row per token — at 100 TB the raw token stream never enters the object
    store."""
    from ray.data.aggregate import Sum

    def block_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"].combine_chunks(), " "))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(block_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
    )


SQL_WORD_COUNT = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 100
"""

# sentinel for per-block Misra-Gries error rows: split(' ') pieces can never
# contain the delimiter, so a leading space cannot collide with a real token
_MG_ERR_SENTINEL = " __mg_err__"


def q_heavy_hitters(sf_dir: str, k: int = 20, capacity: int = 4096):
    """EXACT top-k most frequent words via mergeable Misra-Gries summaries
    (Agarwal et al. 2013, "Mergeable summaries") — same result as
    ``word_count`` but a fundamentally different 100-TB execution strategy:
    the vocabulary never shuffles.

    q_word_count shuffles one row per DISTINCT word per block (vocab-sized
    exchange — fine for bounded vocabularies, quadratic pain for web-scale
    token soup).  Here each block emits an MG summary of ≤ ``capacity``
    (word, lower_bound) rows built from its exact value_counts by
    subtracting the (capacity+1)-th largest count (per-block error e_b ≤
    N_b/(capacity+1)), plus one sentinel row carrying e_b.  One
    summary-sized groupby merges them (MG merge = counter sum; errors add:
    E = Σ e_b).  Candidates with merged lower bound ≥ kth_lo − E are then
    EXACT-counted in a second read whose shuffle carries only candidate
    rows (``pc.is_in`` probe against the broadcast candidate set).

    Exactness proof enforced at runtime: ≥ k words have true count ≥
    kth_lo, so the k-th exact count c_k ≥ kth_lo; every excluded candidate
    has true count ≤ lo + E < kth_lo ≤ c_k (strict — ties cannot flip);
    every never-summarized word has true count ≤ E.  If E < c_k the result
    is provably the exact global top-k; otherwise (adversarially flat
    distribution / tiny capacity) fall back to the full vocab-sized
    groupby, which is always exact.  Both the candidate set and the
    summary table are guarded by BROADCAST_MAX_ROWS with the same
    fallback."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["text"])

    def _tokens(t: pa.Table) -> pa.Array:
        words = pc.list_flatten(
            pc.split_pattern(t["text"].combine_chunks(), " "))
        return words.filter(pc.not_equal(words, ""))

    def _full_exact():
        def block_counts(t: pa.Table) -> pa.Table:
            vc = _tokens(t).value_counts()
            return pa.table({
                "word": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            })

        return (
            docs.map_batches(block_counts, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "word"], descending=[True, False])
            .limit(k)
        )

    def block_mg(t: pa.Table) -> pa.Table:
        vc = _tokens(t).value_counts()
        w = vc.field("values")
        c = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) > capacity:
            off = int(np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1])
            keep = c > off
            w = w.filter(pa.array(keep))
            lo = c[keep] - off
        else:
            off = 0
            lo = c
        return pa.table({
            "word": pa.concat_arrays(
                [pc.cast(w, pa.string()),
                 pa.array([_MG_ERR_SENTINEL], pa.string())]),
            "lo": pa.array(np.concatenate([lo, [off]]).astype(np.int64)),
        })

    merged = (
        docs.map_batches(block_mg, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("lo", alias_name="lo"))
        .materialize()  # summary-sized: ≤ capacity × blocks (+1 sentinel)
    )
    if merged.count() == 0:  # empty corpus: Ray's empty groupby loses schema
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    if merged.count() > BROADCAST_MAX_ROWS:
        return _full_exact()

    def _strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["word"], _MG_ERR_SENTINEL))

    sent = merged.map_batches(
        lambda t: t.filter(pc.equal(t["word"], _MG_ERR_SENTINEL)),
        batch_format="pyarrow").to_pandas()
    err_total = int(sent["lo"].sum()) if len(sent) else 0
    cand_all = merged.map_batches(_strip, batch_format="pyarrow")
    top_lo = cand_all.sort("lo", descending=True).limit(k).to_pandas()
    if not len(top_lo):
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    kth_lo = int(top_lo["lo"].min())
    thr = kth_lo - err_total  # candidates that could still reach top-k
    cands_ds = cand_all.map_batches(
        lambda t, _thr=thr: t.filter(
            pc.greater_equal(t["lo"], pa.scalar(_thr, pa.int64()))),
        batch_format="pyarrow").materialize()
    if cands_ds.count() > BROADCAST_MAX_ROWS:  # guard BEFORE the driver pull
        return _full_exact()
    cands = cands_ds.to_pandas()
    cand_ref = ray.put(pa.array(cands["word"].to_numpy(), pa.string()))

    def exact_counts(t: pa.Table) -> pa.Table:
        words = _tokens(t)
        words = words.filter(pc.is_in(words, value_set=ray.get(cand_ref)))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    topk = (
        docs.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
        .to_pandas()  # k rows
    )
    if err_total > 0 and (len(topk) < k or err_total >= int(topk["n"].min())):
        # never-summarized words are only bounded by E = err_total: with
        # fewer than k provable rows, or E ≥ c_k, the pruned pass is not
        # provably exact — take the always-exact path.  (E == 0 means no
        # block ever dropped a word, so the counted set IS the vocabulary
        # restricted to the threshold and the proof holds even under k.)
        return _full_exact()
    return topk.reset_index(drop=True)


SQL_HEAVY_HITTERS = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def q_semi_join(sf_dir: str, threshold: float = 300_000.0):
    """Distributed semi-join (EXISTS / IN-subquery): customers with at least
    one order above the threshold (J3's complement — the Bloom anti-probe
    pattern, inverted).

    The key set is reduced distributed (per-block ``unique`` combiner →
    groupby), broadcast ONCE via ``ray.put`` when under the size guard and
    probed with vectorized ``np.isin``; above the guard it falls back to the
    native shuffle ``Dataset.join``."""
    import ray

    def block_keys(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater(t["o_totalprice"], threshold))
        return pa.table({"o_custkey": pc.unique(hit["o_custkey"].combine_chunks())})

    keys_ds = (
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(block_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
        .materialize()  # count() below + the probe/join both consume it
    )
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    if keys_ds.count() > BROADCAST_MAX_ROWS:
        return cust.join(
            keys_ds, join_type="inner", num_partitions=16,
            on=("c_custkey",), right_on=("o_custkey",),
        ).select_columns(["c_custkey", "c_acctbal"])

    keys = np.sort(keys_ds.to_pandas()["o_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    def probe(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), k)
        return t.filter(pa.array(mask))

    return cust.map_batches(probe, batch_format="pyarrow")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def q_pivot_status(sf_dir: str):
    """Pivot via conditional aggregation: one row per order priority, one
    revenue column per order status — the wide-table reshape done as masked
    integer-cents partial sums inside map_batches (grid-exact, association-
    order-free) + ONE narrow groupby."""
    from ray.data.aggregate import Count, Sum

    statuses = ("F", "O", "P")

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        cols = {"o_orderpriority": t["o_orderpriority"]}
        for s in statuses:
            cols[f"cents_{s.lower()}"] = pa.array(np.where(st == s, cents, 0))
        return pa.table(cols)

    return (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("cents_f", alias_name="cents_f"),
            Sum("cents_o", alias_name="cents_o"),
            Sum("cents_p", alias_name="cents_p"),
            Count(alias_name="n_orders"),
        )
        .to_pandas()
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_p,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def q_rollup_orders(sf_dir: str):
    """ROLLUP multi-level aggregate: (priority, status) → (priority) → ()
    from ONE fine-grained shuffle; the coarser levels re-merge the ≤15-row
    partial table on the driver instead of rescanning the input — the
    partial-reuse pattern every profile/drift aggregate here is built on."""
    from ray.data.aggregate import Count, Sum

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "o_orderstatus": t["o_orderstatus"],
            "cents": pa.array(cents),
        })

    base = (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("cents", alias_name="sum_cents"), Count(alias_name="n"))
        .to_pandas()
    )
    lvl1 = base.groupby("o_orderpriority", as_index=False)[["sum_cents", "n"]].sum()
    lvl1["o_orderstatus"] = "ALL"
    lvl0 = pd.DataFrame({
        "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
        "sum_cents": [base["sum_cents"].sum()], "n": [base["n"].sum()],
    })
    cols = ["o_orderpriority", "o_orderstatus", "sum_cents", "n"]
    return pd.concat([base[cols], lvl1[cols], lvl0[cols]], ignore_index=True)


SQL_ROLLUP_ORDERS = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       count(*) AS n
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_value_histogram(sf_dir: str, width: float = 25_000.0):
    """Fixed-width histogram of order totals with per-bin min/max — the
    binned-distribution primitive behind the PSI/KS drift verdicts (A6),
    driver-facing.  Bin ids via double divide + floor (bit-identical in
    numpy and DuckDB); min/max are exact data values, so no float-reduction
    ordering can flip the hash gate."""
    from ray.data.aggregate import Count, Max, Min

    def bin_col(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array(np.floor(v / width).astype(np.int64)),
            "o_totalprice": t["o_totalprice"],
        })

    return (
        _rp(sf_dir, "orders", ["o_totalprice"])
        .map_batches(bin_col, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Count(alias_name="n"),
            Min("o_totalprice", alias_name="min_total"),
            Max("o_totalprice", alias_name="max_total"),
        )
    )


SQL_VALUE_HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin, count(*) AS n,
       min(o_totalprice) AS min_total, max(o_totalprice) AS max_total
FROM orders GROUP BY bin
"""


def q_supplier_quantiles(sf_dir: str):
    """Per-group multi-quantile (p25/p50/p75/p95) in one bucketized grouped
    pass — the exact-quantile generalization of `median_price` (A3/A6: the
    reference's robust per-vendor percentiles, requirements.md:127).

    Discrete quantile = sorted value at 0-based index ceil(q·n)−1, matching
    DuckDB ``quantile_disc`` exactly (verified empirically) — an exact data
    value, immune to interpolation/rounding drift."""
    QS = (0.25, 0.5, 0.75, 0.95)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % 64))

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_suppkey", "l_extendedprice"], kind="mergesort")
        keys = df["l_suppkey"].to_numpy()
        vals = df["l_extendedprice"].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lens = np.diff(np.r_[starts, len(keys)])
        out = {"l_suppkey": keys[starts]}
        for q in QS:
            idx = starts + np.ceil(q * lens).astype(np.int64) - 1
            out[f"p{int(q * 100)}"] = vals[idx]
        return pd.DataFrame(out)

    return (
        _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(quantiles, batch_format="pandas")
        .select_columns(["l_suppkey", "p25", "p50", "p75", "p95"])
    )


SQL_SUPPLIER_QUANTILES = """
SELECT l_suppkey,
       quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.50) AS p50,
       quantile_disc(l_extendedprice, 0.75) AS p75,
       quantile_disc(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_suppkey
"""


def q_dedup_components(sf_dir: str, max_iters: int = 50):
    """Connected components over the exact n-gram Jaccard near-dup graph —
    dedup CLUSTERING (entity resolution): every document labeled with the
    smallest doc_id reachable through near-dup edges (J ≥ 0.8).

    Edges come from the exact PPJoin near-dup query (`ngram_jaccard_pairs`,
    itself oracle-checked); component labels are computed by DISTRIBUTED
    min-label propagation — per round: symmetric-edge ``Dataset.join``
    against the label table, union, per-node min.  Convergence is detected
    by the label-sum fixpoint (min-labels decrease monotonically, so an
    unchanged integer sum ⇔ no label changed — one cheap aggregate instead
    of a diff join per round).  Near-dup clusters are shallow, so the first
    rounds are plain neighbor-min (one join each); from round 3 a
    pointer-doubling self-join (label ← label[label]) is unioned in, making
    total rounds O(log diameter) for pathological chained corpora
    (templated docs with incremental drift) instead of O(diameter).
    Correctness: label values are always within-component doc_ids ≥ the
    component min and monotonically decreasing, so adding the label-of-label
    candidate preserves the fixpoint (= per-component min) and the sum-based
    convergence test.  The loop iterates ONLY over edge-touched nodes (labels
    of untouched docs cannot change — they union back in identity form at
    the end), so each round shuffles the near-dup SUBGRAPH, not the whole
    corpus.  Label tables stay Datasets end-to-end — no driver union-find."""
    import ray.data as rd
    from ray.data.aggregate import Min

    labels = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: pa.table({
                "doc_id": pc.cast(
                    t.filter(pc.is_valid(t["text"]))["doc_id"], pa.int64()
                ),
            }),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "component": t["doc_id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # edges stay a DATASET end to end (pulling the pair list to the driver
    # would be O(edges) driver state — the round-1 scale sin class)
    edges_ds = _ngram_pairs_dataset(sf_dir)

    def symmetric(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = edges_ds.map_batches(symmetric, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return labels

    # propagate only over edge-touched nodes: identity labels of untouched
    # docs can never change, so they skip every round's join/shuffle
    sub = (
        edges.select_columns(["src"])
        .groupby("src").count()
        .map_batches(
            lambda t: pa.table({"doc_id": t["src"], "component": t["src"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = None
    converged = False
    for it in range(max_iters):
        nbr = (
            edges.join(
                sub, join_type="inner", num_partitions=8,
                on=("src",), right_on=("doc_id",),
            )
            .select_columns(["dst", "component"])
            .rename_columns({"dst": "doc_id"})
        )
        cand = sub.union(nbr)
        if it >= 2:
            # pointer doubling: every label value is itself an edge-touched
            # doc_id present in `sub`, so label[label[v]] resolves via an
            # inner self-join; union it as one more min-candidate
            hop = (
                sub.join(
                    sub.map_batches(
                        lambda t: pa.table(
                            {"cdoc": t["doc_id"], "parent": t["component"]}),
                        batch_format="pyarrow",
                    ),
                    join_type="inner", num_partitions=8,
                    on=("component",), right_on=("cdoc",),
                )
                .map_batches(
                    lambda t: pa.table(
                        {"doc_id": t["doc_id"], "component": t["parent"]}),
                    batch_format="pyarrow",
                )
            )
            cand = cand.union(hop)
        sub = (
            cand.groupby("doc_id")
            .aggregate(Min("component", alias_name="component"))
            .materialize()
        )
        # empty hash partitions emit zero-column blocks that break the
        # next round's join FieldRef resolution — strip them (refs only)
        sub = _drop_empty_blocks(sub) or sub
        s = sub.sum("component")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # silent exit would hand wrong labels to dedup_corpus / the CLI
        # keep-list; a chain with diameter > max_iters must fail loudly
        raise RuntimeError(
            f"dedup_components: min-label propagation did not converge in "
            f"{max_iters} rounds (graph diameter exceeds budget); raise "
            f"max_iters"
        )
    sub = sub.select_columns(["doc_id", "component"]).materialize()

    # untouched docs keep their identity label; touched ids are
    # output-sized, so probe with a guarded broadcast (join fallback)
    import ray

    if sub.count() <= BROADCAST_MAX_ROWS:
        touched_ref = ray.put(np.sort(
            sub.to_pandas()["doc_id"].to_numpy().astype(np.int64)))

        def untouched(t: pa.Table) -> pa.Table:
            w = ray.get(touched_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(ids, w)))

        rest = labels.map_batches(untouched, batch_format="pyarrow")
    else:
        rest = labels.join(
            sub.map_batches(
                lambda t: pa.table({"tid": t["doc_id"]}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=8,
            on=("doc_id",), right_on=("tid",),
        ).map_batches(
            lambda t: t.filter(pc.is_null(t["tid"])).select(
                ["doc_id", "component"]),
            batch_format="pyarrow",
        )
    return rest.union(sub)


SQL_DEDUP_COMPONENTS = """
WITH RECURSIVE
e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
),
pairs AS (
  SELECT a, b FROM (
    SELECT a.doc_id AS a, b.doc_id AS b,
           len(list_intersect(a.grams, b.grams)) AS inter,
           len(a.grams) AS na, len(b.grams) AS nb
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE inter * 5 >= 4 * (na + nb - inter)
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM g
  UNION
  SELECT edg.dst, reach.r FROM reach JOIN edges edg ON reach.node = edg.src
)
SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
"""


def q_left_join_counts(sf_dir: str):
    """Native LEFT OUTER shuffle join with null-fill: every customer and
    its order count, 0 when no orders match (outer-join semantics — the
    complement of the inner `join_native`)."""
    from ray.data.aggregate import Count

    orders_base = _rp(sf_dir, "orders", ["o_custkey"])
    cust_base = _rp(sf_dir, "customer", ["c_custkey"])
    counts = orders_base.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"))
    joined = cust_base.join(
        counts, join_type="left_outer",
        num_partitions=_join_parts(orders_base, cust_base),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(t["n_orders"], pa.int64()), 0)
        return pa.table({"c_custkey": t["c_custkey"], "n_orders": n})

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_LEFT_JOIN_COUNTS = """
SELECT c_custkey, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
ON c_custkey = o_custkey
"""


def q_priority_topk(sf_dir: str, k: int = 5):
    """Per-group top-k with PARTIAL top-k pushdown (K1/K5 generalized
    beyond top-1): each block keeps only its k best rows per group inside
    map_batches, so the shuffle moves O(k · groups · blocks) rows — never
    the full table — and the per-group finalize picks the k best of the
    partials.  Deterministic total order (value desc, key asc) so ties
    can't flip the hash gate."""

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True], kind="mergesort",
            )
            .groupby("o_orderpriority", sort=False)
            .head(k)
        )

    return (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
        .map_batches(topk, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(topk, batch_format="pandas")
        .select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])
    )


SQL_PRIORITY_TOPK = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 5
"""


def q_order_gap_days(sf_dir: str):
    """LAG window: per order, whole days since the same customer's previous
    order (-1 for the first) — the navigation-window companion to
    q_running_total's cumulative frame.  Bucket shuffle on customer hash →
    within-bucket (customer, date, key) sort → vectorized grouped diff.
    Order dates are midnight-aligned timestamps, so the day diff is an exact
    integer on both engines (DuckDB date_diff counts boundary crossings)."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        d = df.groupby("o_custkey", sort=False)["o_orderdate"].diff()
        df["gap_days"] = d.dt.days.fillna(-1).astype(np.int64)
        return df[["o_orderkey", "gap_days"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
        .select_columns(["o_orderkey", "gap_days"])
    )


SQL_ORDER_GAP_DAYS = """
SELECT o_orderkey,
       COALESCE(date_diff('day',
         lag(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate), -1) AS gap_days
FROM orders
"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE multi-level aggregate over (returnflag, linestatus):
    all four grouping levels from ONE fine-grained shuffle; the coarser
    levels (flag-only, status-only, grand total) re-merge the ≤6-row partial
    table — integer-cents sums, so every re-aggregation is association-order
    exact (the rollup pattern completed to the full lattice)."""
    from ray.data.aggregate import Count, Sum

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pa.array(cents),
        })

    base = (
        _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("cents", alias_name="qty_cents"), Count(alias_name="n"))
        .to_pandas()
    )
    lvl_f = base.groupby("l_returnflag", as_index=False)[["qty_cents", "n"]].sum()
    lvl_f["l_linestatus"] = "ALL"
    lvl_s = base.groupby("l_linestatus", as_index=False)[["qty_cents", "n"]].sum()
    lvl_s["l_returnflag"] = "ALL"
    lvl0 = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "qty_cents": [base["qty_cents"].sum()], "n": [base["n"].sum()],
    })
    cols = ["l_returnflag", "l_linestatus", "qty_cents", "n"]
    return pd.concat(
        [base[cols], lvl_f[cols], lvl_s[cols], lvl0[cols]], ignore_index=True
    )


SQL_CUBE_ORDERS = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       count(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_full_outer_join(sf_dir: str):
    """Native FULL OUTER shuffle join with genuine unmatched rows on BOTH
    sides: per-customer urgent-order counts ⟗ per-user purchase-event
    counts on customer-key = user-id (user ids are a subset of customer
    keys, and urgent-order filtering drops customers — so the result mixes
    matched, left-only and right-only rows, all COALESCE-filled)."""
    from ray.data.aggregate import Count

    orders_base = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    events_base = _rp(sf_dir, "events", ["user_id", "event_type"])
    left = (
        orders_base
        .filter(expr="o_orderpriority == '1-URGENT'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_urgent"))
    )
    right = (
        events_base
        .filter(expr="event_type == 'purchase'")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_purchases"))
    )
    joined = left.join(
        right, join_type="full_outer",
        num_partitions=_join_parts(orders_base, events_base),
        on=("o_custkey",), right_on=("user_id",),
    )

    def fill(t: pa.Table) -> pa.Table:
        # Ray's outer join already coalesces the key into the left column
        return pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "n_urgent": pc.fill_null(pc.cast(t["n_urgent"], pa.int64()), 0),
            "n_purchases": pc.fill_null(pc.cast(t["n_purchases"], pa.int64()), 0),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_FULL_OUTER_JOIN = """
SELECT CAST(COALESCE(o.k, e.k) AS BIGINT) AS key,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_urgent,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_purchases
FROM (SELECT o_custkey AS k, count(*) AS n FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) o
FULL OUTER JOIN
     (SELECT user_id AS k, count(*) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY 1) e
ON o.k = e.k
"""


def q_string_agg_statuses(sf_dir: str):
    """Ordered string aggregation (LISTAGG/string_agg): per customer, the
    '|'-joined sequence of order statuses in (date, key) order — the
    sequence-building groupby used for session/path features.  Bucket
    shuffle on customer hash keeps whole customers co-located; the join is
    a per-customer reduce inside the bucket, never a cross-bucket merge."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def joinseq(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        out = (
            df.groupby("o_custkey", sort=False)["o_orderstatus"]
            .agg("|".join)
            .reset_index()
        )
        out.columns = ["o_custkey", "status_seq"]
        return out

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(joinseq, batch_format="pandas")
        .select_columns(["o_custkey", "status_seq"])
    )


SQL_STRING_AGG_STATUSES = """
SELECT o_custkey,
       string_agg(o_orderstatus, '|' ORDER BY o_orderdate, o_orderkey) AS status_seq
FROM orders GROUP BY o_custkey
"""


def q_intersect_users(sf_dir: str):
    """INTERSECT set operation: users that appear in BOTH the click and the
    purchase event streams — done as masked per-type flags + ONE groupby
    max (no second scan, no distinct-union shuffle), the cheapest
    distributed form of a set intersection over one table."""
    from ray.data.aggregate import Max

    def project(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "is_click": pa.array((et == "click").astype(np.int64)),
            "is_purchase": pa.array((et == "purchase").astype(np.int64)),
        })

    return (
        _rp(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("is_click", alias_name="has_click"),
            Max("is_purchase", alias_name="has_purchase"),
        )
        .filter(expr="has_click == 1 and has_purchase == 1")
        .select_columns(["user_id"])
    )


SQL_INTERSECT_USERS = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_mode_event_type(sf_dir: str):
    """Per-group mode (most frequent value, deterministic lexicographic
    tiebreak): the arg-max-by-count aggregate.  One fine (user, type)
    groupby count, then a per-block top-1 partial so the second shuffle
    moves at most one row per user per block, finished per user inside a
    hash bucket (the priority_topk pushdown specialized to k=1)."""
    from ray.data.aggregate import Count

    n_buckets = 64

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("user_id", sort=False).head(1)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    return (
        _rp(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        .map_batches(top1, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top1, batch_format="pandas")
        .select_columns(["user_id", "event_type", "n"])
    )


SQL_MODE_EVENT_TYPE = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (
           PARTITION BY user_id ORDER BY count(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def q_global_rank(sf_dir: str, k: int = 8):
    """GLOBAL row_number + NTILE over the whole table — the one window shape
    no per-key cogroup can express (every prior window partitions by a key).
    Distributed pattern: (1) one cheap aggregate pass for min/max/count,
    (2) value-range bucketing (equal values always share a bucket, so
    cross-bucket ties are impossible), (3) exact per-bucket counts →
    driver-side exclusive prefix-sum over ≤256 small integers, (4) per-bucket
    local sort + offset.  Nothing larger than the 256-row count table ever
    leaves the workers; at scale the two data passes stream.  A production
    variant would pick boundaries from a quantile sketch for balance — the
    ranks are exact regardless of boundary placement."""
    from ray.data.aggregate import Count, Max, Min

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    stats = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"), Count())
    lo = float(stats["min(o_totalprice)"])
    hi = float(stats["max(o_totalprice)"])
    n = int(stats["count()"])
    n_bins = 256
    width = (hi - lo) / n_bins or 1.0

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.clip(((hi - v) / width).astype(np.int64), 0, n_bins - 1)
        return t.append_column("bin", pa.array(b))

    counts = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(counts["c"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(counts["bin"], cum)}
    # SQL NTILE(k): the first n % k tiles get ceil(n/k) rows, the rest floor
    q_, r_ = divmod(n, k)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        )
        rn = offsets[int(df["bin"].iloc[0])] + np.arange(1, len(df) + 1)
        if q_ == 0:
            tile = rn
        else:
            big = r_ * (q_ + 1)
            tile = np.where(
                rn <= big,
                (rn - 1) // (q_ + 1) + 1,
                r_ + (rn - big - 1) // q_ + 1,
            )
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "rn": rn.astype(np.int64),
            "tile": tile.astype(np.int64),
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_GLOBAL_RANK = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
       CAST(ntile(8) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS tile
FROM orders
"""


def q_shipping_priority(sf_dir: str, cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3-shaped multi-way join aggregate: customer(filter segment)
    ⋈ orders(filter date) ⋈ lineitem(filter date) → per-order revenue →
    global top-k.  Scale shape: lineitem is PRE-AGGREGATED to one row per
    orderkey before any join (the combiner cuts the big side ~4×); both
    joins are native hash-shuffle joins on the same key family; the final
    top-k uses the per-block-partial pushdown so only O(k·blocks) rows reach
    the driver.  Revenue as exact integer: cents(extprice) × (100 −
    pct(discount)) — association-order-proof int64 sums."""
    from ray.data.aggregate import Sum

    cut = pa.scalar(np.datetime64(cutoff, "us"), pa.timestamp("us"))

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        ext = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pct = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue_cents": pa.array(ext * (100 - pct)),
        })

    li_base = _rp(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    n_parts = _join_parts(li_base)
    revenue = (
        li_base
        .map_batches(li_project, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def o_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], cut))
        return t.select(["o_orderkey", "o_custkey", "o_orderpriority"])

    orders = _rp(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_project, batch_format="pyarrow")

    def c_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar("BUILDING")))
        return t.select(["c_custkey"])

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        c_project, batch_format="pyarrow"
    )

    # The customer restriction applies as a guarded-broadcast semi-join so
    # the lazy plan holds at most ONE shuffle join (two joins in one plan
    # can starve each other's actor pools on small CPU reservations); above
    # the guard the filtered-orders side is materialized between the joins.
    import ray

    if cust.count() <= BROADCAST_MAX_ROWS:
        keys_ref = ray.put(np.sort(cust.to_pandas()["c_custkey"].to_numpy()))

        def probe(t: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), k)
            return t.filter(pa.array(mask))

        orders_f = orders.map_batches(probe, batch_format="pyarrow")
    else:
        orders_f = orders.join(
            cust, join_type="inner", num_partitions=n_parts,
            on=("o_custkey",), right_on=("c_custkey",),
        ).materialize()

    joined = revenue.join(
        orders_f, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(k)

    out = (
        joined.select_columns(["l_orderkey", "o_orderpriority", "revenue_cents"])
        .map_batches(topk, batch_format="pandas")
        .to_pandas()
    )
    return topk(out).reset_index(drop=True)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderpriority, revenue_cents FROM (
  SELECT l.l_orderkey, o.o_orderpriority,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l.l_orderkey, o.o_orderpriority
) ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
"""


def q_except_users(sf_dir: str):
    """EXCEPT set op (complement of q_intersect_users): (user, day) pairs
    with a click but no purchase that day.  Single-scan shape — masked
    per-type flags, one groupby max, then a vectorized filter; no second
    scan, no anti-join shuffle."""
    from ray.data.aggregate import Max

    def flags(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.floor_temporal(t["ts"], unit="day"),
            "has_a": pc.cast(pc.equal(et, pa.scalar("click")), pa.int8()),
            "has_b": pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int8()),
        })

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["has_a"], pa.scalar(1, pa.int8())),
                    pc.equal(t["has_b"], pa.scalar(0, pa.int8())))
        t = t.filter(m)
        # µs resolution to match DuckDB's date_trunc dtype exactly
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.cast(t["day"], pa.timestamp("us")),
        })

    return (
        _rp(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(flags, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Max("has_a", alias_name="has_a"), Max("has_b", alias_name="has_b"))
        .map_batches(keep, batch_format="pyarrow")
    )


SQL_EXCEPT_USERS = """
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'purchase'
"""


def q_dense_rank(sf_dir: str):
    """Per-group DENSE_RANK (ties share a rank, no gaps): each order ranked
    within its customer by totalprice descending.  Bucket cogroup on the
    customer hash — the same skew-proof shape as q_order_gap_days — with the
    rank computed by a grouped vectorized pandas rank (dense), which is
    tie-stable, so no tiebreak column is needed for hash-gate determinism."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(c % n_buckets))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        r = (
            df.groupby("o_custkey", sort=False)["o_totalprice"]
            .rank(method="dense", ascending=False)
            .astype(np.int64)
        )
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "drank": r.to_numpy(),
        })

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank, batch_format="pandas")
        .select_columns(["o_orderkey", "drank"])
    )


SQL_DENSE_RANK = """
SELECT o_orderkey,
       CAST(dense_rank() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS drank
FROM orders
"""


def _token_counts(txt: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row count of non-empty whitespace tokens (0 for null text) —
    vectorized: split → flatten with parent indices → bincount."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    split = pc.split_pattern(txt, " ")
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(split)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return np.bincount(parents[nonempty], minlength=len(txt)).astype(np.int64)


def q_stratified_sample(sf_dir: str, k: int = 10):
    """Deterministic stratified sampling: every k-th document per ``lang``
    stratum in doc_id order (training-data subsampling with per-stratum
    quotas).

    Scale shape: a per-stratum GLOBAL rank without ever materializing a
    stratum in one task — (1) one aggregate pass for the doc_id range,
    (2) (lang, doc_id-range-bin) counts → driver exclusive prefix-sum over
    ≤ strata × 256 small integers, (3) per-(lang, bin) local sort + offset
    → rank % k filter.  Equal doc_ids can't straddle bins (ids unique), so
    ranks are exact; both data passes stream."""
    from ray.data.aggregate import Count, Max, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:  # empty table → empty sample
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "lang": pd.Series(dtype="str")})
    lo = int(stats["min(doc_id)"])
    hi = int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((v - lo) // width, 0, n_bins - 1).astype(np.int64)
        return t.append_column("bin", pa.array(b))

    counts = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .count()
        .to_pandas()
        .sort_values(["lang", "bin"])
    )
    offsets = {}
    for lang, g in counts.groupby("lang", sort=False):
        cum = np.concatenate([[0], np.cumsum(g["count()"].to_numpy())[:-1]])
        for b, o in zip(g["bin"], cum):
            offsets[(lang, int(b))] = int(o)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        base = offsets[(df["lang"].iloc[0], int(df["bin"].iloc[0]))]
        rn = base + np.arange(len(df))
        keep = (rn % k) == 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "lang": df["lang"].to_numpy()[keep],
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents)
WHERE (rn - 1) % 10 = 0
"""


def q_token_shards(sf_dir: str, budget: int = 10_000):
    """Token-budget corpus sharding (sequence-packing precursor): walk the
    corpus in doc_id order and assign each document to the shard whose
    token budget its EXCLUSIVE prefix-sum falls in — how a training
    pipeline splits a corpus into ~budget-token output files.

    Scale shape: a global ordered prefix-sum, distributed exactly like
    q_global_rank — doc_id-range bins, per-bin token sums, driver prefix
    over ≤256 ints, per-bin local cumsum + offset.  No sort, no
    whole-corpus materialization; token counting is Arrow-vectorized."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:  # empty table → empty sharding
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "shard": pd.Series(dtype="int64")})
    lo = int(stats["min(doc_id)"])
    hi = int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((ids - lo) // width, 0, n_bins - 1).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(_token_counts(t["text"])),
            "bin": pa.array(b),
        })

    rows = ds.map_batches(tok_rows, batch_format="pyarrow")
    bin_sums = (
        rows.groupby("bin").aggregate(Sum("tokens", alias_name="t"))
        .to_pandas().sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(bin_sums["t"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(bin_sums["bin"], cum)}

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        tok = df["tokens"].to_numpy()
        excl = offsets[int(df["bin"].iloc[0])] + np.cumsum(tok) - tok
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "tokens": tok,
            "shard": (excl // budget).astype(np.int64),
        })

    return rows.groupby("bin").map_groups(finalize, batch_format="pandas")


SQL_TOKEN_SHARDS = """
SELECT doc_id, tokens,
       CAST(COALESCE(sum(tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 10000 AS BIGINT) AS shard
FROM (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents)
"""


def q_term_doc_freq(sf_dir: str, k: int = 100):
    """Vocabulary statistics: per-term document frequency (distinct docs
    containing the term) + total term frequency, top-k by df — the idf
    table every TF-IDF / quality-filter pipeline derives first.

    Scale shape: documents are one row each, so per-block (doc, term)
    DISTINCT pairs are exact without any shuffle — dictionary-encode the
    token stream, np.unique over (row << 32 | code) — and each block emits
    vocab-sized (term, df, tf) partials; one narrow groupby sums them."""
    from ray.data.aggregate import Sum

    def block_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = enc.dictionary
        tf = np.bincount(codes, minlength=len(terms))
        pair = np.unique((parents.astype(np.int64) << np.int64(32)) | codes)
        df_ = np.bincount(pair & np.int64(0xFFFFFFFF), minlength=len(terms))
        return pa.table({
            "term": terms,
            "df": pa.array(df_.astype(np.int64)),
            "tf": pa.array(tf.astype(np.int64)),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(block_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("tf", alias_name="tf"))
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
    )


SQL_TERM_DOC_FREQ = """
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS tf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY df DESC, term
LIMIT 100
"""


def _repetition_block_stats(t: pa.Table, max_dup_pct: int,
                            guard: int = 2**62) -> pa.Table:
    """Per-batch kernel for :func:`q_repetition_filter` (module-level so
    the overflow-fallback path is unit-testable with ``guard=0``)."""
    t = t.filter(pc.is_valid(t["text"]))
    txt = t["text"].combine_chunks()
    split = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    n_grams = np.maximum(lens - 1, 0)
    n_distinct = np.zeros(len(t), dtype=np.int64)
    if int(n_grams.sum()) > 0:
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.list_flatten(split).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        # gram j = (codes[j], codes[j+1]) where both positions sit in the
        # same doc
        same = parents[:-1] == parents[1:]
        gp = parents[:-1][same]
        c1, c2 = codes[:-1][same], codes[1:][same]
        n_docs = np.int64(len(t))
        if V > 0 and n_docs * V * V < np.int64(guard):
            key = (gp * V + c1) * V + c2
            uniq = np.unique(key)
            n_distinct = np.bincount(
                (uniq // (V * V)).astype(np.int64), minlength=len(t)
            ).astype(np.int64)
        elif V > 0:  # vocab² would overflow int64 — lexsort boundary count
            order = np.lexsort((c2, c1, gp))
            g, a, b = gp[order], c1[order], c2[order]
            new = np.ones(len(g), dtype=bool)
            new[1:] = (g[1:] != g[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            n_distinct = np.bincount(g[new], minlength=len(t)).astype(np.int64)
    n_dup = n_grams - n_distinct
    keep = (n_dup * 100 <= max_dup_pct * n_grams).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_grams": pa.array(n_grams),
        "n_distinct": pa.array(n_distinct),
        "n_dup": pa.array(n_dup),
        "keep": pa.array(keep),
    })


def q_repetition_filter(sf_dir: str, max_dup_pct: int = 5):
    """Gopher-style within-document repetition filter: per doc, the count
    of word-2-grams, distinct word-2-grams, duplicated 2-grams, and an
    integer keep verdict (duplicate fraction ≤ ``max_dup_pct``%) — the
    standard "drop template/spam pages that repeat themselves" quality
    gate a pre-training cleaning pipeline runs after per-token stats.

    Semantics pinned for the oracle: tokens are the RAW space split
    (empties kept — adjacency must match SQL's string_split), a 2-gram is
    every consecutive token pair, the verdict is pure integer arithmetic
    (``n_dup * 100 <= max_dup_pct * n_grams``; 0-gram docs keep).

    Scale shape: embarrassingly parallel — one map_batches pass, one
    doc-sized output row per input row, nothing shuffled.  Per batch the
    kernel is fully vectorized: dictionary-encode the flattened token
    stream once, pack each (doc, gram) into one int64 key (guarded
    against vocab² overflow with a lexsort fallback) and count distincts
    with a single np.unique."""
    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: _repetition_block_stats(t, max_dup_pct),
            batch_format="pyarrow",
        )
    )


SQL_REPETITION_FILTER = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
e AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
        FROM t)
),
s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct
  FROM e GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.n_distinct, 0) AS n_distinct,
       COALESCE(s.n_grams - s.n_distinct, 0) AS n_dup,
       CAST(CASE WHEN COALESCE(s.n_grams - s.n_distinct, 0) * 100
                      <= 5 * COALESCE(s.n_grams, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM t LEFT JOIN s ON t.doc_id = s.doc_id
"""


def q_kmeans_clusters(sf_dir: str, k: int = 8, sample_cap: int = 20_000):
    """K-means document clustering over the embedding column: fit k
    centroids on a bounded sample (driver-side Lloyd, deterministic seed —
    functions/ann.py::kmeans_fit, the IVF coarse quantizer), then assign
    the full corpus in a streaming map_batches pass and report per-cluster
    sizes + exact integer centroid-similarity sums.  The sample is capped,
    the assignment broadcast the k×dim centroid matrix once via ray.put —
    at 100 TB only the sample and the k-row result ever leave the workers.
    No SQL oracle (iterative algorithm); gated by determinism + coverage
    tests."""
    from ray.data.aggregate import Count, Sum

    from sievedata.functions.ann import (
        embedding_matrix, kmeans_fit, make_ivf_assign_fn,
    )

    import ray

    sample = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .limit(sample_cap)
        .to_pandas()
    )
    if len(sample) == 0:
        # empty-table convention (stratified_sample, token_shards, …):
        # np.vstack over [] raises — return a typed empty frame instead
        return pd.DataFrame({
            "cluster": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "sim_micro": pd.Series([], dtype="int64"),
        })
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in sample["embedding"]])
    cent_ref = ray.put(kmeans_fit(mat, k))

    def to_stats(t: pa.Table) -> pa.Table:
        # cluster col appended by the assign fn; similarity to own centroid
        # summed as integer 1e-6 units (order-insensitive exact reduce)
        return pa.table({
            "cluster": t["cluster"],
            "sim_micro": pa.array(
                np.round(
                    t["sim"].to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)),
        })

    assign = make_ivf_assign_fn(cent_ref)

    def assign_with_sim(t: pa.Table) -> pa.Table:
        out = assign(t)
        emb = embedding_matrix(t.column("embedding"))
        emb = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        cent = ray.get(cent_ref)
        cl = out["cluster"].to_numpy(zero_copy_only=False)
        sim = np.einsum("ij,ij->i", emb, cent[cl])
        return out.append_column("sim", pa.array(sim))

    return (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(assign_with_sim, batch_format="pyarrow")
        .map_batches(to_stats, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Count(alias_name="n"), Sum("sim_micro", alias_name="sim_micro"))
        .sort("cluster")
    )


def q_union_ids(sf_dir: str):
    """Distributed UNION (distinct) across two DIFFERENT tables: event
    user ids ∪ order customer keys — ``Dataset.union`` concatenates the
    streams without a barrier, then one groupby dedups.  The third set-op
    sibling (INTERSECT/EXCEPT above run single-scan over one table; UNION
    across tables genuinely needs the concat + distinct shuffle)."""

    def ev_ids(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t["user_id"].combine_chunks())})

    def od_ids(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t["o_custkey"].combine_chunks())})

    ev = _rp(sf_dir, "events", ["user_id"]).map_batches(
        ev_ids, batch_format="pyarrow")
    od = _rp(sf_dir, "orders", ["o_custkey"]).map_batches(
        od_ids, batch_format="pyarrow")
    return ev.union(od).groupby("id").count().select_columns(["id"])


SQL_UNION_IDS = """
SELECT user_id AS id FROM events
UNION
SELECT o_custkey AS id FROM orders
"""


def q_approx_quantiles(sf_dir: str, width: float = 1000.0):
    """Approximate quantiles from a MERGEABLE fixed-width histogram sketch
    — the streaming/scale path beside the exact sorted-offset quantiles
    (supplier_quantiles).  Per-block integer bin counts merge exactly
    (order-insensitive), the sketch is O(value-range/width) regardless of
    row count, and the estimate (lower edge of the first bin whose
    cumulative count reaches ⌈p·n/100⌉) is deterministic with error ≤
    one bin width.  Bin ids use the same bit-exact double floor-divide as
    the PSI/KS drift bins, so the SQL oracle reproduces the estimator
    EXACTLY — an approximate sketch with an exact correctness gate."""

    def bin_counts(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.floor(v / width).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(uniq), "c": pa.array(cnt)})

    from ray.data.aggregate import Sum

    bins = (
        _rp(sf_dir, "orders", ["o_totalprice"])
        .map_batches(bin_counts, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()          # sketch-sized: O(range/width) rows
    )
    if len(bins) == 0:  # empty table (groupby loses the schema) → 0 rows
        return pd.DataFrame({"p": pd.Series(dtype="int64"),
                             "approx": pd.Series(dtype="float64")})
    bins = bins.sort_values("bin")
    cum = np.cumsum(bins["c"].to_numpy())
    n = int(cum[-1])
    out_p, out_a = [], []
    for p in (25, 50, 75, 95):
        need = np.ceil(p * n / 100.0)
        idx = int(np.searchsorted(cum, need))
        out_p.append(p)
        out_a.append(float(bins["bin"].iloc[idx]) * width)
    return pd.DataFrame({"p": pd.array(out_p, dtype="int64"),
                         "approx": pd.array(out_a, dtype="float64")})


SQL_APPROX_QUANTILES = """
WITH bins AS (
  SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS b, count(*) AS c
  FROM orders GROUP BY b),
tot AS (SELECT sum(c) AS n FROM bins),
cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM bins),
ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (25), (50), (75), (95)) AS t(p))
SELECT p, min(b) * 1000.0 AS approx
FROM ps, cum, tot
WHERE cc >= ceil(p * n / 100.0)
GROUP BY p
"""


def q_decontaminate(sf_dir: str, modulus: int = 97, threshold: int = 50,
                    n: int = 5):
    """Benchmark decontamination: flag training documents whose distinct
    char n-gram overlap with a held-out 'benchmark' set (docs with
    doc_id % modulus == 0) reaches ``threshold`` — the canonical
    pre-training hygiene pass (strip eval-set contamination from the
    corpus).

    Scale shape: the benchmark gram set is DISTINCT-aggregated
    distributed (vocab-sized output), broadcast once via ray.put as a
    sorted packed-uint64 array, and every training doc probes it with one
    searchsorted over its own distinct grams — no join, no per-row Python.
    Grams are length-tagged packed bytes (kernels/grams.py), lossless for
    ASCII; a non-ASCII corpus or an over-guard vocabulary falls back to a
    distributed string-gram join with identical semantics."""
    import ray

    from ray.data.aggregate import Count

    from sievedata.kernels import grams as G

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def bench_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids % modulus) == 0))
        txt = t["text"].combine_chunks()
        if G.is_ascii(txt):
            _, gram, _ = G.distinct_grams_packed(txt, n)
            return pa.table({"gram": G.packed_to_strings(np.unique(gram), n)})
        grams: set[str] = set()  # exact scalar path for a non-ASCII batch
        for tx in txt.to_pylist():
            if tx is not None:
                grams |= {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    bench = (docs.map_batches(bench_gram_rows, batch_format="pyarrow")
             .groupby("gram").count()
             .materialize())  # vocab-sized
    out_cols = ("doc_id", "n_overlap")
    if bench.count() == 0:  # no benchmark docs → nothing can be contaminated
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_overlap": pd.Series(dtype="int64")})
    if bench.count() <= _NGRAM_VOCAB_BROADCAST_LIMIT:
        bdf = bench.to_pandas()
        grams_str = pa.array(bdf["gram"].to_numpy(), pa.string())
        if G.is_ascii(grams_str):
            _, packed, _ = G.distinct_grams_packed(grams_str, n)
            # one gram per "doc" row ⇒ the packed set IS the distinct set
            bench_ref = ray.put(np.unique(packed))

            def probe(t: pa.Table) -> pa.Table:
                bg = ray.get(bench_ref)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                keep_train = (ids % modulus) != 0
                t = t.filter(pa.array(keep_train))
                ids = ids[keep_train]
                txt = t["text"].combine_chunks()
                if G.is_ascii(txt):
                    doc_idx, gram, _ = G.distinct_grams_packed(txt, n)
                    pos = np.searchsorted(bg, gram)
                    pos[pos >= len(bg)] = len(bg) - 1 if len(bg) else 0
                    hit = bg[pos] == gram if len(bg) else np.zeros(
                        len(gram), bool)
                    cnt = np.bincount(doc_idx[hit], minlength=len(txt))
                else:  # exact scalar fallback for a non-ASCII batch
                    bset = set(G.packed_to_strings(bg, n).to_pylist())
                    cnt = np.array([
                        len({tx[i: i + n]
                             for i in range(max(len(tx) - n + 1, 1))} & bset)
                        if tx is not None else 0
                        for tx in txt.to_pylist()], dtype=np.int64)
                keep = cnt >= threshold
                return pa.table({
                    "doc_id": pa.array(ids[keep]),
                    "n_overlap": pa.array(cnt[keep].astype(np.int64)),
                })

            return docs.map_batches(probe, batch_format="pyarrow")

    # fallback: distributed string-gram join (non-ASCII corpus or a
    # benchmark vocabulary too large to broadcast)
    def train_gram_rows(t: pa.Table) -> pa.Table:
        ids_np = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids_np % modulus) != 0))
        ids_np = ids_np[(ids_np % modulus) != 0]
        txt = t["text"].combine_chunks()
        if G.is_ascii(txt):
            doc_idx, gram, _ = G.distinct_grams_packed(txt, n)
            return pa.table({
                "doc_id": pa.array(ids_np[doc_idx]),
                "gram": G.packed_to_strings(gram, n),
            })
        out_id, out_g = [], []
        for d, tx in zip(ids_np, txt.to_pylist()):
            if tx is None:
                continue
            for g in {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}:
                out_id.append(int(d))
                out_g.append(g)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gram": pa.array(out_g, pa.string())})

    joined = (docs.map_batches(train_gram_rows, batch_format="pyarrow")
              .join(bench.select_columns(["gram"]), join_type="inner",
                    num_partitions=16, on=("gram",))
              .groupby("doc_id").aggregate(Count(alias_name="n_overlap")))
    return joined.filter(expr=f"n_overlap >= {threshold}").select_columns(
        list(out_cols))


SQL_DECONTAMINATE = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
bench AS (
  SELECT DISTINCT substr(text, i::INT, 5) AS g FROM e WHERE doc_id % 97 = 0),
dg AS (
  SELECT DISTINCT doc_id, substr(text, i::INT, 5) AS g
  FROM e WHERE doc_id % 97 <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM dg JOIN bench USING (g)
GROUP BY doc_id
HAVING count(*) >= 50
"""


def q_dedup_corpus(sf_dir: str):
    """End-to-end corpus deduplication keep-list: exact-Jaccard near-dup
    edges → connected components → keep each component's min-doc_id
    representative (plus docs with no text, which have no dedup basis),
    reporting each survivor's group size — the composition a training-data
    pipeline actually runs before tokenization.

    All stages are the already-oracle-checked distributed operators
    (PPJoin edges, min-label propagation); the survivor selection is ONE
    component-size groupby — the min-label IS a member doc_id, so the
    (component, size) aggregate already names each survivor and the old
    reps-filter + hash join were redundant (provably identical output,
    two exchanges and two materializations fewer)."""
    comps = q_dedup_components(sf_dir)  # (doc_id, component)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["component"], pa.int64()),
            "group_size": pc.cast(t["count()"], pa.int64()),
        })

    sizes = comps.groupby("component").count().materialize()
    sizes = _drop_empty_blocks(sizes) or sizes  # zero-column empty blocks
    kept = sizes.map_batches(project, batch_format="pyarrow")

    def null_text_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["text"]))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "group_size": pa.array([1] * t.num_rows, pa.int64()),
        })

    no_basis = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        null_text_rows, batch_format="pyarrow")
    return kept.union(no_basis)


SQL_DEDUP_CORPUS = """
WITH RECURSIVE
e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
),
pairs AS (
  SELECT a, b FROM (
    SELECT a.doc_id AS a, b.doc_id AS b,
           len(list_intersect(a.grams, b.grams)) AS inter,
           len(a.grams) AS na, len(b.grams) AS nb
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  ) WHERE inter * 5 >= 4 * (na + nb - inter)
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM g
  UNION
  SELECT edg.dst, reach.r FROM reach JOIN edges edg ON reach.node = edg.src
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, count(*) AS group_size FROM comp GROUP BY component)
SELECT c.doc_id, CAST(s.group_size AS BIGINT) AS group_size
FROM comp c JOIN sizes s USING (component)
WHERE c.doc_id = c.component
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS group_size
FROM documents WHERE text IS NULL
"""


def q_pii_scan(sf_dir: str, patterns: dict | None = None):
    """Vectorized regex PII scan + redaction over the document corpus —
    the distributed generalization of the reference's PII-stripped export
    (S10, `app/main.py` mask/hash fields): count matches of each sensitive
    pattern per doc and emit the redacted text for docs with any hit.

    Patterns are RE2 on BOTH sides (Arrow's ``count_substring_regex`` /
    ``replace_substring_regex`` and DuckDB's regexp functions are all
    RE2-backed), so non-overlap/leftmost-match semantics agree exactly.
    The default patterns are email/long-digit shapes plus a word-class
    probe that actually fires on the synthetic corpus (it contains no
    digits); the operator takes arbitrary patterns.

    Scale shape: pure map_batches — no shuffle, no state; the only
    non-streaming step is the final sort of the (hit-only) output."""
    pats = patterns or {
        "n_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "n_digits": r"[0-9]{6,}",
        "n_entity": r"\b(customer|vendor|account)\b",
    }
    redact = "|".join(f"(?:{p})" for p in pats.values())

    def scan(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        cols = {"doc_id": t["doc_id"]}
        total = np.zeros(len(t), dtype=np.int64)
        for name, pat in pats.items():
            c = pc.count_substring_regex(txt, pat).to_numpy(zero_copy_only=False)
            c = c.astype(np.int64)
            cols[name] = pa.array(c)
            total += c
        cols["redacted"] = pc.replace_substring_regex(txt, redact, "[REDACTED]")
        out = pa.table(cols)
        return out.filter(pa.array(total > 0))

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(scan, batch_format="pyarrow")
        .sort("doc_id")
    )


SQL_PII_SCAN = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_digits,
       CAST(len(regexp_extract_all(text, '\b(customer|vendor|account)\b')) AS BIGINT) AS n_entity,
       regexp_replace(text,
         '(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})|(?:[0-9]{6,})|(?:\b(?:customer|vendor|account)\b)',
         '[REDACTED]', 'g') AS redacted
FROM documents
WHERE text IS NOT NULL AND n_email + n_digits + n_entity > 0
ORDER BY doc_id
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top term by TF-IDF (whitespace tokens, idf =
    ln(N/df)) — the ranking layer over :func:`q_term_doc_freq`'s idf
    table; every keyword-extraction / relevance pipeline's first step.

    Two passes: (1) the term_doc_freq kernel aggregates the global
    (term → df) table (vocab-sized partials per block, one narrow
    groupby); (2) a stateless map_batches re-tokenizes each doc, computes
    per-(doc, term) tf via one np.unique over dictionary codes, scores
    tf·ln(N/df) and takes the per-doc argmax with an exact (score DESC,
    term ASC) tie-break.  The df table is broadcast via ray.put under the
    BROADCAST_MAX_ROWS guard; a vocab larger than the guard raises (at
    that point the right design is a term-bucketed join, as
    q_decontaminate's fallback does for grams).

    Output columns are integers + the term string — the float score is
    only an internal ORDER BY, computed as the identical double expression
    (CAST BIGINT tf × ln on doubles) on both engines."""
    import ray
    from ray.data.aggregate import Sum

    def df_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parents = flat.filter(pa.array(keep)), parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = np.unique((parents.astype(np.int64) << np.int64(32)) | codes)
        df_ = np.bincount(pair & np.int64(0xFFFFFFFF), minlength=len(enc.dictionary))
        n_docs = pc.sum(pc.is_valid(t["text"]).cast(pa.int64())).as_py() or 0
        out = pa.table({
            "term": enc.dictionary,
            "df": pa.array(df_.astype(np.int64)),
            "n_docs": pa.array(np.full(len(enc.dictionary), 0, dtype=np.int64)),
        })
        # ride the doc count along as one sentinel row ('' never survives
        # the keep filter above, so it cannot collide with a real term)
        sentinel = pa.table({
            "term": pa.array([""], pa.string()),
            "df": pa.array([0], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
        })
        return pa.concat_tables([out, sentinel])

    df_tbl = (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"))
        .materialize()  # vocab-sized; consumed twice (count + pull)
    )
    if df_tbl.count() > BROADCAST_MAX_ROWS:
        raise NotImplementedError(
            "vocab exceeds broadcast guard — use a term-bucketed join "
            "(q_decontaminate fallback shape)"
        )
    dfp = df_tbl.to_pandas()
    n_total = int(dfp.loc[dfp["term"] == "", "n_docs"].sum())
    dfp = dfp[dfp["term"] != ""]
    df_ref = ray.put((
        np.asarray(dfp["term"], dtype=object),
        dfp["df"].to_numpy(np.int64),
        n_total,
    ))

    def top_term(t: pa.Table) -> pa.Table:
        terms_g, df_g, n_docs = ray.get(df_ref)
        order = np.argsort(terms_g, kind="mergesort")
        terms_sorted, df_sorted = terms_g[order], df_g[order]
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parents = flat.filter(pa.array(keep)), parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        local_terms = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        pair, tf = np.unique(
            (parents.astype(np.int64) << np.int64(32)) | codes, return_counts=True
        )
        rows = (pair >> np.int64(32)).astype(np.int64)
        tcode = (pair & np.int64(0xFFFFFFFF)).astype(np.int64)
        pos = np.searchsorted(terms_sorted, local_terms[tcode])
        dfv = df_sorted[pos]
        score = tf.astype(np.float64) * np.log(np.float64(n_docs) / dfv)
        # per-doc argmax with (score DESC, term ASC) tie-break: lexsort is
        # stable, last key dominates
        ord_ = np.lexsort((local_terms[tcode], -score, rows))
        first = np.unique(rows[ord_], return_index=True)[1]
        pick = ord_[first]
        docs = t["doc_id"].take(pa.array(rows[pick]))
        return pa.table({
            "doc_id": docs,
            "top_term": pa.array(local_terms[tcode[pick]].tolist(), pa.string()),
            "tf": pa.array(tf[pick].astype(np.int64)),
            "df": pa.array(dfv[pick]),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(top_term, batch_format="pyarrow")
        .sort("doc_id")
    )


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text IS NOT NULL
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok2),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                    tf.term
         ) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term AS top_term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM scored WHERE rn = 1
ORDER BY doc_id
"""


def q_multi_distinct(sf_dir: str):
    """COUNT(DISTINCT a, b) per group — multi-column distinct cardinality
    (distinct (part, supplier) combinations per returnflag), the exact
    companion to A5's single-column uniqueness checks.

    Scale shape: per-block distinct (flag, part<<32|supp) partials via one
    np.unique (the term_doc_freq idiom) collapse each block to its local
    distinct pairs before any shuffle; one groupby on the composite key
    dedups globally; the final per-flag count aggregates a 3-row table."""
    from ray.data.aggregate import Count

    def block_distinct(t: pa.Table) -> pa.Table:
        flag = t["l_returnflag"].combine_chunks().dictionary_encode()
        fcodes = flag.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        part = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = np.int64(len(flag.dictionary))
        key = (part << np.int64(32) | supp) * nf + fcodes
        uniq = np.unique(key)
        return pa.table({
            "l_returnflag": flag.dictionary.take(pa.array(uniq % nf)),
            "pair_key": pa.array(uniq // nf),
        })

    return (
        _rp(sf_dir, "lineitem", ["l_returnflag", "l_partkey", "l_suppkey"])
        .map_batches(block_distinct, batch_format="pyarrow")
        .groupby(["l_returnflag", "pair_key"])
        .count()
        .groupby("l_returnflag")
        .count()
        .map_batches(
            lambda t: pa.table({
                "l_returnflag": t["l_returnflag"],
                "n_pairs": t["count()"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort("l_returnflag")
    )


SQL_MULTI_DISTINCT = """
SELECT l_returnflag,
       CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def _doc_token_chunks(t: pa.Table, width: int):
    """Shared kernel: split ``text`` into space tokens (empties dropped) and
    join every ``width`` consecutive tokens per doc into one chunk string.

    Returns (doc_ids_per_chunk:int64 ndarray, chunks:pa.StringArray).
    Fully vectorized: one split, one boundary mask, one ``pc.binary_join``
    over a rebuilt list array — no per-token python."""
    t = t.filter(pc.is_valid(t["text"]))
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    split = pc.split_pattern(t["text"].combine_chunks(), " ")
    flat = pc.list_flatten(split)
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep].astype(np.int64)
    n_tok = len(parents)
    if n_tok == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    # within-doc token position (parents are non-decreasing after flatten)
    doc_start = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
    starts_per_tok = np.repeat(doc_start, np.diff(np.r_[doc_start, n_tok]))
    pos = np.arange(n_tok, dtype=np.int64) - starts_per_tok
    ci = pos // width
    # chunk boundary where the doc or the chunk index changes
    new_chunk = np.r_[True, (parents[1:] != parents[:-1]) | (ci[1:] != ci[:-1])]
    offsets = np.r_[np.flatnonzero(new_chunk), n_tok]
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    chunks = pc.binary_join(lists, " ")
    chunk_docs = doc_ids[parents[offsets[:-1]]]
    return chunk_docs, chunks


_DUP_CHUNK_BROADCAST_LIMIT = 2_000_000  # duplicated chunks; ~tens of MB


def q_chunk_dedup(sf_dir: str, width: int = 8):
    """Cross-corpus duplicated-chunk filter (Lee et al. substring-dedup at
    non-overlapping ``width``-token chunk granularity): a chunk is
    duplicated when its exact token string occurs ≥2 times anywhere in the
    corpus; per doc report chunk counts and keep = no duplicated chunk.

    Scale shape: pass 1 pre-aggregates per-block (chunk, cnt) partials
    (value_counts before any shuffle), one groupby sums them and keeps only
    cnt≥2 survivors — the DUPLICATED set, tiny for organic corpora — which
    broadcasts under a guard (probe = one ``pc.index_in`` per batch, exact
    string match); above the guard a distributed (doc, chunk)⋈dups join
    computes the same counts.  The token stream itself never shuffles on
    the fast path."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def chunk_partials(t: pa.Table) -> pa.Table:
        _, chunks = _doc_token_chunks(t, width)
        vc = pa.table({"chunk": chunks}).group_by("chunk").aggregate(
            [("chunk", "count")])
        return pa.table({
            "chunk": vc["chunk"],
            "cnt": vc["chunk_count"].cast(pa.int64()),
        })

    dups = (
        docs.map_batches(chunk_partials, batch_format="pyarrow")
        .groupby("chunk")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr="cnt >= 2")
        .materialize()  # duplicated-chunk set only (output-sized)
    )
    n_dups = dups.count()

    def finalize(doc_ids, chunks, hit) -> pa.Table:
        n_chunks = np.bincount(doc_ids[1], minlength=len(doc_ids[0]))
        n_dup = np.bincount(doc_ids[1][hit], minlength=len(doc_ids[0]))
        present = n_chunks > 0
        return pa.table({
            "doc_id": pa.array(doc_ids[0][present]),
            "n_chunks": pa.array(n_chunks[present].astype(np.int64)),
            "n_dup_chunks": pa.array(n_dup[present].astype(np.int64)),
            "keep": pa.array((n_dup[present] == 0).astype(np.int64)),
        })

    if n_dups <= _DUP_CHUNK_BROADCAST_LIMIT:
        if n_dups == 0:
            dup_arr = pa.array([], pa.string())
        else:
            dup_arr = pa.array(
                dups.to_pandas()["chunk"].to_numpy(), pa.string())
        dup_ref = ray.put(dup_arr)

        def probe(t: pa.Table) -> pa.Table:
            dup_set = ray.get(dup_ref)
            chunk_docs, chunks = _doc_token_chunks(t, width)
            # map chunk-doc ids back to batch-local row index for bincount
            uniq, inv = np.unique(chunk_docs, return_inverse=True)
            if len(dup_set):
                hit = pc.is_valid(pc.index_in(chunks, value_set=dup_set))
                hit = hit.to_numpy(zero_copy_only=False)
            else:
                hit = np.zeros(len(chunks), bool)
            return finalize((uniq, inv), chunks, hit)

        return docs.map_batches(probe, batch_format="pyarrow").sort("doc_id")

    # fallback: distributed join of (doc, chunk) instance rows against the
    # duplicated set, then per-doc counts merged with per-doc totals
    def instance_rows(t: pa.Table) -> pa.Table:
        chunk_docs, chunks = _doc_token_chunks(t, width)
        return pa.table({"doc_id": pa.array(chunk_docs), "chunk": chunks})

    inst = docs.map_batches(instance_rows, batch_format="pyarrow")
    from ray.data.aggregate import Count
    totals = inst.groupby("doc_id").aggregate(Count(alias_name="n_chunks"))
    dup_counts = (
        inst.join(dups.select_columns(["chunk"]), join_type="inner",
                  num_partitions=_join_parts(inst), on=("chunk",))
        .groupby("doc_id").aggregate(Count(alias_name="n_dup_chunks"))
    )
    joined = totals.join(dup_counts, join_type="left_outer",
                         num_partitions=_join_parts(totals), on=("doc_id",))

    def fill(t: pa.Table) -> pa.Table:
        nd = pc.fill_null(t["n_dup_chunks"], 0).combine_chunks().cast(pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chunks": t["n_chunks"].combine_chunks().cast(pa.int64()),
            "n_dup_chunks": nd,
            "keep": pc.cast(pc.equal(nd, 0), pa.int64()),
        })

    return joined.map_batches(fill, batch_format="pyarrow").sort("doc_id")


SQL_CHUNK_DEDUP = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS rn
  FROM documents
  WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY rn) - 1 AS p
  FROM tok WHERE tok <> ''
), chunks AS (
  SELECT doc_id, p // 8 AS ci, string_agg(tok, ' ' ORDER BY p) AS chunk
  FROM t2 GROUP BY doc_id, p // 8
), cnt AS (
  SELECT chunk, count(*) AS c FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(CASE WHEN sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM chunks c JOIN cnt USING (chunk)
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


_VOCAB_TF_BROADCAST_LIMIT = 4_000_000  # (term, tf) pairs


def q_token_rarity(sf_dir: str):
    """Per-doc token-rarity quality signal (the Gopher/C4 'fraction of rare
    words' filter, integer-exact): n_tokens, the sum of each token's GLOBAL
    corpus frequency (low sum/n ⇒ rare-word-heavy doc), and n_hapax (token
    positions whose term occurs exactly once in the corpus).

    Scale shape: pass 1 builds the global (term, tf) table from per-block
    value_counts partials (one narrow vocab-sized groupby); the vocabulary
    broadcasts under a guard and each batch scores via one ``pc.index_in``
    lookup + per-doc bincount sums; above the guard a distributed per-doc
    term-count join computes the same integers."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tok_rows(t: pa.Table):
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return doc_ids, flat.filter(pa.array(keep)), parents[keep]

    def tf_partials(t: pa.Table) -> pa.Table:
        _, flat, _ = tok_rows(t)
        vc = pa.table({"term": flat}).group_by("term").aggregate(
            [("term", "count")])
        return pa.table({
            "term": vc["term"],
            "tf": vc["term_count"].cast(pa.int64()),
        })

    vocab = (
        docs.map_batches(tf_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
        .materialize()  # vocab-sized
    )

    if vocab.count() <= _VOCAB_TF_BROADCAST_LIMIT:
        vdf = vocab.to_pandas()
        terms = pa.array(vdf["term"].to_numpy(), pa.string())
        tf_ref = ray.put((terms, vdf["tf"].to_numpy().astype(np.int64)))

        def score(t: pa.Table) -> pa.Table:
            terms_b, tf_b = ray.get(tf_ref)
            doc_ids, flat, parents = tok_rows(t)
            idx = pc.index_in(flat, value_set=terms_b)
            idx = idx.to_numpy(zero_copy_only=False)  # every term is in vocab
            tf_tok = tf_b[idx]
            n = len(doc_ids)
            n_tokens = np.bincount(parents, minlength=n)
            sum_tf = np.bincount(parents, weights=tf_tok.astype(np.float64),
                                 minlength=n).astype(np.int64)
            n_hapax = np.bincount(parents[tf_tok == 1], minlength=n)
            present = n_tokens > 0
            return pa.table({
                "doc_id": pa.array(doc_ids[present]),
                "n_tokens": pa.array(n_tokens[present].astype(np.int64)),
                "sum_tf": pa.array(sum_tf[present]),
                "n_hapax": pa.array(n_hapax[present].astype(np.int64)),
            })

        return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")

    # fallback: per-doc (term, n) count rows joined to the tf table — the
    # shuffle moves per-doc DISTINCT terms, not the token stream
    def doc_term_counts(t: pa.Table) -> pa.Table:
        doc_ids, flat, parents = tok_rows(t)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(len(enc.dictionary), 1)
        key = parents.astype(np.int64) * V + codes
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(doc_ids[(uniq // V).astype(np.int64)]),
            "term": enc.dictionary.take(pa.array(uniq % V)),
            "n": pa.array(counts.astype(np.int64)),
        })

    dtc = docs.map_batches(doc_term_counts, batch_format="pyarrow")
    joined = dtc.join(vocab, join_type="inner",
                      num_partitions=_join_parts(dtc), on=("term",))

    def partials(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n),
            "sum_tf": pa.array(n * tf),
            "n_hapax": pa.array(n * (tf == 1).astype(np.int64)),
        })

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("sum_tf", alias_name="sum_tf"),
                   Sum("n_hapax", alias_name="n_hapax"))
        .sort("doc_id")
    )


SQL_TOKEN_RARITY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok FROM tok WHERE tok <> ''
), tf AS (
  SELECT tok, count(*) AS tf FROM t2 GROUP BY tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf.tf) AS BIGINT) AS sum_tf,
       CAST(sum(CASE WHEN tf.tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM t2 JOIN tf USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


def q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003) at word-3-gram granularity, window w=4: per doc the shingle
    count, the DISTINCT window-min fingerprint count, and the min/max
    fingerprint values (order-insensitive integer summaries of the
    fingerprint set — the near-copy detection sketch MOSS uses).

    Embarrassingly parallel: ONE map_batches pass, no shuffle.  Shingle
    construction (``binary_join_element_wise`` over shifted token slices),
    window minima (``np.minimum`` over shifted hash slices — same-doc
    shingles are contiguous after the boundary filter) and per-doc dedup
    (lexsort + boundary diff) are Arrow/numpy vectorized; sha256 is the one
    per-shingle python loop (no Arrow kernel — the documented
    row_fingerprint trade).  Docs appear iff they have ≥1 full window
    (≥ 6 tokens)."""
    import hashlib

    K, W = 3, 4
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    _EMPTY = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_shingles": pa.array([], pa.int64()),
        "n_fp": pa.array([], pa.int64()),
        "fp_min": pa.array([], pa.int64()),
        "fp_max": pa.array([], pa.int64()),
    })

    def fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep].astype(np.int64)
        n_tok = len(parents)
        if n_tok < K:
            return _EMPTY
        # shingles: token positions p with p and p+K-1 in the same doc;
        # within a doc these are all positions start..end-K+1, contiguous
        m = n_tok - K + 1
        sh = pc.binary_join_element_wise(
            flat.slice(0, m), flat.slice(1, m), flat.slice(2, m), " ")
        ok = parents[:m] == parents[K - 1:]
        sh = sh.filter(pa.array(ok))
        sp = parents[:m][ok]
        if len(sp) < W:
            return _EMPTY
        h = np.fromiter(
            (int(hashlib.sha256(s).hexdigest()[:15], 16)
             for s in sh.cast(pa.binary()).to_pylist()),
            dtype=np.int64, count=len(sp))
        # full windows: shingle positions q with q and q+W-1 in the same doc
        nw = len(sp) - W + 1
        wok = sp[:nw] == sp[W - 1:]
        wm = h[:nw].copy()
        for off in range(1, W):
            np.minimum(wm, h[off:off + nw], out=wm)
        wm, wp = wm[wok], sp[:nw][wok]
        if not len(wm):
            return _EMPTY
        # distinct (doc, fingerprint) pairs via lexsort + boundary diff
        order = np.lexsort((wm, wp))
        wp, wm = wp[order], wm[order]
        first = np.r_[True, (wp[1:] != wp[:-1]) | (wm[1:] != wm[:-1])]
        wp, wm = wp[first], wm[first]
        starts = np.flatnonzero(np.r_[True, wp[1:] != wp[:-1]])
        ends = np.r_[starts[1:], len(wp)] - 1
        docs_out = wp[starts]
        n_sh = np.bincount(sp, minlength=len(doc_ids))[docs_out]
        return pa.table({
            "doc_id": pa.array(doc_ids[docs_out]),
            "n_shingles": pa.array(n_sh.astype(np.int64)),
            "n_fp": pa.array((ends - starts + 1).astype(np.int64)),
            "fp_min": pa.array(wm[starts]),   # sorted asc within doc
            "fp_max": pa.array(wm[ends]),
        })

    return docs.map_batches(fp, batch_format="pyarrow").sort("doc_id")


SQL_WINNOW_FINGERPRINTS = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS rn
  FROM documents
  WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY rn) AS p
  FROM tok WHERE tok <> ''
), sh AS (
  SELECT doc_id, p,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle,
         count(*) OVER (PARTITION BY doc_id) AS n_tok
  FROM t2 WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), h AS (
  SELECT doc_id, p, n_tok - 2 AS n_sh,
         CAST(concat('0x', substr(sha256(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh WHERE p <= n_tok - 2
), wm AS (
  SELECT doc_id, n_sh, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM h
), sel AS (
  SELECT DISTINCT doc_id, n_sh, m FROM wm WHERE p <= n_sh - 3
)
SELECT doc_id,
       CAST(max(n_sh) AS BIGINT) AS n_shingles,
       CAST(count(*) AS BIGINT) AS n_fp,
       min(m) AS fp_min,
       max(m) AS fp_max
FROM sel
GROUP BY doc_id
ORDER BY doc_id
"""


def q_posting_lists(sf_dir: str, cap: int = 5):
    """Inverted-index build (the S4 search-index sink as a first-class
    distributed materialization): per term its document frequency and a
    doc_id-ascending posting list CAPPED at ``cap`` entries (comma-joined —
    the impact-ordered prefix a search tier actually ships).

    Scale shape: per-block DISTINCT (term, doc_id) pairs via dictionary
    codes + one packed np.unique (the term_doc_freq combiner), ONE
    term-keyed shuffle of those distinct pairs, then a term-bucket cogroup
    that builds every posting string vectorized — lexsort boundaries, a
    rank<cap mask, and one ``pc.binary_join`` over a rebuilt list array; no
    per-term python.  map_groups granularity is the ~1k hash buckets, never
    the vocabulary."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = 512

    def distinct_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep].astype(np.int64)
        if not len(parents):
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tbucket": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(len(enc.dictionary), 1)
        key = parents * V + codes
        uniq = np.unique(key)
        terms = enc.dictionary.take(pa.array(uniq % V))
        from sievedata.sketches.hashing import hash64
        tb = (hash64(terms, seed=11) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "term": terms,
            "doc_id": pa.array(doc_ids[(uniq // V).astype(np.int64)]),
            "tbucket": pa.array(tb),
        })

    def build_postings(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"term": pd.Series(dtype=str),
                                 "df": pd.Series(dtype="int64"),
                                 "posting": pd.Series(dtype=str)})
        terms = df["term"].to_numpy()
        doc_ids = df["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc_ids, terms))
        terms, doc_ids = terms[order], doc_ids[order]
        starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
        counts = np.diff(np.r_[starts, len(terms)])
        # global rank within term (pairs are globally distinct, so the
        # cogroup sees each (term, doc) once)
        rank = np.arange(len(terms)) - np.repeat(starts, counts)
        m = rank < cap
        kept_counts = np.minimum(counts, cap)
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(kept_counts)], pa.int32()),
            pa.array(doc_ids[m].astype("U"), pa.string()))
        posting = pc.binary_join(lists, ",")
        return pd.DataFrame({
            "term": terms[starts],
            "df": counts.astype(np.int64),
            "posting": posting.to_pandas().to_numpy(),
        })

    return (
        docs.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(build_postings, batch_format="pandas")
        .sort("term")
    )


SQL_POSTING_LISTS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), dt AS (
  SELECT DISTINCT tok AS term, doc_id FROM tok WHERE tok <> ''
), ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
  FROM dt
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN r <= 5 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS posting
FROM ranked
GROUP BY term
ORDER BY term
"""


def q_quality_buckets(sf_dir: str, n_buckets: int = 10):
    """CCNet-style corpus quality bucketing: assign every document a decile
    bucket by its GLOBAL token-count percentile, tie-insensitive (equal
    token counts always share a bucket — `floor(n_buckets · rank_lt / N)`
    where rank_lt counts docs with STRICTLY smaller token counts).  This is
    the head/middle/tail split CCNet applies to its perplexity scores.

    Scale shape: rank_lt depends only on the doc's own token VALUE, so the
    whole window collapses to one value-domain histogram — per-block token
    counting (Arrow-vectorized), ONE narrow groupby over distinct token
    counts (bounded by max doc length, never corpus size), a driver-side
    exclusive prefix-sum over that tiny table, then a stateless broadcast
    searchsorted per batch.  No full-row shuffle or sort anywhere — cheaper
    than the q_global_rank bin pattern because no per-bin row cogroup is
    needed."""
    import ray
    from ray.data.aggregate import Count

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tok_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(_token_counts(t["text"])),
        })

    rows = docs.map_batches(tok_rows, batch_format="pyarrow")
    hist = (
        rows.groupby("tokens").aggregate(Count(alias_name="c")).to_pandas()
    )  # value-domain-bounded: one row per DISTINCT token count
    if not len(hist):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "bucket": pd.Series(dtype="int64")})
    hist = hist.sort_values("tokens")
    vals = hist["tokens"].to_numpy().astype(np.int64)
    counts = hist["c"].to_numpy().astype(np.int64)
    n_total = int(counts.sum())
    rank_lt = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ref = ray.put((vals, rank_lt))

    def bucketize(t: pa.Table) -> pa.Table:
        v, rl = ray.get(ref)
        tok = _token_counts(t["text"])
        lt = rl[np.searchsorted(v, tok)]
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(tok),
            "bucket": pa.array((n_buckets * lt // n_total).astype(np.int64)),
        })

    return docs.map_batches(bucketize, batch_format="pyarrow").sort("doc_id")


SQL_QUALITY_BUCKETS = """
WITH tok AS (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents
)
SELECT doc_id, tokens,
       CAST((10 * (rank() OVER (ORDER BY tokens) - 1))
            // count(*) OVER () AS BIGINT) AS bucket
FROM tok
ORDER BY doc_id
"""


def q_image_phash_dups(sf_dir: str, group_mod: int = 64, jitter_mod: int = 3):
    """Multimodal near-dup image grouping via 64-bit average-hash (aHash):
    synthesize one REAL image per document — 24-bit BMP for even ids, 8-bit
    PNG for odd (base image seeded by ``doc_id % group_mod``, then a
    per-doc uniform brightness shift of ``doc_id % jitter_mod`` — so group
    members are byte-DISTINCT payloads in MIXED container formats),
    decode → brightness-invariant aHash → hash-group.  Exact byte dedup
    cannot group these (different bytes, different containers); the
    perceptual hash groups them across formats, and ``distinct_payloads``
    proves it (1 ⇔ the group holds ≥2 different byte payloads).

    Scale shape: one map_batches decode+hash pass (per-row loop documented
    — binary codecs have no Arrow kernel; images are bounded 24×16), then
    ONE narrow groupby over 8-byte hash keys with integer aggregates.  At
    100 TB the payloads would arrive as a binary column; the synth step is
    the in-sandbox stand-in (no image libs / no binary testdata column)."""
    import hashlib

    from ray.data.aggregate import Count, Max, Min

    from sievedata.functions.codecs import (ahash64, bmp_decode, bmp_encode,
                                            png_decode, png_encode)
    from sievedata.functions.media import synth_bmp

    docs = _rp(sf_dir, "documents", ["doc_id"])

    def hash_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = np.empty(len(ids), np.int64)
        pk = np.empty(len(ids), np.int64)
        for i, d in enumerate(ids):
            img = bmp_decode(synth_bmp(int(d) % group_mod))
            img = np.clip(img.astype(np.int16) + int(d) % jitter_mod,
                          0, 255).astype(np.uint8)
            if int(d) % 2 == 0:
                payload = bmp_encode(img)
                decoded = bmp_decode(payload)
            else:
                payload = png_encode(img, filters=int(d) % 5)
                decoded = png_decode(payload)
            ph[i] = np.int64(np.uint64(ahash64(decoded)))
            pk[i] = np.frombuffer(
                hashlib.sha256(payload).digest()[:8], "<i8")[0]
        return pa.table({
            "phash": pa.array(ph),
            "payload_key": pa.array(pk),
            "doc_id": pa.array(ids),
        })

    agg = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("phash")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
            Min("payload_key", alias_name="_pk_min"),
            Max("payload_key", alias_name="_pk_max"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["n_docs"], 1)
        t = t.filter(keep)
        distinct = pc.cast(
            pc.not_equal(t["_pk_min"], t["_pk_max"]), pa.int64())
        return pa.table({
            "phash": t["phash"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "min_doc": t["min_doc"],
            "max_doc": t["max_doc"],
            "distinct_payloads": distinct,
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort("phash")


# --------------------------------------------------------------------------
# Data-mixing / corpus-statistics family (round 3)
# --------------------------------------------------------------------------

def q_domain_mixture(sf_dir: str):
    """Target-mixture domain resampling (training-data mixing, DoReMi-style
    reweighting made deterministic): source ``srcN`` gets target weight
    ``N + 1``; the corpus is scaled to the largest integer multiple the
    scarcest domain supports (``scale = min_s(count_s // w_s)``) and each
    source keeps its first ``scale·w_s`` docs in doc_id order.

    Scale shape: the quota table is one tiny groupby (≤ #sources rows on
    the driver); the per-source GLOBAL rank reuses the stratified-sample
    bin machinery — (source, doc_id-range-bin) counts → driver exclusive
    prefix over ≤ sources × 256 ints → per-bin local sort + offset filter.
    Both data passes stream; nothing domain-sized materializes."""
    from ray.data.aggregate import Max, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    counts = ds.groupby("source").count().to_pandas()
    if len(counts) == 0:  # empty table → typed empty result
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "source": pd.Series(dtype="str")})
    wt = {
        s: int("".join(ch for ch in s if ch.isdigit()) or 0) + 1
        for s in counts["source"]
    }
    scale = int((counts["count()"] // counts["source"].map(wt)).min())
    quota = {s: scale * w for s, w in wt.items()}

    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(stats["min(doc_id)"]), int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((v - lo) // width, 0, n_bins - 1).astype(np.int64)
        return t.append_column("bin", pa.array(b))

    bc = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["source", "bin"])
        .count()
        .to_pandas()
        .sort_values(["source", "bin"])
    )
    offsets = {}
    for src, g in bc.groupby("source", sort=False):
        cum = np.concatenate([[0], np.cumsum(g["count()"].to_numpy())[:-1]])
        for b, o in zip(g["bin"], cum):
            offsets[(src, int(b))] = int(o)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        src = df["source"].iloc[0]
        base = offsets[(src, int(df["bin"].iloc[0]))]
        keep = (base + np.arange(len(df))) < quota.get(src, 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "source": df["source"].to_numpy()[keep],
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["source", "bin"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DOMAIN_MIXTURE = """
WITH w AS (
  SELECT source, CAST(substr(source, 4) AS BIGINT) + 1 AS wt, count(*) AS cnt
  FROM documents GROUP BY source
), s AS (SELECT min(cnt // wt) AS scale FROM w),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.source
FROM r JOIN w USING (source) CROSS JOIN s
WHERE r.rn <= s.scale * w.wt
"""


def q_label_centroids(sf_dir: str):
    """Grouped vector aggregate over the embedding column: per-label
    centroid partial sums in integer microunits (k-means-style class
    centroids / per-domain embedding means).

    Exactness: each float32 component is widened to float64, scaled by 1e6
    and floored to an int64 — identical IEEE ops on both sides — so the
    cross-block SUM is an order-insensitive integer reduction (the engine
    convention for float aggregates under the driver's value-hash gate).
    Per block: one (labels × dims) np.add.at partial, so the shuffle moves
    O(labels · dims · blocks) rows, never the vectors."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s_micro": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dims = np.diff(np.asarray(col.offsets))
        d = int(dims[0])
        assert (dims == d).all(), "ragged embedding column"
        micro = np.floor(flat.astype(np.float64) * 1e6).astype(np.int64)
        mat = micro.reshape(n, d)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
            "s_micro": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "dim": pc.cast(t["dim"], pa.int64()),
            "s_micro": pc.cast(t["sum(s_micro)"], pa.int64()),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s_micro", alias_name="sum(s_micro)"),
                   Sum("n", alias_name="sum(n)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(i AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS s_micro,
       count(*) AS n
FROM (SELECT label, unnest(embedding) AS e,
             unnest(range(len(embedding))) AS i
      FROM embeddings)
GROUP BY label, i
"""


def q_ngram_diversity(sf_dir: str):
    """Per-language corpus n-gram diversity: total char-3-gram occurrences
    and DISTINCT 3-gram vocabulary size per ``lang`` (the distinct/total
    ratio is the standard templated-corpus health metric; emitted as the
    two exact integers so the gate never compares a float division).

    Scale shape: totals are pure length arithmetic (Σ max(len−2, 0), one
    lang-keyed integer groupby); the distinct side emits each block's
    per-(lang, gram) DISTINCT set via the packed-uint64 gram kernel + one
    np.unique over (lang_code << 27 | gram) keys, so the shuffle carries
    vocabulary-sized partials (≤ langs × |charset|³), never the token
    stream.  Non-ASCII blocks fall back to per-row Python gram sets with
    identical semantics."""
    from ray.data.aggregate import Sum

    from sievedata.kernels import grams as G

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def totals(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        ln = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        tot = np.maximum(ln.astype(np.int64) - 2, 0)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lang, return_inverse=True)
        return pa.table({
            "lang": pa.array(uniq),
            "total_grams": pa.array(np.bincount(inv, weights=tot,
                                                minlength=len(uniq)).astype(np.int64)),
        })

    def distinct_pairs(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        ln = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ln >= 3)
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "gram": pa.array([], pa.int64())})
        if len(keep) == 0:
            return empty
        txt = txt.take(pa.array(keep, pa.int64()))
        lang = t["lang"].to_numpy(zero_copy_only=False)[keep]
        luniq, linv = np.unique(lang, return_inverse=True)
        if G.is_ascii(txt):
            di, gram, _ = G.distinct_grams_packed(txt, 3)
            lcode = linv[di].astype(np.uint64)
        else:  # char-exact fallback: python gram sets per row
            rows_l, rows_g = [], []
            for i, s in enumerate(txt.to_pylist()):
                for g in {s[j:j + 3] for j in range(len(s) - 2)}:
                    rows_l.append(linv[i])
                    rows_g.append(hash(g) & ((1 << 27) - 1))
            lcode = np.asarray(rows_l, np.uint64)
            gram = np.asarray(rows_g, np.uint64)
        key = np.unique((lcode << np.uint64(27)) | gram)
        return pa.table({
            "lang": pa.array(luniq[(key >> np.uint64(27)).astype(np.int64)]),
            "gram": pa.array((key & np.uint64((1 << 27) - 1)).astype(np.int64)),
        })

    tot = (
        ds.map_batches(totals, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("total_grams", alias_name="sum(total_grams)"))
        .to_pandas()
    )
    dist = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["lang", "gram"])
        .count()
        .groupby("lang")
        .count()
        .to_pandas()
    )
    if len(tot) == 0:
        return pd.DataFrame({"lang": pd.Series(dtype="str"),
                             "total_grams": pd.Series(dtype="int64"),
                             "distinct_grams": pd.Series(dtype="int64")})
    out = tot.rename(columns={"sum(total_grams)": "total_grams"}).merge(
        dist.rename(columns={"count()": "distinct_grams"}), on="lang", how="left")
    # SQL's pos CTE has no rows for a lang whose docs are all len<3/NULL —
    # that lang must be absent, not a zero row
    out = out[out["total_grams"] > 0]
    out["distinct_grams"] = out["distinct_grams"].fillna(0).astype(np.int64)
    out["total_grams"] = out["total_grams"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


SQL_NGRAM_DIVERSITY = """
WITH pos AS (
  SELECT lang, text, unnest(generate_series(1, length(text) - 2)) AS i
  FROM documents WHERE length(text) >= 3
)
SELECT lang,
       count(*) AS total_grams,
       CAST(count(DISTINCT substr(text, i, 3)) AS BIGINT) AS distinct_grams
FROM pos GROUP BY lang ORDER BY lang
"""


def _mul_hash32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash mod 2**32, well-defined for any doc_id ≥ 0:
    the product is computed in uint64 so it wraps mod 2**64 (2**32 divides
    2**64, so the low 32 bits equal those of the exact product — no silent
    int64 overflow for doc_id ≳ 3.5e9), then returned as int64 (< 2**32).
    SQL mirror: CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296."""
    return ((ids.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296)).astype(np.int64)


def q_weighted_sample(sf_dir: str, k: int = 100):
    """Deterministic size-weighted corpus sampling: priority key
    ``((doc_id · 2654435761) mod 2³²) · 10⁶ ∕∕ n_chars`` (a multiplicative
    hash divided by the weight — larger docs draw smaller keys, the
    integer-exact analogue of Efraimidis–Spirakis exponential keys without
    any float op the oracle could disagree on); keep the k smallest keys,
    doc_id tiebreak.

    Scale shape: per-block k-best partial pushdown (each block contributes
    ≤ k rows) before the final sort+limit, so the exchange carries
    O(k · blocks) rows regardless of corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = nch > 0
        ids, nch = ids[m], nch[m]
        h = _mul_hash32(ids)
        wkey = (h * 1000000) // nch
        order = np.lexsort((ids, wkey))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "wkey": pa.array(wkey[order])})

    return (
        _rp(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .sort(["wkey", "doc_id"])
        .limit(k)
    )


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id,
       CAST((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296)
            * 1000000 // n_chars AS BIGINT) AS wkey
FROM documents WHERE n_chars > 0
ORDER BY wkey, doc_id LIMIT 100
"""


# --------------------------------------------------------------------------
# Web-corpus curation operators (round-4 additions)
# --------------------------------------------------------------------------

def q_domain_caps(sf_dir: str, cap: int = 15):
    """Per-domain document cap (the C4/RefinedWeb "max N pages per host"
    rule): keep at most ``cap`` docs per ``source``, chosen by a
    deterministic multiplicative-hash priority — a uniform within-domain
    sample rather than a doc_id-order prefix — with doc_id tiebreak; emit
    each kept row with its within-domain rank.

    Scale shape: every block first prunes itself to ≤ cap rows per source
    via one lexsort + run-boundary ranks (no per-key masks), so the
    exchange carries O(cap · sources_per_block · blocks) rows; the final
    selection is a hash-bucketed map_groups over ≤ 64 buckets — never a
    whole-corpus sort, and a hot domain costs cap rows per block, not its
    full page count."""
    from sievedata.sketches.hashing import hash64

    n_buckets = 64

    def _ranked_prefix(ids: np.ndarray, src: np.ndarray, k: int):
        pri = _mul_hash32(ids)
        order = np.lexsort((ids, pri, src))
        src_s = src[order]
        starts = np.flatnonzero(np.concatenate(([True], src_s[1:] != src_s[:-1])))
        pos = np.arange(len(src_s), dtype=np.int64)
        rank = pos - starts[np.searchsorted(starts, pos, side="right") - 1]
        keep = order[rank < k]
        return keep, (rank[rank < k] + 1)

    def partial(t: pa.Table) -> pa.Table:
        # NULL sources are unorderable under np.lexsort (None vs str);
        # drop them here and in the oracle's WHERE clause alike.
        t = t.filter(pc.is_valid(t["source"]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        keep, _ = _ranked_prefix(ids, src, cap)
        kept_src = src[keep]
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array(kept_src),
            "bucket": pa.array(hash64(pa.array(kept_src)).astype(np.int64)
                               % n_buckets),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        src = df["source"].to_numpy()
        keep, rn = _ranked_prefix(ids, src, cap)
        return pd.DataFrame({
            "doc_id": ids[keep],
            "source": src[keep],
            "rn": rn.astype(np.int64),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
        .select_columns(["doc_id", "source", "rn"])
    )


SQL_DOMAIN_CAPS = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
             ORDER BY CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296,
                      doc_id) AS rn
  FROM documents WHERE source IS NOT NULL)
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 15
"""


def q_hash_split(sf_dir: str):
    """Deterministic train/valid/test corpus split by doc_id hash (the
    standard leakage-safe split: membership is a pure function of the id,
    stable under re-runs and across workers) — emits per-split doc and
    char totals, the manifest row a curation pipeline writes next to each
    split.

    Scale shape: per-block integer partials (≤ 3 rows each) into one
    3-group aggregate; nothing but the manifest leaves the workers."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mul_hash32(ids) % 100
        split = np.where(h < 10, "test", np.where(h < 20, "valid", "train"))
        uniq, inv = np.unique(split, return_inverse=True)
        return pa.table({
            "split": pa.array(uniq),
            "n_docs": pa.array(np.bincount(inv, minlength=len(uniq))
                               .astype(np.int64)),
            "n_chars": pa.array(np.bincount(inv, weights=nch,
                                            minlength=len(uniq))
                                .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "split": t["split"],
            "n_docs": pc.cast(t["sum(n_docs)"], pa.int64()),
            "n_chars": pc.cast(t["sum(n_chars)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="sum(n_docs)"),
                   Sum("n_chars", alias_name="sum(n_chars)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_HASH_SPLIT = """
SELECT CASE
         WHEN CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 % 100 < 10
           THEN 'test'
         WHEN CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 % 100 < 20
           THEN 'valid'
         ELSE 'train' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY 1
"""


def q_pack_windows(sf_dir: str, window: int = 512):
    """Concat-and-chunk sequence packing (the LLM-pretraining step after
    dedup/filter): documents are concatenated in doc_id order and cut into
    fixed ``window``-token contexts; each doc reports the window span it
    lands in — first/last window id — so straddling docs (attention-mask
    boundaries) are visible.

    Scale shape: the global token prefix-sum is distributed exactly like
    q_token_shards — doc_id-range bins, per-bin token sums, a driver
    prefix over ≤ 256 ints, per-bin local cumsum + offset.  No sort and no
    whole-corpus materialization; the window span is pure arithmetic on
    the exclusive prefix."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "first_win": pd.Series(dtype="int64"),
                             "last_win": pd.Series(dtype="int64")})
    lo = int(stats["min(doc_id)"])
    hi = int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((ids - lo) // width, 0, n_bins - 1).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(_token_counts(t["text"])),
            "bin": pa.array(b),
        })

    rows = ds.map_batches(tok_rows, batch_format="pyarrow")
    bin_sums = (
        rows.groupby("bin").aggregate(Sum("tokens", alias_name="t"))
        .to_pandas().sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(bin_sums["t"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(bin_sums["bin"], cum)}

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        tok = df["tokens"].to_numpy().astype(np.int64)
        excl = offsets[int(df["bin"].iloc[0])] + np.cumsum(tok) - tok
        keep = tok > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "tokens": tok[keep],
            "first_win": (excl[keep] // window).astype(np.int64),
            "last_win": ((excl[keep] + tok[keep] - 1) // window).astype(np.int64),
        })

    return rows.groupby("bin").map_groups(finalize, batch_format="pandas")


SQL_PACK_WINDOWS = """
WITH tok AS (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents),
pre AS (
  SELECT doc_id, tokens,
         CAST(COALESCE(sum(tokens) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS excl
  FROM tok)
SELECT doc_id, tokens,
       excl // 512 AS first_win,
       (excl + tokens - 1) // 512 AS last_win
FROM pre WHERE tokens > 0
"""


def q_length_filter(sf_dir: str, qlo: float = 0.05, qhi: float = 0.95):
    """Exact global length-percentile band filter (the "drop the shortest
    and longest tails" curation rule): keep docs whose ``n_chars`` lies in
    [p5, p95], where the percentiles are EXACT discrete quantiles
    (sorted[ceil(q·n)−1], DuckDB's quantile_disc convention — verified
    index-by-index, see tests).

    Scale shape: the quantiles come from a value-domain histogram — each
    block emits (n_chars, count) partials via np.unique, one narrow
    groupby sums them, and the driver prefix-scans the ≤ |distinct
    lengths| rows (bounded by the value domain, not the corpus); the
    filter pass is then an embarrassingly-parallel map_batches.  No sort,
    no quantile sketch approximation."""
    import math

    from ray.data.aggregate import Sum

    def hist(t: pa.Table) -> pa.Table:
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(nch, return_counts=True)
        return pa.table({"n_chars": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hdf = (
        _rp(sf_dir, "documents", ["n_chars"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("n_chars").aggregate(Sum("cnt", alias_name="c"))
        .to_pandas()
    )
    if len(hdf) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_chars": pd.Series(dtype="int64")})
    hdf = hdf.sort_values("n_chars")
    vals = hdf["n_chars"].to_numpy()
    cum = np.cumsum(hdf["c"].to_numpy())
    n = int(cum[-1])

    def disc(q: float) -> int:
        rank = min(max(math.ceil(q * n) - 1, 0), n - 1)  # 0-based
        return int(vals[np.searchsorted(cum, rank + 1)])

    lo_v, hi_v = disc(qlo), disc(qhi)

    def band(t: pa.Table) -> pa.Table:
        nch = t["n_chars"]
        keep = pc.and_(pc.greater_equal(nch, lo_v), pc.less_equal(nch, hi_v))
        t = t.filter(keep)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": pc.cast(t["n_chars"], pa.int64())})

    return _rp(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        band, batch_format="pyarrow")


SQL_LENGTH_FILTER = """
WITH b AS (
  SELECT quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents)
SELECT doc_id, n_chars FROM documents, b WHERE n_chars BETWEEN lo AND hi
"""


def q_embedding_quantize(sf_dir: str):
    """Symmetric int8 embedding quantization audit (the memory-4× step
    before ANN serving): per vector, scale = max|v| ∕ 127, codes =
    ⌊v∕scale + ½⌋, and the max absolute reconstruction error — emitted as
    nano-unit integers so the gate compares exact values.  Every op is an
    identical elementwise IEEE double op on both sides (widen, divide,
    floor, multiply, subtract, abs, max) — no ordering-sensitive
    reduction.

    Scale shape: one zero-copy matrix per batch, pure row-wise numpy; no
    shuffle at all (the audit is embarrassingly parallel)."""
    from sievedata.functions.ann import embedding_matrix

    def audit(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "scale_nano": pa.array([], pa.int64()),
                             "max_err_nano": pa.array([], pa.int64())})
        vmax = np.abs(m).max(axis=1)
        keep = vmax > 0
        m, ids, vmax = m[keep], ids[keep], vmax[keep]
        scale = vmax / 127.0
        codes = np.floor(m / scale[:, None] + 0.5)
        err = np.abs(m - codes * scale[:, None]).max(axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "scale_nano": pa.array(np.floor(scale * 1e9).astype(np.int64)),
            "max_err_nano": pa.array(np.floor(err * 1e9).astype(np.int64)),
        })

    return _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        audit, batch_format="pyarrow")


SQL_EMBEDDING_QUANTIZE = """
WITH d AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
m AS (
  SELECT vec_id, max(abs(x)) AS vmax FROM d GROUP BY vec_id),
j AS (
  SELECT d.vec_id, d.x, m.vmax / 127 AS scale
  FROM d JOIN m USING (vec_id) WHERE m.vmax > 0)
SELECT vec_id,
       CAST(floor(any_value(scale) * 1000000000) AS BIGINT) AS scale_nano,
       CAST(floor(max(abs(x - floor(x / scale + 0.5) * scale))
                  * 1000000000) AS BIGINT) AS max_err_nano
FROM j GROUP BY vec_id
"""


def q_bpe_merge_candidates(sf_dir: str, k: int = 20):
    """First BPE merge step: corpus-wide counts of ADJACENT token pairs
    (the pair a byte-pair-encoding trainer would merge next), top-k by
    count with deterministic (t1, t2) tiebreak.

    Scale shape: each block dictionary-encodes its token stream once,
    forms adjacency pairs with pure offset arithmetic (a pair exists where
    two consecutive flat tokens share a parent doc), and emits
    vocab²-bounded (pair, n) partials via one np.unique — the shuffle
    carries pair-vocabulary rows, never the token stream; the final top-k
    is a sort over the summed pair vocabulary."""
    from ray.data.aggregate import Sum

    def pair_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        txt = t["text"].combine_chunks()
        if len(txt) == 0:
            return empty
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        if len(flat) < 2:
            return empty
        adj = parents[1:] == parents[:-1]
        if not adj.any():
            return empty
        left = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
        right = flat.slice(1).filter(pa.array(adj))
        pair = pc.binary_join_element_wise(left, right, "\x1f")
        uniq, cnt = np.unique(np.asarray(pair), return_counts=True)
        return pa.table({"pair": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    def project(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["pair"], "\x1f")
        return pa.table({
            "t1": pc.list_element(parts, 0),
            "t2": pc.list_element(parts, 1),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="sum(n)"))
        .map_batches(project, batch_format="pyarrow")
        .sort(["n", "t1", "t2"], descending=[True, False, False])
        .limit(k)
    )


SQL_BPE_MERGE_CANDIDATES = """
WITH tok AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents WHERE text IS NOT NULL),
idx AS (
  SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
  FROM tok WHERE len(ts) >= 2)
SELECT ts[i] AS t1, ts[i + 1] AS t2, count(*) AS n
FROM idx GROUP BY t1, t2
ORDER BY n DESC, t1, t2 LIMIT 20
"""


def q_dup_ratio_by_source(sf_dir: str):
    """Per-domain exact-duplicate ratio (boilerplate-host detector): for
    each ``source``, total docs and how many are byte-identical copies of
    another doc from the same source (n_docs − distinct texts) — the
    curation metric that decides which hosts get aggressive dedup.

    Scale shape: distinct-text counting is EXACT via a NATIVE
    (source, text) hash aggregate — per-block Arrow group_by pre-dedup
    combiner, one shuffle of the deduped (source, text) rows, then a
    source-keyed integer sum; no pandas group ever materializes a corpus
    fraction and the text column crosses the wire exactly once."""
    from ray.data.aggregate import Sum

    def block_dedup(t: pa.Table) -> pa.Table:
        # per-block (source, text) pre-dedup combiner before the shuffle
        t = t.filter(pc.is_valid(t["text"]))
        return t.group_by(["source", "text"]).aggregate([])

    def src_rows(t: pa.Table) -> pa.Table:
        return pa.table({"source": t["source"],
                         "n_distinct": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    # NATIVE (source, text) hash aggregate — exact distinct with no pandas
    # group ever holding a corpus fraction; the text column shuffles once
    distinct = (
        _rp(sf_dir, "documents", ["source", "text"])
        .map_batches(block_dedup, batch_format="pyarrow")
        .groupby(["source", "text"]).count()
        .map_batches(src_rows, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_distinct", alias_name="nd"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        src = t["source"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.table({"source": pa.array(uniq),
                         "n_docs": pa.array(cnt.astype(np.int64))})

    totals = (
        _rp(sf_dir, "documents", ["source", "text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n"))
    )

    def project(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        nd = pc.cast(t["nd"], pa.int64())
        return pa.table({
            "source": t["source"],
            "n_docs": n,
            "n_dup_docs": pc.subtract(n, nd),
        })

    # hash aggregates can emit zero-column blocks for empty partitions
    # (Ray 2.49) which break the join's FieldRef resolution — strip them
    totals = totals.materialize()
    totals = _drop_empty_blocks(totals) or totals
    distinct = distinct.materialize()
    distinct = _drop_empty_blocks(distinct) or distinct
    return (
        totals.join(distinct, join_type="inner", num_partitions=8,
                    on=("source",))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_DUP_RATIO_BY_SOURCE = """
SELECT source, count(*) AS n_docs,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


def q_event_funnel(sf_dir: str):
    """Ordered conversion funnel over the event stream: per user, how far
    through view → click → purchase they progressed, where each stage must
    STRICTLY FOLLOW the previous one in time (min qualifying timestamp
    chains, the standard product-analytics funnel with re-ordering
    ruled out).

    Scale shape: one user-hash cogroup shuffle; inside each bucket the
    stage chain is three masked groupby-transform('min') passes over
    microsecond-integer timestamps — vectorized across all users in the
    bucket, no per-user loop, and timestamp comparisons are integer-exact
    so the oracle agrees bit-for-bit."""
    n_buckets = 1024  # a bucket holds ~1/1024 of users — never one group

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"]
        ts = df["ts"]
        t1 = ts.where(df["event_type"] == "view").groupby(uid).transform("min")
        t2 = (ts.where((df["event_type"] == "click") & (ts > t1))
              .groupby(uid).transform("min"))
        t3 = (ts.where((df["event_type"] == "purchase") & (ts > t2))
              .groupby(uid).transform("min"))
        stage = (t1.notna().astype(np.int64) + t2.notna().astype(np.int64)
                 + t3.notna().astype(np.int64))
        out = pd.DataFrame({"user_id": uid.to_numpy().astype(np.int64),
                            "stage": stage.to_numpy()})
        return out.groupby("user_id", as_index=False, sort=False)["stage"].max()

    return (
        _rp(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
        .select_columns(["user_id", "stage"])
    )


SQL_EVENT_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_json_props_sum(sf_dir: str):
    """Semi-structured payload extraction: pull the integer ``k`` field
    out of the JSON ``props`` column and aggregate it per event type (the
    ubiquitous "parse the properties blob" step of event analytics).

    Exactness: extraction is the same RE2 regex on both sides (Arrow
    ``extract_regex`` and DuckDB ``regexp_extract`` are both RE2 — the
    pii_scan precedent), and the aggregate is an integer sum.

    Scale shape: per-block (event_type, sum, count) integer partials; one
    ≤ |event types| groupby — nothing but the partials shuffles."""
    from ray.data.aggregate import Sum

    pat = r'"k":\s*(?P<v>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        props = pc.fill_null(t["props"].combine_chunks(), "")
        ext = pc.extract_regex(props, pat)
        valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        vals = np.zeros(len(props), dtype=np.int64)
        if valid.any():
            picked = pc.struct_field(ext.filter(pa.array(valid)), "v")
            vals[valid] = pc.cast(picked, pa.int64()).to_numpy(
                zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(uniq),
            "k_sum": pa.array(np.bincount(inv, weights=vals,
                                          minlength=len(uniq))
                              .astype(np.int64)),
            "n_extracted": pa.array(np.bincount(inv, weights=valid.astype(np.int64),
                                                minlength=len(uniq))
                                    .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "k_sum": pc.cast(t["sum(k_sum)"], pa.int64()),
            "n_extracted": pc.cast(t["sum(n_extracted)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k_sum", alias_name="sum(k_sum)"),
                   Sum("n_extracted", alias_name="sum(n_extracted)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_JSON_PROPS_SUM = """
SELECT event_type,
       CAST(COALESCE(sum(CAST(nullif(
              regexp_extract(props, '"k":\\s*(-?\\d+)', 1), '') AS BIGINT)),
            0) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extracted
FROM events WHERE props IS NOT NULL
GROUP BY event_type
"""


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention over the event stream: users are cohorted
    by the Monday-start week of their FIRST event; for each (cohort week,
    week offset) the distinct active users — the grid every retention
    curve is drawn from.

    Week truncation is pure integer arithmetic on epoch days
    (``day − ((day + 3) mod 7)``, Monday-start, matching DuckDB's
    date_trunc('week')), so both sides agree exactly.

    Scale shape: per-user first-event is a narrow (user, min-micros)
    aggregate; cohorts rejoin the stream with ONE hash join (no
    user-table broadcast — users are unbounded at corpus scale); distinct
    actives collapse per block via np.unique before the final
    (cohort, offset, user)-keyed dedup groupby and the tiny count
    groupby."""
    from ray.data.aggregate import Min

    DAY_US = 86_400_000_000

    def week_day(micros: np.ndarray) -> np.ndarray:
        day = micros // DAY_US
        return day - ((day + 3) % 7)

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "micros": pc.cast(t["ts"], pa.int64()),
        })

    ev = _rp(sf_dir, "events", ["user_id", "ts"]).map_batches(
        to_int, batch_format="pyarrow")
    first = ev.groupby("user_id").aggregate(
        Min("micros", alias_name="first_micros")).materialize()
    first = _drop_empty_blocks(first) or first

    def cohort_col(t: pa.Table) -> pa.Table:
        fm = t["first_micros"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "cohort_day": pa.array(week_day(fm)),
        })

    cohorts = first.map_batches(cohort_col, batch_format="pyarrow")

    def triples(t: pa.Table) -> pa.Table:
        um = t["micros"].to_numpy(zero_copy_only=False).astype(np.int64)
        cd = t["cohort_day"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = (week_day(um) - cd) // 7
        # per-block distinct collapse before the shuffle
        key = np.stack([cd, off, uid], axis=1)
        key = np.unique(key, axis=0)
        return pa.table({
            "cohort_day": pa.array(key[:, 0]),
            "week_offset": pa.array(key[:, 1]),
            "user_id": pa.array(key[:, 2]),
        })

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({"cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                         "week_offset": pc.cast(t["week_offset"], pa.int64())})

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                         "week_offset": pc.cast(t["week_offset"], pa.int64()),
                         "n_users": pc.cast(t["count()"], pa.int64())})

    # two NATIVE hash aggregates (triple-dedup, then pair-count): no
    # map_groups ever materializes a whole cohort of users in one block
    return (
        ev.join(cohorts, join_type="inner", num_partitions=8,
                on=("user_id",))
        .map_batches(triples, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset", "user_id"]).count()
        .map_batches(pair_rows, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset"]).count()
        .map_batches(project, batch_format="pyarrow")
    )


SQL_RETENTION_COHORTS = """
WITH f AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01', date_trunc('week', min(ts)))
           AS cohort_day
  FROM events GROUP BY user_id)
SELECT f.cohort_day,
       (datediff('day', DATE '1970-01-01', date_trunc('week', e.ts))
          - f.cohort_day) // 7 AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_degree_histogram(sf_dir: str):
    """Near-dup graph degree distribution (dedup diagnostics): for the
    exact n-gram Jaccard graph (`ngram_jaccard_pairs`), how many docs have
    1, 2, … near-dup neighbors — the shape that decides whether clustering
    is pair-dominated (safe) or star-dominated (template storms).

    Scale shape: edges come from the already-distributed PPJoin Dataset
    seam; degrees are one narrow groupby over the symmetric edge list
    (O(edges) rows), the histogram a second groupby over ≤ max-degree
    rows."""
    edges = _ngram_pairs_dataset(sf_dir)

    def symmetric(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"doc_id": pa.concat_arrays([a, b])})

    deg = (
        edges.map_batches(symmetric, batch_format="pyarrow")
        .groupby("doc_id").count()
    )

    def to_deg(t: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.cast(t["count()"], pa.int64())})

    hist = (
        deg.map_batches(to_deg, batch_format="pyarrow")
        .groupby("degree").count()
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.cast(t["degree"], pa.int64()),
                         "n_docs": pc.cast(t["count()"], pa.int64())})

    return hist.map_batches(project, batch_format="pyarrow")


SQL_DEGREE_HISTOGRAM = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
),
pairs AS (
  SELECT a, b FROM (
    SELECT a.doc_id AS a, b.doc_id AS b,
           len(list_intersect(a.grams, b.grams)) AS inter,
           len(a.grams) AS na, len(b.grams) AS nb
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  )
  WHERE inter * 5 >= 4 * (na + nb - inter)
),
deg AS (
  SELECT doc_id, count(*) AS degree FROM (
    SELECT a AS doc_id FROM pairs UNION ALL SELECT b AS doc_id FROM pairs)
  GROUP BY doc_id)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree
"""


def q_tokenizer_coverage(sf_dir: str, vocab_k: int = 100):
    """Vocabulary coverage / OOV audit: fix the vocab to the corpus's
    top-``vocab_k`` tokens by total frequency (deterministic count-then-
    token tiebreak), then per doc report total tokens and how many are
    in-vocab — the OOV-rate table a tokenizer change is judged by.

    Scale shape: the vocab phase reuses the term-partial pattern
    (vocab-sized per-block (term, n) counts, one narrow groupby, driver
    keeps only k rows); the probe phase broadcasts the k tokens once and
    runs an embarrassingly-parallel ``pc.is_in`` count per block."""
    import ray
    from ray.data.aggregate import Sum

    def term_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        uniq, cnt = np.unique(np.asarray(flat), return_counts=True)
        return pa.table({"t": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    vocab_df = (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("t").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "t"], descending=[True, False])
        .limit(vocab_k)
        .to_pandas()
    )
    if len(vocab_df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "n_in_vocab": pd.Series(dtype="int64")})
    vocab_ref = ray.put(pa.array(sorted(vocab_df["t"]), pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n = t.num_rows
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        inv = pc.is_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        n_in = np.bincount(parents[inv], minlength=n).astype(np.int64)
        keep_docs = n_tokens > 0  # docs with no tokens have no coverage row
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                pa.array(keep_docs)),
            "n_tokens": pa.array(n_tokens[keep_docs]),
            "n_in_vocab": pa.array(n_in[keep_docs]),
        })

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow")


SQL_TOKENIZER_COVERAGE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS t
  FROM documents WHERE text IS NOT NULL),
v AS (
  SELECT t FROM (
    SELECT t, count(*) AS n FROM tok GROUP BY t
    ORDER BY n DESC, t LIMIT 100))
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN t IN (SELECT t FROM v) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_in_vocab
FROM tok GROUP BY doc_id
"""


def q_null_profile(sf_dir: str):
    """Column completeness profile over the documents table (the first
    pass of any schema-validation engine): per column, total rows, nulls,
    and empty-string counts — pure integer counts so the gate is exact.

    Scale shape: per-block partials are |columns| rows each (pc.is_null /
    equality kernels, zero data-dependent state), one ≤ |columns|-group
    aggregate — nothing but the tiny profile shuffles."""
    from ray.data.aggregate import Sum

    cols = ["doc_id", "text", "lang", "source", "n_chars"]

    def partial(t: pa.Table) -> pa.Table:
        names, n_null, n_empty = [], [], []
        for c in cols:
            col = t[c]
            names.append(c)
            n_null.append(col.null_count)
            if pa.types.is_string(col.type):
                ne = pc.sum(pc.equal(col, "")).as_py() or 0
            else:
                ne = 0
            n_empty.append(int(ne))
        k = len(cols)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array([t.num_rows] * k, pa.int64()),
            "n_null": pa.array(n_null, pa.int64()),
            "n_empty": pa.array(n_empty, pa.int64()),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": t["column"],
            "n_rows": pc.cast(t["sum(n_rows)"], pa.int64()),
            "n_null": pc.cast(t["sum(n_null)"], pa.int64()),
            "n_empty": pc.cast(t["sum(n_empty)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_rows", alias_name="sum(n_rows)"),
                   Sum("n_null", alias_name="sum(n_null)"),
                   Sum("n_empty", alias_name="sum(n_empty)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_NULL_PROFILE = """
SELECT 'doc_id' AS column, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(0 AS BIGINT) AS n_empty
FROM documents
UNION ALL
SELECT 'text', count(*),
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN source = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT)
FROM documents
"""


def q_above_avg_orders(sf_dir: str):
    """Correlated-subquery pattern: orders whose total exceeds their
    customer's average order total.  Float averages never cross the gate —
    the predicate is the cross-multiplied integer-cents comparison
    ``price_cents · n_orders > sum_cents`` (exactly ⇔ price > avg).

    Scale shape: per-customer (n, Σcents) via per-block integer partials
    and one narrow groupby; the predicate pass re-reads orders and probes
    a broadcast (guarded) customer stat table — or one hash join past the
    guard."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        return pa.table({
            "o_custkey": pa.array(uniq),
            "n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(uniq)).astype(np.int64)),
        })

    stats = (
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .materialize()
    )
    stats = _drop_empty_blocks(stats) or stats
    out_cols = ("o_orderkey", "o_custkey", "o_totalprice")

    if stats.count() <= BROADCAST_MAX_ROWS:
        sdf = stats.to_pandas()
        order = np.argsort(sdf["o_custkey"].to_numpy())
        stats_ref = ray.put((
            sdf["o_custkey"].to_numpy()[order].astype(np.int64),
            sdf["n"].to_numpy()[order].astype(np.int64),
            sdf["s"].to_numpy()[order].astype(np.int64),
        ))

        def above(t: pa.Table) -> pa.Table:
            keys, n, s = ray.get(stats_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.round(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            pos = np.searchsorted(keys, ck)
            keep = cents * n[pos] > s[pos]  # price > avg, integer-exact
            return t.select(list(out_cols)).filter(pa.array(keep))

        return _rp(sf_dir, "orders", list(out_cols)).map_batches(
            above, batch_format="pyarrow")

    def above_joined(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select(list(out_cols)).filter(pa.array(cents * n > s))

    return (
        _rp(sf_dir, "orders", list(out_cols))
        .join(stats, join_type="inner", num_partitions=8, on=("o_custkey",))
        .map_batches(above_joined, batch_format="pyarrow")
    )


SQL_ABOVE_AVG_ORDERS = """
WITH s AS (
  SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN s USING (o_custkey)
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * s.n > s.s
"""


def q_orders_per_weekday(sf_dir: str):
    """Date-part aggregate: order counts and integer-cents revenue per ISO
    weekday.  The weekday is pure epoch-day arithmetic
    (``(day + 3) mod 7 + 1`` with Monday = 1, matching DuckDB's
    isodow), so no date library crosses the gate.

    Scale shape: ≤ 7-row per-block integer partials, one tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        days = micros // 86_400_000_000
        dow = (days + 3) % 7 + 1  # 1970-01-01 = Thursday; Monday = 1
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(dow, return_inverse=True)
        return pa.table({
            "weekday": pa.array(uniq),
            "n_orders": pa.array(np.bincount(inv, minlength=len(uniq))
                                 .astype(np.int64)),
            "revenue_cents": pa.array(np.bincount(inv, weights=cents,
                                                  minlength=len(uniq))
                                      .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "weekday": pc.cast(t["weekday"], pa.int64()),
            "n_orders": pc.cast(t["sum(n_orders)"], pa.int64()),
            "revenue_cents": pc.cast(t["sum(revenue_cents)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("weekday")
        .aggregate(Sum("n_orders", alias_name="sum(n_orders)"),
                   Sum("revenue_cents", alias_name="sum(revenue_cents)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_ORDERS_PER_WEEKDAY = """
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS weekday,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders GROUP BY 1
"""


def q_char_concentration(sf_dir: str, threshold_ppm: int = 80_000):
    """Character-concentration spam signal: per doc, the Simpson-index
    numerator Σ c_i² over CHARACTER counts, reported as parts-per-million
    of its maximum n² (1e6 = one repeated character — the classic
    keyboard-mash / padding detector).  Integer arithmetic end to end;
    flags docs at or above ``threshold_ppm``.

    Scale shape: one embarrassingly-parallel pass; per batch the character
    counts come from the vectorized UTF-8 codepoint kernel
    (functions/text.py::utf8_codepoints — a ≤4-step byte-position fold, no
    per-row python) and ONE np.unique over (row << 21 | codepoint) keys
    (codepoints ≤ 0x10FFFF fit 21 bits exactly)."""
    from sievedata.functions.text import utf8_codepoints

    def conc(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        n_rows = len(txt)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "conc_ppm": pa.array([], pa.int64())})
        if n_rows == 0:
            return empty
        parent, cp, n_chars = utf8_codepoints(txt)
        if parent.size == 0:
            return empty
        key = (parent << np.int64(21)) | cp
        uk, cnt = np.unique(key, return_counts=True)
        # Σc² per doc (cnt < 2^21 ⇒ the float64 accumulation is exact)
        ss = np.bincount(uk >> np.int64(21),
                         weights=cnt.astype(np.float64) ** 2,
                         minlength=n_rows).astype(np.int64)
        keep = n_chars > 0
        n2 = n_chars.astype(np.int64) ** 2
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = np.zeros(n_rows, dtype=np.int64)
        ppm[keep] = ss[keep] * 1_000_000 // n2[keep]
        sel = keep & (ppm >= threshold_ppm)
        return pa.table({"doc_id": pa.array(ids[sel]),
                         "conc_ppm": pa.array(ppm[sel])})

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        conc, batch_format="pyarrow")


SQL_CHAR_CONCENTRATION = """
WITH pos AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
c AS (
  SELECT doc_id, any_value(n) AS n, count(*) AS cnt
  FROM (SELECT doc_id, n, substr(text, i::INT, 1) AS ch FROM pos)
  GROUP BY doc_id, ch)
SELECT doc_id,
       CAST(sum(cnt * cnt) * 1000000 // (any_value(n) * any_value(n))
            AS BIGINT) AS conc_ppm
FROM c GROUP BY doc_id
HAVING CAST(sum(cnt * cnt) * 1000000 // (any_value(n) * any_value(n))
            AS BIGINT) >= 80000
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

_ORACLE = {
    "returnflag_agg": SQL_RETURNFLAG_AGG,
    "customer_baseline": SQL_CUSTOMER_BASELINE,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "region_customers": SQL_REGION_CUSTOMERS,
    "anti_join": SQL_ANTI_JOIN,
    "join_native": SQL_JOIN_NATIVE,
    "topk_orders": SQL_TOPK_ORDERS,
    "top_order_per_customer": SQL_TOP_ORDER_PER_CUSTOMER,
    "distinct_parts": SQL_DISTINCT_PARTS,
    "dup_orders": SQL_DUP_ORDERS,
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "price_outliers": SQL_PRICE_OUTLIERS,
    "invnum_norm": SQL_INVNUM_NORM,
    "desc_norm": SQL_DESC_NORM,
    "mask_hash": SQL_MASK_HASH,
    "token_stats": SQL_TOKEN_STATS,
    "quality_filter": SQL_QUALITY_FILTER,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "window_drift": SQL_WINDOW_DRIFT,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "embedding_norms": SQL_EMBEDDING_NORMS,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "line_sum_check": SQL_LINE_SUM_CHECK,
    "knn_classify": SQL_KNN_CLASSIFY,
    "systematic_sample": SQL_SYSTEMATIC_SAMPLE,
    "text_blob": SQL_TEXT_BLOB,
    "row_fingerprint": SQL_ROW_FINGERPRINT,
    "dedup_survivors": SQL_DEDUP_SURVIVORS,
    "median_price": SQL_MEDIAN_PRICE,
    "running_total": SQL_RUNNING_TOTAL,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "sliding_window": SQL_SLIDING_WINDOW,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "bpe_token_count": SQL_BPE_TOKEN_COUNT,
    "word_count": SQL_WORD_COUNT,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "semi_join": SQL_SEMI_JOIN,
    "pivot_status": SQL_PIVOT_STATUS,
    "rollup_orders": SQL_ROLLUP_ORDERS,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "supplier_quantiles": SQL_SUPPLIER_QUANTILES,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    "left_join_counts": SQL_LEFT_JOIN_COUNTS,
    "priority_topk": SQL_PRIORITY_TOPK,
    "order_gap_days": SQL_ORDER_GAP_DAYS,
    "cube_orders": SQL_CUBE_ORDERS,
    "full_outer_join": SQL_FULL_OUTER_JOIN,
    "string_agg_statuses": SQL_STRING_AGG_STATUSES,
    "intersect_users": SQL_INTERSECT_USERS,
    "mode_event_type": SQL_MODE_EVENT_TYPE,
    "global_rank": SQL_GLOBAL_RANK,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "except_users": SQL_EXCEPT_USERS,
    "dense_rank": SQL_DENSE_RANK,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "token_shards": SQL_TOKEN_SHARDS,
    "term_doc_freq": SQL_TERM_DOC_FREQ,
    "repetition_filter": SQL_REPETITION_FILTER,
    "union_ids": SQL_UNION_IDS,
    "approx_quantiles": SQL_APPROX_QUANTILES,
    "decontaminate": SQL_DECONTAMINATE,
    "dedup_corpus": SQL_DEDUP_CORPUS,
    "pii_scan": SQL_PII_SCAN,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "multi_distinct": SQL_MULTI_DISTINCT,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "token_rarity": SQL_TOKEN_RARITY,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "posting_lists": SQL_POSTING_LISTS,
    "quality_buckets": SQL_QUALITY_BUCKETS,
    "domain_mixture": SQL_DOMAIN_MIXTURE,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "ngram_diversity": SQL_NGRAM_DIVERSITY,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "domain_caps": SQL_DOMAIN_CAPS,
    "hash_split": SQL_HASH_SPLIT,
    "pack_windows": SQL_PACK_WINDOWS,
    "length_filter": SQL_LENGTH_FILTER,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    "bpe_merge_candidates": SQL_BPE_MERGE_CANDIDATES,
    "dup_ratio_by_source": SQL_DUP_RATIO_BY_SOURCE,
    "event_funnel": SQL_EVENT_FUNNEL,
    "json_props_sum": SQL_JSON_PROPS_SUM,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "degree_histogram": SQL_DEGREE_HISTOGRAM,
    "tokenizer_coverage": SQL_TOKENIZER_COVERAGE,
    "above_avg_orders": SQL_ABOVE_AVG_ORDERS,
    "orders_per_weekday": SQL_ORDERS_PER_WEEKDAY,
    "char_concentration": SQL_CHAR_CONCENTRATION,
    "null_profile": SQL_NULL_PROFILE,
    # round-5 conversions from rows-only to oracle-bearing
    "lang_id": SQL_LANG_ID,
    "minhash_near_dups": SQL_MINHASH_NEAR_DUPS,
}

_QUERIES = {
    "returnflag_agg": q_returnflag_agg,
    "customer_baseline": q_customer_baseline,
    "segment_revenue": q_segment_revenue,
    "region_customers": q_region_customers,
    "anti_join": q_anti_join,
    "join_native": q_join_native,
    "topk_orders": q_topk_orders,
    "top_order_per_customer": q_top_order_per_customer,
    "distinct_parts": q_distinct_parts,
    "dup_orders": q_dup_orders,
    "exact_dedup_docs": q_exact_dedup_docs,
    "price_outliers": q_price_outliers,
    "invnum_norm": q_invnum_norm,
    "desc_norm": q_desc_norm,
    "mask_hash": q_mask_hash,
    "token_stats": q_token_stats,
    "quality_filter": q_quality_filter,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "window_drift": q_window_drift,
    "ann_topk": q_ann_topk,
    "embedding_norms": q_embedding_norms,
    "embedding_near_dups": q_embedding_near_dups,
    "line_sum_check": q_line_sum_check,
    "knn_classify": q_knn_classify,
    "systematic_sample": q_systematic_sample,
    "text_blob": q_text_blob,
    "row_fingerprint": q_row_fingerprint,
    "dedup_survivors": q_dedup_survivors,
    "median_price": q_median_price,
    "running_total": q_running_total,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "sliding_window": q_sliding_window,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "bpe_token_count": q_bpe_token_count,
    "word_count": q_word_count,
    "heavy_hitters": q_heavy_hitters,
    "semi_join": q_semi_join,
    "pivot_status": q_pivot_status,
    "rollup_orders": q_rollup_orders,
    "value_histogram": q_value_histogram,
    "supplier_quantiles": q_supplier_quantiles,
    "dedup_components": q_dedup_components,
    "left_join_counts": q_left_join_counts,
    "priority_topk": q_priority_topk,
    "order_gap_days": q_order_gap_days,
    "cube_orders": q_cube_orders,
    "full_outer_join": q_full_outer_join,
    "string_agg_statuses": q_string_agg_statuses,
    "intersect_users": q_intersect_users,
    "mode_event_type": q_mode_event_type,
    "global_rank": q_global_rank,
    "shipping_priority": q_shipping_priority,
    "except_users": q_except_users,
    "dense_rank": q_dense_rank,
    "stratified_sample": q_stratified_sample,
    "token_shards": q_token_shards,
    "term_doc_freq": q_term_doc_freq,
    "repetition_filter": q_repetition_filter,
    "union_ids": q_union_ids,
    "approx_quantiles": q_approx_quantiles,
    "decontaminate": q_decontaminate,
    "dedup_corpus": q_dedup_corpus,
    "pii_scan": q_pii_scan,
    "tfidf_top_terms": q_tfidf_top_terms,
    "multi_distinct": q_multi_distinct,
    "chunk_dedup": q_chunk_dedup,
    "token_rarity": q_token_rarity,
    "winnow_fingerprints": q_winnow_fingerprints,
    "posting_lists": q_posting_lists,
    "quality_buckets": q_quality_buckets,
    "domain_mixture": q_domain_mixture,
    "label_centroids": q_label_centroids,
    "ngram_diversity": q_ngram_diversity,
    "weighted_sample": q_weighted_sample,
    "domain_caps": q_domain_caps,
    "hash_split": q_hash_split,
    "pack_windows": q_pack_windows,
    "length_filter": q_length_filter,
    "embedding_quantize": q_embedding_quantize,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "dup_ratio_by_source": q_dup_ratio_by_source,
    "event_funnel": q_event_funnel,
    "json_props_sum": q_json_props_sum,
    "retention_cohorts": q_retention_cohorts,
    "degree_histogram": q_degree_histogram,
    "tokenizer_coverage": q_tokenizer_coverage,
    "above_avg_orders": q_above_avg_orders,
    "orders_per_weekday": q_orders_per_weekday,
    "char_concentration": q_char_concentration,
    "null_profile": q_null_profile,
    # rows-only (no SQL equivalent)
    "kmeans_clusters": q_kmeans_clusters,
    "image_phash_dups": q_image_phash_dups,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "simhash": q_simhash,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "media_features": q_media_features,
    "media_audio": q_media_audio,
    "media_resize": q_media_resize,
    "frame_sample": q_frame_sample,
    "validate_flagship": q_validate_flagship,
    "score_flagship": q_score_flagship,
    "validate_incremental": q_validate_incremental,
    "score_incremental": q_score_incremental,
    "profile_incremental": q_profile_incremental,
}


# The external correctness driver samples the FIRST 50 entries of queries()
# insertion order.  Rounds 1-4 always led with the round-1 relational set, so
# the 44 oracle-bearing operators added in rounds 3-4 never got a driver row
# (VERDICT.md round 4, "Next round #1").  Lead with those 44, then 6
# long-green round-1 sentinels to fill the 50-slot window; everything else
# (already captured in CORRECTNESS_r01..r04) follows in original order.
_DRIVER_PRIORITY = [
    # never-driver-checked, oracle-bearing (rounds 2-4)
    "full_outer_join",
    "string_agg_statuses",
    "intersect_users",
    "mode_event_type",
    "global_rank",
    "shipping_priority",
    "except_users",
    "dense_rank",
    "stratified_sample",
    "token_shards",
    "term_doc_freq",
    "repetition_filter",
    "union_ids",
    "approx_quantiles",
    "decontaminate",
    "dedup_corpus",
    "pii_scan",
    "tfidf_top_terms",
    "multi_distinct",
    "chunk_dedup",
    "token_rarity",
    "winnow_fingerprints",
    "posting_lists",
    "quality_buckets",
    "domain_mixture",
    "label_centroids",
    "ngram_diversity",
    "weighted_sample",
    "domain_caps",
    "hash_split",
    "pack_windows",
    "length_filter",
    "embedding_quantize",
    "bpe_merge_candidates",
    "dup_ratio_by_source",
    "event_funnel",
    "json_props_sum",
    "retention_cohorts",
    "degree_histogram",
    "tokenizer_coverage",
    "above_avg_orders",
    "orders_per_weekday",
    "char_concentration",
    "null_profile",
    # round-5 oracle conversions (first driver capture this round)
    "lang_id",
    "minhash_near_dups",
    # long-green sentinels (driver-checked every prior round)
    "returnflag_agg",
    "customer_baseline",
    "anti_join",
    "topk_orders",
]


def _reorder(d):
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries():
    return _reorder(_QUERIES)


def oracle_sql():
    return _reorder(_ORACLE)
