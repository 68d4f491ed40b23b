"""Dedup / duplicate flagging (D1 family) — split from the single-file catalogue (round 5, pure
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
