"""String normalization kernels (M1-M4 family) — split from the single-file catalogue (round 5, pure
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
