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
