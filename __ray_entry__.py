"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship constraint-validation pipeline (profile pass +
validate pass over a deterministic span-structured documents fixture — the
BASELINE.json ``input_hint`` shape) and returns the violations table.
``queries()``/``oracle_sql()`` expose the operator catalogue over the driver
testdata tables (sievedata/queries.py).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

try:
    from sievedata.fixtures import FIXTURE_VERSION as _FV
except Exception:  # pragma: no cover
    _FV = 0
_ENTRY_CACHE = f"/tmp/sievedata_entry_v{_FV}"


def entry() -> Any:
    """Flagship pipeline: generate the t1 span fixture (cached), learn
    per-partition profiles from the unshifted baseline, validate the current
    table, return the violations Dataset (stable schema: partition_key,
    doc_id, reason_code, detail)."""
    import ray.data as rd

    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    fix_dir = os.path.join(_ENTRY_CACHE, "fixture")
    marker = os.path.join(fix_dir, "documents.parquet")
    if not os.path.exists(marker):
        generate_fixture(fix_dir, n_docs=2000, n_vendors=20, seed=42)
    prof = build_profiles(
        os.path.join(fix_dir, "baseline.parquet"),
        os.path.join(fix_dir, "media_catalog.parquet"),
        os.path.join(_ENTRY_CACHE, "profiles"),
    )
    res = validate_documents(
        marker,
        prof["profiles"],
        prof["media_bloom"],
        os.path.join(_ENTRY_CACHE, "validate"),
        resume=False,
    )
    return rd.read_parquet(res["violations"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus
    the training-data-pipeline operators); see sievedata/queries.py."""
    from sievedata.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for every SQL-expressible entry
    in ``queries()`` (96 of 110, incl. lang-ID via profile-literal VALUES
    and MinHash near-dups via integer-ppm exact verification); genuinely
    non-SQL ops (SimHash tables, splitmix fingerprints, media decode,
    k-means, the flagship/incremental pipelines) are intentionally
    omitted → rows-only check."""
    from sievedata.queries import oracle_sql as _o

    return _o()
