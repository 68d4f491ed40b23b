"""Storage seam: Parquet default, Lance optional.

The target deployment reads Lance tables; this sandbox has no ``lance``
package, so Parquet is the default backend and Lance is a thin adapter gated
behind an import-try.  All pipeline code goes through these three functions —
swapping the backend never touches a pipeline.
"""
from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

# Ray's path resolution lazily does `from fsspec.implementations.http import
# HTTPFileSystem` on every read.  aiohttp is absent here, so that import
# normally fails with ModuleNotFoundError (which Ray catches) — but when two
# driver threads race the first import, one can observe the partially-removed
# module and get a bare ImportError that Ray does NOT catch.  Register a stub
# module once, deterministically: the class is never instantiated, only used
# in an isinstance() check that correctly returns False.
try:  # pragma: no cover
    import fsspec.implementations.http  # noqa: F401
except Exception:  # pragma: no cover
    import sys
    import types

    _http_stub = types.ModuleType("fsspec.implementations.http")

    class _StubHTTPFileSystem:
        pass

    _http_stub.HTTPFileSystem = _StubHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = _http_stub

try:  # optional Lance adapter (absent in this sandbox)
    import lance  # type: ignore

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


def _is_lance(path: str) -> bool:
    return path.endswith(".lance")


def read_documents(path: str, columns: list[str] | None = None, **kwargs: Any):
    """Read a documents table (or any table) as a ray.data.Dataset.

    ``path`` may be a parquet file or a directory of parquet parts (the
    default backend), a ``.jsonl``/``.json`` line-delimited dump (the
    reference's ingest format), a ``.csv``, or a ``.lance`` dataset when
    lance is installed.  Column pruning is pushed to the reader where the
    format supports it (parquet/lance); row-based formats read fully and
    project after — prefer parquet for wide tables at scale.
    """
    import ray.data as rd

    if _is_lance(path):
        if not _HAVE_LANCE:
            raise NotImplementedError(
                "Lance backend requested but the 'lance' package is not installed; "
                "use Parquet (the default backend) in this environment."
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    fmt = _sniff_format(path)
    if fmt == "json":
        ds = rd.read_json(path, **kwargs)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if fmt == "csv":
        ds = rd.read_csv(path, **kwargs)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    return rd.read_parquet(path, columns=columns, **kwargs)


def _sniff_format(path: str) -> str:
    """Route by file extension; for a local directory, by the extension of
    the first data file inside (one listdir — no data read)."""
    import os

    def ext_of(name: str) -> str:
        if name.endswith((".jsonl", ".json")):
            return "json"
        if name.endswith(".csv"):
            return "csv"
        if name.endswith(".parquet"):
            return "parquet"
        return ""

    e = ext_of(path)
    if e:
        return e
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            e = ext_of(entry)
            if e:
                return e
    return "parquet"


read_table = read_documents


def write_table(table: pa.Table, path: str) -> None:
    """Write a small driver-side Arrow table (profiles, manifests)."""
    if _is_lance(path):
        if not _HAVE_LANCE:
            raise NotImplementedError("lance not installed")
        lance.write_dataset(table, path)  # pragma: no cover
        return
    pq.write_table(table, path)
