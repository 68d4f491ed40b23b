"""Vectorized 64-bit string hashing for sketches (HLL / Bloom / MinHash).

Fast path: polars ``Series.hash`` (seeded, deterministic for the installed
version — sketch hashes never cross environment boundaries: profiles are
rebuilt per deployment, and the correctness oracle compares *violation rows*,
never raw hash values).  Fallback: a pure-numpy FNV-style polynomial hash that
is deterministic forever.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# Each Ray worker importing polars would otherwise spawn a full rayon
# threadpool (one per worker × num_cores threads = massive oversubscription
# when 30 workers hash small per-batch arrays).  Our hashing calls are tiny
# and per-batch — single-threaded is optimal inside a worker.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

try:
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SPLITMIX_C1
    x ^= x >> np.uint64(27)
    x *= _SPLITMIX_C2
    x ^= x >> np.uint64(31)
    return x


def _to_string_array(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array([None if v is None else str(v) for v in values], pa.string())
    if pa.types.is_large_string(values.type) or pa.types.is_string(values.type):
        return values
    return values.cast(pa.string())


def _hash_numpy(arr: pa.Array, seed: int) -> np.ndarray:
    """Polynomial rolling hash over utf-8 bytes, O(max_len) numpy passes."""
    arr = arr.cast(pa.large_binary()) if not pa.types.is_large_string(arr.type) else arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data_buf = arr.buffers()[2]
    buf = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    starts = offsets[:-1]
    h = np.full(n, np.uint64(seed) ^ _GOLDEN, dtype=np.uint64)
    P = np.uint64(1099511628211)
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            mask = lengths > j
            if not mask.any():
                break
            idx = starts[mask] + j
            h[mask] = h[mask] * P + buf[idx].astype(np.uint64)
        h ^= lengths.astype(np.uint64)
        out = _splitmix64(h)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        out = np.where(valid, out, np.uint64(0))
    return out


def hash64(values, seed: int = 0) -> np.ndarray:
    """Hash a string column (pa.Array / ChunkedArray / list) → uint64 numpy.

    Nulls hash to 0 (callers mask them out before sketch updates).
    """
    arr = _to_string_array(values)
    if _HAVE_POLARS:
        s = pl.from_arrow(arr)
        hashed = s.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy().astype(np.uint64)
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            hashed = np.where(valid, hashed, np.uint64(0))
        return hashed
    return _hash_numpy(arr, seed)


def hash64_pair(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes (for Kirsch-Mitzenmacher double hashing)."""
    h1 = hash64(values, seed)
    with np.errstate(over="ignore"):
        h2 = _splitmix64(h1 ^ np.uint64((seed * 2 + 1) & 0xFFFFFFFFFFFFFFFF))
        h2 |= np.uint64(1)  # odd, so strides cover the space
    return h1, h2
