"""Deduplication operators for training-data pipelines.

All expressed Ray-Data-first:
- exact dedup: content-hash column (vectorized) → groupby(hash) → keep first
- MinHash-LSH near-dup: shingle → minhash signature per batch → explode to
  (band_id, band_hash) rows → groupby band → candidate pairs → Jaccard verify
- SimHash near-dup: simhash column → bucket by rotated prefixes → Hamming verify
- n-gram Jaccard: verification kernel (sievedata.kernels.similarity)

Partitioning assumption (documented per north_rule): candidate generation
shuffles only (band_hash, doc_id) rows — signatures stay in the narrow
exploded table, never the documents themselves; pair verification re-reads
only candidate docs.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sievedata.sketches.hashing import hash64, hash64_pair


def shingle_hashes(text: str, n: int = 5, seed: int = 1719) -> np.ndarray:
    """Hashes of the char n-gram shingle set of one document."""
    if len(text) < n:
        shingles = [text]
    else:
        shingles = list({text[i : i + n] for i in range(len(text) - n + 1)})
    return hash64(shingles, seed=seed)


def minhash_signature_batch(
    texts: list[str], num_perm: int = 64, n: int = 5, seed: int = 1719
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signatures.

    Kirsch-Mitzenmacher: perm_i(x) = h1(x) + i·h2(x) — two base hashes per
    shingle, num_perm derived permutations, min over shingles.

    Vectorized across the whole batch: ONE hash call over the concatenated
    shingle list, then per-permutation segment minima via
    ``np.minimum.reduceat`` — no per-document hashing overhead.
    """
    from sievedata.kernels import grams as G

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        arr = texts
        if arr.null_count:
            import pyarrow.compute as pc
            arr = pc.fill_null(arr, "")  # None → "" like the scalar path
    else:
        arr = pa.array([t if t is not None else "" for t in texts],
                       pa.string())
    n_docs = len(arr)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return out
    if n <= 7 and G.is_ascii(arr):
        # vectorized distinct-shingle extraction (packed uint64 windows →
        # one np.unique → decode); the DECODED STRINGS hash through the
        # same hash64, so signatures are bit-identical to the scalar path
        # (short texts yield the whole text — same special case)
        _, gram, doc_n = G.distinct_grams_packed(arr, n)
        shingles = G.packed_to_strings(gram, n)
        offsets = np.concatenate(([0], np.cumsum(doc_n))).astype(np.int64)
        if len(shingles) == 0:
            return out
        h1, h2 = hash64_pair(shingles, seed=seed)
    else:
        all_shingles: list[str] = []
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        for row, t in enumerate(arr.to_pylist()):
            t = t or ""
            if len(t) < n:
                sh = [t]
            else:
                sh = list({t[i : i + n] for i in range(len(t) - n + 1)})
            all_shingles.extend(sh)
            offsets[row + 1] = offsets[row] + len(sh)
        if not all_shingles:
            return out
        h1, h2 = hash64_pair(all_shingles, seed=seed)
    starts = offsets[:-1]
    nonempty = np.diff(offsets) > 0
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            v = h1 + np.uint64(i) * h2
            mins = np.minimum.reduceat(v, starts[nonempty]) if nonempty.any() else None
            if mins is not None:
                out[nonempty, i] = mins
    return out


def lsh_band_rows(
    doc_ids: list[str], sigs: np.ndarray, bands: int = 16
) -> pa.Table:
    """Explode signatures into (band_id, band_hash, doc_id) rows for the
    banding groupby."""
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    band_ids = []
    band_hashes = []
    ids = []
    for b in range(bands):
        chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
        # mix the band's minhash values into one 64-bit key
        h = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + chunk[:, c]
        band_ids.extend([b] * n)
        band_hashes.extend(h.tolist())
        ids.extend(doc_ids)
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(ids, pa.string()),
        }
    )


def lsh_band_arrays(sigs: np.ndarray, bands: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized band explode: (band_id int32, band_hash uint64) arrays of
    length bands×n, band-major — same mixing as ``lsh_band_rows`` (callers
    relying on identical grouping can use either), no python list building."""
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
    hashes = np.empty(bands * n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + chunk[:, c]
            hashes[b * n : (b + 1) * n] = h
    return band_ids, hashes


def candidate_pairs_from_band(g: pd.DataFrame, cap: int = 200) -> pd.DataFrame:
    """All unordered doc pairs within one (band_id, band_hash) bucket,
    doc_id-sorted, capped (like the reference's BR-004 fan-out cap)."""
    ids = sorted(g["doc_id"].unique())[: cap]
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame(pairs, columns=["a", "b"])


def jaccard_from_signatures(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate: fraction of equal signature slots."""
    return float((sig_a == sig_b).mean())


def exact_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    a = {text_a[i : i + n] for i in range(max(len(text_a) - n + 1, 1))}
    b = {text_b[i : i + n] for i in range(max(len(text_b) - n + 1, 1))}
    union = len(a | b)
    return len(a & b) / union if union else 1.0
