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


def _packed_hash_pair(gram: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Kirsch-Mitzenmacher base hashes for PACKED uint64 grams — pure
    splitmix64 integer mixing, no decode-to-string round trip.  h2's
    derivation mirrors ``hash64_pair`` (odd, so strides cover the space)."""
    from sievedata.sketches.hashing import _splitmix64

    with np.errstate(over="ignore"):
        seed_mix = _splitmix64(np.array([seed], np.uint64))[0]
        h1 = _splitmix64(gram ^ seed_mix)
        h2 = _splitmix64(h1 ^ np.uint64((seed * 2 + 1) & 0xFFFFFFFFFFFFFFFF))
        h2 |= np.uint64(1)
    return h1, h2


def _min_perms_blocked(
    h1: np.ndarray, h2: np.ndarray, doc_n: np.ndarray,
    rows: np.ndarray, out: np.ndarray, num_perm: int,
) -> None:
    """Per-doc minima of h1 + i·h2 for i in [0, num_perm), written into
    ``out[rows]``.  Doc-boundary chunks sized so h1/h2/scratch stay
    L2-resident across all num_perm passes — the naive loop re-streams the
    full window arrays from RAM num_perm times, and validate stage 1 is
    memory-bandwidth-bound at high core counts (bench.py --membw: triad
    throughput at 32 procs ≤ 8 procs on this class of box)."""
    offsets = np.concatenate(([0], np.cumsum(doc_n))).astype(np.int64)
    n_docs = len(doc_n)
    chunk_windows = 32_768  # 3 uint64 arrays × 32k ≈ 768 KB ≈ L2-resident
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < n_docs:
            d1 = int(np.searchsorted(offsets, offsets[d0] + chunk_windows,
                                     side="right")) - 1
            d1 = min(max(d1, d0 + 1), n_docs)
            s, e = offsets[d0], offsets[d1]
            h1c, h2c = h1[s:e], h2[s:e]
            dn = doc_n[d0:d1]
            ne = dn > 0
            if ne.any():
                starts = (offsets[d0:d1] - s)[ne]
                buf = np.empty(e - s, np.uint64)
                mins = np.empty((int(ne.sum()), num_perm), np.uint64)
                for i in range(num_perm):
                    np.multiply(h2c, np.uint64(i), out=buf)
                    np.add(buf, h1c, out=buf)
                    mins[:, i] = np.minimum.reduceat(buf, starts)
                out[rows[d0:d1][ne]] = mins
            d0 = d1


def minhash_signature_batch(
    texts: list[str], num_perm: int = 64, n: int = 5, seed: int = 1719
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signatures.

    Kirsch-Mitzenmacher: perm_i(x) = h1(x) + i·h2(x) — two base hashes per
    shingle, num_perm derived permutations, min over shingles.

    ASCII docs (the hot path): ALL packed uint64 windows — duplicates kept,
    because min over a multiset equals min over its set, so the per-doc
    DISTINCT sort the old path paid was pure waste — hashed with splitmix64
    integer mixing (``_packed_hash_pair``; no decode-to-string round trip),
    then an L2-blocked permutation loop (``_min_perms_blocked``).  Non-ASCII
    docs route per-DOC through the distinct-shingle-string scalar path, so
    every signature depends only on its own document's bytes (deterministic
    under any Ray batch split).  The two classes therefore hash differently
    — a near-dup pair straddling the ASCII boundary won't LSH-collide; the
    downstream Jaccard/Hamming verify gates keep precision exact, and
    sketch hash values never cross environment boundaries by contract
    (sketches/hashing.py docstring).
    """
    import pyarrow.compute as pc

    from sievedata.kernels import grams as G

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        arr = texts
        if arr.null_count:
            arr = pc.fill_null(arr, "")  # None → "" like the scalar path
    else:
        arr = pa.array([t if t is not None else "" for t in texts],
                       pa.string())
    n_docs = len(arr)
    out = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return out

    if n <= 7 and G.is_ascii(arr):
        ascii_rows = np.arange(n_docs, dtype=np.int64)
        ascii_arr = arr
        other_rows = np.empty(0, np.int64)
    elif n <= 7:
        is_a = pc.equal(pc.utf8_length(arr), pc.binary_length(arr))
        mask = np.asarray(is_a.to_numpy(zero_copy_only=False), dtype=bool)
        ascii_rows = np.flatnonzero(mask)
        other_rows = np.flatnonzero(~mask)
        ascii_arr = arr.take(pa.array(ascii_rows)) if len(ascii_rows) else None
    else:
        ascii_rows = np.empty(0, np.int64)
        other_rows = np.arange(n_docs, dtype=np.int64)
        ascii_arr = None

    if len(ascii_rows):
        gram, doc_n = G.all_grams_packed(ascii_arr, n)
        if len(gram):
            h1, h2 = _packed_hash_pair(gram, seed)
            _min_perms_blocked(h1, h2, doc_n, ascii_rows, out, num_perm)

    if len(other_rows):
        sub = arr.take(pa.array(other_rows))
        all_shingles: list[str] = []
        doc_n = np.zeros(len(other_rows), dtype=np.int64)
        for row, t in enumerate(sub.to_pylist()):
            t = t or ""
            if len(t) < n:
                sh = [t]
            else:
                sh = list({t[i : i + n] for i in range(len(t) - n + 1)})
            all_shingles.extend(sh)
            doc_n[row] = len(sh)
        if all_shingles:
            h1, h2 = hash64_pair(all_shingles, seed=seed)
            _min_perms_blocked(h1, h2, doc_n, other_rows, out, num_perm)
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
