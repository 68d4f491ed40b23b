"""Vectorized character n-gram kernels for exact Jaccard dedup.

The PPJoin pipeline (queries.q_ngram_jaccard_pairs) and its verification
stage need per-document DISTINCT n-gram sets and exact pairwise
intersection counts.  Doing that with Python ``set`` objects per document
(or per candidate pair) is the classic hot-stage sin: at sf0.1 the
verification alone was ~30 s for 1.5 M candidate pairs.

Fast path (pure numpy, no Python loop): for ASCII text every character is
one UTF-8 byte, so a char n-gram (n ≤ 7) packs LOSSLESSLY into a uint64 —
n bytes big-endian in the low bits plus a length tag above them (so the
empty gram of an empty document and short-document grams stay distinct
from real n-grams).  Per-document dedup is one ``np.unique`` over
``(doc_idx << TAG_SHIFT) | packed_gram`` keys; pair intersection is one
``np.unique`` over the concatenated per-side keys (a key seen twice is a
shared gram).  Non-ASCII batches fall back to exact Python sets — same
results, slower — so there is NO recall or precision loss anywhere, only
a speed cliff for non-ASCII corpora.

Reference semantics: char n-grams over the raw text, one gram per window,
short texts yield the whole text as their single gram (matches DuckDB
``substr(text, i, 5)`` with ``generate_series(1, greatest(len-4, 1))``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# n bytes (n ≤ 7) occupy bits [0, 8n); the 3-bit length tag sits right above
# them, and doc/pair indices occupy the remaining 64 − (8n+3) high bits.
_MAX_N = 7


def doc_capacity(n: int) -> int:
    """Max doc/pair indices that fit above an n-gram's packed bits."""
    return 1 << (64 - (8 * n + 3))


def is_ascii(texts: pa.Array | pa.ChunkedArray) -> bool:
    """True iff every non-null value is pure ASCII (char count == byte count)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return True
    valid = texts.drop_null()
    if len(valid) == 0:
        return True
    eq = pc.equal(pc.utf8_length(valid), pc.binary_length(valid))
    return bool(pc.min(eq).as_py())


def _buffers(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte values, per-string offsets) for a string/large_string array."""
    if pa.types.is_string(texts.type):
        texts = texts.cast(pa.large_string())
    n = len(texts)
    offsets = np.frombuffer(texts.buffers()[1], dtype=np.int64)[
        texts.offset : texts.offset + n + 1
    ]
    data = texts.buffers()[2]
    values = (np.frombuffer(data, dtype=np.uint8) if data is not None
              else np.empty(0, np.uint8))
    return values, offsets


def _pack_windows(
    buf: np.ndarray, starts: np.ndarray, n: int, tag_shift: int
) -> np.ndarray:
    """Pack n consecutive bytes at each start into uint64 (big-endian),
    with the constant length tag ``n << tag_shift``."""
    g = np.zeros(len(starts), dtype=np.uint64)
    for k in range(n):
        g = (g << np.uint64(8)) | buf[starts + k].astype(np.uint64)
    return g | (np.uint64(n) << np.uint64(tag_shift))


def distinct_grams_packed(
    texts: pa.Array | pa.ChunkedArray, n: int = 5
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document DISTINCT packed n-grams for an ASCII string array.

    Returns ``(doc_idx, gram, doc_n)`` where ``doc_idx``/``gram`` are
    parallel arrays (one row per distinct gram, grams uint64-packed and
    sorted within a doc) and ``doc_n[d]`` is doc d's distinct-gram count
    (0 for null texts, which produce no rows — SQL ``WHERE text IS NOT
    NULL`` semantics).

    Caller must ensure ``is_ascii(texts)`` and ``n <= 7``.  The doc-index
    tag occupies the 64 − (8n+3) bits above the gram, so batches beyond
    that capacity (2**21 docs at n=5, 2**13 at n=6, 2**5 at n=7) are
    processed in capacity-sized chunks and concatenated — same output,
    never a silent key collision.
    """
    if n > _MAX_N:
        raise ValueError(f"n={n} exceeds packable width {_MAX_N}")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ndocs = len(texts)
    cap = doc_capacity(n)
    if ndocs > cap:
        idx_parts, gram_parts, dn_parts = [], [], []
        for start in range(0, ndocs, cap):
            di, g, dn = distinct_grams_packed(texts.slice(start, cap), n)
            idx_parts.append(di + start)
            gram_parts.append(g)
            dn_parts.append(dn)
        return (np.concatenate(idx_parts), np.concatenate(gram_parts),
                np.concatenate(dn_parts))
    doc_n = np.zeros(ndocs, dtype=np.int64)
    if ndocs == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64), doc_n

    tag_shift = 8 * n  # length tag right above the gram bytes
    key_shift = np.uint64(tag_shift + 3)  # 3 bits fit lengths 0..7

    valid = np.ones(ndocs, dtype=bool)
    if texts.null_count:
        valid = np.asarray(texts.is_valid())
    buf, offsets = _buffers(texts)
    lens = np.diff(offsets)
    lens = np.where(valid, lens, -1)  # nulls: no grams at all

    keys_parts: list[np.ndarray] = []

    # Full-width windows: docs with len >= n contribute len-n+1 grams.
    full = np.nonzero(lens >= n)[0]
    if len(full):
        m = lens[full] - n + 1
        doc_rep = np.repeat(full, m)
        csum = np.concatenate(([0], np.cumsum(m)))
        within = np.arange(csum[-1], dtype=np.int64) - np.repeat(csum[:-1], m)
        starts = offsets[doc_rep] + within
        g = _pack_windows(buf, starts, n, tag_shift)
        keys_parts.append((doc_rep.astype(np.uint64) << key_shift) | g)

    # Short docs (0 <= len < n): single gram = the whole text, length-tagged.
    short = np.nonzero((lens >= 0) & (lens < n))[0]
    for d in short:  # rare; bounded by count of sub-n-char docs
        o = offsets[d]
        ln = int(lens[d])
        g = np.uint64(0)
        for k in range(ln):
            g = (g << np.uint64(8)) | np.uint64(buf[o + k])
        g |= np.uint64(ln) << np.uint64(tag_shift)
        keys_parts.append(
            np.array([(np.uint64(d) << key_shift) | g], dtype=np.uint64)
        )

    if not keys_parts:
        return np.empty(0, np.int64), np.empty(0, np.uint64), doc_n
    keys = np.unique(np.concatenate(keys_parts))
    doc_idx = (keys >> key_shift).astype(np.int64)
    gram = keys & ((np.uint64(1) << key_shift) - np.uint64(1))
    counts = np.bincount(doc_idx, minlength=ndocs)
    doc_n[: len(counts)] = counts
    return doc_idx, gram, doc_n


def all_grams_packed(
    texts: pa.Array | pa.ChunkedArray, n: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """ALL packed n-gram windows per document (duplicates kept, doc-major
    order) for an ASCII string array — the MinHash input: min over a
    multiset equals min over its set, so the ``np.unique`` sort that
    ``distinct_grams_packed`` pays (the single hottest kernel in validate
    stage 1) is pure waste for signature computation.

    Returns ``(gram, doc_n)``: ``gram`` holds doc 0's windows, then doc
    1's, …; ``doc_n[d]`` is doc d's window count (``len-n+1`` for full
    docs, 1 whole-text gram for ``len < n``, 0 for nulls).  No doc-index
    tag is packed, so there is NO per-batch capacity limit here.  Caller
    must ensure ``is_ascii(texts)`` and ``n <= 7``."""
    if n > _MAX_N:
        raise ValueError(f"n={n} exceeds packable width {_MAX_N}")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ndocs = len(texts)
    if ndocs == 0:
        return np.empty(0, np.uint64), np.zeros(0, np.int64)
    tag_shift = 8 * n

    valid = np.ones(ndocs, dtype=bool)
    if texts.null_count:
        valid = np.asarray(texts.is_valid())
    buf, offsets = _buffers(texts)
    lens = np.diff(offsets)
    lens = np.where(valid, lens, -1)  # nulls: no grams at all

    doc_n = np.where(lens >= n, lens - n + 1, np.where(lens >= 0, 1, 0))
    doc_n = doc_n.astype(np.int64)
    out_off = np.concatenate(([0], np.cumsum(doc_n)))
    out = np.zeros(out_off[-1], dtype=np.uint64)

    full = np.nonzero(lens >= n)[0]
    if len(full):
        m = doc_n[full]
        doc_rep = np.repeat(full, m)
        csum = np.concatenate(([0], np.cumsum(m)))
        within = np.arange(csum[-1], dtype=np.int64) - np.repeat(csum[:-1], m)
        starts = offsets[doc_rep] + within
        out[out_off[doc_rep] + within] = _pack_windows(buf, starts, n, tag_shift)

    short = np.nonzero((lens >= 0) & (lens < n))[0]
    for d in short:  # rare; bounded by count of sub-n-char docs
        o = offsets[d]
        g = np.uint64(0)
        for k in range(int(lens[d])):
            g = (g << np.uint64(8)) | np.uint64(buf[o + k])
        out[out_off[d]] = g | (np.uint64(int(lens[d])) << np.uint64(tag_shift))
    return out, doc_n


def packed_to_strings(gram: np.ndarray, n: int) -> pa.Array:
    """Decode packed uint64 grams back to their exact ASCII strings."""
    tag_shift = np.uint64(8 * n)
    lens = (gram >> tag_shift).astype(np.int64)
    be = gram.astype(">u8").view(np.uint8).reshape(-1, 8)
    if len(gram) and (lens == n).all():  # common case: uniform width
        values = be[:, 8 - n :].ravel()
        offsets = np.arange(len(gram) + 1, dtype=np.int32) * n
    else:
        chunks = [be[i, 8 - int(ln) : 8] if ln else np.empty(0, np.uint8)
                  for i, ln in enumerate(lens)]
        values = (np.concatenate(chunks) if chunks
                  else np.empty(0, np.uint8))
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.Array.from_buffers(
        pa.string(),
        len(gram),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())],
    )


def pair_jaccard_counts_indexed(
    doc_texts: pa.Array | pa.ChunkedArray,
    a_idx: np.ndarray,
    b_idx: np.ndarray,
    n: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact (intersection, union) gram-set sizes for pairs given as
    indices into a deduplicated ``doc_texts`` array.

    Packs each UNIQUE document once (candidate docs appear in many pairs —
    per-pair re-packing was the hot spot), then intersects per pair with a
    single ``searchsorted``: tagging each gram with its pair index keeps
    the concatenated a-side keys globally sorted (pair-major, grams sorted
    within a doc by construction), so no per-batch sort is needed at all.
    """
    if isinstance(doc_texts, pa.ChunkedArray):
        doc_texts = doc_texts.combine_chunks()
    rows = len(a_idx)
    if rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if not is_ascii(doc_texts):
        ta = doc_texts.take(pa.array(a_idx))
        tb = doc_texts.take(pa.array(b_idx))
        return pair_jaccard_counts(ta, tb, n)
    gram, starts, doc_n = pack_doc_grams(doc_texts, n)
    return intersect_packed(gram, starts, doc_n, a_idx, b_idx, n)


def pack_doc_grams(
    texts: pa.Array | pa.ChunkedArray, n: int = 5
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc distinct packed gram arrays in CSR layout: ``(gram, starts,
    doc_n)`` with doc d's sorted grams at ``gram[starts[d]:starts[d+1]]``.
    Pack ONCE, intersect many times — the broadcastable side of pair
    verification."""
    _, gram, doc_n = distinct_grams_packed(texts, n)
    starts = np.concatenate(([0], np.cumsum(doc_n)))
    return gram, starts, doc_n


def intersect_packed(
    gram: np.ndarray,
    starts: np.ndarray,
    doc_n: np.ndarray,
    a_idx: np.ndarray,
    b_idx: np.ndarray,
    n: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """(intersection, union) sizes for doc-index pairs over a CSR gram
    table from :func:`pack_doc_grams`.  Two gathers + one searchsorted —
    no sort: tagging grams with their pair index keeps the concatenated
    a-side keys globally ordered (pair-major, grams pre-sorted per doc)."""
    rows = len(a_idx)
    if rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cap = min(doc_capacity(n), 1 << 20)  # pair tag must fit; bound memory
    if rows > cap:
        outs = [intersect_packed(gram, starts, doc_n,
                                 a_idx[s:s + cap], b_idx[s:s + cap], n)
                for s in range(0, rows, cap)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))
    key_shift = np.uint64(8 * n + 3)
    na = doc_n[a_idx]
    nb = doc_n[b_idx]

    def _gather_keys(idx: np.ndarray, sizes: np.ndarray) -> np.ndarray:
        csum = np.concatenate(([0], np.cumsum(sizes)))
        total = int(csum[-1])
        if total == 0:
            return np.empty(0, np.uint64)
        pair_rep = np.repeat(
            np.arange(len(idx), dtype=np.uint64), sizes
        )
        within = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], sizes)
        pos = np.repeat(starts[idx], sizes) + within
        return (pair_rep << key_shift) | gram[pos]

    ka = _gather_keys(a_idx, na)
    kb = _gather_keys(b_idx, nb)
    if len(ka) == 0 or len(kb) == 0:
        inter = np.zeros(rows, dtype=np.int64)
        return inter, na + nb - inter
    pos = np.searchsorted(ka, kb)
    valid = pos < len(ka)
    hit = np.zeros(len(kb), dtype=bool)
    hit[valid] = ka[pos[valid]] == kb[valid]
    pair_of_kb = np.repeat(np.arange(rows, dtype=np.int64), nb)
    inter = np.bincount(pair_of_kb[hit], minlength=rows).astype(np.int64)
    return inter, na + nb - inter


def _py_gram_set(tx: str, n: int) -> set:
    return {tx[i : i + n] for i in range(max(len(tx) - n + 1, 1))}


def pair_jaccard_counts(
    texts_a: pa.Array | pa.ChunkedArray,
    texts_b: pa.Array | pa.ChunkedArray,
    n: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-row (intersection, union) sizes of the two texts'
    distinct char n-gram sets.  Vectorized for ASCII batches (one
    np.unique per side + one over the concatenation: a (row, gram) key
    appearing on both sides is a shared gram); exact Python-set fallback
    otherwise."""
    if isinstance(texts_a, pa.ChunkedArray):
        texts_a = texts_a.combine_chunks()
    if isinstance(texts_b, pa.ChunkedArray):
        texts_b = texts_b.combine_chunks()
    rows = len(texts_a)
    if rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cap = doc_capacity(n)
    if rows > cap:  # row tag must fit above the packed gram
        outs = [pair_jaccard_counts(texts_a.slice(s, cap),
                                    texts_b.slice(s, cap), n)
                for s in range(0, rows, cap)]
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))
    if is_ascii(texts_a) and is_ascii(texts_b):
        ia, ga, na = distinct_grams_packed(texts_a, n)
        ib, gb, nb = distinct_grams_packed(texts_b, n)
        key_shift = np.uint64(8 * n + 3)
        ka = (ia.astype(np.uint64) << key_shift) | ga
        kb = (ib.astype(np.uint64) << key_shift) | gb
        both, cnt = np.unique(np.concatenate([ka, kb]), return_counts=True)
        shared = both[cnt == 2] >> key_shift
        inter = np.bincount(shared.astype(np.int64), minlength=rows)
        inter = inter.astype(np.int64)
        uni = na + nb - inter
        return inter, uni
    inter = np.empty(rows, dtype=np.int64)
    uni = np.empty(rows, dtype=np.int64)
    for i, (ta, tb) in enumerate(zip(texts_a.to_pylist(), texts_b.to_pylist())):
        # null ⇒ empty gram set, matching the ASCII path (no rows for nulls)
        A = _py_gram_set(ta, n) if ta is not None else set()
        B = _py_gram_set(tb, n) if tb is not None else set()
        iv = len(A & B)
        inter[i] = iv
        uni[i] = len(A) + len(B) - iv
    return inter, uni


# --- Bitset verification (small global vocabularies) ---------------------
#
# The df aggregate in the PPJoin fast path computes the GLOBAL distinct
# gram vocabulary as a byproduct.  Templated corpora (boilerplate text
# with substituted fields) have tiny vocabularies — thousands of grams
# for millions of documents — which makes the CSR searchsorted kernel
# pathological: every pair gathers its two full gram lists (~hundreds of
# uint64 each), so a 64k-pair batch allocates ~0.5 GB and verification is
# memory-bandwidth-bound.  With a small vocab, each doc's DISTINCT gram
# set is a |vocab|-bit bitset; pair intersection = popcount(a AND b) over
# a few uint64 lanes — ~100× less traffic, exact same counts.

_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)


def build_bitsets(
    gram: np.ndarray, starts: np.ndarray, doc_n: np.ndarray, vocab: np.ndarray
) -> np.ndarray:
    """(ndocs, words) uint64 bitsets from a CSR gram table
    (:func:`pack_doc_grams`) over a sorted global ``vocab`` of packed
    grams.  Every gram must be present in ``vocab``."""
    ndocs = len(doc_n)
    words = (len(vocab) + 63) // 64
    bits = np.zeros((ndocs, words), dtype=np.uint64)
    if len(gram) == 0:
        return bits
    vid = np.searchsorted(vocab, gram)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), doc_n)
    flat = doc_of * words + (vid >> 6)
    bit = np.uint64(1) << (vid & 63).astype(np.uint64)
    # grams are sorted per doc ⇒ flat is non-decreasing: one reduceat OR
    # per (doc, word) run instead of a slow ufunc.at scatter
    bounds = np.flatnonzero(np.diff(flat)) + 1
    run_starts = np.concatenate(([0], bounds))
    bits.reshape(-1)[flat[run_starts]] = np.bitwise_or.reduceat(
        bit, run_starts
    )
    return bits


def intersect_bitsets(
    bits: np.ndarray, doc_n: np.ndarray, a_idx: np.ndarray, b_idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(intersection, union) distinct-gram counts for doc-index pairs via
    popcount of ANDed bitsets."""
    rows = len(a_idx)
    if rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    band = bits[a_idx] & bits[b_idx]
    inter = _POPCOUNT8[band.view(np.uint8)].sum(axis=1, dtype=np.int64)
    uni = doc_n[a_idx] + doc_n[b_idx] - inter
    return inter, uni
