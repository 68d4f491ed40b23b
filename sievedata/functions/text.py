"""Text-analysis kernels for training-data pipelines, all vectorized per
batch: token counting, quality scoring, language-ID heuristic, document
fingerprinting.  Used by map_batches stages over the ``documents`` table.
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.sketches.hashing import hash64

_WORD_RE = re.compile(r"[A-Za-z0-9']+")

# GPT-2-style pre-tokenizer pattern, restricted to ASCII classes and with
# the trailing-whitespace lookahead removed so python re and RE2 (DuckDB)
# agree exactly (RE2 has no lookahead).  Whitespace is an EXPLICIT class,
# not \s: python's \s is Unicode-aware (and ASCII \s includes \v) while
# RE2's \s is [\t\n\f\r ] — the explicit class is identical in both
# engines.  Compiled once at module load.
_BPE_WS = r" \t\n\f\r"
_BPE_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^"
    + _BPE_WS + r"a-zA-Z0-9]+|[" + _BPE_WS + r"]+"
)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# (public-knowledge common function words)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and a to in is you that it he was for on are".split()),
    "de": frozenset("der die das und ist ein eine zu den von mit nicht".split()),
    "fr": frozenset("le la les et un une des est pour que dans il".split()),
    "es": frozenset("el la los las y un una de en es por que".split()),
    "zh": frozenset(),  # no-latin-stopword fallback bucket
}


def token_count_column(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Whitespace-token count per string (vectorized)."""
    counts = pc.list_value_length(pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
    empty = pc.equal(pc.utf8_trim_whitespace(text), "")
    return pc.if_else(empty, pa.scalar(0, pa.int32()), counts)


def bpe_token_count_column(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """BPE-ish pre-token count per string (the GPT-2 split pattern, ASCII
    variant) — the token-budget estimator a training-data pipeline uses
    before running a real tokenizer.  Regex compiled once at module load;
    python loop is per-batch, not per-task."""
    return pa.array(
        [len(_BPE_RE.findall(t)) if t is not None else 0 for t in text.to_pylist()],
        pa.int64(),
    )


def word_token_count_column(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Word-token count: count of alnum/apostrophe runs (regex compiled once
    at module load; python loop is per-batch, not per-task)."""
    return pa.array(
        [len(_WORD_RE.findall(t)) if t is not None else 0 for t in text.to_pylist()],
        pa.int64(),
    )


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality signals per document."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text)
    n_tokens = token_count_column(text)
    # punct count = chars remaining after stripping alnum+space
    punct = pc.utf8_length(pc.replace_substring_regex(text, r"[a-zA-Z0-9\s]", ""))
    avg_token_len = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(
            pc.cast(pc.utf8_length(pc.replace_substring_regex(text, r"\s+", "")), pa.float64()),
            pc.cast(n_tokens, pa.float64()),
        ),
        pa.scalar(0.0),
    )
    out = batch.select([c for c in ("doc_id", text_col) if c in batch.column_names])
    out = out.append_column("n_chars", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("punct_count", pc.cast(punct, pa.int64()))
    out = out.append_column("avg_token_len", avg_token_len)
    return out


class LangId:
    """Stopword-profile language classifier — an actor-pool stage
    (profiles + regex compiled once per actor in __init__).

    ``__call__`` is vectorized across the batch: one regex split +
    ``pc.is_in`` membership pass per language builds a (docs × langs) hit
    matrix, argmax with the scalar path's first-greater tie rule.
    ``classify`` keeps the per-row reference implementation (parity-tested
    against the batch path)."""

    def __init__(self):
        self.word = re.compile(r"[a-z']+")
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}
        self.langs = sorted(self.profiles)
        self._prof_arrays = [
            pa.array(sorted(self.profiles[lang]), pa.string())
            for lang in self.langs
        ]

    def classify(self, text: str) -> str:
        toks = self.word.findall(text.lower())
        if not toks:
            return "und"
        best_lang, best_hits = "und", 0
        for lang in self.langs:
            hits = sum(1 for t in toks if t in self.profiles[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(txt)
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), "[^a-z']+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, prof in enumerate(self._prof_arrays):
            m = pc.is_in(flat, value_set=prof).to_numpy(zero_copy_only=False)
            if m.any():
                hits[:, j] = np.bincount(parents[m], minlength=n)
        # first max in sorted-lang order == the scalar strictly-greater scan
        best = hits.argmax(axis=1) if len(self.langs) else np.zeros(n, np.int64)
        lang_arr = np.asarray(self.langs, dtype=object)
        preds = np.where(hits.max(axis=1, initial=0) > 0, lang_arr[best], "und")
        return batch.select(["doc_id"]).append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string()))


def utf8_codepoints(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized UTF-8 → codepoint decode for a string Array (no nulls):
    returns (char_parent_row, codepoints, chars_per_row).  Pure numpy — a
    left-fold over the ≤ 4 byte positions within each character — so the
    hot path stays loop-free over rows and bytes."""
    flat = arr.cast(pa.large_binary())
    n_rows = len(flat)
    if n_rows == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
        flat.offset: flat.offset + n_rows + 1]
    data = flat.buffers()[2]
    buf = (np.frombuffer(data, dtype=np.uint8)[offs[0]:offs[-1]]
           if data is not None else np.empty(0, np.uint8))
    if buf.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.zeros(n_rows, np.int64))
    lens = offs[1:] - offs[:-1]
    byte_parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    is_lead = (buf & 0xC0) != 0x80
    char_id = np.cumsum(is_lead) - 1           # global char index per byte
    n_chars = int(char_id[-1]) + 1
    b = buf.astype(np.int64)
    lead_val = np.where(b < 0x80, b,
               np.where(b >= 0xF0, b & 0x07,
               np.where(b >= 0xE0, b & 0x0F, b & 0x1F)))
    # byte position within its character: global byte index − lead index
    lead_byte_idx = np.flatnonzero(is_lead)
    within = np.arange(buf.size, dtype=np.int64) - lead_byte_idx[char_id]
    cp = np.zeros(n_chars, dtype=np.int64)
    for p in range(4):
        sel = within == p
        if not sel.any():
            break
        ids = char_id[sel]
        v = lead_val[sel] if p == 0 else (b[sel] & 0x3F)
        cp[ids] = (cp[ids] * 64 if p else 0) + v
    char_parent = byte_parent[lead_byte_idx]
    chars_per_row = np.bincount(char_parent, minlength=n_rows).astype(np.int64)
    return char_parent, cp, chars_per_row


def fingerprint_column(text: pa.Array | pa.ChunkedArray, seed: int = 9001) -> pa.Array:
    """64-bit content fingerprint per document (vectorized rolling hash)."""
    h = hash64(text, seed=seed)
    return pa.array([f"{int(x):016x}" for x in h], pa.string())


def simhash_column(texts: list[str], n: int = 4, seed: int = 4242) -> np.ndarray:
    """64-bit SimHash per document over DISTINCT char n-gram features.

    Vectorized across the whole batch (the minhash_signature_batch
    treatment): one distinct-shingle extraction (packed uint64 windows on
    the ascii fast path), ONE hash call over the concatenated shingle list,
    then per-doc signed bit votes via ``np.add.reduceat`` — bit-identical
    to the old per-doc loop (votes are order-insensitive sums over the same
    distinct-gram hash values; short texts yield the whole text)."""
    from sievedata.kernels import grams as G

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        arr = texts if not texts.null_count else pc.fill_null(texts, "")
    else:
        arr = pa.array([t if t is not None else "" for t in texts], pa.string())
    n_docs = len(arr)
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return out
    if n <= 7 and G.is_ascii(arr):
        _, gram, doc_n = G.distinct_grams_packed(arr, n)
        shingles = G.packed_to_strings(gram, n)
        offsets = np.concatenate(([0], np.cumsum(doc_n))).astype(np.int64)
    else:
        all_shingles: list[str] = []
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        for row, t in enumerate(arr.to_pylist()):
            t = t or ""
            sh = [t] if len(t) < n else list({t[i: i + n] for i in range(len(t) - n + 1)})
            all_shingles.extend(sh)
            offsets[row + 1] = offsets[row] + len(sh)
        shingles = all_shingles
    if len(shingles) == 0:
        return out
    h = hash64(shingles, seed=seed)
    counts = np.diff(offsets)
    bit_ix = np.arange(64, dtype=np.uint64)
    # chunk docs so the (grams × 64) vote matrix stays bounded
    max_grams = 262_144
    d0 = 0
    while d0 < n_docs:
        d1 = d0
        g = 0
        while d1 < n_docs and (g == 0 or g + counts[d1] <= max_grams):
            g += counts[d1]
            d1 += 1
        hs = h[offsets[d0]:offsets[d1]]
        sub_counts = counts[d0:d1]
        sub_starts = (offsets[d0:d1] - offsets[d0])
        nonempty = sub_counts > 0
        if hs.size and nonempty.any():
            bits = ((hs[:, None] >> bit_ix) & np.uint64(1)).astype(np.int64)
            sums = np.add.reduceat(bits, sub_starts[nonempty], axis=0)
            votes = 2 * sums - sub_counts[nonempty][:, None]
            sig = ((votes > 0).astype(np.uint64) << bit_ix[None, :]).sum(
                axis=1, dtype=np.uint64)
            out[d0 + np.flatnonzero(nonempty)] = sig
        d0 = d1
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
