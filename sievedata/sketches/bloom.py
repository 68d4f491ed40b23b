"""Bloom filter for broadcast referential checks (media_ref → media catalog).

Replaces the reference's per-request remit-account existence lookup
(/root/reference/app/anomaly.py:45-70): the catalog key set is folded into a
Bloom filter once, ``ray.put`` once, probed vectorized per batch; a miss is a
definitive violation (no false negatives).

Kirsch-Mitzenmacher double hashing: g_i(x) = h1(x) + i·h2(x).
Merge = bitwise OR (same size/seed).
"""
from __future__ import annotations

import numpy as np

from sievedata.sketches.hashing import hash64_pair


class BloomFilter:
    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, capacity: int, fp_rate: float = 1e-4, bits: np.ndarray | None = None, k: int | None = None):
        if bits is not None:
            self.bits = bits
            self.n_bits = bits.size * 64
            self.k = k or 7
            return
        capacity = max(int(capacity), 1)
        n_bits = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        n_words = max((n_bits + 63) // 64, 1)
        self.n_bits = n_words * 64
        self.k = max(int(round(self.n_bits / capacity * np.log(2))), 1)
        self.k = min(self.k, 16)
        self.bits = np.zeros(n_words, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        h1, h2 = hash64_pair(values, seed=77)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            pos = (h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)
        return pos  # shape (k, n)

    def add(self, values) -> "BloomFilter":
        pos = self._positions(values)
        word = (pos >> np.uint64(6)).ravel()
        bit = (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.bits, word.astype(np.int64), np.uint64(1) << bit)
        return self

    def contains(self, values) -> np.ndarray:
        """Vectorized membership probe → bool array."""
        pos = self._positions(values)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = pos & np.uint64(63)
        hits = (self.bits[word] >> bit) & np.uint64(1)
        return hits.all(axis=0)

    def merged(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        return BloomFilter(0, bits=self.bits | other.bits, k=self.k)

    def to_bytes(self) -> bytes:
        return np.uint64(self.k).tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        k = int(np.frombuffer(data[:8], dtype=np.uint64)[0])
        bits = np.frombuffer(data[8:], dtype=np.uint64).copy()
        return cls(0, bits=bits, k=k)
