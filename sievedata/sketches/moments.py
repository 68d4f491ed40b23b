"""Streaming moments (count / mean / M2) with Chan-style parallel merge.

Replaces the reference's pandas ``groupby("vendor_id")["total"].agg(mean, std,
count)`` baseline job (/root/reference/scripts/train_anomaly.py:17-53) with a
single-pass mergeable statistic: partials per Arrow block, merged per
partition.  ``std`` uses ddof=1 to match pandas ``.std()``.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_FMT = "<qddd d"  # count, mean, m2, min, max


@dataclass
class Moments:
    count: int = 0
    mean: float = 0.0
    m2: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")

    def update(self, values: np.ndarray) -> "Moments":
        """Vectorized bulk update (one pass over a numpy array)."""
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        n = values.size
        if n == 0:
            return self
        b_mean = float(values.mean())
        b_m2 = float(((values - b_mean) ** 2).sum())
        other = Moments(n, b_mean, b_m2, float(values.min()), float(values.max()))
        merged = self.merged(other)
        self.count, self.mean, self.m2 = merged.count, merged.mean, merged.m2
        self.min, self.max = merged.min, merged.max
        return self

    def merged(self, other: "Moments") -> "Moments":
        """Chan et al. parallel combination — associative, commutative."""
        if other.count == 0:
            return Moments(self.count, self.mean, self.m2, self.min, self.max)
        if self.count == 0:
            return Moments(other.count, other.mean, other.m2, other.min, other.max)
        n = self.count + other.count
        delta = other.mean - self.mean
        mean = self.mean + delta * other.count / n
        m2 = self.m2 + other.m2 + delta * delta * self.count * other.count / n
        return Moments(n, mean, m2, min(self.min, other.min), max(self.max, other.max))

    @property
    def variance(self) -> float:
        """Sample variance, ddof=1 (pandas .std() semantics); 0.0 when n<2."""
        if self.count < 2:
            return 0.0
        return self.m2 / (self.count - 1)

    @property
    def std(self) -> float:
        return float(np.sqrt(self.variance))

    def to_bytes(self) -> bytes:
        return struct.pack(_FMT, self.count, self.mean, self.m2, self.min, self.max)

    @classmethod
    def from_bytes(cls, data: bytes) -> "Moments":
        count, mean, m2, mn, mx = struct.unpack(_FMT, data)
        return cls(count, mean, m2, mn, mx)
