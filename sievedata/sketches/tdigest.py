"""Merging t-digest (Dunning & Ertl) for per-partition quantiles and
distribution-drift comparison (north_rule: t-digest quantile sketch per
partition; KS/PSI computed between a current-run digest and the stored
profile digest).

Centroids are (mean, weight) pairs kept sorted; compression uses the k1
scale function k(q) = δ/(2π)·asin(2q−1).  Merge = concatenate + compress
(weakly order-sensitive like all t-digests, but quantile error stays within
the usual 1/δ bound, and verdict thresholds tolerate it).
"""
from __future__ import annotations

import struct

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf_means", "_buf_weights")

    def __init__(self, delta: int = 200, means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)

    # -- construction -----------------------------------------------------
    def update(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return self
        v, cnt = np.unique(values, return_counts=True)
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, cnt.astype(np.float64)])
        self._compress()
        return self

    def merged(self, other: "TDigest") -> "TDigest":
        out = TDigest(
            self.delta,
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        out._compress()
        return out

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self) -> None:
        if self.means.size <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        means = self.means[order]
        weights = self.weights[order]
        total = weights.sum()
        new_means: list[float] = []
        new_weights: list[float] = []
        acc_mean = means[0]
        acc_w = weights[0]
        w_so_far = 0.0
        for i in range(1, means.size):
            q0 = w_so_far / total
            q2 = (w_so_far + acc_w + weights[i]) / total
            if self._k(np.array([q2]))[0] - self._k(np.array([q0]))[0] <= 1.0:
                acc_mean = (acc_mean * acc_w + means[i] * weights[i]) / (acc_w + weights[i])
                acc_w += weights[i]
            else:
                new_means.append(acc_mean)
                new_weights.append(acc_w)
                w_so_far += acc_w
                acc_mean = means[i]
                acc_w = weights[i]
        new_means.append(acc_mean)
        new_weights.append(acc_w)
        self.means = np.array(new_means)
        self.weights = np.array(new_weights)

    # -- queries ----------------------------------------------------------
    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(target, cum, self.means))

    def cdf(self, xs: np.ndarray) -> np.ndarray:
        """Approximate CDF at points xs (piecewise-linear between centroids)."""
        xs = np.atleast_1d(np.asarray(xs, dtype=np.float64))
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        out = np.interp(xs, self.means, cum / total, left=0.0, right=1.0)
        return out

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        header = struct.pack("<ii", self.delta, self.means.size)
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        delta, n = struct.unpack("<ii", data[:8])
        body = np.frombuffer(data[8:], dtype=np.float64)
        return cls(delta, body[:n].copy(), body[n : 2 * n].copy())
