"""Distribution-drift statistics: PSI and two-sample KS (scipy-free).

Implements the spec'd per-vendor drift monitors of the reference
(/root/reference/architecture.md:223, requirements.md:258 — PSI / KS per
vendor, breach ⇒ fallback + alert) as pure functions over t-digest sketches
or histograms.  KS p-value uses the asymptotic Kolmogorov distribution
(Smirnov's series), which is what scipy.stats.ks_2samp(mode='asymp') computes.
"""
from __future__ import annotations

import numpy as np

from sievedata.sketches.tdigest import TDigest

PSI_THRESHOLD = 0.2
KS_P_THRESHOLD = 0.01


def psi(expected_frac: np.ndarray, actual_frac: np.ndarray, eps: float = 1e-4) -> float:
    """Population Stability Index over matched histogram bins.

    PSI = Σ (a_i − e_i)·ln(a_i / e_i), with zero-bin flooring at eps.
    Standard industry thresholds: <0.1 stable, 0.1-0.2 moderate, >0.2 shifted.
    """
    e = np.clip(np.asarray(expected_frac, dtype=float), eps, None)
    a = np.clip(np.asarray(actual_frac, dtype=float), eps, None)
    e = e / e.sum()
    a = a / a.sum()
    return float(np.sum((a - e) * np.log(a / e)))


def psi_from_digests(profile: TDigest, current: TDigest, n_bins: int = 10) -> float:
    """PSI with bins at the profile digest's deciles (equal-expected-mass)."""
    if profile.count == 0 or current.count == 0:
        return 0.0
    qs = np.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    edges = np.array([profile.quantile(q) for q in qs])
    edges = np.unique(edges)
    if edges.size == 0:
        return 0.0

    def hist(d: TDigest) -> np.ndarray:
        cdf = d.cdf(edges)
        cdf = np.concatenate([[0.0], cdf, [1.0]])
        return np.diff(cdf)

    return psi(hist(profile), hist(current))


def ks_statistic(a: "TDigest | np.ndarray", b: "TDigest | np.ndarray", n_points: int = 201) -> float:
    """Two-sample KS statistic D = sup|F_a − F_b|.

    Exact when both sides are raw samples; evaluated on a quantile grid when
    either side is a digest.
    """
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        a = np.sort(a)
        b = np.sort(b)
        allv = np.concatenate([a, b])
        cdf_a = np.searchsorted(a, allv, side="right") / a.size
        cdf_b = np.searchsorted(b, allv, side="right") / b.size
        return float(np.abs(cdf_a - cdf_b).max())
    fa = a.cdf if isinstance(a, TDigest) else _empirical_cdf(a)
    fb = b.cdf if isinstance(b, TDigest) else _empirical_cdf(b)
    lo = min(
        a.quantile(0.0) if isinstance(a, TDigest) else float(np.min(a)),
        b.quantile(0.0) if isinstance(b, TDigest) else float(np.min(b)),
    )
    hi = max(
        a.quantile(1.0) if isinstance(a, TDigest) else float(np.max(a)),
        b.quantile(1.0) if isinstance(b, TDigest) else float(np.max(b)),
    )
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        return 0.0
    grid = np.linspace(lo, hi, n_points)
    return float(np.abs(fa(grid) - fb(grid)).max())


def _empirical_cdf(samples: np.ndarray):
    s = np.sort(np.asarray(samples, dtype=float))

    def cdf(xs: np.ndarray) -> np.ndarray:
        return np.searchsorted(s, np.atleast_1d(xs), side="right") / s.size

    return cdf


def ks_pvalue(d: float, n_a: float, n_b: float) -> float:
    """Asymptotic two-sample KS p-value (Smirnov series)."""
    if n_a <= 0 or n_b <= 0 or d <= 0:
        return 1.0
    en = np.sqrt(n_a * n_b / (n_a + n_b))
    t = (en + 0.12 + 0.11 / en) * d
    # Q_KS(t) = 2 Σ_{k≥1} (−1)^{k−1} exp(−2 k² t²)
    ks = np.arange(1, 101)
    terms = 2.0 * ((-1.0) ** (ks - 1)) * np.exp(-2.0 * (ks**2) * (t**2))
    p = float(terms.sum())
    return float(min(max(p, 0.0), 1.0))
