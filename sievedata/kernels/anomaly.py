"""Per-partition statistical anomaly scoring against learned baselines.

Reproduces /root/reference/app/anomaly.py:27-94 with the database replaced by
profile columns (mean/std/count per partition_key) — the engine's profiles
table is the baseline store; ``bank_change`` comes from the Bloom referential
check rather than a remit-account lookup.
"""
from __future__ import annotations

from typing import Any

import numpy as np

Z_OUTLIER_THRESHOLD = 2.5


def anomaly_score(
    total: Any,
    mean_total: Any,
    std_total: Any,
    sample_count: int,
    bank_change: bool,
    vendor_hist_count: int | None = None,
    has_baseline: bool = True,
) -> tuple[float, list[str]]:
    """Scalar anomaly probability + reason codes.

    z = |total−mean|/std when std>0; else |total−mean|/max(|mean|,1) when
    count>10; z ≥ 2.5 ⇒ UNIT_PRICE_OUTLIER.  prob = 0.1 + min(z/5, 0.6)
    (+0.25 if bank_change) (×0.8 if hist<5), clamped ≤ 1.
    Ref: app/anomaly.py:72-94.
    """
    reasons: list[str] = []
    if bank_change:
        reasons.append("BANK_CHANGE")
    total_f = float(total or 0.0)
    mean_f = float(mean_total or 0.0) if has_baseline else 0.0
    std_f = float(std_total or 0.0) if has_baseline else 0.0
    count = int(sample_count or 0) if has_baseline else 0

    amount_z = 0.0
    if has_baseline and std_f > 0.0:
        amount_z = abs(total_f - mean_f) / std_f
    elif has_baseline and count > 10:
        amount_z = abs(total_f - mean_f) / max(abs(mean_f), 1.0)

    if amount_z >= Z_OUTLIER_THRESHOLD:
        reasons.append("UNIT_PRICE_OUTLIER")

    prob = 0.1 + min(amount_z / 5.0, 0.6)
    if bank_change:
        prob += 0.25
    if vendor_hist_count is not None and vendor_hist_count < 5:
        prob *= 0.8
    return float(min(prob, 1.0)), reasons


def anomaly_score_vec(
    total: np.ndarray,
    mean_total: np.ndarray,
    std_total: np.ndarray,
    sample_count: np.ndarray,
    bank_change: np.ndarray,
    vendor_hist_count: np.ndarray | None = None,
    has_baseline: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized anomaly scoring.

    Returns (prob, amount_z, is_outlier).  ``has_baseline`` marks rows whose
    partition has a profile row (others score with z=0, like the reference's
    missing-baseline branch).
    """
    total = np.nan_to_num(np.asarray(total, dtype=float))
    mean_total = np.nan_to_num(np.asarray(mean_total, dtype=float))
    std_total = np.nan_to_num(np.asarray(std_total, dtype=float))
    sample_count = np.nan_to_num(np.asarray(sample_count, dtype=float))
    bank_change = np.asarray(bank_change, dtype=bool)
    if has_baseline is None:
        has_baseline = np.ones(total.shape, dtype=bool)

    dev = np.abs(total - mean_total)
    with np.errstate(divide="ignore", invalid="ignore"):
        z_std = np.where(std_total > 0.0, dev / np.where(std_total > 0.0, std_total, 1.0), 0.0)
    z_mad = dev / np.maximum(np.abs(mean_total), 1.0)
    amount_z = np.where(
        has_baseline & (std_total > 0.0),
        z_std,
        np.where(has_baseline & (sample_count > 10), z_mad, 0.0),
    )
    is_outlier = amount_z >= Z_OUTLIER_THRESHOLD

    prob = 0.1 + np.minimum(amount_z / 5.0, 0.6)
    prob = prob + np.where(bank_change, 0.25, 0.0)
    if vendor_hist_count is not None:
        prob = prob * np.where(np.asarray(vendor_hist_count) < 5, 0.8, 1.0)
    return np.minimum(prob, 1.0), amount_z, is_outlier
