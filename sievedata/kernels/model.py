"""Duplicate-probability logistic model (from-scratch numpy).

The reference ships a fixed 13-feature fallback logistic regression
(/root/reference/app/duplicate_model.py:14-57) used whenever no trained
artifact exists — it is the deterministic default our correctness tests pin.
Weights/bias below reproduce that model's published coefficients (they ARE the
semantics of the default scorer).  A minimal gradient-descent trainer replaces
sklearn's LogisticRegression for the offline training path
(/root/reference/scripts/train_duplicate.py:100-121).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

FEATURE_ORDER = [
    "abs_total_diff_pct",
    "days_diff",
    "same_po",
    "same_currency",
    "same_tax_total",
    "bank_change_flag",
    "payee_name_change_flag",
    "invnum_edit",
    "line_coverage_pct",
    "unmatched_amount_frac",
    "count_new_items",
    "median_unit_price_diff",
    "text_cosine",
]

DEFAULT_WEIGHTS = np.array(
    [-1.2, -0.03, 0.8, 0.3, 0.2, -0.4, -0.1, -1.5, 1.6, -1.8, -0.4, -0.05, 2.2]
)
DEFAULT_BIAS = -0.3


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def predict_dup_prob_matrix(
    matrix: np.ndarray,
    weights: np.ndarray = DEFAULT_WEIGHTS,
    bias: float = DEFAULT_BIAS,
) -> np.ndarray:
    """Vectorized P(dup) for a (N, 13) matrix in FEATURE_ORDER, clamped [0,1]."""
    probs = _sigmoid(np.asarray(matrix, dtype=float) @ weights + bias)
    return np.clip(probs, 0.0, 1.0)


def features_to_vector(features: Mapping[str, Any]) -> np.ndarray:
    return np.array([float(features.get(name, 0.0) or 0.0) for name in FEATURE_ORDER])


def predict_dup_prob(features: Mapping[str, Any]) -> float:
    """P(dup) for one feature dict (missing features → 0.0), clamped [0,1].
    Ref: app/duplicate_model.py:74-80."""
    return float(predict_dup_prob_matrix(features_to_vector(features)[None, :])[0])


def train_logistic(
    X: np.ndarray,
    y: np.ndarray,
    lr: float = 0.1,
    epochs: int = 500,
    l2: float = 1e-4,
    class_weight_balanced: bool = True,
    seed: int = 0,
) -> tuple[np.ndarray, float]:
    """Batch-gradient-descent logistic regression (standardized inputs),
    replacing sklearn's ``LogisticRegression(max_iter=500,
    class_weight='balanced')`` in the training path.  Returns (weights, bias)
    in original feature units."""
    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    n, d = X.shape
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    if class_weight_balanced:
        n_pos = max(y.sum(), 1.0)
        n_neg = max(n - y.sum(), 1.0)
        sw = np.where(y == 1.0, n / (2.0 * n_pos), n / (2.0 * n_neg))
    else:
        sw = np.ones(n)
    w = np.zeros(d)
    b = 0.0
    for _ in range(epochs):
        p = _sigmoid(Xs @ w + b)
        g = (p - y) * sw
        gw = Xs.T @ g / n + l2 * w
        gb = g.mean()
        w -= lr * gw
        b -= lr * gb
    # de-standardize: w'·(x-mu)/sd + b  ==  (w'/sd)·x + (b - w'·mu/sd)
    w_orig = w / sd
    b_orig = b - float((w * mu / sd).sum())
    return w_orig, b_orig
