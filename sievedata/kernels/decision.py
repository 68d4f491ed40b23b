"""Score fusion + thresholded decision.

Reproduces the reference's *code* semantics (/root/reference/app/decision.py:7-32)
— NOT the spec formula at requirements.md:139; the reference's own test
(tests/test_decision.py) pins the code path, so that is ground truth.
"""
from __future__ import annotations

import numpy as np

HOLD = "HOLD"
REVIEW = "REVIEW"
PASS = "PASS"


def fuse_scores(
    dup_prob: float, anom_prob: float, bank_change: bool, text_dup_prob: float
) -> float:
    """0-100 risk score: (0.7·dup + 0.2·max(dup, text) + 0.1·anom)·100,
    bank_change ⇒ +15 capped at 100 then floored at 80; clamp [0, 100]."""
    score = (0.7 * dup_prob + 0.2 * max(dup_prob, text_dup_prob) + 0.1 * anom_prob) * 100.0
    if bank_change:
        score = min(100.0, score + 15.0)
        score = max(score, 80.0)
    return float(max(0.0, min(score, 100.0)))


def fuse_scores_vec(
    dup_prob: np.ndarray,
    anom_prob: np.ndarray,
    bank_change: np.ndarray,
    text_dup_prob: np.ndarray,
) -> np.ndarray:
    """Vectorized fuse_scores over numpy arrays (bank_change: bool array)."""
    score = (0.7 * dup_prob + 0.2 * np.maximum(dup_prob, text_dup_prob) + 0.1 * anom_prob) * 100.0
    bumped = np.maximum(np.minimum(100.0, score + 15.0), 80.0)
    score = np.where(bank_change, bumped, score)
    return np.clip(score, 0.0, 100.0)


def decide(score: float, review_threshold: float, hold_threshold: float) -> str:
    """score ≥ T_hold → HOLD; ≥ T_review → REVIEW; else PASS.
    Raises when T_hold < T_review.  Defaults in the reference: 80/50."""
    if hold_threshold < review_threshold:
        raise ValueError("hold_threshold must be >= review_threshold")
    if score >= hold_threshold:
        return HOLD
    if score >= review_threshold:
        return REVIEW
    return PASS


def decide_vec(
    score: np.ndarray, review_threshold: float, hold_threshold: float
) -> np.ndarray:
    """Vectorized decide → array of 'HOLD'/'REVIEW'/'PASS'."""
    if hold_threshold < review_threshold:
        raise ValueError("hold_threshold must be >= review_threshold")
    out = np.where(
        score >= hold_threshold, HOLD, np.where(score >= review_threshold, REVIEW, PASS)
    )
    return out
