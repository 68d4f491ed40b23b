"""Offline duplicate-model training — the reference's
scripts/train_duplicate.py:24-121 re-expressed as a Ray Data pipeline:

1. score-parse the documents table (lines ride along)
2. per-vendor pair generation with weak labels (T2,
   scripts/train_duplicate.py:59-68: same invnum_norm ∨ same pdf_hash ∨
   (|Δtotal| ≤ 0.01 ∧ |Δdays| ≤ 5)), capped per group like the candidate
   blocking (implementation.md:1084-1101 samples; we cap deterministically)
3. featurize pairs with the F1+F2+F3 kernels (same FEATURE_ORDER)
4. driver-side numpy logistic fit (kernels.model.train_logistic — the
   sklearn replacement; feature matrices are small once capped) + train AUC

The fitted (weights, bias) are saved as .npz; scoring loads them in place of
the fallback weights (the reference's DUP_MODEL_PATH swap,
app/duplicate_model.py:12).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from sievedata.kernels.model import FEATURE_ORDER, train_logistic
from sievedata.pipelines.score import PairScorer, _explode_candidates
from sievedata.sources.storage import read_documents
from sievedata.stages.score_parse import score_parse_batch

_FEAT_COLS = [f"f_{n}" for n in FEATURE_ORDER]


def _weak_label(df: pd.DataFrame) -> np.ndarray:
    """T2 weak labels from pair features: exact invnum (invnum_edit == 0) ∨
    same pdf (pdf_equal) ∨ (|Δtotal| ≤ 0.01·|total| ∧ days ≤ 5)."""
    return (
        (df["f_invnum_edit"].to_numpy() == 0.0)
        | (df["pdf_equal"].to_numpy() == 1.0)
        | (
            (df["f_abs_total_diff_pct"].to_numpy() <= 0.0001)
            & (df["f_days_diff"].to_numpy() <= 5)
        )
    ).astype(float)


def build_pair_dataset(
    documents_path: str, n_buckets: int = 64, block_group_cap: int = 50
) -> pd.DataFrame:
    """Featurized candidate pairs with weak labels (distributed)."""
    pairs = (
        read_documents(documents_path)
        .map_batches(score_parse_batch, batch_format="pyarrow")
        .map_batches(lambda b: _explode_candidates(b, n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda df: PairScorer(block_group_cap=block_group_cap, per_doc_window=10)(df),
            batch_format="pandas",
        )
        .to_pandas()
    )
    pairs = pairs.drop_duplicates(["doc_id", "cand_id"]).reset_index(drop=True)
    pairs["label"] = _weak_label(pairs)
    return pairs


def roc_auc(y: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), scipy-free."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=float)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    pos = y == 1.0
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def train_duplicate_model(
    documents_path: str, out_path: str, seed: int = 0
) -> dict:
    """Full training run; skips (like the reference) when <2 classes."""
    pairs = build_pair_dataset(documents_path)
    X = pairs[_FEAT_COLS].to_numpy(dtype=float)
    y = pairs["label"].to_numpy(dtype=float)
    if len(np.unique(y)) < 2:
        return {"status": "skipped", "reason": "fewer than 2 label classes",
                "n_pairs": int(len(pairs))}
    w, b = train_logistic(X, y, seed=seed)
    scores = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    auc = roc_auc(y, scores)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, weights=w, bias=np.array([b]), feature_order=np.array(FEATURE_ORDER))
    return {"status": "trained", "n_pairs": int(len(pairs)),
            "n_pos": int(y.sum()), "train_auc": round(auc, 4), "model_path": out_path}


def load_trained_model(path: str) -> tuple[np.ndarray, float]:
    z = np.load(path, allow_pickle=False)
    assert list(z["feature_order"]) == FEATURE_ORDER
    return z["weights"], float(z["bias"][0])
