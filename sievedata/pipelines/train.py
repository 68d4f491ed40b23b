"""Offline duplicate-model training — the reference's
scripts/train_duplicate.py:24-121 re-expressed as a Ray Data pipeline:

1. score-parse the documents table (lines ride along)
2. per-vendor pair generation with weak labels (T2,
   scripts/train_duplicate.py:59-68: same invnum_norm ∨ same pdf_hash ∨
   (|Δtotal| ≤ 0.01 ABSOLUTE dollars ∧ |Δdays| ≤ 5)), capped per group like
   the candidate blocking
3. deterministic bounded sampling INSIDE the distributed stage — the
   reference caps its training set at 500 positive + 2000 negative pairs
   (implementation.md:1084-1101 LIMIT 500 / LIMIT 2000); we keep at most
   that many per class PER BUCKET (ranked by a stable pair hash), so the
   driver collect is ≤ n_buckets × 2500 rows regardless of corpus size,
   then apply the same global 500/2000 rank cap on the driver
4. featurize pairs with the F1+F2+F3 kernels (same FEATURE_ORDER)
5. driver-side numpy logistic fit (kernels.model.train_logistic — the
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

# reference training-set shape: LIMIT 500 positives, LIMIT 2000 negatives
POS_CAP = 500
NEG_CAP = 2000


def _weak_label(df: pd.DataFrame) -> np.ndarray:
    """T2 weak labels from pair features: exact invnum (invnum_edit == 0) ∨
    same pdf (pdf_equal) ∨ (|Δtotal| ≤ $0.01 ∧ days ≤ 5).

    The near-total clause is ABSOLUTE dollars, matching the reference's
    ``abs(a.total - b.total) <= 0.01`` (scripts/train_duplicate.py:63-66) —
    NOT the relative f_abs_total_diff_pct feature (a $10 invoice would get a
    1,000× tighter tolerance and a $1M invoice a 10,000× looser one)."""
    return (
        (df["f_invnum_edit"].to_numpy() == 0.0)
        | (df["pdf_equal"].to_numpy() == 1.0)
        | (
            (df["abs_total_diff"].to_numpy() <= 0.01)
            & (df["f_days_diff"].to_numpy() <= 5)
        )
    ).astype(float)


def _pair_rank(df: pd.DataFrame) -> np.ndarray:
    """Stable uniform rank per pair for deterministic sampling."""
    from sievedata.sketches.hashing import hash64

    key = (df["doc_id"].astype(str) + "|" + df["cand_id"].astype(str)).tolist()
    return hash64(key, seed=7)


def _cap_by_label(df: pd.DataFrame, pos_cap: int, neg_cap: int) -> pd.DataFrame:
    """Keep the pos_cap lowest-ranked positives + neg_cap negatives."""
    if not len(df):
        return df
    rank = _pair_rank(df)
    df = df.assign(_rank=rank)
    pos = df[df["label"] == 1.0].nsmallest(pos_cap, "_rank")
    neg = df[df["label"] == 0.0].nsmallest(neg_cap, "_rank")
    return pd.concat([pos, neg], ignore_index=True)


def build_pair_dataset(
    documents_path: str, n_buckets: int = 64, block_group_cap: int = 50,
    pos_cap: int = POS_CAP, neg_cap: int = NEG_CAP,
) -> pd.DataFrame:
    """Featurized candidate pairs with weak labels (distributed).

    Labels + per-class rank caps are applied INSIDE map_groups, so at most
    n_buckets × (pos_cap + neg_cap) rows ever reach the driver; the final
    global cap re-applies the same deterministic rank, making the result
    independent of bucketing."""

    def score_and_cap(df: pd.DataFrame) -> pd.DataFrame:
        pairs = PairScorer(
            block_group_cap=block_group_cap, per_doc_window=10,
            emit_total_diff=True,
        )(df)
        if not len(pairs):
            return pairs.assign(
                label=pd.Series(dtype="float64"), _rank=pd.Series(dtype="uint64"))
        pairs = pairs.drop_duplicates(["doc_id", "cand_id"]).reset_index(drop=True)
        pairs["label"] = _weak_label(pairs)
        return _cap_by_label(pairs, pos_cap, neg_cap)

    pairs = (
        read_documents(documents_path)
        .map_batches(  # parse + explode fused (block-boundary copy cost)
            lambda b: _explode_candidates(score_parse_batch(b), n_buckets),
            batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_and_cap, batch_format="pandas")
        .to_pandas()  # bounded: ≤ n_buckets × (pos_cap + neg_cap) rows
    )
    if not len(pairs):
        return pairs
    # cross-bucket duplicates (same pair in several block families landing
    # in different buckets) then the global deterministic cap
    pairs = pairs.drop_duplicates(["doc_id", "cand_id"]).reset_index(drop=True)
    pos = pairs[pairs["label"] == 1.0].nsmallest(pos_cap, "_rank")
    neg = pairs[pairs["label"] == 0.0].nsmallest(neg_cap, "_rank")
    out = pd.concat([pos, neg], ignore_index=True)
    return (out.sort_values(["doc_id", "cand_id"], kind="mergesort")
            .drop(columns=["_rank"]).reset_index(drop=True))


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
    if not len(pairs):
        return {"status": "skipped", "reason": "no candidate pairs", "n_pairs": 0}
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
