"""Training pipeline (reference scripts/train_duplicate.py semantics):
weak-label pair dataset, numpy LR fit, AUC sanity, model round-trip."""
import numpy as np
import pytest


def test_roc_auc_known_values():
    from sievedata.pipelines.train import roc_auc

    y = np.array([1, 1, 0, 0], dtype=float)
    assert roc_auc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 1.0
    assert roc_auc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 0.0
    assert roc_auc(y, np.array([0.5, 0.5, 0.5, 0.5])) == pytest.approx(0.5)


def test_train_logistic_separates():
    from sievedata.kernels.model import train_logistic

    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (500, 3))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    w, b = train_logistic(X, y)
    acc = (((X @ w + b) > 0).astype(float) == y).mean()
    assert acc > 0.9


def _ref_label_pair(a: dict, b: dict) -> int:
    """The reference's weak-label predicate, from its spec
    (scripts/train_duplicate.py:59-68): same non-empty invnum_norm ∨ same
    non-empty pdf_hash ∨ (|Δtotal| ≤ 0.01 absolute ∧ |Δdays| ≤ 5)."""
    if a["invoice_number_norm"] and a["invoice_number_norm"] == b["invoice_number_norm"]:
        return 1
    if a.get("pdf_hash") and a.get("pdf_hash") == b.get("pdf_hash"):
        return 1
    if (abs(a.get("total", 0.0) - b.get("total", 0.0)) <= 0.01
            and abs((a["invoice_date"] - b["invoice_date"]).days) <= 5):
        return 1
    return 0


def _weak_label_inputs(a: dict, b: dict):
    """Engine-side label inputs for one pair (the columns _weak_label reads)."""
    from sievedata.kernels.features import header_features

    feats = header_features(a, b)
    return {
        "f_invnum_edit": feats["invnum_edit"],
        "f_days_diff": feats["days_diff"],
        "pdf_equal": float(bool(a.get("pdf_hash"))
                           and a.get("pdf_hash") == b.get("pdf_hash")),
        "abs_total_diff": abs(float(a.get("total", 0.0)) - float(b.get("total", 0.0))),
    }


def test_weak_label_matches_reference_on_sample_payloads():
    """Golden: _weak_label labels the reference's own sample pairs
    (samples/sample_payloads.jsonl) identically to its _label_pair, plus
    constructed pairs that distinguish ABSOLUTE |Δtotal| ≤ $0.01 from the
    old relative-pct clause (a $10 pair Δ=$0.005 is positive; a $1M pair
    Δ=$50 is negative)."""
    import datetime
    import json
    import os

    import pandas as pd

    from sievedata.kernels.normalize import invnum_norm
    from sievedata.pipelines.train import _weak_label

    def mk(invoice_id, invnum, date, total, pdf_hash):
        return {
            "invoice_id": invoice_id,
            "invoice_number_norm": invnum_norm(invnum),
            "invoice_date": datetime.date.fromisoformat(date),
            "total": total, "pdf_hash": pdf_hash,
        }

    docs = []
    sample = "/root/reference/samples/sample_payloads.jsonl"
    if os.path.exists(sample):
        with open(sample) as f:
            for line in f:
                r = json.loads(line)
                docs.append(mk(r["invoice_id"], r["invoice_number"],
                               r["invoice_date"], r["total"], r.get("pdf_hash")))
    # absolute-vs-relative discriminators (different invnum + pdf so only
    # the near-total clause can fire)
    docs += [
        mk("S1", "A-1", "2025-01-01", 10.0, "h1"),
        mk("S2", "B-2", "2025-01-03", 10.005, "h2"),   # abs 0.005 ≤ 0.01 → pos
        mk("L1", "C-3", "2025-02-01", 1_000_000.0, "h3"),
        mk("L2", "D-4", "2025-02-03", 1_000_050.0, "h4"),  # abs $50 → neg
    ]
    import itertools

    pairs = list(itertools.combinations(docs, 2))
    frame = pd.DataFrame([_weak_label_inputs(a, b) for a, b in pairs])
    got = _weak_label(frame)
    want = [float(_ref_label_pair(a, b)) for a, b in pairs]
    assert list(got) == want
    # the discriminators actually discriminate
    by_id = {d["invoice_id"]: d for d in docs}
    assert _ref_label_pair(by_id["S1"], by_id["S2"]) == 1
    assert _ref_label_pair(by_id["L1"], by_id["L2"]) == 0


def test_build_pair_dataset_bounded(ray_session, t1_tables):
    """Collected training rows never exceed the documented 500-pos/2000-neg
    cap and carry the abs_total_diff side channel."""
    from sievedata.pipelines.train import build_pair_dataset

    pairs = build_pair_dataset(t1_tables["documents"], pos_cap=3, neg_cap=5)
    assert len(pairs[pairs["label"] == 1.0]) <= 3
    assert len(pairs[pairs["label"] == 0.0]) <= 5
    assert "abs_total_diff" in pairs.columns
    # deterministic: same caps → same pair set
    again = build_pair_dataset(t1_tables["documents"], pos_cap=3, neg_cap=5)
    assert pairs[["doc_id", "cand_id", "label"]].equals(
        again[["doc_id", "cand_id", "label"]])


def test_train_duplicate_model_e2e(ray_session, t1_tables, tmp_path):
    from sievedata.pipelines.train import load_trained_model, train_duplicate_model

    out = str(tmp_path / "dup_model.npz")
    res = train_duplicate_model(t1_tables["documents"], out)
    assert res["status"] == "trained", res
    assert res["n_pos"] > 0
    # weak labels are learnable: planted twins give clean positives
    assert res["train_auc"] > 0.8, res
    w, b = load_trained_model(out)
    assert w.shape == (13,)
    assert np.isfinite(w).all() and np.isfinite(b)


def test_incremental_profile_update(ray_session, t1_tables, tmp_path):
    """update_profiles merges new-day sketches into stored profiles without
    re-reading history; merged moments equal a from-scratch rebuild."""
    import pyarrow.parquet as pq

    from sievedata.pipelines.profile import build_profiles, update_profiles

    p1 = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "p1")
    )
    # "new day" = the current table (any documents table works as a source)
    upd = update_profiles(p1["profiles"], t1_tables["documents"], str(tmp_path / "p2"))
    old = pq.read_table(p1["profiles"]).to_pandas().set_index("partition_key")
    new = pq.read_table(upd["profiles"]).to_pandas().set_index("partition_key")
    assert (new["profile_version"] == "p2").all()
    # counts strictly grow and mean stays finite/positive
    joined = old.join(new, lsuffix="_old", rsuffix="_new")
    assert (joined["sample_count_new"] > joined["sample_count_old"]).all()
    assert np.isfinite(new["mean_total"]).all()
    # merged count == old + eligible new docs per partition
    from sievedata.oracle import parse_doc_row

    docs = [parse_doc_row(r["doc_id"], r["spans"])
            for r in pq.read_table(t1_tables["documents"]).to_pylist()]
    import collections

    elig = collections.Counter(
        d["vendor_id"] for d in docs if not d["missing"] and not d["is_credit"]
    )
    for pk, row in new.iterrows():
        assert row["sample_count"] == old.loc[pk, "sample_count"] + elig[pk]
