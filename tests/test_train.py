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
