"""End-to-end: engine (Ray pipelines) vs pure-python oracle — EXACT match of
violation rows and verdicts on the t1 fixture (SURVEY.md §5 / BASELINE.md
north metric), plus span-sequence invariance and resume."""
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def t1_run(ray_session, t1_tables, tmp_path_factory):
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    run_root = tmp_path_factory.mktemp("t1_run")
    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(run_root / "profiles")
    )
    res = validate_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(run_root / "validate"), resume=False,
    )
    return {"tables": t1_tables, "profiles": prof, "result": res, "root": run_root}


def _canon_violations(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["partition_key", "doc_id", "reason_code", "detail"]]
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_violations_exact_match_oracle(t1_run):
    from sievedata.oracle import oracle_validate

    vio_engine = _canon_violations(pq.read_table(t1_run["result"]["violations"]).to_pandas())
    vio_oracle, ver_oracle = oracle_validate(
        t1_run["tables"]["documents"],
        t1_run["profiles"]["profiles"],
        t1_run["tables"]["media_catalog"],
    )
    assert len(vio_engine) == len(vio_oracle), (
        vio_engine["reason_code"].value_counts().to_dict(),
        vio_oracle["reason_code"].value_counts().to_dict(),
    )
    pd.testing.assert_frame_equal(vio_engine, _canon_violations(vio_oracle))

    ver_engine = (
        pq.read_table(t1_run["result"]["verdicts"]).to_pandas()
        .sort_values(["partition_key", "check_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    ver_oracle = ver_oracle.sort_values(
        ["partition_key", "check_name"], kind="mergesort"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ver_engine[["partition_key", "check_name", "passed", "n_docs", "n_violations"]],
        ver_oracle[["partition_key", "check_name", "passed", "n_docs", "n_violations"]],
    )
    # metrics exact (PSI from integer bin counts, HLL from max-merged registers)
    np.testing.assert_allclose(
        ver_engine["metric"].to_numpy(), ver_oracle["metric"].to_numpy(), rtol=0, atol=0
    )
    assert (ver_engine["detail"] == ver_oracle["detail"]).all()


def test_planted_violations_found(t1_run):
    vio = pq.read_table(t1_run["result"]["violations"]).to_pandas()
    codes = vio["reason_code"].value_counts().to_dict()
    # every class planted by the fixture shows up
    for code in (
        "EXACT_INVNUM", "PDF_NEAR_DUP", "SAME_PO_NEAR_TOTAL",
        "UNIT_PRICE_OUTLIER", "BANK_CHANGE", "MISSING_REQUIRED_FIELD",
    ):
        assert codes.get(code, 0) > 0, code
    # all dup twins are flagged
    twins = vio[vio["doc_id"].str.endswith("~dup")]
    assert set(twins["reason_code"]) >= {"EXACT_INVNUM", "PDF_NEAR_DUP"}
    # near twins flagged on the po rule
    nears = vio[vio["doc_id"].str.endswith("~near")]
    assert (nears["reason_code"] == "SAME_PO_NEAR_TOTAL").any()
    # ~text twins (no shared structured key) flagged via the near-text
    # LSH + Jaccard branch (RR-003), with the base doc as the match
    texts = vio[vio["doc_id"].str.endswith("~text")]
    flagged = texts[texts["reason_code"] == "PDF_NEAR_DUP"]
    # every ~text twin is caught by the near-text branch (1.5× totals may
    # additionally trip UNIT_PRICE_OUTLIER — that's correct too)
    assert set(flagged["doc_id"]) == set(texts["doc_id"]) and len(flagged) > 0
    assert flagged["detail"].str.startswith("jaccard=1.000000;match=").all()
    # drift vendor fails drift check, most others pass
    ver = pq.read_table(t1_run["result"]["verdicts"]).to_pandas()
    drift = ver[ver["check_name"] == "drift"].set_index("partition_key")
    assert not drift.loc["V0007", "passed"]  # vendor_idx % 50 == 7
    assert drift["passed"].sum() >= len(drift) - 3


def test_span_sequence_invariance(ray_session, t1_tables):
    """Every stage output preserves (kind, text, media_ref, offset) per doc_id."""
    import ray.data as rd

    from sievedata.stages.parse import parse_documents_batch

    ds = rd.read_parquet(t1_tables["documents"])
    parsed = ds.map_batches(parse_documents_batch, batch_format="pyarrow")
    out = parsed.select_columns(["doc_id", "spans"]).to_pandas()
    orig = pq.read_table(t1_tables["documents"]).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    assert (out["doc_id"] == orig["doc_id"]).all()
    for a, b in zip(out["spans"], orig["spans"]):
        la = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in a]
        lb = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in b]
        assert la == lb


def test_resume_skips_and_reproduces(t1_run):
    """Re-running with resume=True skips completed stages and leaves outputs
    byte-identical (per-partition manifest unchanged)."""
    from sievedata.pipelines.validate import validate_documents

    res = t1_run["result"]
    with open(res["manifest"]) as f:
        manifest_before = f.read()
    vio_before = _canon_violations(pq.read_table(res["violations"]).to_pandas())

    res2 = validate_documents(
        t1_run["tables"]["documents"],
        t1_run["profiles"]["profiles"],
        t1_run["profiles"]["media_bloom"],
        os.path.dirname(res["verdicts"]),
        resume=True,
    )
    with open(res2["manifest"]) as f:
        manifest_after = f.read()
    assert manifest_before == manifest_after
    vio_after = _canon_violations(pq.read_table(res2["violations"]).to_pandas())
    pd.testing.assert_frame_equal(vio_before, vio_after)


def test_profiles_match_pandas_groupby(t1_run):
    """Profile moments == pandas groupby agg (the reference's baseline job,
    scripts/train_anomaly.py:31)."""
    import ray.data as rd

    from sievedata.stages.parse import parse_documents_batch

    prof = pq.read_table(t1_run["profiles"]["profiles"]).to_pandas()
    ds = rd.read_parquet(t1_run["tables"]["baseline"])
    parsed = ds.map_batches(parse_documents_batch, batch_format="pyarrow")
    df = parsed.select_columns(["partition_key", "total"]).to_pandas()
    expected = df.groupby("partition_key")["total"].agg(["mean", "std", "count"])
    merged = prof.set_index("partition_key").join(expected)
    np.testing.assert_allclose(merged["mean_total"], merged["mean"], rtol=1e-9)
    np.testing.assert_allclose(merged["std_total"], merged["std"], rtol=1e-9)
    assert (merged["sample_count"] == merged["count"]).all()
