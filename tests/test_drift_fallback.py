"""ML-003 drift-breach → rules-only fallback (requirements.md:258,
architecture.md:223): scoring a partition whose drift monitor breached
suppresses the duplicate-model probabilities (rules + anomaly only), still
escalates the deterministic HOLD rules, stamps every affected decision with
MODEL_SUPPRESSED_DRIFT, and records the partitions in the manifest.
Partitions that did not breach are byte-identical to a normal run."""
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _decisions(run_dir: str) -> pd.DataFrame:
    files = [os.path.join(r, f)
             for r, _, fs in os.walk(os.path.join(run_dir, "decisions"))
             for f in fs if f.endswith(".parquet")]
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def drift_env(ray_session, tmp_path_factory):
    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import score_documents
    from sievedata.pipelines.validate import validate_documents

    base = str(tmp_path_factory.mktemp("driftfb"))
    generate_fixture(os.path.join(base, "fx"), n_docs=2000, n_vendors=20,
                     seed=42)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))
    docs = os.path.join(base, "fx", "documents.parquet")
    vrun = validate_documents(
        docs, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "vrun"), resume=False)
    verdicts = pq.read_table(vrun["verdicts"]).to_pandas()
    breached = sorted(
        verdicts.loc[(verdicts["check_name"] == "drift")
                     & (~verdicts["passed"]), "partition_key"].unique())
    # the fixture plants a drifted vendor (vendor_idx % 50 == 7) — the
    # fallback test is vacuous unless the monitor actually fired
    assert breached, "fixture produced no breached drift verdict"

    run_base = score_documents(
        docs, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "score_base"), resume=False)
    run_fb = score_documents(
        docs, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "score_fb"), resume=False,
        drift_verdicts_path=vrun["verdicts"])
    return {"base": base, "breached": breached,
            "d_base": _decisions(os.path.join(base, "score_base")),
            "d_fb": _decisions(os.path.join(base, "score_fb")),
            "run_fb": run_fb}


def test_unbreached_partitions_identical(drift_env):
    breached = set(drift_env["breached"])
    b = drift_env["d_base"]
    f = drift_env["d_fb"]
    pd.testing.assert_frame_equal(
        b[~b["partition_key"].isin(breached)].reset_index(drop=True),
        f[~f["partition_key"].isin(breached)].reset_index(drop=True))


def test_breached_partition_scored_rules_only(drift_env):
    breached = set(drift_env["breached"])
    b = drift_env["d_base"]
    f = drift_env["d_fb"]
    bb = b[b["partition_key"].isin(breached)].reset_index(drop=True)
    fb = f[f["partition_key"].isin(breached)].reset_index(drop=True)
    assert len(fb) == len(bb) > 0
    # every affected decision is stamped
    assert fb["reason_codes"].str.contains("MODEL_SUPPRESSED_DRIFT").all()
    assert not b["reason_codes"].str.contains("MODEL_SUPPRESSED_DRIFT").any()
    # fusion is monotone in the suppressed model probabilities
    assert (fb["risk_score"].to_numpy() <= bb["risk_score"].to_numpy()).all()
    # the deterministic HOLD rules still escalate without the model
    hold_rules = ("EXACT_INVNUM", "SAME_PO_NEAR_TOTAL", "PDF_NEAR_DUP")
    rule_hit = fb["reason_codes"].str.contains("|".join(hold_rules))
    assert rule_hit.any(), "no rule-hit docs in the breached partition"
    assert (fb.loc[rule_hit, "decision"] == "HOLD").all()
    # and something actually downgraded (the fallback is not a no-op)
    assert (fb["risk_score"] < bb["risk_score"]).any()


def test_manifest_stamps_suppressed_partitions(drift_env):
    with open(drift_env["run_fb"]["manifest"]) as fh:
        lin = json.load(fh)["lineage"]
    assert lin["model_suppressed_partitions"] == list(drift_env["breached"])
    assert lin["drift_verdicts_path"]
