"""t2-scale correctness: exact violation-row + verdict match vs the oracle
on a multi-block fixture (100 vendors, Zipf-skewed, every planted class) —
exercises the bucketed shuffles beyond the single-block t1 case."""
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def t2_run(ray_session, tmp_path_factory):
    from sievedata.fixtures import generate_fixture_ray
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    root = tmp_path_factory.mktemp("t2")
    fix = generate_fixture_ray(str(root / "fx"), n_docs=20000, n_vendors=100, n_shards=16)
    prof = build_profiles(fix["baseline"], fix["media_catalog"], str(root / "profiles"))
    res = validate_documents(
        fix["documents"], prof["profiles"], prof["media_bloom"],
        str(root / "run"), resume=False,
    )
    return {"fix": fix, "prof": prof, "res": res}


def test_t2_exact_match(t2_run):
    from sievedata.oracle import oracle_validate

    vio_engine = (
        pq.read_table(t2_run["res"]["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort")
        .reset_index(drop=True)
    )
    vio_oracle, ver_oracle = oracle_validate(
        t2_run["fix"]["documents"],
        t2_run["prof"]["profiles"],
        t2_run["fix"]["media_catalog"],
    )
    vio_oracle = vio_oracle.sort_values(
        ["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort"
    ).reset_index(drop=True)
    assert len(vio_engine) == len(vio_oracle), (
        vio_engine["reason_code"].value_counts().to_dict(),
        vio_oracle["reason_code"].value_counts().to_dict(),
    )
    pd.testing.assert_frame_equal(vio_engine, vio_oracle)

    ver_engine = (
        pq.read_table(t2_run["res"]["verdicts"]).to_pandas()
        .sort_values(["partition_key", "check_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ver_engine[["partition_key", "check_name", "passed", "n_docs", "n_violations", "detail"]],
        ver_oracle[["partition_key", "check_name", "passed", "n_docs", "n_violations", "detail"]],
    )
    assert (ver_engine["metric"] == ver_oracle["metric"]).all()
