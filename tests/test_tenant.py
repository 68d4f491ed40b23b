"""Tenant dimension (reference schema keys everything tenant-first:
app/schema.sql:21-24, app/retrieval.py:20 WHERE tenant_id=:t AND
vendor_id=:v): the composite (tenant ␟ vendor) partition key must isolate
blocking, duplicate detection, profiles/drift and manifests across tenants —
on a fixture where IDENTICAL vendors, invoice numbers and pdf hashes exist
under two tenants."""
import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

TENANTS = ("T1", "T2")


@pytest.fixture(scope="module")
def tenant_run(ray_session, tmp_path_factory):
    from sievedata.fixtures import generate_two_tenant_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    root = tmp_path_factory.mktemp("tenant")
    tables = generate_two_tenant_fixture(str(root), n_docs=800, n_vendors=8, seed=7)
    prof = build_profiles(
        tables["baseline"], tables["media_catalog"], str(root / "profiles")
    )
    res = validate_documents(
        tables["documents"], prof["profiles"], prof["media_bloom"],
        str(root / "validate"), resume=False,
    )
    return {"tables": tables, "profiles": prof, "result": res, "root": root}


def test_partition_keys_are_tenant_composite(tenant_run):
    prof = pq.read_table(tenant_run["profiles"]["profiles"]).to_pandas()
    # one profile row per (tenant, vendor), never a bare vendor key
    assert (prof["partition_key"].str.contains("\x1f")).all()
    tenants = prof["partition_key"].str.split("\x1f").str[0].unique()
    assert set(tenants) == set(TENANTS)
    # per-tenant replicas of the same vendor get their own profile rows
    vendors = prof["partition_key"].str.split("\x1f").str[1]
    assert (vendors.value_counts() == len(TENANTS)).all()


def test_no_cross_tenant_violation_pairs(tenant_run):
    """Every dup violation's matched doc lives in the SAME tenant: identical
    invoice numbers / pdf hashes / po totals planted under both tenants must
    pair only within their tenant."""
    vio = pq.read_table(tenant_run["result"]["violations"]).to_pandas()
    assert len(vio) > 0
    # the flagged doc's tenant == the partition key's tenant
    doc_tenant = vio["doc_id"].str.split(":").str[0]
    pk_tenant = vio["partition_key"].str.split("\x1f").str[0]
    assert (doc_tenant == pk_tenant).all()
    # dup rows name their match in detail (…;first=<id> / ;match=<id>):
    # the matched doc must be same-tenant
    dup = vio[vio["reason_code"].isin(
        ["EXACT_INVNUM", "PDF_NEAR_DUP", "SAME_PO_NEAR_TOTAL"])]
    assert len(dup) > 0
    match_ids = dup["detail"].str.extract(r"(?:first|match)=([^;]+)$")[0].dropna()
    assert len(match_ids) > 0
    assert (match_ids.str.split(":").str[0]
            == dup.loc[match_ids.index, "doc_id"].str.split(":").str[0]).all()
    # and each tenant's planted twins are still caught
    for t in TENANTS:
        assert (doc_tenant == t).sum() > 0


def test_violations_match_oracle_two_tenants(tenant_run):
    """The pure-python oracle (also composite-keyed) agrees EXACTLY on the
    two-tenant fixture — the strongest no-bleed evidence."""
    from sievedata.oracle import oracle_validate

    vio_engine = (
        pq.read_table(tenant_run["result"]["violations"]).to_pandas()
        [["partition_key", "doc_id", "reason_code", "detail"]]
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"],
                     kind="mergesort").reset_index(drop=True)
    )
    vio_oracle, ver_oracle = oracle_validate(
        tenant_run["tables"]["documents"],
        tenant_run["profiles"]["profiles"],
        tenant_run["tables"]["media_catalog"],
    )
    vio_oracle = (
        vio_oracle[["partition_key", "doc_id", "reason_code", "detail"]]
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"],
                     kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(vio_engine, vio_oracle)

    ver_engine = (
        pq.read_table(tenant_run["result"]["verdicts"]).to_pandas()
        .sort_values(["partition_key", "check_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    ver_oracle = ver_oracle.sort_values(
        ["partition_key", "check_name"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ver_engine[["partition_key", "check_name", "passed", "n_docs", "n_violations"]],
        ver_oracle[["partition_key", "check_name", "passed", "n_docs", "n_violations"]],
    )


def test_manifest_keyed_per_tenant_partition(tenant_run):
    manifest = json.load(open(tenant_run["result"]["manifest"]))
    keys = list(manifest["partitions"])
    assert all("\x1f" in k for k in keys)
    assert {k.split("\x1f")[0] for k in keys} == set(TENANTS)


def test_no_cross_tenant_score_candidates(tenant_run, tmp_path):
    """Scoring blocks are tenant-scoped: every candidate in top_matches
    shares the doc's tenant even though the twin tenant holds byte-identical
    invoices."""
    from sievedata.pipelines.score import ScoreConfig, score_documents

    t = tenant_run["tables"]
    prof = tenant_run["profiles"]
    res = score_documents(
        t["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "score"), cfg=ScoreConfig(), resume=False,
    )
    dec = pq.read_table(res["decisions"]).to_pandas()
    assert len(dec) > 0
    scored = dec[dec["n_candidates"] > 0]
    assert len(scored) > 0
    checked_pairs = 0
    for _, row in scored.iterrows():
        tenant = row["doc_id"].split(":")[0]
        for m in json.loads(row["top_matches"]):
            assert m["cand_id"].split(":")[0] == tenant, (row["doc_id"], m["cand_id"])
            checked_pairs += 1
    assert checked_pairs > 0
    # per-tenant replicas decide identically (same content, isolated blocks)
    d = dec.copy()
    d["tenant"] = d["doc_id"].str.split(":").str[0]
    d["bare"] = d["doc_id"].str.split(":").str[1:].str.join(":")
    t1 = d[d["tenant"] == "T1"].set_index("bare")
    t2 = d[d["tenant"] == "T2"].set_index("bare")
    common = t1.index.intersection(t2.index)
    assert len(common) > 0
    pd.testing.assert_series_equal(
        t1.loc[common, "decision"], t2.loc[common, "decision"],
        check_names=False)
    np.testing.assert_allclose(
        t1.loc[common, "risk_score"], t2.loc[common, "risk_score"], atol=1e-9)
