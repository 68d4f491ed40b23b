"""Scoring-pipeline tests: planted-twin outcomes + EXACT row match against a
pure-python orchestration oracle (same kernels — already golden-tested — but
independent blocking/dedup/cap/top-k/fusion logic in plain dict loops)."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def t1_score(ray_session, t1_tables, tmp_path_factory):
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import ScoreConfig, score_documents

    root = tmp_path_factory.mktemp("t1_score")
    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(root / "profiles")
    )
    cfg = ScoreConfig()
    res = score_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(root / "run"), cfg=cfg, resume=False,
    )
    dec = pq.read_table(res["decisions"]).to_pandas()
    return {"profiles": prof, "cfg": cfg, "decisions": dec, "tables": t1_tables,
            "result": res}


def test_cases_and_audit_sinks(t1_score):
    import json
    import os

    res = t1_score["result"]
    cases = pq.read_table(res["cases"]).to_pandas()
    dec = t1_score["decisions"]
    assert len(cases) == (dec["decision"] != "PASS").sum()
    assert (cases["status"] == "OPEN").all()
    assert cases["case_id"].str.startswith("case_").all()
    assert os.path.exists(res["audit"])
    entries = [json.loads(l) for l in open(res["audit"])]
    assert entries[-1]["action"] == "score" and entries[-1]["n_docs"] == len(dec)


def test_case_upsert_semantics(t1_score, tmp_path):
    """Re-scoring against an existing cases table UPDATES instead of
    duplicating (app/case.py:16-50 ON CONFLICT DO UPDATE): case_ids stay
    unique, analyst fields (disposition/notes) and created_run survive the
    re-run, status re-opens and sla_due refreshes."""
    import shutil

    from sievedata.pipelines.score import score_documents

    t = t1_score["tables"]
    prof = t1_score["profiles"]
    run_dir = str(tmp_path / "run")
    res1 = score_documents(
        t["documents"], prof["profiles"], prof["media_bloom"], run_dir,
        cfg=t1_score["cfg"], resume=False,
    )
    c1 = pq.read_table(res1["cases"]).to_pandas().sort_values("case_id").reset_index(drop=True)
    assert c1["case_id"].is_unique and len(c1) > 0

    # analyst touches one case (disposition + notes), like the reference's
    # cases table rows mutated by the review UI
    touched = c1["case_id"].iloc[0]
    mut = c1.copy()
    mut.loc[mut["case_id"] == touched, ["disposition", "disposition_user", "notes"]] = (
        "duplicate", "analyst7", "confirmed dup")
    import pyarrow as pa

    shutil.rmtree(res1["cases"])
    import os

    os.makedirs(res1["cases"])
    pq.write_table(pa.Table.from_pandas(mut, preserve_index=False),
                   os.path.join(res1["cases"], "part-0.parquet"))

    res2 = score_documents(
        t["documents"], prof["profiles"], prof["media_bloom"], run_dir,
        cfg=t1_score["cfg"], resume=False,
    )
    c2 = pq.read_table(res2["cases"]).to_pandas().sort_values("case_id").reset_index(drop=True)
    # no duplicates, same case set (same input → same decisions)
    assert c2["case_id"].is_unique
    assert list(c2["case_id"]) == list(c1["case_id"])
    # analyst fields preserved, case re-opened
    row = c2[c2["case_id"] == touched].iloc[0]
    assert row["disposition"] == "duplicate"
    assert row["disposition_user"] == "analyst7"
    assert row["notes"] == "confirmed dup"
    assert row["status"] == "OPEN"
    # untouched cases byte-identical across the upsert
    rest1 = c1[c1["case_id"] != touched].reset_index(drop=True)
    rest2 = c2[c2["case_id"] != touched].reset_index(drop=True)
    pd.testing.assert_frame_equal(rest1, rest2)


def test_planted_twins_held(t1_score):
    dec = t1_score["decisions"]
    twins = dec[dec["doc_id"].str.endswith("~dup")]
    assert len(twins) > 0
    assert (twins["decision"] == "HOLD").all()
    assert twins["reason_codes"].str.contains("EXACT_INVNUM").all()
    assert twins["reason_codes"].str.contains("PDF_NEAR_DUP").all()
    nears = dec[dec["doc_id"].str.endswith("~near")]
    assert nears["reason_codes"].str.contains("SAME_PO_NEAR_TOTAL").all()
    # missing-field docs are rejected at the edge → absent from decisions
    assert not dec["risk_score"].isna().any()
    assert dec["risk_score"].between(0, 100).all()


def test_pii_stripped_export(t1_score, tmp_path):
    """S10/RPT-002: the export carries masked/hashed account columns only —
    raw remit_account, names, and spans never appear."""
    import os

    from sievedata.pipelines.export import export_decisions

    run_dir = os.path.dirname(t1_score["result"]["decisions"])
    out = export_decisions(
        t1_score["tables"]["documents"], run_dir, str(tmp_path / "exp")
    )
    exp = pq.read_table(out["out"]).to_pandas()
    assert len(exp) == len(t1_score["decisions"])
    assert not {"remit_account", "remit_name", "vendor_name", "spans"} & set(exp.columns)
    masked = exp["remit_account_masked"].dropna()
    assert masked.str.match(r"^\*{4}(\d{4})?$").all()
    assert set(exp["decision"]) <= {"PASS", "REVIEW", "HOLD"}

    # vendor selection
    out_v = export_decisions(
        t1_score["tables"]["documents"], run_dir, str(tmp_path / "exp_v"),
        vendor="V0005",
    )
    exp_v = pq.read_table(out_v["out"]).to_pandas()
    assert (exp_v["partition_key"] == "V0005").all() and len(exp_v) > 0

    # date-range selection (RPT-001's by-date axis): a window strictly
    # inside the fixture's date span keeps a proper non-empty subset
    dates = exp["invoice_date"].sort_values()
    lo, hi = dates.iloc[len(dates) // 4], dates.iloc[3 * len(dates) // 4]
    out_d = export_decisions(
        t1_score["tables"]["documents"], run_dir, str(tmp_path / "exp_d"),
        date_from=str(lo), date_to=str(hi),
    )
    exp_d = pq.read_table(out_d["out"]).to_pandas()
    assert 0 < len(exp_d) < len(exp)
    assert exp_d["invoice_date"].between(lo, hi).all()
    assert len(exp_d) == ((exp["invoice_date"] >= lo) & (exp["invoice_date"] <= hi)).sum()

    # idempotent re-run into the same out dir: no stale-file accumulation
    out2 = export_decisions(
        t1_score["tables"]["documents"], run_dir, str(tmp_path / "exp")
    )
    assert out2["n_rows"] == out["n_rows"]
    assert len(pq.read_table(out2["out"]).to_pandas()) == len(exp)


def test_text_twins_retrieved_via_lsh(t1_score):
    """Planted ~text twins share NO structured block key with their base doc
    (different invnum/PO/total/pdf) — only the near-text MinHash-LSH family
    (BR-003) can retrieve them — and RR-003's Jaccard branch must flag them
    as PDF_NEAR_DUP (identical line text → shingle-Jaccard 1.0 ≥ 0.9)."""
    import json

    dec = t1_score["decisions"]
    texts = dec[dec["doc_id"].str.endswith("~text")]
    assert len(texts) > 0
    assert (texts["n_candidates"] > 0).all()
    assert texts["reason_codes"].str.contains("PDF_NEAR_DUP").all()
    for _, r in texts.iterrows():
        tm = json.loads(r["top_matches"])
        assert tm[0]["cand_id"] == r["doc_id"][: -len("~text")]
        assert tm[0]["features"]["text_cosine"] == 1.0


def _oracle_score_vendor(tables, profiles, cfg, vendor: str) -> pd.DataFrame:
    """Plain-python re-implementation of the batch scoring flow for one
    vendor partition."""
    from sievedata.kernels.anomaly import anomaly_score
    from sievedata.kernels.decision import decide, fuse_scores
    from sievedata.kernels.features import header_features, line_assign_features
    from sievedata.kernels.model import predict_dup_prob
    from sievedata.kernels.similarity import dice_3gram
    from sievedata.oracle import parse_doc_row
    from sievedata.kernels.normalize import desc_norm, hash_account
    from sievedata.sketches import BloomFilter

    import datetime

    prof_df = pq.read_table(profiles["profiles"]).to_pandas().set_index("partition_key")
    cat = pq.read_table(tables["media_catalog"], columns=["media_ref"])
    bf = BloomFilter(capacity=max(cat.num_rows, 1), fp_rate=1e-4)
    bf.add(cat.column("media_ref").combine_chunks())

    raw = pq.read_table(tables["documents"]).to_pylist()
    docs = []
    for r in raw:
        d = parse_doc_row(r["doc_id"], r["spans"])
        if (d.get("vendor_id") or "") != vendor or d["missing"]:
            continue
        lines = []
        for lt in d["lines"]:
            parts = lt.split("|")
            lines.append(
                {"desc_norm": desc_norm(parts[0]), "qty": float(parts[1]),
                 "unit_price": float(parts[2]), "amount": float(parts[3])}
            )
        d["lines_structs"] = lines
        d["line_text"] = " ".join(l["desc_norm"] for l in lines)
        d["invoice_number_norm"] = d["invnum_norm"] or ""
        d["date_obj"] = datetime.date.fromisoformat(d["invoice_date"])
        d["remit_account_hash"] = hash_account(d.get("remit_account"))
        d["month"] = d["invoice_date"][:7].replace("-", "")
        d["amount_month"] = f"{round(d['total_f'], 2)}|{d['month']}"
        docs.append(d)

    # block groups per family (doc_id sorted, group cap, ALL pairs in a
    # block — reference retrieval semantics, app/retrieval.py:15-30)
    fam_keys = [("invnum", "invnum_norm"), ("po", "po_number"),
                ("amount", "amount_month"), ("acct", "remit_account_hash")]
    eligible = [d for d in docs if not d["is_credit"]]
    cand: dict[str, list[tuple[int, str]]] = {}

    def _pair_members(members, fam_idx):
        members = sorted(members, key=lambda x: x["doc_id"])[: cfg.block_group_cap]
        for i, a in enumerate(members):
            for j, b in enumerate(members):
                if i != j:
                    cand.setdefault(a["doc_id"], []).append((fam_idx, b["doc_id"]))

    for fam_idx, (fam, key) in enumerate(fam_keys):
        groups: dict[str, list[dict]] = {}
        for d in eligible:
            if d.get(key) is not None:
                groups.setdefault(str(d[key]), []).append(d)
        for members in groups.values():
            _pair_members(members, fam_idx)

    # near-text LSH family (BR-003): MinHash band groups over line_text —
    # shared definitional primitives (minhash_signature_batch/lsh_band_rows),
    # independent grouping logic
    if cfg.neartext:
        from sievedata.functions.dedup import lsh_band_rows, minhash_signature_batch

        NEARTEXT_IDX = 4
        sigs = minhash_signature_batch([d["line_text"] for d in eligible])
        band_tbl = lsh_band_rows(
            [d["doc_id"] for d in eligible], sigs, bands=cfg.neartext_bands
        ).to_pandas()
        by_id_elig = {d["doc_id"]: d for d in eligible}
        for (_bid, _bh), g in band_tbl.groupby(["band_id", "band_hash"], sort=False):
            ids = g["doc_id"].unique().tolist()
            if len(ids) >= 2:
                _pair_members([by_id_elig[i] for i in ids], NEARTEXT_IDX)

    by_id = {d["doc_id"]: d for d in docs}
    rows = []
    for d in docs:
        pairs = sorted(set(cand.get(d["doc_id"], [])))
        # BR-003 fallback: text neighbors only when every structured block missed
        if any(f < 4 for f, _ in pairs):
            pairs = [(f, c) for f, c in pairs if f < 4]
        seen = set()
        kept = []
        for fam_idx, cid in pairs:
            if cid not in seen:
                seen.add(cid)
                kept.append(cid)
            if len(kept) >= cfg.candidate_cap:
                break
        scored = []
        for cid in kept:
            b = by_id[cid]
            a_h = {"total": d["total_f"], "invoice_date": d["date_obj"],
                   "po_number": d.get("po_number"), "currency": d.get("currency"),
                   "tax_total": float(d.get("tax_total") or 0.0),
                   "remit_account_hash": d["remit_account_hash"],
                   "remit_name": d.get("remit_name"),
                   "invoice_number_norm": d["invoice_number_norm"]}
            b_h = {"total": b["total_f"], "invoice_date": b["date_obj"],
                   "po_number": b.get("po_number"), "currency": b.get("currency"),
                   "tax_total": float(b.get("tax_total") or 0.0),
                   "remit_account_hash": b["remit_account_hash"],
                   "remit_name": b.get("remit_name"),
                   "invoice_number_norm": b["invoice_number_norm"]}
            feats = header_features(a_h, b_h)
            feats.update(line_assign_features(d["lines_structs"], b["lines_structs"]))
            feats["text_cosine"] = dice_3gram(d["line_text"], b["line_text"])
            feats["pdf_equal"] = float(bool(d["pdf_hash"]) and d["pdf_hash"] == b["pdf_hash"])
            scored.append((cid, predict_dup_prob(feats), feats))
        scored.sort(key=lambda x: (-x[1], x[0]))
        top = scored[:3]
        dup_prob = top[0][1] if top else 0.0
        text_dup = max((t[2]["text_cosine"] for t in top), default=0.0)

        import json
        from sievedata.kernels.model import FEATURE_ORDER

        if top:
            feats0 = {n: round(float(top[0][2].get(n, 0.0)), 6) for n in FEATURE_ORDER}
            expl = json.dumps(
                [{"feature": k, "value": v} for k, v in feats0.items()],
                separators=(",", ":"),
            )
        else:
            expl = "[]"

        prow = prof_df.loc[vendor] if vendor in prof_df.index else None
        # no media ref → no referential probe (engine's has_ref guard)
        bank_change = bool(d["pdf_hash"]) and not bool(
            bf.contains([f"media://{d['pdf_hash']}"])[0]
        )
        anom_prob, anom_reasons = anomaly_score(
            d["total_f"],
            float(prow["mean_total"]) if prow is not None else 0.0,
            float(prow["std_total"]) if prow is not None else 0.0,
            int(prow["sample_count"]) if prow is not None else 0,
            bank_change,
            vendor_hist_count=int(prow["sample_count"]) if prow is not None else 0,
            has_baseline=prow is not None,
        )
        is_outlier = ("UNIT_PRICE_OUTLIER" in anom_reasons) and not d["is_credit"]
        risk = fuse_scores(dup_prob, anom_prob, bank_change, text_dup)
        decision = decide(risk, cfg.review_threshold, cfg.hold_threshold)
        codes = []
        if top:
            f0 = top[0][2]
            if f0["invnum_edit"] == 0.0:
                codes.append("EXACT_INVNUM")
            if (f0["same_po"] == 1.0 and f0["abs_total_diff_pct"] <= 0.005
                    and f0["days_diff"] <= 30):
                codes.append("SAME_PO_NEAR_TOTAL")
            tc = f0["text_cosine"]
            jac = tc / max(2.0 - tc, 1e-12)  # set Dice → Jaccard
            if f0["pdf_equal"] == 1.0 or jac >= 0.9:
                codes.append("PDF_NEAR_DUP")
        if bank_change:
            codes.append("BANK_CHANGE")
        if is_outlier:
            codes.append("UNIT_PRICE_OUTLIER")
        rows.append(
            (d["doc_id"], vendor, round(risk, 2), decision,
             ",".join(dict.fromkeys(codes)), len(kept), expl)
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "partition_key", "risk_score", "decision",
                       "reason_codes", "n_candidates", "explanations"]
    ).sort_values("doc_id").reset_index(drop=True)


def test_score_matches_oracle_one_vendor(t1_score):
    vendor = "V0005"
    oracle = _oracle_score_vendor(
        t1_score["tables"], t1_score["profiles"], t1_score["cfg"], vendor
    )
    engine = (
        t1_score["decisions"]
        .loc[lambda d: d["partition_key"] == vendor,
             ["doc_id", "partition_key", "risk_score", "decision",
              "reason_codes", "n_candidates", "explanations"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(engine) == len(oracle)
    pd.testing.assert_frame_equal(
        engine[["doc_id", "decision", "reason_codes", "n_candidates",
                "explanations"]],
        oracle[["doc_id", "decision", "reason_codes", "n_candidates",
                "explanations"]],
    )
    np.testing.assert_allclose(
        engine["risk_score"], oracle["risk_score"], rtol=0, atol=1e-9
    )
