"""Pure-python oracle for the validate pass (no Ray).

Recomputes violations + verdicts row-at-a-time from the same inputs
(documents, engine-built profiles, media catalog) with an independent code
path: python dict grouping instead of Ray shuffles, scalar loops instead of
vectorized kernels.  Only the *definitional* primitives are shared with the
engine (BloomFilter / HyperLogLog / psi from sievedata.sketches and the
scalar ``invnum_norm``): the Bloom filter IS the referential check's
semantics, and HLL registers are order-insensitive by construction, so
sharing them checks the engine's distribution logic, not the arithmetic.

Used by tests to assert EXACT violation-row and verdict equality
(BASELINE.md north metric).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from sievedata.kernels.normalize import invnum_norm
from sievedata.pipelines.validate import ValidateConfig
from sievedata.schema import (
    CHECK_DRIFT, CHECK_DUPLICATE, CHECK_RANGE, CHECK_REFERENTIAL,
    CHECK_SCHEMA, CHECK_STRUCTURE, CHECK_UNIQUENESS,
    REASON_BANK_CHANGE, REASON_EXACT_INVNUM,
    REASON_MISSING_FIELD, REASON_PDF_NEAR_DUP, REASON_SAME_PO_NEAR_TOTAL,
    REASON_UNIT_PRICE_OUTLIER, REQUIRED_KINDS,
)
from sievedata.sketches import BloomFilter, HyperLogLog
from sievedata.sketches.drift import psi


def parse_doc_row(doc_id: str, spans: list[dict]) -> dict:
    """Row-at-a-time span parse (first span of each kind wins, like the engine)."""
    fields: dict = {"doc_id": doc_id}
    lines = []
    for s in spans:
        k = s["kind"]
        if k == "line":
            lines.append(s["text"])
        elif k == "media":
            fields.setdefault("media_ref", s["media_ref"])
        elif k not in fields:
            fields[k] = s["text"]
    fields["lines"] = lines
    fields["n_spans"] = len(spans)
    # composite tenant ␟ vendor partition key, mirroring the engine parse
    t, v = fields.get("tenant_id"), fields.get("vendor_id")
    fields["partition_key"] = (f"{t}\x1f{v}" if t is not None else v) if v is not None else None
    missing = [k for k in REQUIRED_KINDS if fields.get(k) is None]
    if not lines:
        missing.append("line_items")
    fields["missing"] = ",".join(missing)
    total = fields.get("total")
    fields["total_f"] = float(total) if total is not None else 0.0
    fields["is_credit"] = fields["total_f"] < 0.0
    inv = fields.get("invoice_number")
    fields["invnum_norm"] = invnum_norm(inv) if inv is not None else None
    mref = fields.get("media_ref")
    fields["pdf_hash"] = mref[len("media://"):] if mref else None
    return fields


def oracle_validate(
    documents_path: str,
    profiles_path: str,
    media_catalog_path: str,
    cfg: ValidateConfig | None = None,
    bloom_fp_rate: float = 1e-4,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (violations, verdicts) sorted canonically."""
    cfg = cfg or ValidateConfig()
    docs_t = pq.read_table(documents_path).to_pylist()
    docs = [parse_doc_row(r["doc_id"], r["spans"]) for r in docs_t]

    prof_df = pq.read_table(profiles_path).to_pandas()
    prof = {r["partition_key"]: r for _, r in prof_df.iterrows()}

    cat = pq.read_table(media_catalog_path, columns=["media_ref"])
    bf = BloomFilter(capacity=max(cat.num_rows, 1), fp_rate=bloom_fp_rate)
    bf.add(cat.column("media_ref").combine_chunks())

    violations: list[tuple[str, str, str, str]] = []

    # ---- per-doc checks -------------------------------------------------
    for d in docs:
        pk = d.get("partition_key") or ""
        d["pk"] = pk
        if d["missing"]:
            violations.append((pk, d["doc_id"], REASON_MISSING_FIELD, f"missing={d['missing']}"))
            d["eligible"] = False
            continue
        d["eligible"] = not d["is_credit"]
        if d.get("media_ref"):
            if not bool(bf.contains([d["media_ref"]])[0]):
                violations.append(
                    (pk, d["doc_id"], REASON_BANK_CHANGE, f"media_ref={d['media_ref']}")
                )
        if d["eligible"] and pk in prof:
            p = prof[pk]
            mean, std, cnt = float(p["mean_total"]), float(p["std_total"]), int(p["sample_count"])
            dev = abs(d["total_f"] - mean)
            if std > 0.0:
                z = dev / std
            elif cnt > 10:
                z = dev / max(abs(mean), 1.0)
            else:
                z = 0.0
            if z >= cfg.z_threshold:
                violations.append((pk, d["doc_id"], REASON_UNIT_PRICE_OUTLIER, f"z={z:.6f}"))

    # ---- blocked duplicate checks --------------------------------------
    blocks: dict[tuple[str, str, str], list[dict]] = {}
    for d in docs:
        if d["missing"] or d["is_credit"]:
            continue
        for family, key in (
            ("invnum", d["invnum_norm"]),
            ("pdf", d["pdf_hash"]),
            ("po", d.get("po_number")),
        ):
            if key is not None:
                blocks.setdefault((d["pk"], family, key), []).append(d)

    for (pk, family, key), members in blocks.items():
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda d: d["doc_id"])
        if family == "invnum":
            first = members[0]["doc_id"]
            for d in members[1:]:
                violations.append(
                    (pk, d["doc_id"], REASON_EXACT_INVNUM, f"invnum_norm={key};first={first}")
                )
        elif family == "pdf":
            first = members[0]["doc_id"]
            for d in members[1:]:
                violations.append(
                    (pk, d["doc_id"], REASON_PDF_NEAR_DUP, f"pdf_hash={key};first={first}")
                )
        else:
            import datetime

            dates = [datetime.date.fromisoformat(m["invoice_date"]) for m in members]
            for j in range(1, len(members)):
                lo = max(0, j - cfg.pair_scan_cap)
                tj = members[j]["total_f"]
                tol = cfg.po_pct_tol * max(abs(tj), 1.0)
                for i in range(lo, j):
                    gap = abs((dates[j] - dates[i]).days)
                    if abs(tj - members[i]["total_f"]) <= tol and gap <= cfg.po_window_days:
                        violations.append(
                            (pk, members[j]["doc_id"], REASON_SAME_PO_NEAR_TOTAL,
                             f"po={key};match={members[i]['doc_id']}")
                        )
                        break

    # ---- near-text duplicate checks (RR-003 Jaccard branch) ------------
    # Shared definitional primitives (minhash/lsh/shingle hashing) with
    # independent grouping logic, per this oracle's convention.
    if cfg.neartext:
        from sievedata.functions.dedup import lsh_band_rows, minhash_signature_batch
        from sievedata.kernels.normalize import desc_norm

        elig_docs = [d for d in docs if not d["missing"] and not d["is_credit"]]
        texts = [
            " ".join(desc_norm(l.split("|")[0]) for l in d["lines"])
            for d in elig_docs
        ]
        pk_of = {d["doc_id"]: d["pk"] for d in elig_docs}
        pdf_of = {d["doc_id"]: d["pdf_hash"] for d in elig_docs}
        # 8-bit-truncated slots (b-bit minwise hashing) for BOTH banding and
        # verification — identical to the engine's stored neartext_sig
        sigs = minhash_signature_batch(texts) & np.uint64(0xFF)
        sig_of = {d["doc_id"]: sigs[i] for i, d in enumerate(elig_docs)}
        band_tbl = lsh_band_rows(
            [d["doc_id"] for d in elig_docs], sigs, bands=cfg.neartext_bands
        ).to_pandas()
        best: dict[str, tuple[str, float]] = {}
        for (_b, _h), g in band_tbl.groupby(["band_id", "band_hash"], sort=False):
            by_pk: dict[str, list[str]] = {}
            for i in sorted(g["doc_id"].unique()):
                by_pk.setdefault(pk_of[i], []).append(i)
            for _pk, ids in by_pk.items():
                ids = ids[: cfg.pair_scan_cap]
                for j in range(1, len(ids)):
                    for i in range(j):
                        if pdf_of[ids[i]] is not None and pdf_of[ids[i]] == pdf_of[ids[j]]:
                            continue
                        # truncated-slot agreement — the engine's estimator
                        jac = float((sig_of[ids[i]] == sig_of[ids[j]]).mean())
                        if jac >= cfg.neartext_jaccard:
                            cur = best.get(ids[j])
                            if cur is None or ids[i] < cur[0]:
                                best[ids[j]] = (ids[i], jac)
                            break
        for dj, (mi, jac) in best.items():
            violations.append(
                (pk_of[dj], dj, REASON_PDF_NEAR_DUP, f"jaccard={jac:.6f};match={mi}")
            )

    vio_df = pd.DataFrame(
        violations, columns=["partition_key", "doc_id", "reason_code", "detail"]
    ).sort_values(["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort").reset_index(drop=True)

    # ---- per-partition verdicts ----------------------------------------
    by_pk: dict[str, list[dict]] = {}
    for d in docs:
        by_pk.setdefault(d["pk"], []).append(d)

    check_of_reason = {
        REASON_MISSING_FIELD: CHECK_SCHEMA,
        REASON_EXACT_INVNUM: CHECK_DUPLICATE,
        REASON_PDF_NEAR_DUP: CHECK_DUPLICATE,
        REASON_SAME_PO_NEAR_TOTAL: CHECK_DUPLICATE,
        REASON_BANK_CHANGE: CHECK_REFERENTIAL,
        REASON_UNIT_PRICE_OUTLIER: CHECK_RANGE,
    }
    vio_counts: dict[tuple[str, str], int] = {}
    for pk, _doc, code, _det in violations:
        ck = check_of_reason[code]
        vio_counts[(pk, ck)] = vio_counts.get((pk, ck), 0) + 1

    rows = []
    for pk in sorted(by_pk):
        members = by_pk[pk]
        n_docs = len(members)
        elig = [d for d in members if not d["missing"] and not d["is_credit"]]
        n_elig = len(elig)
        for check in (CHECK_SCHEMA, CHECK_DUPLICATE, CHECK_REFERENTIAL, CHECK_RANGE):
            nv = vio_counts.get((pk, check), 0)
            rows.append((pk, check, nv == 0, n_docs, nv, float(nv), ""))
        # drift
        p = prof.get(pk)
        totals = np.array([d["total_f"] for d in elig], dtype=np.float64)
        if p is None or not len(p["bin_fracs"]) or totals.size == 0:
            rows.append((pk, CHECK_DRIFT, True, n_docs, 0, 0.0, "no_profile"))
        else:
            edges = np.asarray(p["bin_edges"], dtype=np.float64)
            binned = np.searchsorted(edges, totals, side="right")
            counts = np.bincount(binned, minlength=len(edges) + 1).astype(np.int64)
            cur_frac = counts / counts.sum()
            val = psi(np.asarray(p["bin_fracs"], dtype=np.float64), cur_frac)
            n_base = max(int(p["sample_count"]), 1)
            noise = cfg.psi_noise_factor * (len(cur_frac) - 1) * (1.0 / max(totals.size, 1) + 1.0 / n_base)
            thresh = max(cfg.psi_threshold, noise)
            ks = float(np.abs(
                np.cumsum(np.asarray(p["bin_fracs"], dtype=np.float64)) - np.cumsum(cur_frac)
            ).max())
            rows.append(
                (pk, CHECK_DRIFT, bool(val <= thresh), n_docs, 0, float(val),
                 f"threshold={thresh:.6f};ks={ks:.6f}")
            )
        # structure: avg spans/doc vs profile span-kind histogram expectation
        import json as _json

        span_total_prof = 0
        if p is not None and isinstance(p.get("span_kind_histogram"), str):
            span_total_prof = sum(_json.loads(p["span_kind_histogram"]).values())
        if p is None or not span_total_prof or n_elig == 0:
            rows.append((pk, CHECK_STRUCTURE, True, n_docs, 0, 0.0, "no_profile"))
        else:
            span_sum = sum(d["n_spans"] for d in elig)
            cur_avg = span_sum / n_elig
            exp_avg = span_total_prof / max(int(p["sample_count"]), 1)
            ratio = cur_avg / exp_avg if exp_avg else 1.0
            rows.append(
                (pk, CHECK_STRUCTURE, bool(0.9 <= ratio <= 1.1), n_docs, 0,
                 float(cur_avg), f"expected={exp_avg:.6f}")
            )
        # uniqueness
        h_doc = HyperLogLog().update([d["doc_id"] for d in elig])
        h_inv = HyperLogLog().update([d["invnum_norm"] for d in elig])
        est = h_doc.cardinality()
        ratio = est / n_elig if n_elig else 1.0
        rows.append(
            (pk, CHECK_UNIQUENESS, bool(ratio >= cfg.uniqueness_min_ratio),
             n_docs, 0, float(ratio), f"hll_invnum={h_inv.cardinality():.1f}")
        )

    ver_df = pd.DataFrame(
        rows, columns=["partition_key", "check_name", "passed", "n_docs",
                       "n_violations", "metric", "detail"],
    ).sort_values(["partition_key", "check_name"], kind="mergesort").reset_index(drop=True)
    return vio_df, ver_df
