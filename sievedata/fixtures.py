"""Deterministic synthetic documents fixture (FIXTURES.md).

Generates the span-structured documents table of BASELINE.json's
``input_hint``, a media catalog, and an unshifted baseline table for profile
learning.  Fully deterministic given ``seed``: per-row randomness is
counter-based (``np.random.SeedSequence((seed, vendor_idx, seq, tag))``), so
rows can be generated independently, in any order, in parallel shards.

Planted violation classes (modulo rules on per-vendor ``seq``, first match
wins): exact-dup twin (97), near-dup twin (89), out-of-range total (101),
referential miss (103), missing required field (107), credit note (109),
near-dup-text twin (113 — different invoice number/PO/total/pdf, identical
line descriptions, reachable only via the near-text LSH family);
drifted partitions: ``vendor_idx % 50 == 7`` (current-table totals drawn with
``mu_v + 0.8``).
"""
from __future__ import annotations

import hashlib
import itertools
import os
from datetime import date, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sievedata.schema import DOCUMENTS, MEDIA_CATALOG

SEED_DEFAULT = 42
# bump when generator semantics change so cached fixtures regenerate
FIXTURE_VERSION = 4
SIGMA = 0.25
BASE_DATE = date(2025, 1, 1)

_ADJ = ["paper", "printer", "toner", "desk", "cable", "monitor", "chair", "lamp"]
_NOUN = ["a4", "ink", "hdmi", "usb", "stand", "mount", "filter", "tray"]
VOCAB = [f"{a} {b} {i}" for i, (a, b) in enumerate(itertools.product(_ADJ, _NOUN))]
assert len(VOCAB) == 64

CURRENCIES = ["USD", "EUR", "GBP"]
TERMS = ["Net 15", "Net 30", "Net 45"]


def vendor_mu(vendor_idx: int) -> float:
    return 4.0 + (vendor_idx % 37) / 10.0


def vendor_theoretical_stats(vendor_idx: int) -> tuple[float, float]:
    mu = vendor_mu(vendor_idx)
    mean = float(np.exp(mu + SIGMA**2 / 2))
    std = float(mean * np.sqrt(np.exp(SIGMA**2) - 1.0))
    return mean, std


def is_drift_vendor(vendor_idx: int) -> bool:
    return vendor_idx % 50 == 7


def violation_class(seq: int) -> str | None:
    """First matching modulo rule wins (FIXTURES.md §1.3)."""
    if seq % 97 == 0:
        return "dup"
    if seq % 89 == 0:
        return "near"
    if seq % 101 == 0:
        return "outlier"
    if seq % 103 == 0:
        return "refmiss"
    if seq % 107 == 0:
        return "missing"
    if seq % 109 == 0:
        return "credit"
    if seq % 113 == 0:
        return "text"
    return None


def zipf_counts(n_docs: int, n_vendors: int, s: float = 1.1) -> np.ndarray:
    w = np.arange(1, n_vendors + 1, dtype=np.float64) ** (-s)
    counts = np.floor(n_docs * w / w.sum()).astype(np.int64)
    counts = np.maximum(counts, 1)
    deficit = n_docs - int(counts.sum())
    if deficit > 0:
        counts[:deficit] += 1
    return counts


def _rng(seed: int, vendor_idx: int, seq: int, tag: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(np.random.SeedSequence((seed, vendor_idx, seq, tag))))


def _pdf_hash(doc_id: str) -> str:
    return hashlib.sha256(doc_id.encode()).hexdigest()[:12]


def _invoice_number(vendor_idx: int, seq: int, style: int) -> str:
    base = f"{vendor_idx:04d}-{seq:06d}"
    if style == 0:
        return f"INV-{base}"
    if style == 1:
        return f"inv-{vendor_idx:04d}-{seq:06d}"
    if style == 2:
        return f"INVOICE-{base}"
    if style == 3:
        return f"INV {vendor_idx:04d}/{seq:06d}"
    return f"INV-{vendor_idx:04d}-0{seq:06d}"  # style 4: extra zero padding


def _row_draws(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All of a row's randomness in three bulk draws (fixed layout — row
    fields index into these arrays, so any field is recomputable from just
    the row key)."""
    r = rng.random(16)
    z = rng.integers(0, 2**31, size=32)
    u = rng.uniform(2.0, 200.0, size=8)
    return r, z, u


def _style_from_draws(r: np.ndarray, z: np.ndarray) -> int:
    return int(1 + z[0] % 4) if r[0] < 0.10 else 0


def make_doc(
    seed: int, vendor_idx: int, seq: int, table: str
) -> tuple[dict, dict | None]:
    """Generate one document (and its planted twin, if any) as field dicts.

    ``table`` is "current" (violations + drift planted) or "baseline"
    (clean, unshifted — the profile-learning input).
    """
    tag = 0 if table == "baseline" else 1
    rng = _rng(seed, vendor_idx, seq, tag)
    vendor_id = f"V{vendor_idx:04d}"
    doc_id = f"{vendor_id}:{seq:06d}"
    vclass = violation_class(seq) if table == "current" else None

    r, z, u = _row_draws(rng)
    style = _style_from_draws(r, z)

    mu = vendor_mu(vendor_idx)
    if table == "current" and is_drift_vendor(vendor_idx):
        mu += 0.8
    target_total = float(np.round(rng.lognormal(mu, SIGMA), 2))
    if vclass == "outlier":
        mean_t, std_t = vendor_theoretical_stats(vendor_idx)
        target_total = float(np.round(mean_t + 8.0 * std_t, 2))

    # line items: rescale unit prices so Σ amount == target_total (±rounding)
    k = int(1 + z[1] % 8)
    # vocab word + per-line model code (~6.4M distinct descs): organic doc
    # pairs stay well below the 0.9 near-text Jaccard threshold — only the
    # PLANTED near-text twins copy full line text.  A 64-word vocab alone
    # made 1-2-line docs collide at J=1.0 organically, flooding the
    # near-text check with fixture artifacts instead of planted cases.
    descs = [
        f"{VOCAB[int(z[2 + i]) % 64]} model {(int(z[2 + i]) >> 6) % 100000:05d}"
        for i in range(k)
    ]
    qtys = [int(1 + z[10 + i] % 20) for i in range(k)]
    ups = np.round(u[:k], 2)
    raw = np.array(qtys) * ups
    scale = target_total / raw.sum() if raw.sum() else 1.0
    ups = np.round(ups * scale, 4)
    amounts = np.round(np.array(qtys) * ups, 2)
    total = float(np.round(amounts.sum(), 2))
    skus = [
        f"SKU-{int(z[22 + i] % 512):04d}" if r[1 + i] < 0.7 else "" for i in range(k)
    ]
    lines = [
        {"desc": d, "qty": q, "unit_price": float(up), "amount": float(a), "sku": s}
        for d, q, up, a, s in zip(descs, qtys, ups, amounts, skus)
    ]

    invoice_number = _invoice_number(vendor_idx, seq, style)
    inv_date = BASE_DATE + timedelta(days=int(z[18] % 365))
    currency = CURRENCIES[int(z[19] % 3)]
    tax_total = round(total * 0.19, 2)
    has_po = r[9] < 0.70 or vclass == "near"
    po_number = f"PO-{vendor_idx:04d}-{int(z[20] % 1000)}" if has_po else None
    remit_account = (
        f"DE{(89 + vendor_idx) % 100:02d}3704004405{vendor_idx:06d}00"
        if r[10] < 0.90
        else None
    )
    remit_name = f"Vendor {vendor_idx:04d} GmbH" if r[11] < 0.90 else None
    terms = TERMS[int(z[21] % 3)] if r[12] < 0.60 else None

    pdf_hash = _pdf_hash(doc_id)
    media_ref = f"media://{pdf_hash}"
    if vclass == "refmiss":
        media_ref = f"media://missing/{doc_id}"

    doc = {
        "doc_id": doc_id,
        "vendor_id": vendor_id,
        "vendor_name": f"Vendor {vendor_idx:04d} GmbH",
        "invoice_number": invoice_number,
        "invoice_date": inv_date.isoformat(),
        "currency": currency,
        "total": total,
        "tax_total": tax_total,
        "po_number": po_number,
        "remit_account": remit_account,
        "remit_name": remit_name,
        "terms": terms,
        "lines": lines,
        "media_ref": media_ref,
        "vclass": vclass,
    }

    if vclass == "missing":
        doc["currency"] = None
    if vclass == "credit":
        # credit note: negated amounts; invoice number copies the previous
        # seq's doc (same norm) to exercise the credit-note dedup exclusion
        doc["total"] = -total
        doc["tax_total"] = -tax_total
        for line in doc["lines"]:
            line["unit_price"] = -line["unit_price"]
            line["amount"] = -line["amount"]
        if seq > 0:
            prev_rng = _rng(seed, vendor_idx, seq - 1, tag)
            pr, pz, _pu = _row_draws(prev_rng)
            doc["invoice_number"] = _invoice_number(
                vendor_idx, seq - 1, _style_from_draws(pr, pz)
            )

    twin: dict | None = None
    if vclass == "dup":
        twin = dict(doc)
        twin["lines"] = [dict(l) for l in doc["lines"]]
        twin["doc_id"] = doc_id + "~dup"
        twin_style = 2 if style != 2 else 1
        twin["invoice_number"] = _invoice_number(vendor_idx, seq, twin_style)
        twin["invoice_date"] = (inv_date + timedelta(days=3)).isoformat()
        twin["media_ref"] = media_ref  # same pdf_hash
        twin["vclass"] = "dup_twin"
    elif vclass == "near":
        trng = _rng(seed, vendor_idx, seq, 2)
        twin = dict(doc)
        twin["doc_id"] = doc_id + "~near"
        twin["invoice_number"] = _invoice_number(vendor_idx, seq, 0) + "X"
        twin["invoice_date"] = (inv_date + timedelta(days=5)).isoformat()
        new_total = round(total * 1.003, 2)
        f = new_total / total if total else 1.0
        twin["lines"] = [
            {
                **l,
                "unit_price": round(l["unit_price"] * f, 4),
                "amount": round(l["amount"] * f, 2),
            }
            for l in doc["lines"]
        ]
        twin["total"] = float(np.round(sum(l["amount"] for l in twin["lines"]), 2))
        twin["tax_total"] = round(twin["total"] * 0.19, 2)
        twin_hash = _pdf_hash(twin["doc_id"])
        twin["media_ref"] = f"media://{twin_hash}"
        twin["vclass"] = "near_twin"
        del trng
    elif vclass == "text":
        # near-dup-TEXT twin (BR-003 retrieval case): identical line
        # descriptions (→ shingle-Jaccard 1.0) but a DIFFERENT invoice
        # number, no PO, no remit account, 1.5× total and a different pdf
        # hash — invisible to every structured block family; only the
        # near-text LSH path can retrieve it.
        twin = dict(doc)
        twin["doc_id"] = doc_id + "~text"
        twin["invoice_number"] = f"INV-{vendor_idx:04d}-9{seq:06d}"
        twin["invoice_date"] = (inv_date + timedelta(days=7)).isoformat()
        twin["po_number"] = None
        twin["remit_account"] = None
        f = 1.5
        twin["lines"] = [
            {
                **l,
                "unit_price": round(l["unit_price"] * f, 4),
                "amount": round(l["amount"] * f, 2),
            }
            for l in doc["lines"]
        ]
        twin["total"] = float(np.round(sum(l["amount"] for l in twin["lines"]), 2))
        twin["tax_total"] = round(twin["total"] * 0.19, 2)
        twin["media_ref"] = f"media://{_pdf_hash(twin['doc_id'])}"
        twin["vclass"] = "text_twin"
    return doc, twin


def doc_to_spans(doc: dict) -> list[dict]:
    """Encode a document dict as the ordered span sequence (FIXTURES.md §1.1).
    A ``tenant_id`` field (multi-tenant corpora) becomes the leading span."""
    spans: list[tuple[str, str, str]] = []
    for kind in (
        "tenant_id",
        "vendor_id", "vendor_name", "invoice_number", "invoice_date", "currency",
    ):
        v = doc.get(kind)
        if v is not None:
            spans.append((kind, str(v), ""))
    if doc.get("total") is not None:
        spans.append(("total", f"{doc['total']:.2f}", ""))
    if doc.get("tax_total") is not None:
        spans.append(("tax_total", f"{doc['tax_total']:.2f}", ""))
    for kind in ("po_number", "remit_account", "remit_name", "terms"):
        v = doc.get(kind)
        if v is not None:
            spans.append((kind, str(v), ""))
    for line in doc["lines"]:
        text = (
            f"{line['desc']}|{line['qty']}|{line['unit_price']:.4f}|"
            f"{line['amount']:.2f}|{line['sku']}"
        )
        spans.append(("line", text, ""))
    spans.append(("media", "", doc["media_ref"]))

    out = []
    offset = 0
    for kind, text, mref in spans:
        out.append({"kind": kind, "text": text, "media_ref": mref, "offset": offset})
        offset += len(text) + 1
    return out


def generate_docs_table(
    seed: int, n_docs: int, n_vendors: int, table: str,
    vendor_range: tuple[int, int] | None = None,
    spans_plan: list[tuple[int, int, int]] | None = None,
) -> tuple[pa.Table, list[str]]:
    """Build the documents Arrow table (+ list of clean media_refs).

    ``spans_plan``: explicit [(vendor_idx, seq_lo, seq_hi)] work items for
    parallel sharded generation (rows are counter-based independent, so any
    split produces identical rows).
    """
    if spans_plan is None:
        counts = zipf_counts(n_docs, n_vendors)
        lo, hi = vendor_range or (0, n_vendors)
        spans_plan = [(v, 0, int(counts[v])) for v in range(lo, hi)]
    doc_ids: list[str] = []
    span_lists: list[list[dict]] = []
    media_refs: list[str] = []
    for vendor_idx, seq_lo, seq_hi in spans_plan:
        for seq in range(seq_lo, seq_hi):
            doc, twin = make_doc(seed, vendor_idx, seq, table)
            for d in (doc, twin) if twin is not None else (doc,):
                doc_ids.append(d["doc_id"])
                span_lists.append(doc_to_spans(d))
                if d["vclass"] != "refmiss":
                    media_refs.append(d["media_ref"])
    tbl = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": span_lists}, schema=DOCUMENTS
    )
    return tbl, media_refs


def _plan_shards(
    counts: np.ndarray, n_shards: int
) -> list[list[tuple[int, int, int]]]:
    """Split (vendor, seq-range) work into ~equal-doc shards — hot Zipf-head
    vendors are split across shards by seq range."""
    total = int(counts.sum())
    per_shard = max(total // n_shards, 1)
    shards: list[list[tuple[int, int, int]]] = []
    cur: list[tuple[int, int, int]] = []
    cur_n = 0
    for v, c in enumerate(counts):
        seq = 0
        c = int(c)
        while seq < c:
            if len(shards) >= n_shards - 1:
                take = c - seq  # final shard takes everything remaining
            else:
                take = max(min(c - seq, per_shard - cur_n), 1)
            cur.append((v, seq, seq + take))
            seq += take
            cur_n += take
            if cur_n >= per_shard and len(shards) < n_shards - 1:
                shards.append(cur)
                cur, cur_n = [], 0
    if cur:
        shards.append(cur)
    return shards


def generate_fixture_ray(
    out_dir: str,
    n_docs: int,
    n_vendors: int,
    seed: int = SEED_DEFAULT,
    n_shards: int = 64,
) -> dict[str, str]:
    """Sharded parallel fixture generation via Ray tasks (bench scale).

    Writes documents/ and baseline/ as directories of parquet shards plus
    media_catalog.parquet; byte-equivalent rows to generate_fixture (modulo
    sharding layout) because row randomness is counter-based.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, "_SUCCESS")
    paths = {
        "documents": os.path.join(out_dir, "documents"),
        "baseline": os.path.join(out_dir, "baseline"),
        "media_catalog": os.path.join(out_dir, "media_catalog.parquet"),
    }
    if os.path.exists(done_marker):
        return paths

    counts = zipf_counts(n_docs, n_vendors)
    shards = _plan_shards(counts, n_shards)

    @ray.remote
    def gen_shard(plan, table, path):
        tbl, refs = generate_docs_table(seed, n_docs, n_vendors, table, spans_plan=plan)
        pq.write_table(tbl, path)
        return refs

    futures = []
    for table in ("current", "baseline"):
        sub = paths["documents" if table == "current" else "baseline"]
        os.makedirs(sub, exist_ok=True)
        for i, plan in enumerate(shards):
            futures.append(
                gen_shard.remote(plan, table, os.path.join(sub, f"part-{i:05d}.parquet"))
            )
    all_refs: set[str] = set()
    for refs in ray.get(futures):
        all_refs.update(refs)

    refs_sorted = sorted(all_refs)
    epoch = np.datetime64("2025-01-01T00:00:00", "us")
    catalog = pa.Table.from_pydict(
        {
            "media_ref": refs_sorted,
            "size_bytes": [1000 + (len(r) * 37) % 9000 for r in refs_sorted],
            "first_seen": [epoch + np.timedelta64(i, "s") for i in range(len(refs_sorted))],
        },
        schema=MEDIA_CATALOG,
    )
    pq.write_table(catalog, paths["media_catalog"])
    with open(done_marker, "w") as f:
        f.write("")
    return paths


def generate_two_tenant_fixture(
    out_dir: str, n_docs: int, n_vendors: int, seed: int = SEED_DEFAULT,
    tenants: tuple[str, ...] = ("T1", "T2"),
) -> dict[str, str]:
    """Multi-tenant fixture: the SAME vendors and invoice content replicated
    under every tenant (tenant_id span prepended, doc ids tenant-prefixed) —
    the adversarial shape for tenant isolation: identical vendor ids,
    invoice numbers and pdf hashes exist across tenants and must never pair
    (mirrors app/retrieval.py:20's tenant_id-first keying)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "documents": os.path.join(out_dir, "documents.parquet"),
        "baseline": os.path.join(out_dir, "baseline.parquet"),
        "media_catalog": os.path.join(out_dir, "media_catalog.parquet"),
    }
    all_refs: set[str] = set()
    for table, path_key in (("current", "documents"), ("baseline", "baseline")):
        doc_ids: list[str] = []
        span_lists: list[list[dict]] = []
        counts = zipf_counts(n_docs, n_vendors)
        for tenant in tenants:
            for v in range(n_vendors):
                for seq in range(int(counts[v])):
                    doc, twin = make_doc(seed, v, seq, table)
                    for d in (doc, twin) if twin is not None else (doc,):
                        d = dict(d)
                        d["tenant_id"] = tenant
                        d["doc_id"] = f"{tenant}:{d['doc_id']}"
                        doc_ids.append(d["doc_id"])
                        span_lists.append(doc_to_spans(d))
                        if d["vclass"] != "refmiss":
                            all_refs.add(d["media_ref"])
        pq.write_table(
            pa.Table.from_pydict(
                {"doc_id": doc_ids, "spans": span_lists}, schema=DOCUMENTS),
            paths[path_key],
        )
    refs = sorted(all_refs)
    epoch = np.datetime64("2025-01-01T00:00:00", "us")
    catalog = pa.Table.from_pydict(
        {
            "media_ref": refs,
            "size_bytes": [1000 + (len(r) * 37) % 9000 for r in refs],
            "first_seen": [epoch + np.timedelta64(i, "s") for i in range(len(refs))],
        },
        schema=MEDIA_CATALOG,
    )
    pq.write_table(catalog, paths["media_catalog"])
    return paths


def generate_fixture(
    out_dir: str, n_docs: int, n_vendors: int, seed: int = SEED_DEFAULT,
) -> dict[str, str]:
    """Write documents.parquet (current), baseline.parquet, media_catalog.parquet."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "documents": os.path.join(out_dir, "documents.parquet"),
        "baseline": os.path.join(out_dir, "baseline.parquet"),
        "media_catalog": os.path.join(out_dir, "media_catalog.parquet"),
    }
    current, cur_refs = generate_docs_table(seed, n_docs, n_vendors, "current")
    baseline, base_refs = generate_docs_table(seed, n_docs, n_vendors, "baseline")
    pq.write_table(current, paths["documents"])
    pq.write_table(baseline, paths["baseline"])

    refs = sorted(set(cur_refs) | set(base_refs))
    epoch = np.datetime64("2025-01-01T00:00:00", "us")
    catalog = pa.Table.from_pydict(
        {
            "media_ref": refs,
            "size_bytes": [1000 + (len(r) * 37) % 9000 for r in refs],
            "first_seen": [epoch + np.timedelta64(i, "s") for i in range(len(refs))],
        },
        schema=MEDIA_CATALOG,
    )
    pq.write_table(catalog, paths["media_catalog"])
    return paths
