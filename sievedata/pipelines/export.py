"""PII-stripped export of decisions joined with document headers (S10).

The reference specifies exports of decisions/features/audit by date+vendor
that MUST NOT include raw PII or full bank numbers (RPT-001/002,
/root/reference/requirements.md:305-309; SEC-004/005).  Ray-Data-first:

    read documents → parse → project + mask (mask_account_last4 /
    hash_account — raw remit account and names never leave the stage) →
    hash-partitioned join with the run's decisions → filtered, partitioned
    parquet/CSV (one directory per partition_key → resumable, prunable).
"""
from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from sievedata.sources.storage import read_documents
from sievedata.stages.parse import parse_documents_batch

# columns that may appear in an export — everything else (raw
# remit_account, remit_name, vendor_name, raw spans/text) is PII-stripped
EXPORT_DOC_COLUMNS = [
    "doc_id", "partition_key", "invnum_norm", "invoice_date", "currency",
    "total", "tax_total", "remit_account_masked", "remit_account_hash",
]


def _strip_batch(batch: pa.Table) -> pa.Table:
    from sievedata.kernels.normalize import hash_account, mask_account_last4

    parsed = parse_documents_batch(batch)
    accounts = parsed.column("remit_account").to_pylist()
    masked = pa.array([mask_account_last4(a) for a in accounts], pa.string())
    hashed = pa.array([hash_account(a) for a in accounts], pa.string())
    out = parsed.select(
        [c for c in EXPORT_DOC_COLUMNS if c in parsed.column_names]
    )
    out = out.append_column("remit_account_masked", masked)
    out = out.append_column("remit_account_hash", hashed)
    return out.select(EXPORT_DOC_COLUMNS)


def export_decisions(
    documents_path: str,
    run_dir: str,
    out_dir: str,
    vendor: str | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
    fmt: str = "parquet",
) -> dict:
    """Write the PII-stripped decisions export; returns paths + row count."""
    import ray.data as rd

    docs = read_documents(documents_path).map_batches(
        _strip_batch, batch_format="pyarrow"
    )

    decisions = rd.read_parquet(
        os.path.join(run_dir, "decisions"),
        columns=["doc_id", "risk_score", "decision", "reason_codes",
                 "dup_prob", "anom_prob", "n_candidates"],
    )
    joined = docs.join(
        decisions, join_type="inner", num_partitions=16,
        on=("doc_id",),
    )

    # vendor/date selection AFTER the join: a pre-join filter can starve
    # hash partitions into schema-less empties, which the shuffle join's
    # key resolution rejects.  At real scale the export input would be the
    # partition_key-partitioned decisions layout, so vendor/date selection
    # happens as partition pruning at the READ, not a row filter here.
    def sel(t: pa.Table) -> pa.Table:
        if vendor is not None:
            t = t.filter(pc.equal(t["partition_key"], vendor))
        if date_from is not None:
            t = t.filter(pc.greater_equal(
                t["invoice_date"],
                pa.scalar(datetime.date.fromisoformat(date_from))))
        if date_to is not None:
            t = t.filter(pc.less_equal(
                t["invoice_date"],
                pa.scalar(datetime.date.fromisoformat(date_to))))
        return t

    joined = joined.map_batches(sel, batch_format="pyarrow")

    # idempotent re-run: a prior export's UUID-named files would otherwise
    # survive next to the new ones and double-count in n_rows (same
    # clear-first contract as the score pipeline's cases sink)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "csv":
        joined.write_csv(out_dir)
    else:
        joined.write_parquet(out_dir, partition_cols=["partition_key"])
    n_rows = rd.read_parquet(out_dir).count() if fmt == "parquet" else rd.read_csv(out_dir).count()
    return {"out": out_dir, "format": fmt, "n_rows": int(n_rows)}
