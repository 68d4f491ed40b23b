"""Scoring-row projection: parse stage output extended with the fields the
pairwise duplicate scorer needs (line items as list<struct>, remit account
hash, amount-month block key).

Mirrors the reference's persisted invoice row + line rows
(/root/reference/app/schema.sql:21-61) — but lines ride along in the row
(list<struct>) instead of a separate table, so candidate featurization never
joins (SURVEY.md J2: the key idiomatic win)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, hash_account_array
from sievedata.stages.parse import parse_documents_batch

LINE = pa.struct(
    [
        ("desc_norm", pa.string()),
        ("qty", pa.float64()),
        ("unit_price", pa.float64()),
        ("amount", pa.float64()),
    ]
)

SCORE_COLUMNS = [
    "doc_id", "partition_key", "invnum_norm", "invoice_date", "currency",
    "total", "tax_total", "po_number", "remit_account_hash", "remit_name",
    "pdf_hash", "amount_month_key", "missing_fields", "is_credit", "lines",
]


def score_parse_batch(batch: pa.Table) -> pa.Table:
    """documents → scoring rows (vectorized; one python pass only over the
    line-span split for the nested rebuild)."""
    parsed = parse_documents_batch(batch)
    n = parsed.num_rows

    # line structs from the raw spans (kind == "line", '|'-encoded)
    spans = batch.column("spans").combine_chunks()
    counts = np.diff(np.asarray(spans.offsets))
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    values = spans.flatten()
    kind = np.asarray(values.field("kind").to_numpy(zero_copy_only=False))
    line_mask = kind == "line"
    line_parent = parent[line_mask]
    line_text = values.field("text").take(pa.array(np.flatnonzero(line_mask), pa.int64()))
    parts = pc.split_pattern(line_text, "|")
    descs = desc_norm_array(pc.list_element(parts, 0))
    qtys = pc.cast(pc.list_element(parts, 1), pa.float64())
    ups = pc.cast(pc.list_element(parts, 2), pa.float64())
    amounts = pc.cast(pc.list_element(parts, 3), pa.float64())
    line_structs = pa.StructArray.from_arrays(
        [descs, qtys, ups, amounts], fields=list(LINE)
    )
    # rebuild list offsets per parent row (line_parent ascends)
    line_counts = np.bincount(line_parent, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(line_counts, out=offsets[1:])
    lines_col = pa.ListArray.from_arrays(pa.array(offsets), line_structs)

    month = pc.strftime(pc.cast(parsed.column("invoice_date"), pa.timestamp("us")), "%Y%m")
    total_r2 = pc.round(parsed.column("total"), 2)
    amount_month = pc.binary_join_element_wise(
        pc.cast(total_r2, pa.string()), month, "|"
    )
    remit_hash = hash_account_array(
        batch_remit_account(parsed)
    )

    cols = {name: parsed.column(name) for name in (
        "doc_id", "partition_key", "invnum_norm", "invoice_date", "currency",
        "total", "tax_total", "po_number", "remit_name", "pdf_hash",
        "missing_fields", "is_credit",
    )}
    cols["remit_account_hash"] = remit_hash
    cols["amount_month_key"] = amount_month
    cols["lines"] = lines_col
    return pa.table({name: cols[name] for name in SCORE_COLUMNS})


def batch_remit_account(parsed: pa.Table) -> pa.Array:
    col = parsed.column("remit_account")
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
