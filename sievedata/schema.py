"""Arrow schemas for the engine's tables (FIXTURES.md §1-3).

The primary input is a table of interleaved text+media documents
(BASELINE.json ``input_hint``): ``doc_id:string,
spans:list<struct<kind,text,media_ref,offset:int32>>``.  Each document
encodes one reference-shaped invoice (/root/reference/app/models.py:10-41) as
an ordered span sequence; header-field spans in fixed order, then one span per
line item (payload order == the reference's line_no ordering,
app/main.py:145-167), then one media span.
"""
from __future__ import annotations

import pyarrow as pa

SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN))])

MEDIA_CATALOG = pa.schema(
    [
        ("media_ref", pa.string()),
        ("size_bytes", pa.int64()),
        ("first_seen", pa.timestamp("us")),
    ]
)

PROFILES = pa.schema(
    [
        ("partition_key", pa.string()),
        ("sample_count", pa.int64()),
        ("mean_total", pa.float64()),
        ("std_total", pa.float64()),
        ("tdigest", pa.binary()),
        ("hll_doc_id", pa.binary()),
        ("hll_invnum", pa.binary()),
        ("span_kind_histogram", pa.map_(pa.string(), pa.int64())),
        ("profile_version", pa.string()),
    ]
)

VIOLATIONS = pa.schema(
    [
        ("partition_key", pa.string()),
        ("doc_id", pa.string()),
        ("reason_code", pa.string()),
        ("detail", pa.string()),
    ]
)

VERDICTS = pa.schema(
    [
        ("partition_key", pa.string()),
        ("check_name", pa.string()),
        ("passed", pa.bool_()),
        ("n_docs", pa.int64()),
        ("n_violations", pa.int64()),
        ("metric", pa.float64()),
        ("detail", pa.string()),
    ]
)

# Header-field span kinds in their fixed encoding order (FIXTURES.md §1.1).
HEADER_KINDS = [
    "vendor_id",
    "vendor_name",
    "invoice_number",
    "invoice_date",
    "currency",
    "total",
    "tax_total",
    "po_number",
    "remit_account",
    "remit_name",
    "terms",
]
REQUIRED_KINDS = [
    "vendor_id",
    "vendor_name",
    "invoice_number",
    "invoice_date",
    "currency",
    "total",
]

REASON_EXACT_INVNUM = "EXACT_INVNUM"
REASON_SAME_PO_NEAR_TOTAL = "SAME_PO_NEAR_TOTAL"
REASON_PDF_NEAR_DUP = "PDF_NEAR_DUP"
REASON_BANK_CHANGE = "BANK_CHANGE"
REASON_UNIT_PRICE_OUTLIER = "UNIT_PRICE_OUTLIER"
REASON_MISSING_FIELD = "MISSING_REQUIRED_FIELD"

CHECK_SCHEMA = "schema"
CHECK_DUPLICATE = "duplicate"
CHECK_REFERENTIAL = "referential"
CHECK_RANGE = "range"
CHECK_DRIFT = "drift"
CHECK_UNIQUENESS = "uniqueness"
CHECK_STRUCTURE = "structure"
