"""Span-sequence parse stage: documents → derived header/line columns.

The engine's first ``map_batches`` stage (batch_format="pyarrow",
zero_copy_batch): flattens the ``spans`` list<struct> column with Arrow
list-offset arithmetic + numpy scatters — no Python loop over rows — and
derives the columns every downstream check needs, while PRESERVING the
``spans`` column untouched (the per-row span-sequence invariant,
BASELINE.json ``input_hint``).

Replaces the reference's pydantic ingest + derived-column persistence
(/root/reference/app/main.py:66-202): partition_key ≙ vendor_id (the blocking
key of app/retrieval.py:20), invnum_norm ≙ invoices.invoice_number_norm,
pdf_hash ≙ media span ref.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import invnum_norm_array
from sievedata.schema import HEADER_KINDS, REQUIRED_KINDS

PARSED_COLUMNS = [
    "doc_id", "spans", "partition_key", "tenant_id", "vendor_name",
    "invoice_number",
    "invnum_norm", "invoice_date", "currency", "total", "tax_total",
    "po_number", "remit_account", "remit_name", "terms", "media_ref",
    "pdf_hash", "n_lines", "line_amount_sum", "missing_fields", "is_credit",
]

_FLOAT_KINDS = {"total", "tax_total"}


def _scatter_first(
    n: int, parent: np.ndarray, mask: np.ndarray, values: pa.Array
) -> pa.Array:
    """Scatter values[mask] to their parent rows, first occurrence winning."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return pa.nulls(n, pa.string())
    parents = parent[idx]
    # parents ascend with list layout, so np.unique's first index is the
    # first span of this kind within each row
    uniq, first_pos = np.unique(parents, return_index=True)
    vals = values.take(pa.array(idx[first_pos], pa.int64())).to_numpy(
        zero_copy_only=False
    )
    out = np.full(n, None, dtype=object)
    out[uniq] = vals
    return pa.array(out, pa.string())


def parse_documents_batch(batch: pa.Table) -> pa.Table:
    """Arrow-in/Arrow-out parse of one batch of documents."""
    n = batch.num_rows
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):  # zero-length edge
        spans = spans.combine_chunks()
    list_offsets = np.asarray(spans.offsets)
    counts = np.diff(list_offsets)
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    values = spans.flatten()
    kind = values.field("kind")
    text = values.field("text")
    media = values.field("media_ref")

    kind_np = np.asarray(kind.to_numpy(zero_copy_only=False))

    cols: dict[str, pa.Array] = {
        "doc_id": batch.column("doc_id"),
        "spans": batch.column("spans"),
    }

    header_cols: dict[str, pa.Array] = {}
    for k in HEADER_KINDS:
        mask = kind_np == k
        header_cols[k] = _scatter_first(n, parent, mask, text)

    # tenant dimension: an optional "tenant_id" span composes into the
    # partition key (tenant ␟ vendor), mirroring the reference's composite
    # keying (app/retrieval.py:20 WHERE tenant_id=:t AND vendor_id=:v,
    # app/schema.sql:21-24) — blocking, profiles, drift, manifests and every
    # dup family inherit tenant isolation through the one key.  Single-tenant
    # corpora (no tenant span) keep partition_key == vendor_id unchanged.
    tenant_mask = kind_np == "tenant_id"
    cols["tenant_id"] = _scatter_first(n, parent, tenant_mask, text)
    if tenant_mask.any():
        cols["partition_key"] = pc.if_else(
            pc.is_null(cols["tenant_id"]),
            header_cols["vendor_id"],
            pc.binary_join_element_wise(
                pc.fill_null(cols["tenant_id"], ""),
                pc.fill_null(header_cols["vendor_id"], ""),
                "\x1f",
            ),
        )
        # a null vendor with a tenant still needs a null partition key
        cols["partition_key"] = pc.if_else(
            pc.is_null(header_cols["vendor_id"]),
            pa.nulls(n, pa.string()),
            cols["partition_key"],
        )
    else:
        cols["partition_key"] = header_cols["vendor_id"]
    cols["vendor_name"] = header_cols["vendor_name"]
    cols["invoice_number"] = header_cols["invoice_number"]
    cols["invnum_norm"] = pc.if_else(
        pc.is_null(header_cols["invoice_number"]),
        pa.nulls(n, pa.string()),
        invnum_norm_array(pc.fill_null(header_cols["invoice_number"], "")),
    )
    cols["invoice_date"] = pc.cast(
        pc.strptime(header_cols["invoice_date"], format="%Y-%m-%d", unit="us"),
        pa.date32(),
    )
    cols["currency"] = header_cols["currency"]
    cols["total"] = pc.cast(header_cols["total"], pa.float64())
    cols["tax_total"] = pc.cast(header_cols["tax_total"], pa.float64())
    for k in ("po_number", "remit_account", "remit_name", "terms"):
        cols[k] = header_cols[k]

    # media span: media_ref field of spans with kind == "media"
    media_mask = kind_np == "media"
    cols["media_ref"] = _scatter_first(n, parent, media_mask, media)
    cols["pdf_hash"] = pc.replace_substring_regex(cols["media_ref"], r"^media://", "")

    # line spans: count + vectorized amount-sum (field 3 of the '|' encoding)
    line_mask = kind_np == "line"
    n_lines = np.bincount(parent[line_mask], minlength=n).astype(np.int64)
    cols["n_lines"] = pa.array(n_lines)
    line_idx = np.flatnonzero(line_mask)
    amount_sum = np.zeros(n, dtype=np.float64)
    if line_idx.size:
        line_text = text.take(pa.array(line_idx, pa.int64()))
        parts = pc.split_pattern(line_text, "|")
        amounts = pc.cast(pc.list_element(parts, 3), pa.float64())
        amount_np = np.asarray(amounts.to_numpy(zero_copy_only=False), dtype=np.float64)
        amount_sum = np.bincount(
            parent[line_idx], weights=np.nan_to_num(amount_np), minlength=n
        )
    cols["line_amount_sum"] = pa.array(np.round(amount_sum, 2))

    # schema check: missing required header kinds (or no lines at all)
    missing_lists: list[list[str]] = [[] for _ in range(n)]
    any_missing = np.zeros(n, dtype=bool)
    for k in REQUIRED_KINDS:
        null_mask = np.asarray(pc.is_null(header_cols[k]).to_numpy(zero_copy_only=False))
        any_missing |= null_mask
        for row in np.flatnonzero(null_mask):
            missing_lists[row].append(k)
    no_lines = n_lines == 0
    any_missing |= no_lines
    for row in np.flatnonzero(no_lines):
        missing_lists[row].append("line_items")
    cols["missing_fields"] = pa.array(
        [",".join(m) if m else "" for m in missing_lists], pa.string()
    )

    total_np = np.nan_to_num(
        np.asarray(cols["total"].to_numpy(zero_copy_only=False), dtype=np.float64)
    )
    cols["is_credit"] = pa.array(total_np < 0.0)

    return pa.table({name: cols[name] for name in PARSED_COLUMNS})
