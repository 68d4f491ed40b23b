"""String normalization kernels.

Semantics match the reference normalizers (/root/reference/app/normalization.py:14-70,
requirements NR-001..NR-004) — re-implemented from scratch with both a scalar
form (for the oracle / unit tests) and a vectorized pyarrow form (for
map_batches hot paths).
"""
from __future__ import annotations

import hashlib
import re
from typing import Any, Mapping

import pyarrow as pa
import pyarrow.compute as pc

_SPACE_PUNCT = re.compile(r"[\s\-_\/]")
_NON_ALNUM = re.compile(r"[^a-z0-9\s]")
_MULTI_SPACE = re.compile(r"\s+")
_NON_DIGIT = re.compile(r"\D")


def invnum_norm(value: str) -> str:
    """Normalize an invoice-number-like string (NR-001).

    upper → strip [\\s\\-_/] → drop one leading INVOICE|INV|BILL prefix
    (longest-first, as Python re alternation does) → strip leading zeros →
    "0" if empty.  Ref: app/normalization.py:14-21.
    """
    value = value.strip().upper()
    value = _SPACE_PUNCT.sub("", value)
    for prefix in ("INVOICE", "INV", "BILL"):
        if value.startswith(prefix):
            value = value[len(prefix):]
            break
    value = value.lstrip("0")
    return value or "0"


def invnum_norm_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized invnum_norm over an Arrow string array (null-preserving).

    Exactly one leading prefix is stripped, longest alternative first
    (INVOICE before INV), matching Python ``re`` alternation semantics in the
    scalar form.  Known divergence from the scalar form: Arrow's utf8_upper
    does not apply locale-special casefolds (ß→ẞ, not SS) — irrelevant for
    invoice-number-like ASCII fields, asserted equivalent on ASCII by
    property tests.
    """
    a = pc.utf8_upper(pc.utf8_trim_whitespace(arr))
    a = pc.replace_substring_regex(a, r"[\s\-_/]", "")
    is7 = pc.starts_with(a, "INVOICE")
    is3 = pc.starts_with(a, "INV")
    is4 = pc.starts_with(a, "BILL")
    a = pc.if_else(
        is7,
        pc.utf8_slice_codeunits(a, 7),
        pc.if_else(
            is3,
            pc.utf8_slice_codeunits(a, 3),
            pc.if_else(is4, pc.utf8_slice_codeunits(a, 4), a),
        ),
    )
    a = pc.replace_substring_regex(a, r"^0+", "")
    a = pc.if_else(pc.equal(a, ""), pa.scalar("0", pa.string()), a)
    return a if isinstance(a, pa.Array) else a.combine_chunks()


def desc_norm(value: str) -> str:
    """Normalize free text for similarity (NR-003): lower → non-[a-z0-9\\s]
    to space → collapse whitespace → strip.  Ref: app/normalization.py:24-30."""
    value = value.lower()
    value = _NON_ALNUM.sub(" ", value)
    return _MULTI_SPACE.sub(" ", value).strip()


def desc_norm_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized desc_norm over an Arrow string array."""
    # U+0130 (İ) is Unicode's only multi-char unconditional lowercase
    # mapping; python str.lower() expands it to 'i' + U+0307 but Arrow's
    # utf8_lower does the simple 1:1 map — pre-expand so both paths agree
    a = pc.replace_substring(arr, "İ", "i̇")
    a = pc.utf8_lower(a)
    a = pc.replace_substring_regex(a, r"[^a-z0-9\s]", " ")
    a = pc.replace_substring_regex(a, r"\s+", " ")
    a = pc.utf8_trim_whitespace(a)
    return a if isinstance(a, pa.Array) else a.combine_chunks()


def mask_account_last4(account: str | None) -> str | None:
    """PII mask: '****{last4 digits}', '****' if no digits, None passthrough.
    Ref: app/normalization.py:33-41."""
    if not account:
        return None
    digits = _NON_DIGIT.sub("", account)
    if not digits:
        return "****"
    return f"****{digits[-4:]}"


def hash_account(account: str | None) -> str | None:
    """SHA-256 hex of an account string; None-propagating.
    Ref: app/normalization.py:44-49."""
    if not account:
        return None
    return hashlib.sha256(account.encode("utf8")).hexdigest()


def hash_account_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized hash_account (python loop over batch — sha256 has no Arrow
    kernel; still amortized per batch, not per row-task)."""
    out = [hash_account(v) for v in arr.to_pylist()]
    return pa.array(out, pa.string())


def text_blob(doc: Mapping[str, Any]) -> str:
    """Lowercased concat of vendor_name + po_number + terms + per-line sku+desc.
    Ref: app/normalization.py:52-63."""
    parts: list[str] = [
        doc.get("vendor_name", "") or "",
        doc.get("po_number", "") or "",
        doc.get("terms", "") or "",
    ]
    for line in doc.get("line_items", []) or []:
        parts.append(str(line.get("sku", "") or ""))
        parts.append(str(line.get("desc", "") or ""))
    return " ".join(p for p in parts if p).lower()


def payload_hash(payload: Mapping[str, Any]) -> str:
    """Stable content hash of a payload dict: sha256(repr(sorted(items))).
    Ref: app/normalization.py:66-70."""
    normalized = repr(sorted(payload.items())).encode("utf8")
    return hashlib.sha256(normalized).hexdigest()
