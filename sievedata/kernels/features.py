"""Pairwise duplicate-detection features.

Reproduces the reference's header + line-assignment features
(/root/reference/app/features.py:11-101) on the from-scratch Jaro-Winkler and
Hungarian kernels.  Inputs are plain dicts (one per document / line) as
produced by the span parse stage; all numerics are coerced like the
reference's ``_to_float`` (None/Decimal/str → float, default 0.0).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from sievedata.kernels.assignment import linear_sum_assignment
from sievedata.kernels.similarity import jaro_winkler


def _to_float(value: Any, default: float = 0.0) -> float:
    """None/Decimal/str → float with default.  Ref: app/features.py:11-17."""
    if value is None:
        return default
    try:
        return float(value)
    except (TypeError, ValueError):
        return default


def _string_distance(a: str, b: str) -> float:
    return 1.0 - jaro_winkler(a, b)


def header_features(
    a: Dict[str, Any], b: Dict[str, Any], jw_fn=None
) -> Dict[str, float]:
    """Header-level pair features.  Ref: app/features.py:20-40.

    ``invoice_date`` values must support subtraction yielding ``.days``
    (datetime.date), like the reference.  ``jw_fn(a, b)`` optionally
    overrides the invoice-number Jaro-Winkler (callers may pass a memoized
    or batch-precomputed version; must return the identical value).
    """
    if jw_fn is None:
        jw_fn = jaro_winkler
    total_a = _to_float(a.get("total"))
    total_b = _to_float(b.get("total"))
    feats: Dict[str, float] = {}
    feats["abs_total_diff_pct"] = float(abs(total_a - total_b) / max(abs(total_a), 1.0))
    feats["days_diff"] = float(abs((a.get("invoice_date") - b.get("invoice_date")).days))
    feats["same_po"] = float(
        1.0 if a.get("po_number") and a.get("po_number") == b.get("po_number") else 0.0
    )
    feats["same_currency"] = float(1.0 if a.get("currency") == b.get("currency") else 0.0)
    feats["same_tax_total"] = float(
        1.0
        if round(float(a.get("tax_total") or 0.0), 2) == round(float(b.get("tax_total") or 0.0), 2)
        else 0.0
    )
    feats["bank_change_flag"] = float(
        1.0
        if a.get("remit_account_hash")
        and b.get("remit_account_hash")
        and a.get("remit_account_hash") != b.get("remit_account_hash")
        else 0.0
    )
    feats["payee_name_change_flag"] = float(
        1.0 if (a.get("remit_name") or "") != (b.get("remit_name") or "") else 0.0
    )
    feats["invnum_edit"] = 1.0 - jw_fn(
        a.get("invoice_number_norm", ""), b.get("invoice_number_norm", "")
    )
    return feats


def line_assign_features(
    a_lines: List[Dict[str, Any]],
    b_lines: List[Dict[str, Any]],
    alpha: float = 0.7,
    beta: float = 0.2,
    gamma: float = 0.1,
    dist_fn=None,
    cost=None,
) -> Dict[str, float]:
    """Optimal line-item matching features via Hungarian assignment on
    0.7·desc_dist + 0.2·capped Δunit_price + 0.1·capped Δqty.
    Ref: app/features.py:47-101, including the empty-side fallback.

    ``dist_fn(a, b)`` overrides the desc distance (callers may pass a
    memoized Jaro-Winkler — descs repeat heavily across pairs).
    ``cost`` optionally supplies the whole (n, m) cost matrix precomputed
    (callers may assemble it vectorized from batch-computed desc
    distances; values must be identical to the in-line build).
    """
    if dist_fn is None:
        dist_fn = _string_distance
    if not a_lines or not b_lines:
        total_amount = sum((_to_float(x.get("amount")) for x in a_lines), 0.0)
        unmatched = float(total_amount)
        unmatched_amount_frac = (
            float(unmatched / max(total_amount, 1.0)) if total_amount else 1.0
        )
        return {
            "line_coverage_pct": 0.0,
            "unmatched_amount_frac": unmatched_amount_frac,
            "count_new_items": float(len(a_lines)),
            "median_unit_price_diff": unmatched,
        }

    n, m = len(a_lines), len(b_lines)
    b_up = [_to_float(bl.get("unit_price")) for bl in b_lines]
    if cost is None:
        b_desc = [bl.get("desc_norm", "") for bl in b_lines]
        b_qty = [_to_float(bl.get("qty")) for bl in b_lines]
        cost = np.zeros((n, m), dtype=float)
        for i, al in enumerate(a_lines):
            desc_a = al.get("desc_norm", "")
            up_a = _to_float(al.get("unit_price"))
            qty_a = _to_float(al.get("qty"))
            for j in range(m):
                desc_cost = dist_fn(desc_a, b_desc[j])
                up_term = min(abs(up_a - b_up[j]) / max(abs(up_a), 1.0), 5.0)
                qty_term = min(abs(qty_a - b_qty[j]) / max(abs(qty_a), 1.0), 5.0)
                cost[i, j] = alpha * desc_cost + beta * up_term + gamma * qty_term

    row_ind, col_ind = linear_sum_assignment(cost)
    matched_rows = set(row_ind.tolist())

    matched_amount = sum(_to_float(a_lines[i].get("amount")) for i in matched_rows)
    total_amount = sum(_to_float(line.get("amount")) for line in a_lines)
    unmatched_amount = max(total_amount - matched_amount, 0.0)
    unmatched_amount_frac = (
        float(unmatched_amount / max(total_amount, 1.0)) if total_amount else 1.0
    )
    coverage = float(1.0 - unmatched_amount_frac)

    med_diffs = sorted(
        abs(_to_float(a_lines[i].get("unit_price")) - b_up[j])
        for i, j in zip(row_ind, col_ind)
    )
    # inline median (np.median's per-call overhead dominates at 1-5 matches);
    # even case (lo+hi)/2.0 is the identical IEEE op to numpy's mean-of-two
    if med_diffs:
        h = len(med_diffs) // 2
        if len(med_diffs) % 2:
            median_unit_price_diff = float(med_diffs[h])
        else:
            median_unit_price_diff = float((med_diffs[h - 1] + med_diffs[h]) / 2.0)
    else:
        median_unit_price_diff = 0.0

    return {
        "line_coverage_pct": coverage,
        "unmatched_amount_frac": unmatched_amount_frac,
        "count_new_items": float(max(0, n - len(matched_rows))),
        "median_unit_price_diff": median_unit_price_diff,
    }
