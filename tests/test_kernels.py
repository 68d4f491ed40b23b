"""Golden-vector tests for the pure kernels — same numbers as the reference's
own tests (see FIXTURES.md §5 for the mapping)."""
from datetime import date
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

from sievedata.kernels import (
    anomaly_score,
    decide,
    desc_norm,
    desc_norm_array,
    dice_3gram,
    fuse_scores,
    hash_account,
    header_features,
    invnum_norm,
    invnum_norm_array,
    jaro_winkler,
    line_assign_features,
    linear_sum_assignment,
    mask_account_last4,
    predict_dup_prob,
)
from sievedata.kernels.decision import decide_vec, fuse_scores_vec


def test_invnum_norm_golden():
    assert invnum_norm(" inv-000123 ") == "123"
    assert invnum_norm("invoice-001A") == "1A"
    assert invnum_norm("BILL-0042") == "42"
    assert invnum_norm("000") == "0"
    assert invnum_norm("") == "0"
    assert invnum_norm("inv") == "0"
    assert invnum_norm("A-1_2/3 4") == "A1234"


def test_invnum_norm_array_matches_scalar():
    vals = [
        " inv-000123 ", "invoice-001A", "BILL-0042", "000", "", "inv",
        "A-1_2/3 4", "INV-0007-000001", "xyz", "InVoIcE99", "INVO-5",
    ]
    arr = invnum_norm_array(pa.array(vals)).to_pylist()
    assert arr == [invnum_norm(v) for v in vals]


def test_desc_norm_golden():
    assert desc_norm("Printer Ink, Black!!!") == "printer ink black"
    vals = ["Printer Ink, Black!!!", "  A  B ", "ümlaut-Ö", "x", ""]
    arr = desc_norm_array(pa.array(vals)).to_pylist()
    assert arr == [desc_norm(v) for v in vals]


def test_mask_and_hash():
    assert mask_account_last4(None) is None
    assert mask_account_last4("abc") == "****"
    assert mask_account_last4("DE89 3704 0044 0532 0130 00") == "****3000"
    assert hash_account(None) is None
    assert len(hash_account("X")) == 64


def test_jaro_winkler_known_values():
    # standard published Jaro-Winkler values
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("a", "") == 0.0


def test_hungarian_matches_bruteforce():
    import itertools

    rng = np.random.default_rng(7)
    for n, m in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 3), (6, 6)]:
        cost = rng.random((n, m))
        r, c = linear_sum_assignment(cost)
        got = cost[r, c].sum()
        k = min(n, m)
        best = min(
            sum(cost[i, p[idx]] for idx, i in enumerate(rows))
            for rows in itertools.combinations(range(n), k)
            for p in itertools.permutations(range(m), k)
        )
        assert got == pytest.approx(best, abs=1e-9), (n, m)


def test_line_features_identical():
    a = [{"desc_norm": "paper a4", "qty": 10, "unit_price": 10.0, "amount": 100.0}]
    features = line_assign_features(a, list(a))
    assert features["line_coverage_pct"] >= 0.99
    assert features["unmatched_amount_frac"] <= 0.01


def test_header_features_decimal_totals():
    a = {"total": Decimal("100.00"), "invoice_date": date(2023, 1, 1)}
    b = {"total": Decimal("110.00"), "invoice_date": date(2023, 1, 2)}
    features = header_features(a, b)
    assert features["abs_total_diff_pct"] == pytest.approx(0.1)
    assert features["days_diff"] == pytest.approx(1.0)


def test_line_features_empty_candidate():
    a_lines = [{"amount": Decimal("50.00"), "unit_price": Decimal("5.00"), "qty": Decimal("10")}]
    features = line_assign_features(a_lines, [])
    assert features["line_coverage_pct"] == pytest.approx(0.0)
    assert features["unmatched_amount_frac"] == pytest.approx(1.0)
    assert features["count_new_items"] == pytest.approx(1.0)
    assert features["median_unit_price_diff"] == pytest.approx(50.0)


def test_fuse_and_decide():
    score = fuse_scores(0.8, 0.2, True, 0.1)
    assert 80 <= score <= 100
    assert decide(score, 50, 80) == "HOLD"
    with pytest.raises(ValueError):
        decide(10, 80, 50)
    # vectorized parity
    s = fuse_scores_vec(
        np.array([0.8, 0.1]), np.array([0.2, 0.0]),
        np.array([True, False]), np.array([0.1, 0.9]),
    )
    assert s[0] == pytest.approx(score)
    assert s[1] == pytest.approx(fuse_scores(0.1, 0.0, False, 0.9))
    assert list(decide_vec(s, 50, 80)) == ["HOLD", "PASS"]


def test_dup_prob_fallback_model():
    # all-zero features → sigmoid(-0.3)
    p = predict_dup_prob({})
    assert p == pytest.approx(1 / (1 + np.exp(0.3)))
    strong = {
        "line_coverage_pct": 1.0, "text_cosine": 1.0, "same_po": 1.0,
        "same_currency": 1.0, "same_tax_total": 1.0,
    }
    assert predict_dup_prob(strong) > 0.98


@pytest.mark.parametrize("std_total, sample_count", [(Decimal("12.5"), 20), (Decimal("0"), 20)])
def test_anomaly_score_decimal_baseline(std_total, sample_count):
    prob, reasons = anomaly_score(
        total=Decimal("110.0"),
        mean_total=Decimal("100.0"),
        std_total=std_total,
        sample_count=sample_count,
        bank_change=False,
        vendor_hist_count=11,
    )
    assert isinstance(prob, float)
    assert isinstance(reasons, list)
    assert all(isinstance(r, str) for r in reasons)
    assert 0.0 <= prob <= 1.0


def test_anomaly_outlier_and_vec_parity():
    from sievedata.kernels import anomaly_score_vec

    prob, reasons = anomaly_score(200.0, 100.0, 10.0, 50, bank_change=True)
    assert "UNIT_PRICE_OUTLIER" in reasons and "BANK_CHANGE" in reasons
    pv, z, out = anomaly_score_vec(
        np.array([200.0, 110.0]), np.array([100.0, 100.0]),
        np.array([10.0, 0.0]), np.array([50, 20]),
        np.array([True, False]),
    )
    assert pv[0] == pytest.approx(prob)
    assert bool(out[0]) and not bool(out[1])
    # std=0, count>10 → MAD-like branch: z = 10/100 = 0.1
    assert z[1] == pytest.approx(0.1)


def test_dice_3gram():
    assert dice_3gram("abcdef", "abcdef") == 1.0
    assert dice_3gram("ab", "ab") == 0.0  # below shingle size
    assert 0.0 < dice_3gram("paper a4 500", "paper a4 200") < 1.0


def test_hungarian_list_path_identical():
    """The small-matrix Python-list path must be BIT-identical to the numpy
    path — same assignments (incl. tie choices) on random and tie-heavy
    matrices."""
    from sievedata.kernels import assignment as A

    rng = np.random.default_rng(123)
    cases = []
    for n, m in [(2, 2), (2, 5), (5, 2), (3, 3), (7, 4), (6, 9), (8, 8)]:
        cases.append(rng.random((n, m)))
        # tie-heavy: values drawn from a tiny grid so equal costs abound
        cases.append(rng.integers(0, 3, (n, m)).astype(float) / 2.0)
    cases.append(np.zeros((4, 6)))  # all-ties
    for cost in cases:
        r_list, c_list = A.linear_sum_assignment(cost)
        old = A._LIST_PATH_MAX
        A._LIST_PATH_MAX = 0
        try:
            r_np, c_np = A.linear_sum_assignment(cost)
        finally:
            A._LIST_PATH_MAX = old
        np.testing.assert_array_equal(r_list, r_np)
        np.testing.assert_array_equal(c_list, c_np)


def test_dice_3gram_batch_matches_scalar():
    from sievedata.kernels.similarity import dice_3gram, dice_3gram_batch

    rng = np.random.default_rng(5)
    texts = ["invoice paper a4 ream", "invoice paper a5 ream", "toner xl",
             "abc", "abcd", "office chair mesh black", "häßlich ünïcode",
             "invoice paper a4 ream"]
    pairs = [(texts[int(i)], texts[int(j)])
             for i, j in rng.integers(0, len(texts), (40, 2))]
    got = dice_3gram_batch([a for a, _ in pairs], [b for _, b in pairs])
    for k, (a, b) in enumerate(pairs):
        assert got[k] == dice_3gram(a, b), (a, b)
