"""Hypothesis property tests: scalar ↔ vectorized kernel equivalence,
normalization behavior, bloom/hll invariants (SURVEY.md §5 item 5)."""
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sievedata.kernels.normalize import (
    desc_norm,
    desc_norm_array,
    invnum_norm,
    invnum_norm_array,
)

# ASCII domain: Arrow's utf8_upper and Python's str.upper() diverge on
# locale-special casefolds (ß→SS vs ẞ); invoice-number-like fields are ASCII
# (documented in kernels/normalize.py)
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
_any_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_invnum_vectorized_equals_scalar(vals):
    got = invnum_norm_array(pa.array(vals, pa.string())).to_pylist()
    assert got == [invnum_norm(v) for v in vals]


@settings(max_examples=200, deadline=None)
@given(st.lists(_any_text, min_size=1, max_size=20))
def test_desc_vectorized_equals_scalar_and_idempotent(vals):
    got = desc_norm_array(pa.array(vals, pa.string())).to_pylist()
    expected = [desc_norm(v) for v in vals]
    assert got == expected
    # desc_norm is idempotent (output alphabet is closed under the transform)
    assert [desc_norm(v) for v in expected] == expected


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab01-/ ", max_size=12), min_size=1, max_size=200))
def test_bloom_never_false_negative(keys):
    from sievedata.sketches import BloomFilter

    bf = BloomFilter(capacity=max(len(keys), 1))
    bf.add(keys)
    assert bf.contains(keys).all()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(alphabet="xyz0123456789", min_size=1, max_size=10),
             min_size=1, max_size=300),
    st.integers(min_value=2, max_value=5),
)
def test_hll_merge_equals_union_any_split(vals, n_parts):
    from sievedata.sketches import HyperLogLog

    whole = HyperLogLog().update(vals)
    parts = [HyperLogLog() for _ in range(n_parts)]
    for i, v in enumerate(vals):
        parts[i % n_parts].update([v])
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merged(p)
    np.testing.assert_array_equal(whole.registers, merged.registers)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e5, 1e5), min_size=2, max_size=200),
       st.integers(min_value=2, max_value=4))
def test_tdigest_count_and_bounds_under_merge(vals, n_parts):
    from sievedata.sketches import TDigest

    parts = [TDigest() for _ in range(n_parts)]
    for i, v in enumerate(vals):
        parts[i % n_parts].update(np.array([v]))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merged(p)
    assert merged.count == pytest.approx(len(vals))
    assert merged.quantile(0.0) == pytest.approx(min(vals))
    assert merged.quantile(1.0) == pytest.approx(max(vals))


@settings(max_examples=100, deadline=None)
@given(st.floats(0, 1), st.floats(0, 1), st.booleans(), st.floats(0, 1))
def test_fuse_scores_bounds_and_bank_floor(dup, anom, bank, text):
    from sievedata.kernels.decision import fuse_scores

    s = fuse_scores(dup, anom, bank, text)
    assert 0.0 <= s <= 100.0
    if bank:
        assert s >= 80.0


# small alphabet ⇒ frequent partial matches, transpositions and shared
# prefixes — the branches where batch and scalar JW could diverge
_jw_text = st.text(alphabet="abАБ01- ", max_size=20)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_jw_text, _jw_text), min_size=1, max_size=50))
def test_jaro_winkler_batch_equals_scalar(pairs):
    from sievedata.kernels.similarity import jaro_winkler, jaro_winkler_batch

    got = jaro_winkler_batch(pairs)
    expected = np.array([jaro_winkler(a, b) for a, b in pairs])
    # bit-exact: the pair scorer's oracle parity relies on identical floats
    assert np.array_equal(got, expected)


def test_jaro_winkler_batch_edge_paths():
    from sievedata.kernels.similarity import jaro_winkler, jaro_winkler_batch

    long = "x" * 200 + "abc"
    pairs = [
        ("", ""), ("", "a"), ("abc", "abc"),
        (long, long[:-1] + "d"),          # >128-char scalar fallback
        ("martha", "marhta"), ("dwayne", "duane"),
    ]
    got = jaro_winkler_batch(pairs)
    assert np.array_equal(got, np.array([jaro_winkler(a, b) for a, b in pairs]))


@settings(deadline=None, max_examples=60)
@given(st.lists(st.text(max_size=40), max_size=20))
def test_utf8_codepoints_property(texts):
    """Vectorized UTF-8 decode == python ord() on arbitrary unicode."""
    import numpy as np
    import pyarrow as pa

    from sievedata.functions.text import utf8_codepoints

    arr = pa.array(texts, pa.string())
    parent, cp, n = utf8_codepoints(arr)
    want_cp = [ord(ch) for t in texts for ch in t]
    want_parent = [i for i, t in enumerate(texts) for _ in t]
    assert cp.tolist() == want_cp
    assert parent.tolist() == want_parent
    assert n.tolist() == [len(t) for t in texts]


@settings(deadline=None, max_examples=40)
@given(st.lists(st.lists(st.floats(-10, 10, allow_nan=False, width=32),
                         min_size=3, max_size=3), min_size=1, max_size=16),
       st.integers(0, 8))
def test_embedding_matrix_property(rows, offset):
    """Zero-copy matrix == per-row build, on plain and sliced arrays."""
    import numpy as np
    import pyarrow as pa

    from sievedata.functions.ann import embedding_matrix

    arr = pa.array(rows, pa.list_(pa.float32()))
    old = np.asarray([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])
    np.testing.assert_array_equal(embedding_matrix(arr), old)
    off = min(offset, len(arr) - 1)
    sliced = arr.slice(off)
    np.testing.assert_array_equal(embedding_matrix(sliced), old[off:])
