"""Exactness tests for the packed n-gram kernels (kernels/grams.py):
every vectorized path must agree bit-for-bit with naive Python sets."""
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sievedata.kernels import grams as G


def _py_grams(tx: str, n: int) -> set:
    return {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
any_text = st.text(max_size=40)


@settings(max_examples=60, deadline=None)
@given(st.lists(ascii_text, max_size=12), st.integers(2, 7))
def test_distinct_grams_match_python_sets(texts, n):
    arr = pa.array(texts, pa.string())
    doc_idx, gram, doc_n = G.distinct_grams_packed(arr, n)
    decoded = G.packed_to_strings(gram, n).to_pylist()
    per_doc = {d: set() for d in range(len(texts))}
    for d, g in zip(doc_idx, decoded):
        per_doc[int(d)].add(g)
    for d, tx in enumerate(texts):
        assert per_doc[d] == _py_grams(tx, n)
        assert doc_n[d] == len(_py_grams(tx, n))


def test_distinct_grams_null_text_yields_no_rows():
    arr = pa.array(["hello world", None, ""], pa.string())
    doc_idx, gram, doc_n = G.distinct_grams_packed(arr, 5)
    assert 1 not in set(doc_idx.tolist())
    assert doc_n.tolist() == [7, 0, 1]  # "" → single empty gram


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(any_text, any_text), min_size=1, max_size=10),
       st.integers(2, 5))
def test_pair_jaccard_counts_exact(pairs, n):
    ta = pa.array([a for a, _ in pairs], pa.string())
    tb = pa.array([b for _, b in pairs], pa.string())
    inter, uni = G.pair_jaccard_counts(ta, tb, n)
    for i, (a, b) in enumerate(pairs):
        A, B = _py_grams(a, n), _py_grams(b, n)
        assert inter[i] == len(A & B)
        assert uni[i] == len(A | B)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_indexed_csr_and_bitset_agree(data):
    texts = data.draw(st.lists(ascii_text, min_size=1, max_size=15))
    n = data.draw(st.integers(2, 5))
    rows = data.draw(st.integers(0, 20))
    a_idx = np.array(
        [data.draw(st.integers(0, len(texts) - 1)) for _ in range(rows)],
        dtype=np.int64)
    b_idx = np.array(
        [data.draw(st.integers(0, len(texts) - 1)) for _ in range(rows)],
        dtype=np.int64)
    arr = pa.array(texts, pa.string())
    gram, starts, doc_n = G.pack_doc_grams(arr, n)
    i_csr, u_csr = G.intersect_packed(gram, starts, doc_n, a_idx, b_idx, n)
    vocab = np.unique(gram)
    bits = G.build_bitsets(gram, starts, doc_n, vocab)
    i_bit, u_bit = G.intersect_bitsets(bits, doc_n, a_idx, b_idx)
    np.testing.assert_array_equal(i_csr, i_bit)
    np.testing.assert_array_equal(u_csr, u_bit)
    for r in range(rows):
        A = _py_grams(texts[a_idx[r]], n)
        B = _py_grams(texts[b_idx[r]], n)
        assert i_csr[r] == len(A & B)
        assert u_csr[r] == len(A | B)


def test_bitset_wide_vocab_boundary():
    # vocab straddling several 64-bit words, docs hitting high word indices
    rng = np.random.RandomState(7)
    texts = ["".join(chr(97 + c) for c in rng.randint(0, 26, 20))
             for _ in range(26)]
    arr = pa.array(texts, pa.string())
    n = 3
    gram, starts, doc_n = G.pack_doc_grams(arr, n)
    vocab = np.unique(gram)
    assert len(vocab) > 64  # must span >1 uint64 word
    bits = G.build_bitsets(gram, starts, doc_n, vocab)
    a_idx = np.arange(26, dtype=np.int64)
    b_idx = (a_idx + 1) % 26
    i_bit, u_bit = G.intersect_bitsets(bits, doc_n, a_idx, b_idx)
    for r in range(26):
        A = _py_grams(texts[a_idx[r]], n)
        B = _py_grams(texts[b_idx[r]], n)
        assert i_bit[r] == len(A & B)
        assert u_bit[r] == len(A | B)


def test_non_ascii_falls_back_exactly():
    texts_a = pa.array(["héllo wörld", "abcdef"], pa.string())
    texts_b = pa.array(["héllo würld", "abcxef"], pa.string())
    inter, uni = G.pair_jaccard_counts(texts_a, texts_b, 3)
    for i, (a, b) in enumerate([("héllo wörld", "héllo würld"),
                                ("abcdef", "abcxef")]):
        A, B = _py_grams(a, 3), _py_grams(b, 3)
        assert inter[i] == len(A & B)
        assert uni[i] == len(A | B)


def test_capacity_chunking_n7_large_batch():
    """n=7 leaves only 2**5 doc-index slots above the packed gram — a
    40-doc batch must chunk, not silently alias documents (regression:
    the old guard allowed 2**22 docs regardless of n)."""
    rng = np.random.RandomState(11)
    texts = ["".join(chr(97 + c) for c in rng.randint(0, 26, 30))
             for _ in range(40)]
    arr = pa.array(texts, pa.string())
    for n in (6, 7):
        doc_idx, gram, doc_n = G.distinct_grams_packed(arr, n)
        decoded = G.packed_to_strings(gram, n).to_pylist()
        per_doc = {}
        for d, g in zip(doc_idx, decoded):
            per_doc.setdefault(int(d), set()).add(g)
        for d, tx in enumerate(texts):
            assert per_doc.get(d, set()) == _py_grams(tx, n), (n, d)
            assert doc_n[d] == len(_py_grams(tx, n))


def test_intersect_packed_chunking_n7():
    """Pair-index tags at n=7 fit only 32 pairs per chunk — larger pair
    lists must chunk with identical results."""
    rng = np.random.RandomState(12)
    texts = ["".join(chr(97 + c) for c in rng.randint(0, 26, 25))
             for _ in range(10)]
    arr = pa.array(texts, pa.string())
    n = 7
    gram, starts, doc_n = G.pack_doc_grams(arr, n)
    a_idx = rng.randint(0, 10, 200).astype(np.int64)
    b_idx = rng.randint(0, 10, 200).astype(np.int64)
    inter, uni = G.intersect_packed(gram, starts, doc_n, a_idx, b_idx, n)
    for r in range(200):
        A = _py_grams(texts[a_idx[r]], n)
        B = _py_grams(texts[b_idx[r]], n)
        assert inter[r] == len(A & B)
        assert uni[r] == len(A | B)


def test_pair_jaccard_counts_null_fallback():
    """Non-ASCII batches with null texts: the scalar fallback must treat
    null as an EMPTY gram set (matching the ASCII path), not crash."""
    ta = pa.array(["héllo wörld", None, "abc"], pa.string())
    tb = pa.array(["héllo wörld", "xyz", None], pa.string())
    inter, uni = G.pair_jaccard_counts(ta, tb, 3)
    assert inter[0] == len(_py_grams("héllo wörld", 3))
    assert inter[1] == 0 and uni[1] == len(_py_grams("xyz", 3))
    assert inter[2] == 0 and uni[2] == len(_py_grams("abc", 3))


def test_all_grams_packed_matches_distinct_multiset():
    """all_grams_packed must emit every window (duplicates kept, doc-major
    contiguous) whose SET equals distinct_grams_packed's output per doc."""
    import numpy as np
    import pyarrow as pa

    from sievedata.kernels import grams as G

    texts = pa.array(["aaaaaaa", "abcdefgh", "ab", "", None, "xyxyxyxy"],
                     pa.string())
    gram, doc_n = G.all_grams_packed(texts, 5)
    exp_counts = [3, 4, 1, 1, 0, 4]
    assert doc_n.tolist() == exp_counts
    di, dg, dn = G.distinct_grams_packed(texts, 5)
    off = np.concatenate(([0], np.cumsum(doc_n)))
    doff = np.concatenate(([0], np.cumsum(dn)))
    for d in range(len(texts)):
        mine = set(gram[off[d]:off[d+1]].tolist())
        ref = set(dg[doff[d]:doff[d+1]].tolist())
        assert mine == ref, d
    # 'aaaaaaa': 3 identical windows — multiset kept
    assert len(set(gram[off[0]:off[1]].tolist())) == 1
