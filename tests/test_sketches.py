"""Sketch correctness + merge-property tests (SURVEY.md §5 item 5)."""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sievedata.sketches import BloomFilter, HyperLogLog, Moments, TDigest
from sievedata.sketches.drift import ks_pvalue, ks_statistic, psi, psi_from_digests
from sievedata.sketches.hashing import hash64, _hash_numpy, _to_string_array


def test_hash64_deterministic_and_spread():
    vals = [f"doc-{i}" for i in range(1000)]
    h1 = hash64(vals, seed=3)
    h2 = hash64(vals, seed=3)
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == 1000
    assert (hash64(vals, seed=4) != h1).any()


def test_hash_numpy_fallback_works():
    import pyarrow as pa

    vals = pa.array(["abc", "", None, "longer string value here", "abc"])
    h = _hash_numpy(_to_string_array(vals), seed=1)
    assert h[0] == h[4]
    assert h[2] == 0  # null
    assert h[0] != h[3]


def test_moments_matches_pandas():
    import pandas as pd

    rng = np.random.default_rng(0)
    x = rng.normal(50, 9, size=5000)
    m = Moments().update(x)
    assert m.count == 5000
    assert m.mean == pytest.approx(x.mean())
    assert m.std == pytest.approx(pd.Series(x).std())  # ddof=1


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=50),
       st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=50),
       st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=50))
def test_moments_merge_associative_commutative(a, b, c):
    ma, mb, mc = (Moments().update(np.array(v)) for v in (a, b, c))
    left = ma.merged(mb).merged(mc)
    right = ma.merged(mb.merged(mc))
    swap = mc.merged(ma.merged(mb))
    for other in (right, swap):
        assert left.count == other.count
        assert left.mean == pytest.approx(other.mean, rel=1e-9, abs=1e-9)
        assert left.m2 == pytest.approx(other.m2, rel=1e-6, abs=1e-5)


def test_moments_roundtrip():
    m = Moments().update(np.array([1.0, 2.0, 3.0]))
    m2 = Moments.from_bytes(m.to_bytes())
    assert m2.count == 3 and m2.mean == pytest.approx(2.0)


def test_tdigest_quantiles():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 20000)
    td = TDigest()
    for chunk in np.array_split(x, 13):
        td.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert td.quantile(q) == pytest.approx(np.quantile(x, q), abs=0.06)
    # merge of shard digests ≈ single digest
    parts = [TDigest().update(c) for c in np.array_split(x, 8)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merged(p)
    assert merged.count == pytest.approx(20000)
    assert merged.quantile(0.5) == pytest.approx(np.median(x), abs=0.06)
    rt = TDigest.from_bytes(merged.to_bytes())
    assert rt.quantile(0.5) == pytest.approx(merged.quantile(0.5))


def test_hll_accuracy_and_merge():
    n = 50000
    vals = [f"id-{i}" for i in range(n)]
    h = HyperLogLog(p=12)
    h.update(vals)
    assert h.cardinality() == pytest.approx(n, rel=0.05)
    # merged shards == union
    h1 = HyperLogLog(p=12).update(vals[: n // 2])
    h2 = HyperLogLog(p=12).update(vals[n // 3 :])
    merged = h1.merged(h2)
    assert merged.cardinality() == pytest.approx(n, rel=0.05)
    rt = HyperLogLog.from_bytes(merged.to_bytes())
    assert rt.cardinality() == merged.cardinality()
    # small-range linear counting
    small = HyperLogLog(p=12).update([f"x{i}" for i in range(100)])
    assert small.cardinality() == pytest.approx(100, rel=0.03)


def test_bloom_no_false_negatives_low_fp():
    keys = [f"media://{i:08x}" for i in range(20000)]
    bf = BloomFilter(capacity=20000, fp_rate=1e-4)
    bf.add(keys)
    assert bf.contains(keys).all()
    probes = [f"missing://{i}" for i in range(20000)]
    fp = bf.contains(probes).mean()
    assert fp < 1e-2
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.contains(keys[:100]).all()
    m = BloomFilter(capacity=20000, fp_rate=1e-4).add(probes[:10]).merged(bf)
    assert m.contains(probes[:10]).all() and m.contains(keys[:100]).all()


def test_psi_and_ks():
    rng = np.random.default_rng(2)
    base = rng.normal(100, 10, 20000)
    same = rng.normal(100, 10, 20000)
    shifted = rng.normal(125, 10, 20000)

    td_base = TDigest().update(base)
    td_same = TDigest().update(same)
    td_shift = TDigest().update(shifted)

    assert psi_from_digests(td_base, td_same) < 0.05
    assert psi_from_digests(td_base, td_shift) > 0.2

    d_same = ks_statistic(base, same)
    d_shift = ks_statistic(base, shifted)
    assert ks_pvalue(d_same, base.size, same.size) > 0.01
    assert ks_pvalue(d_shift, base.size, shifted.size) < 1e-6
    # digest-based KS agrees with exact within tolerance
    d_digest = ks_statistic(td_base, td_shift)
    assert d_digest == pytest.approx(d_shift, abs=0.05)

    assert psi(np.array([0.5, 0.5]), np.array([0.5, 0.5])) == pytest.approx(0.0)


def _scalar_ascii_sig(t: str | None, num_perm: int = 64, n: int = 5,
                      seed: int = 1719) -> "np.ndarray":
    """Definitional scalar re-derivation of one ASCII doc's signature:
    pack each n-char window's bytes big-endian + length tag, splitmix-mix
    (``_packed_hash_pair``), min per permutation.  Windows as a SET — the
    engine keeps duplicates, and min must be idempotent to them."""
    import numpy as np

    from sievedata.functions.dedup import _packed_hash_pair

    out = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    t = t or ""  # list inputs coerce None → "" (pa.array fill), like the engine
    sh = [t] if len(t) < n else sorted({t[i:i+n] for i in range(len(t)-n+1)})
    packed = np.zeros(len(sh), np.uint64)
    for j, s in enumerate(sh):
        g = 0
        for b in s.encode():
            g = (g << 8) | b
        packed[j] = np.uint64(g | (len(s) << (8 * n)))
    h1, h2 = _packed_hash_pair(packed, seed)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            out[i] = (h1 + np.uint64(i) * h2).min()
    return out


def test_minhash_vectorized_path_identical():
    """The packed-gram fast path must produce signatures identical to the
    definitional scalar re-derivation (packed windows → splitmix64 pair →
    minima), including multiset-idempotence ('aaaaaaa' has 3 identical
    windows) and per-DOC routing determinism (a doc's signature must not
    depend on which batch it landed in)."""
    import numpy as np

    from sievedata.functions.dedup import minhash_signature_batch
    from sievedata.sketches.hashing import hash64_pair

    texts = ["the quick brown fox jumps", "the quick brown fax jumps",
             "ab", "", None, "aaaaaaa", "invoice 12345 total 99.99"]
    got = minhash_signature_batch(texts)
    num_perm, n = 64, 5
    exp = np.stack([_scalar_ascii_sig(t) for t in texts])
    np.testing.assert_array_equal(got, exp)

    # non-ASCII docs route per-doc through the distinct-shingle-string path
    got_u = minhash_signature_batch(["héllo wörld invoice", "plain ascii"])
    exp_u = np.full((2, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    sh = list({"héllo wörld invoice"[i:i+n]
               for i in range(len("héllo wörld invoice")-n+1)})
    h1, h2 = hash64_pair(sh, seed=1719)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            exp_u[0, i] = (h1 + np.uint64(i) * h2).min()
    exp_u[1] = _scalar_ascii_sig("plain ascii")
    np.testing.assert_array_equal(got_u, exp_u)

    # batch-split determinism: each doc's row equals its singleton-batch row
    mixed = ["héllo wörld invoice", "plain ascii", None, "ab",
             "the quick brown fox jumps"]
    whole = minhash_signature_batch(mixed)
    for r, t in enumerate(mixed):
        np.testing.assert_array_equal(
            whole[r], minhash_signature_batch([t])[0], err_msg=str(t))
