"""ANN operators: brute-force exactness is covered by the DuckDB oracle
(ann_topk); here: IVF recall vs brute force, kmeans determinism, LSH
signatures, SimHash/Hamming sanity."""
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_kmeans_deterministic():
    from sievedata.functions.ann import kmeans_fit

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (500, 16))
    c1 = kmeans_fit(x, k=8)
    c2 = kmeans_fit(x, k=8)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def test_ivf_recall_vs_bruteforce(ray_session):
    from sievedata.queries import q_ann_ivf_topk, q_ann_topk

    brute = q_ann_topk(SF)
    ivf = q_ann_ivf_topk(SF)
    recall = []
    for qid in brute["query_id"].unique():
        b = set(brute.loc[brute["query_id"] == qid, "neighbor_id"])
        i = set(ivf.loc[ivf["query_id"] == qid, "neighbor_id"])
        recall.append(len(b & i) / len(b))
    assert np.mean(recall) >= 0.6, recall


def test_lsh_recall_vs_bruteforce(ray_session):
    from sievedata.queries import q_ann_lsh_topk, q_ann_topk

    brute = q_ann_topk(SF)
    lsh = q_ann_lsh_topk(SF)
    recall = []
    for qid in brute["query_id"].unique():
        b = set(brute.loc[brute["query_id"] == qid, "neighbor_id"])
        l = set(lsh.loc[lsh["query_id"] == qid, "neighbor_id"])
        recall.append(len(b & l) / len(b))
    assert np.mean(recall) >= 0.5, recall


def test_hyperplane_lsh_buckets_similar_vectors():
    from sievedata.functions.ann import hyperplane_signatures, make_planes

    rng = np.random.default_rng(2)
    base = rng.normal(0, 1, (100, 32))
    noisy = base + rng.normal(0, 0.01, base.shape)
    planes = make_planes(32, n_bits=8)
    s1 = hyperplane_signatures(base, planes)
    s2 = hyperplane_signatures(noisy, planes)
    assert (s1 == s2).mean() > 0.8  # tiny perturbations rarely flip buckets
    far = rng.normal(0, 1, (100, 32))
    s3 = hyperplane_signatures(far, planes)
    assert (s1 == s3).mean() < 0.3


def test_bruteforce_single_batch_returns_k_nonself(ray_session):
    """Regression: when the whole corpus lands in ONE block, the query's own
    vector (sim=1.0) must not burn one of the k local slots — the stage
    selects k+1 locally and self is filtered at the merge."""
    import pandas as pd
    import ray

    from sievedata.functions.ann import BruteForceTopK, merge_topk

    rng = np.random.default_rng(3)
    n, dim, k = 20, 8, 5
    mat = rng.normal(0, 1, (n, dim))
    queries_ref = ray.put((np.array([0]), mat[:1]))
    import pyarrow as pa

    batch = pa.table(
        {"vec_id": pa.array(np.arange(n)),
         "embedding": pa.array([list(map(float, v)) for v in mat], pa.list_(pa.float64()))}
    )
    stage = BruteForceTopK(queries_ref, k=k)
    cands = stage(batch).to_pandas()
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    out = merge_topk(cands, k=k)
    assert len(out) == k  # all k non-self neighbors survive the single batch

    # exact match vs numpy brute force
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm[0] @ norm.T
    sims[0] = -np.inf
    expect = set(np.argsort(-sims)[:k])
    assert set(out["neighbor_id"]) == expect


def test_simhash_hamming():
    from sievedata.functions.text import hamming64, simhash_column

    texts = ["the quick brown fox jumps over the lazy dog" * 3,
             "the quick brown fox jumps over the lazy cat" * 3,
             "completely different content about spark and ray data engines"]
    sigs = simhash_column(texts)
    d_near = hamming64(sigs[0:1], sigs[1:2])[0]
    d_far = hamming64(sigs[0:1], sigs[2:3])[0]
    assert d_near < d_far
    assert hamming64(sigs[0:1], sigs[0:1])[0] == 0


def test_embedding_matrix_shapes_and_values():
    """Zero-copy list<float> → matrix: plain, chunked, sliced (non-zero
    offset), empty, and pandas-Series fallback all agree with the per-row
    build; ragged input raises like the old idiom did."""
    import pandas as pd
    import pyarrow as pa

    from sievedata.functions.ann import embedding_matrix

    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float32()))
    expect = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    np.testing.assert_array_equal(embedding_matrix(arr), expect)
    assert embedding_matrix(arr).dtype == np.float64

    chunked = pa.chunked_array([arr.slice(0, 1), arr.slice(1)])
    np.testing.assert_array_equal(embedding_matrix(chunked), expect)

    sliced = arr.slice(1)  # offsets no longer start at 0
    np.testing.assert_array_equal(embedding_matrix(sliced), expect[1:])

    empty = pa.array([], pa.list_(pa.float32()))
    assert embedding_matrix(empty).shape == (0, 0)

    series = pd.Series([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_array_equal(embedding_matrix(series), expect[:2])

    # float32 → float64 widening is exact (bit-identical to the old idiom)
    f32 = pa.array([[0.1, 0.2]], pa.list_(pa.float32()))
    old = np.asarray([np.asarray(v, dtype=np.float64) for v in f32.to_pylist()])
    np.testing.assert_array_equal(embedding_matrix(f32), old)

    ragged = pa.array([[1.0, 2.0], []], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        embedding_matrix(ragged)
