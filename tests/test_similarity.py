"""Similarity search: exact top-k vs numpy oracle; LSH recall."""
import numpy as np
import pytest

from pysemanticcomplexity_spark.operators import similarity

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(80, DIM).astype(np.float32)
    # plant exact near-neighbors: vec[i+40] ~ vec[i]
    for i in range(40):
        vecs[i + 40] = vecs[i] + rng.randn(DIM).astype(np.float32) * 0.05
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def _numpy_topk(vecs, query_ids, k):
    v = vecs.astype(np.float64)
    normed = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = normed @ normed.T
    out = {}
    for q in query_ids:
        order = sorted(((-sims[q, j], j) for j in range(len(v)) if j != q))
        out[q] = [j for _, j in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    df, vecs = emb
    got = {}
    res = similarity.cosine_topk(df, df.filter("vec_id < 10"), k=5)
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    expected = _numpy_topk(vecs, range(10), 5)
    for q in range(10):
        mine = [n for _, n in sorted(got[q])]
        assert mine == expected[q], (q, mine, expected[q])


def test_planted_neighbor_is_top1(spark, emb):
    df, _ = emb
    res = similarity.cosine_topk(df, df.filter("vec_id < 10"), k=1)
    for r in res.collect():
        assert r["neighbor_id"] == r["query_id"] + 40


def test_lsh_topk_recall(spark, emb):
    """SRP-LSH recalls *strong* neighbors: the planted near-duplicate
    (cos ~0.99) must be found for >=90% of queries; weak random top-3
    neighbors are legitimately missed (that's the bucket-pruning trade)."""
    df, vecs = emb
    res = similarity.lsh_topk(df, df.filter("vec_id < 10"), k=3, dim=DIM,
                              n_tables=8, n_bits=6)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    planted_hits = sum(1 for q in range(10) if (q + 40) in got.get(q, set()))
    assert planted_hits >= 9, planted_hits


def test_lsh_deterministic(spark, emb):
    df, _ = emb
    a = {tuple(r) for r in similarity.lsh_topk(
        df, df.filter("vec_id < 5"), k=3, dim=DIM).collect()}
    b = {tuple(r) for r in similarity.lsh_topk(
        df, df.filter("vec_id < 5"), k=3, dim=DIM).collect()}
    assert a == b


def test_ivf_trained_centroids_recall(spark, emb):
    """IVF with a k-means-trained quantizer: the planted near-duplicate
    (cos ~0.99, also L2-close) lands in the same cell as its source for
    >= 90% of queries at nprobe=2."""
    df, vecs = emb
    cents = similarity.ivf_centroids(vecs[:60], n_centroids=8, seed=5)
    res = similarity.ivf_topk(df, df.filter("vec_id < 10"), k=1,
                              centroids=cents, nprobe=2)
    hits = sum(1 for r in res.collect()
               if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] + 40)
    assert hits >= 9


def test_ivf_full_probe_equals_exact(spark, emb):
    """nprobe == n_centroids probes every cell -> identical to brute force."""
    df, vecs = emb
    cents = similarity.ivf_centroids(vecs[:60], n_centroids=4, seed=5)
    approx = {tuple(r) for r in similarity.ivf_topk(
        df, df.filter("vec_id < 10"), k=3, centroids=cents,
        nprobe=4).collect()}
    exact = {tuple(r) for r in similarity.cosine_topk(
        df, df.filter("vec_id < 10"), k=3).collect()}
    assert approx == exact


def test_ivf_requires_quantizer(spark, emb):
    df, _ = emb
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivf_topk(df, df, k=1)


def test_ivf_centroids_deterministic():
    rng = np.random.RandomState(0)
    x = rng.randn(200, 16)
    a = similarity.ivf_centroids(x, 8, seed=3)
    b = similarity.ivf_centroids(x, 8, seed=3)
    assert np.array_equal(a, b)
    # training actually moves centroids toward cluster structure
    assert not np.array_equal(a, x[:8])


def test_lsh_topk_return_sim(spark, emb):
    """return_sim=True appends the cosine; ranking/columns otherwise equal,
    and sim agrees with the exact cosine for the returned pairs."""
    df, vecs = emb
    q = df.filter("vec_id < 5")
    base = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in similarity.lsh_topk(df, q, k=3, dim=DIM).collect()}
    rich = similarity.lsh_topk(df, q, k=3, dim=DIM, return_sim=True).collect()
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rich} == base
    v64 = vecs.astype(np.float64)
    for r in rich:
        a, b = v64[r["query_id"]], v64[r["neighbor_id"]]
        exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["sim"] - exact) < 1e-9


def test_ivf_centroids_rejects_small_sample():
    import numpy as np
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_centroids"):
        similarity.ivf_centroids(np.ones((3, 4)), n_centroids=8)


def test_ivf_blas_kernel_matches_expr(spark, emb):
    """kernel='blas' (per-cell matmul, the FAISS scan shape) returns the
    same neighbors as the default expression kernel; ranks agree everywhere
    sims are not exact ties (random fixture: no ties)."""
    df, vecs = emb
    cents = np.random.RandomState(7).randn(16, DIM)
    q = df.filter("vec_id < 10")
    a = {(r["query_id"], r["neighbor_id"], r["rank"])
         for r in similarity.ivf_topk(df, q, k=4, centroids=cents,
                                      nprobe=4).collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rank"])
         for r in similarity.ivf_topk(df, q, k=4, centroids=cents,
                                      nprobe=4, kernel="blas").collect()}
    assert a == b


def test_ivf_rejects_unknown_kernel(spark, emb):
    df, _ = emb
    import pytest as _pytest
    with _pytest.raises(ValueError, match="kernel"):
        similarity.ivf_topk(df, df, centroids=np.zeros((4, DIM)),
                            kernel="nope")


def test_nan_vector_never_ranks(spark, emb):
    """One corrupt embedding (NaN component) must not hijack the ranking:
    Spark orders NaN above every double, so an unfiltered NaN sim would be
    the rank-1 neighbor of EVERY query. All three operators and both IVF
    kernels must exclude it and agree with each other."""
    df, vecs = emb
    bad = spark.createDataFrame(
        [(999, [float("nan")] + [0.0] * (DIM - 1))],
        "vec_id long, embedding array<float>")
    corpus = df.unionByName(bad)
    q = df.filter("vec_id < 10")

    clean = {(r["query_id"], r["neighbor_id"], r["rank"])
             for r in similarity.cosine_topk(df, q, k=3).collect()}
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in similarity.cosine_topk(corpus, q, k=3).collect()}
    assert got == clean                       # NaN row changed nothing
    assert not any(n == 999 for _q, n, _r in got)

    lsh = similarity.lsh_topk(corpus, q, k=3, dim=DIM,
                              n_tables=8, n_bits=6).collect()
    assert not any(r["neighbor_id"] == 999 for r in lsh)

    cents = np.random.RandomState(7).randn(16, DIM)
    for kernel in ("expr", "blas"):
        ivf = similarity.ivf_topk(corpus, q, k=4, centroids=cents,
                                  nprobe=16, kernel=kernel).collect()
        assert not any(r["neighbor_id"] == 999 for r in ivf), kernel
