"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k: JVM-side dot products via
  ``F.aggregate``/``zip_with`` (no Python), shuffle = one broadcast of the
  query block. Baseline and verification oracle.
* ``lsh_topk``         — random-hyperplane LSH bucketing: queries and corpus
  meet only inside shared hash buckets (probe multiple tables), turning the
  O(N*Q) cross join into O(bucket) joins — the 100 TB path.

Vectors are cast to double before arithmetic so results are reproducible
across engines (float32 summation order differences disappear at double
precision for 64-dim vectors).

Degenerate vectors never rank: a NaN component makes every cosine against
the vector NaN, and Spark orders NaN ABOVE every double — unfiltered, one
corrupt embedding row (a real upstream-model failure mode) would become
the rank-1 neighbor of EVERY query. Degeneracy is a per-VECTOR property
(NaN/Inf component -> NaN/Inf norm; zero norm -> NULL sim non-ANSI), so
``_prep_vectors`` drops such vectors ONCE — O(corpus), not the O(pairs)
per-pair sim filter of round 5, which additionally made Catalyst evaluate
the dot fold twice per pair (Filter below the Project referencing the
same derived column). Matches the blas kernel, whose lexsort+isfinite
path already dropped them.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["cosine_topk", "lsh_topk", "srp_planes", "ivf_centroids",
           "ivf_topk"]


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank): exact top-k cosine neighbors, self
    excluded; ties broken by neighbor_id ascending (deterministic).

    Norms are precomputed ONCE per vector map-side (they are a property of
    the vector, not the pair), so the per-pair work is a single dot fold —
    3x fewer interpreted higher-order-function evaluations than folding
    dot + both norms per pair. The fold order is unchanged, so sims stay
    bit-identical to the previous formulation and to the sequential SQL
    oracle."""
    c = _prep_vectors(corpus, id_col, vec_col, "neighbor_id", "cvec", "cnorm")
    q = _prep_vectors(queries, id_col, vec_col, "query_id", "qvec", "qnorm")
    sim = (c.crossJoin(F.broadcast(q))
           .filter(F.col("neighbor_id") != F.col("query_id"))
           .select("query_id", "neighbor_id",
                   (_dot(F.col("cvec"), F.col("qvec"))
                    / (F.col("cnorm") * F.col("qnorm"))).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def _prep_vectors(df: DataFrame, id_col: str, vec_col: str,
                  out_id: str, out_vec: str, out_norm: str) -> DataFrame:
    """(out_id, out_vec double[], out_norm): one norm fold per VECTOR.

    Degenerate vectors are dropped HERE, once per vector (module
    docstring): a NaN component makes the norm NaN, an Inf component
    makes it Inf, and a zero vector has norm 0 — each would make every
    sim against the vector NaN/NULL, which round 5 filtered per PAIR
    (O(n*m) + a duplicated dot-fold evaluation under the Filter).
    Note NaN compares greater-than in Spark, so ``> 0`` alone would NOT
    exclude it — the isnan test is load-bearing."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (df.select(F.col(id_col).alias(out_id), v.alias(out_vec))
            .withColumn(out_norm, _norm(F.col(out_vec)))
            .filter(~F.isnan(F.col(out_norm)) & (F.col(out_norm) > 0)
                    & (F.col(out_norm) != F.lit(float("inf")))))


def srp_planes(dim: int, n_tables: int, n_bits: int,
               seed: int = 42) -> np.ndarray:
    """Seeded random hyperplanes, shape (n_tables, n_bits, dim)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim)


def _srp_bucket_udf(planes: np.ndarray):
    """Arrow-batched bucket computation: ONE BLAS matmul per batch.

    ``(batch x dim) @ (dim x n_tables*n_bits)`` then sign-pack each table's
    bits into a long — ~5,000x fewer interpreted ops than evaluating the
    per-plane dot products as Catalyst higher-order-function lambdas (the
    previous implementation built a ~5,000-node expression tree computing
    n_tables*n_bits*dim multiply-adds per row in the interpreter). The plane
    matrix ships once inside the serialized UDF closure (~40 KB), i.e. a
    broadcast."""
    n_tables, n_bits, dim = planes.shape
    flat = np.ascontiguousarray(planes.reshape(n_tables * n_bits, dim).T)
    weights = (np.int64(1) << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ flat >= 0).astype(np.int64)
        packed = bits.reshape(len(vecs), n_tables, n_bits) @ weights
        return pd.Series(list(packed))

    return buckets


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_tables: int = 8, n_bits: int = 10,
             seed: int = 42, return_sim: bool = False) -> DataFrame:
    """Approximate top-k via random-hyperplane (SRP) LSH.

    Each table hashes a vector to an ``n_bits`` sign pattern; a query only
    scores corpus vectors sharing a bucket in >= 1 table. Recall rises with
    ``n_tables``; cost stays ~bucket-sized. Hyperplanes are seeded and
    deterministic; buckets are computed by a vectorized pandas UDF (one
    matmul per Arrow batch — the 100 TB hash path).

    The cosine is computed map-side on the bucket-join output BEFORE the
    (query, neighbor) dedup, so the dedup shuffle carries only
    (long, long, double) — not two dim-sized double vectors. A pair seen in
    several tables computes its cosine once per table (dim multiply-adds,
    JVM-side), which is far cheaper than shuffling the vectors; duplicate
    rows carry bit-identical sims, so which one survives is immaterial.

    ``return_sim=True`` appends the cosine as a ``sim`` column so callers
    (e.g. dedup.embedding_near_dups) can threshold on it without re-joining
    the vector tables.

    Cross-engine note: bucket bits are signs of BLAS-accumulated dot
    products; an engine re-deriving them with sequential summation (the SQL
    oracles) could flip a bit when a projection lands within float rounding
    of 0 — a measure-zero event for continuous data that has never fired in
    practice; seeded fixtures make any occurrence deterministic and visible.
    """
    planes = srp_planes(dim, n_tables, n_bits, seed)
    bucket_udf = _srp_bucket_udf(planes)

    def prep(df, out_id, out_vec, out_norm):
        base = _prep_vectors(df, id_col, vec_col, out_id, out_vec, out_norm)
        return base.select(out_id, out_vec, out_norm,
                           F.posexplode(bucket_udf(out_vec))
                           .alias("table", "bucket"))

    c = prep(corpus, "neighbor_id", "cvec", "cnorm")
    q = prep(queries, "query_id", "qvec", "qnorm")
    sim = (c.join(q, ["table", "bucket"])
           .filter(F.col("neighbor_id") != F.col("query_id"))
           .select("query_id", "neighbor_id",
                   (_dot(F.col("cvec"), F.col("qvec"))
                    / (F.col("cnorm") * F.col("qnorm"))).alias("sim"))
           .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    cols = ["query_id", "neighbor_id", "rank"] + (["sim"] if return_sim else [])
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*cols))


def ivf_centroids(sample: np.ndarray, n_centroids: int = 16,
                  iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample.

    The coarse quantizer of an IVF index is trained on a bounded sample
    (classic FAISS practice), never the corpus: the sample is collected once
    (O(sample) driver memory), the centroid matrix (n_centroids x dim,
    a few KB) is broadcast. Fully seeded -> reproducible across runs and in
    the SQL oracle, which inlines the same centroids as literals."""
    rng = np.random.RandomState(seed)
    x = np.asarray(sample, dtype=np.float64)
    if len(x) < n_centroids:
        raise ValueError(
            f"ivf_centroids needs a training sample of at least n_centroids="
            f"{n_centroids} vectors, got {len(x)} — enlarge the sample or "
            f"lower n_centroids")
    cents = x[rng.choice(len(x), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            pts = x[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def _ivf_assign_udf(cents: np.ndarray, nprobe: int):
    """array<long> of the nprobe nearest centroid ids (L2), ties by id.

    One batched distance computation per Arrow batch:
    ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2, i.e. a single matmul."""
    cents = np.asarray(cents, dtype=np.float64)
    c_norm2 = (cents ** 2).sum(axis=1)

    @F.pandas_udf("array<long>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (mat ** 2).sum(axis=1, keepdims=True) - 2.0 * (mat @ cents.T) \
            + c_norm2[None, :]
        # stable argsort -> deterministic tie-break by centroid id
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int64)))

    return assign


def _cell_topk_blas(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Per-cell cosine top-k as ONE BLAS matmul per (cell of corpus x
    queries probing it), via cogroup + applyInPandas — the FAISS scan shape.

    Any global top-k member is also in the top-k of the cell that contains
    it, so emitting only k candidates per (query, cell) loses nothing; the
    caller's global window finishes the ranking. Self-matches are excluded
    inside the kernel; ties prefer the smaller neighbor id."""
    import pandas as pd

    def per_cell(_key, cdf: pd.DataFrame, qdf: pd.DataFrame):
        if len(cdf) == 0 or len(qdf) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        C = np.asarray([np.asarray(x, dtype=np.float64) for x in cdf["cvec"]])
        Q = np.asarray([np.asarray(x, dtype=np.float64) for x in qdf["qvec"]])
        cn = cdf["cnorm"].to_numpy(dtype=np.float64)
        qn = qdf["qnorm"].to_numpy(dtype=np.float64)
        cid = cdf["neighbor_id"].to_numpy(dtype=np.int64)
        qid = qdf["query_id"].to_numpy(dtype=np.int64)
        sims = (Q @ C.T) / (qn[:, None] * cn[None, :])
        sims[qid[:, None] == cid[None, :]] = -np.inf      # self-exclusion
        kk = min(k, sims.shape[1])
        # top-k per row by (sim desc, neighbor_id asc)
        order = np.lexsort((cid[None, :].repeat(len(qid), 0), -sims), axis=1)
        top = order[:, :kk]
        rows_q = np.repeat(qid, kk)
        rows_n = cid[top].reshape(-1)
        rows_s = np.take_along_axis(sims, top, axis=1).reshape(-1)
        keep = rows_s > -np.inf
        return pd.DataFrame({"query_id": rows_q[keep],
                             "neighbor_id": rows_n[keep],
                             "sim": rows_s[keep]})

    return (c.groupBy("cell").cogroup(q.groupBy("cell"))
            .applyInPandas(per_cell,
                           "query_id long, neighbor_id long, sim double"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: np.ndarray = None, nprobe: int = 4,
             n_centroids: int = 16, seed: int = 42,
             train_sample: np.ndarray = None,
             kernel: str = "expr") -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    Corpus vectors live in exactly ONE cell (their nearest centroid);
    queries probe their ``nprobe`` nearest cells. The candidate join is an
    equi-join on the cell id — O(corpus + queries x nprobe x cell) — and
    exact cosine re-ranks inside the probed cells. Recall rises with
    ``nprobe``; ``nprobe = n_centroids`` degenerates to exact search.

    Pass ``centroids`` (or ``train_sample`` to train them here) — the
    quantizer is an explicit, versionable artifact, as at corpus scale
    (train once on a sample, broadcast everywhere).

    Quantizer norms matter: cell assignment is L2 argmin, so centroid
    norms must be comparable to the data's — for unit-norm embeddings use
    unit-norm (spherical) centroids, or the smallest-norm centroid wins
    every argmin and ALL vectors collapse into one cell (no pruning).
    ``ivf_centroids`` trained on the data is safe (cell means have
    comparable norms); hand-picked quantizers need the normalization.

    ``kernel`` picks the scoring path:

    * ``'expr'`` (default): JVM expression per candidate row, dot fold only
      (norms precomputed per vector). Sequential accumulation — bit-identical
      to the SQL oracle, the cross-engine-checkable path.
    * ``'blas'``: cogroup per cell + one numpy matmul per (cell, queries)
      block (the FAISS scan shape) — ~10-50x less per-candidate CPU at
      large cells; BLAS accumulation order can differ from the sequential
      fold in the last ulp, so ranks at exact ties may differ from 'expr'
      (measure-zero for continuous data). Use at corpus scale
      (BENCH/SIMILARITY.md measures both).
    """
    if kernel not in ("expr", "blas"):
        raise ValueError(f"kernel must be 'expr' or 'blas', got {kernel!r}")
    if centroids is None:
        if train_sample is None:
            raise ValueError("pass centroids= or train_sample=")
        centroids = ivf_centroids(train_sample, n_centroids, seed=seed)

    one = _ivf_assign_udf(centroids, nprobe=1)
    probe = _ivf_assign_udf(centroids, nprobe=nprobe)

    c = _prep_vectors(corpus, id_col, vec_col, "neighbor_id", "cvec", "cnorm") \
        .withColumn("cell", F.get(one("cvec"), 0))
    q = _prep_vectors(queries, id_col, vec_col, "query_id", "qvec", "qnorm") \
        .select("query_id", "qvec", "qnorm",
                F.explode(probe("qvec")).alias("cell"))

    if kernel == "blas":
        sim = _cell_topk_blas(c, q, k)
    else:
        cand = (c.join(q, "cell")
                .filter(F.col("neighbor_id") != F.col("query_id")))
        sim = cand.select(
            "query_id", "neighbor_id",
            (_dot(F.col("cvec"), F.col("qvec"))
             / (F.col("cnorm") * F.col("qnorm"))).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
