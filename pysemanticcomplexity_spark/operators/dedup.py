"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (it has no dedup), these are the standard
web-corpus dedup family, each built scale-first:

* exact        — hash-groupBy on normalized text (partial agg, one shuffle);
* minhash LSH  — shingle -> k minhashes -> b bands -> bucket join; candidate
                 pairs only ever meet inside a band bucket, so the shuffle is
                 O(docs x bands), never O(docs^2);
* simhash      — 64-bit weighted-token fingerprint; near-dups = small Hamming
                 distance within 4-way table-split buckets;
* n-gram Jaccard — exact pairwise similarity via shingle equi-join
                 (the verification stage after LSH candidate generation);
* embedding cosine — see operators/similarity.py.

All hashing uses xxhash64 (JVM-side, deterministic across runs/executors).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["normalize_text", "exact_dedup", "shingles", "minhash_signatures",
           "lsh_candidate_pairs", "ngram_jaccard_pairs", "simhash",
           "simhash_candidate_pairs"]


def normalize_text(col) -> F.Column:
    """Lowercase, collapse whitespace — the usual exact-dup normal form."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (keep_id, n_dups).

    keep_id = min id of the group (deterministic winner). Single shuffle with
    map-side partial aggregation; at 100 TB group by a 128-bit text hash
    instead of the text itself to shrink shuffle keys — provided via
    ``group_key='hash'``-like normalization here by hashing explicitly.
    """
    key = F.xxhash64(normalize_text(F.col(text_col))).alias("text_key")
    return (docs.select(key, F.col(id_col))
            .groupBy("text_key")
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups")))


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """Token n-gram shingles, one row per distinct (id, shingle)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)) \
        .otherwise(F.array().cast("array<int>"))   # <n tokens -> no shingles
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return (docs.select(F.col(id_col).alias("id"),
                        F.explode(F.array_distinct(sh)).alias("shingle"))
            .filter(F.length("shingle") > 0))


def minhash_signatures(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(id, sig array<long>): sig[i] = min over shingles of xxhash64(shingle, i).

    Implemented as one groupBy with ``min`` aggregates over seeded hashes —
    partial aggregation keeps the shuffle at one row per doc.
    """
    hashes = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
              for i in range(num_hashes)]
    agg = sh.groupBy("id").agg(*hashes)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)])
                      .alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 8,
                        sig_len: int = None) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash): docs agreeing
    on all rows of any band become candidate pairs (id_a < id_b).

    Pass sig_len (= num_hashes) to avoid a schema-probe job; it is only
    inferred with an extra action when omitted."""
    if sig_len is None:
        sig_len = len(sigs.select("sig").first()["sig"])
    rows_per_band = sig_len // bands
    buckets = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     # xxhash64 hashes array columns natively (no string cast)
                     F.xxhash64(F.slice("sig", b * rows_per_band + 1,
                                        rows_per_band))
                     .alias("bucket"))
            for b in range(bands)])).alias("bb")) \
        .select("id", "bb.band", "bb.bucket")
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def ngram_jaccard_pairs(sh: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over shingle sets via equi-join on shingle.

    (id_a, id_b, jaccard) for pairs >= threshold. The shingle join only
    touches docs sharing at least one shingle; at web scale run it on LSH
    candidates only (join against lsh_candidate_pairs first).
    """
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    (F.col("inter")
                     / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        use_lsh: bool = False, **lsh_kwargs) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Brute-force by default (exact; the verification oracle); at corpus scale
    set use_lsh=True to generate candidates through SRP-LSH buckets first
    (operators/similarity.py) and verify only those.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    a = emb.select(F.col(id_col).alias("id_a"), v.alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), v.alias("vb"))
    if use_lsh:
        from .similarity import lsh_topk
        cand = lsh_topk(emb, emb, k=50, id_col=id_col, vec_col=vec_col,
                        **lsh_kwargs) \
            .select(F.col("query_id").alias("id_a"),
                    F.col("neighbor_id").alias("id_b")) \
            .filter(F.col("id_a") < F.col("id_b"))
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_a = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    norm_b = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (pairs.select("id_a", "id_b",
                         (dot / (norm_a * norm_b)).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 9).alias("cosine")))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens: bit j of the fingerprint is the sign of
    Σ_token (+1 if bit j of xxhash64(token) else -1).

    Pure JVM expressions: explode tokens, per-bit contribution via shiftright
    + sum, reassemble. One shuffle (groupBy id)."""
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.explode(F.split(normalize_text(F.col(text_col)), " "))
                        .alias("tok"))
            .filter(F.length("tok") > 0)
            .withColumn("h", F.xxhash64("tok")))
    bit_sums = toks.groupBy("id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{j}")
        for j in range(64)])
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"b{j}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseXOR(bit)
    return bit_sums.select("id", fp.alias("fingerprint"))


def simhash_candidate_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Split the 64-bit fingerprint into 4 16-bit blocks; by pigeonhole any
    pair within Hamming distance 3 agrees on >= 1 block, so the self-join is
    bucketed by (block_idx, block_value), never all-pairs."""
    blocks = fps.select(
        "id", "fingerprint",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("blk"),
                     F.shiftright("fingerprint", 16 * k)
                     .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for k in range(4)])).alias("b")) \
        .select("id", "fingerprint", "b.blk", "b.val")
    a = blocks.select(F.col("id").alias("id_a"),
                      F.col("fingerprint").alias("fp_a"), "blk", "val")
    b = blocks.select(F.col("id").alias("id_b"),
                      F.col("fingerprint").alias("fp_b"), "blk", "val")
    cand = (a.join(b, ["blk", "val"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "fp_a", "fp_b").distinct())
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
