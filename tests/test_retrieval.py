"""BM25 retrieval: python-replica equality + plan shape."""
import math
import re

import pyspark.sql.functions as F
import pytest

from pysemanticcomplexity_spark import plans
from pysemanticcomplexity_spark.operators.retrieval import bm25_topk, term_stats

DOCS = [
    (1, "spark shuffles data between executors during wide transformations"),
    (2, "spark spark spark broadcast joins avoid the shuffle entirely"),
    (3, "ducks swim in the pond near the data center"),
    (4, "the quick brown fox avoids the lazy dog"),
    (5, "executors cache data partitions in memory for reuse"),
    (6, ""),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {i: {w: ts.count(w) for w in set(ts)} for i, ts in toks.items()}
    df = {q: sum(1 for i in tf if q in tf[i]) for q in query}
    scores = {}
    for i in tf:
        s, m = 0.0, 0
        for q in query:
            f = tf[i].get(q, 0)
            if not f:
                continue
            m += 1
            idf = math.log((2 * n - 2 * df[q] + 1) / (2 * df[q] + 1))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(toks[i]) / avgdl))
        if m:
            scores[i] = (m, s)
    return scores


def test_term_stats_counts(spark):
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
           for r in term_stats(_docs_df(spark), terms=["spark", "data"])
           .collect()}
    assert got[(2, "spark")] == (3, 9)
    assert got[(1, "spark")] == (1, 8) and got[(1, "data")] == (1, 8)
    assert (4, "spark") not in got and (6, "spark") not in got


def test_bm25_matches_python_replica(spark):
    query = ["spark", "data", "executors"]
    got = {r["doc_id"]: (r["n_match_terms"], r["score"])
           for r in bm25_topk(_docs_df(spark), query, k=10).collect()}
    want = _py_bm25(query)
    assert set(got) == set(want)
    for i, (m, s) in want.items():
        assert got[i][0] == m
        assert got[i][1] == pytest.approx(s, rel=1e-12)


def test_bm25_topk_order_and_limit(spark):
    query = ["spark", "data", "executors"]
    rows = bm25_topk(_docs_df(spark), query, k=2).collect()
    want = sorted(_py_bm25(query).items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [r["doc_id"] for r in rows] == [i for i, _ in want[:2]]
    # doc 1 matches all three query terms; doc 2's 3x spark saturates
    # under k1 and loses — multi-term coverage beats term stuffing
    assert rows[0]["doc_id"] == 1


def test_bm25_term_filter_reaches_scan(spark, tmp_path):
    """The query-term filter must sit below the aggregation (scan-side),
    so per-query cost tracks matching postings, not the corpus."""
    path = str(tmp_path / "docs")
    _docs_df(spark).write.mode("overwrite").parquet(path)
    stats = term_stats(spark.read.parquet(path), terms=["spark"])
    plan = plans.executed_plan(stats)
    fpos = plan.index("Filter")
    xpos = plan.index("Exchange")
    assert fpos > xpos  # formatted plan prints top-down: filter BELOW exchange


def test_bm25_validates_and_empty(spark):
    df = _docs_df(spark)
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(df, ["spark"], k=0)
    with pytest.raises(ValueError, match="query"):
        bm25_topk(df, [])
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["spark"]).count() == 0
