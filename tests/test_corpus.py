"""Benchmark decontamination + deterministic stratified sampling."""
import re

import pytest

from pysemanticcomplexity_spark import plans
from pysemanticcomplexity_spark.operators.corpus import (
    SAMPLE_A, SAMPLE_B, SAMPLE_DENOM, contamination_flags, stratified_sample)
from pysemanticcomplexity_spark.operators.dedup import POLY_MOD


def _py_shingles(text, n=3):
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            if " ".join(toks[i:i + n])}


def _py_poly(s):
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % POLY_MOD
    return acc


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "web"),
    (1, "the quick brown fox sleeps all day long", "web"),
    (2, "completely unrelated text about spark joins", "wiki"),
    (3, "too short", "wiki"),                       # < n tokens: no shingles
    (4, "the  QUICK   brown fox jumps over the lazy dog", "code"),  # ws+case
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_contamination_matches_python_oracle(spark, docs_df):
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string")
    bench_sh = _py_shingles("quick brown fox jumps high")
    got = {r["id"]: r for r in contamination_flags(docs_df, bench).collect()}
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text, _src in DOCS:
        sh = _py_shingles(text)
        hit = len(sh & bench_sh)
        assert got[doc_id]["n_shingles"] == len(sh), doc_id
        assert got[doc_id]["n_contaminated"] == hit, doc_id
        want = hit / len(sh) if sh else 0.0
        assert got[doc_id]["contamination"] == pytest.approx(want), doc_id
    # the whitespace/case variant of doc 0 must contaminate identically
    assert got[4]["n_contaminated"] == got[0]["n_contaminated"] > 0


def test_contamination_empty_benchmark_zero_fills(spark, docs_df):
    bench = spark.createDataFrame([], "doc_id long, text string")
    rows = contamination_flags(docs_df, bench).collect()
    assert len(rows) == len(DOCS)
    assert all(r["n_contaminated"] == 0 and r["contamination"] == 0.0
               for r in rows)


def test_contamination_benchmark_is_broadcast(spark, docs_df):
    bench = spark.createDataFrame([(100, "quick brown fox jumps high")],
                                  "doc_id long, text string")
    plan = plans.executed_plan(contamination_flags(docs_df, bench))
    assert "BroadcastHashJoin" in plan
    # the corpus side must never self-join
    assert plan.count("BroadcastHashJoin") == 1


def test_stratified_sample_matches_python_threshold(spark, docs_df):
    fracs = {"web": 1.0, "wiki": 0.5}
    kept = {r["doc_id"] for r in
            stratified_sample(docs_df, fracs).collect()}
    want = set()
    for doc_id, _text, src in DOCS:
        thr = int(round(fracs.get(src, 0.0) * SAMPLE_DENOM))
        h = (_py_poly(f"mix:{doc_id}") * SAMPLE_A + SAMPLE_B) % POLY_MOD
        if h % SAMPLE_DENOM < thr:
            want.add(doc_id)
    assert kept == want
    assert not any(src == "code" for d, _t, src in DOCS if d in kept)


def test_stratified_sample_deterministic_and_fraction_accurate(spark):
    rows = [(i, "t", "a" if i % 2 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept1 = sorted(r["doc_id"] for r in
                   stratified_sample(df, {"a": 0.3, "b": 0.8}).collect())
    kept2 = sorted(r["doc_id"] for r in
                   stratified_sample(df, {"a": 0.3, "b": 0.8}).collect())
    assert kept1 == kept2
    n_a = sum(1 for d in kept1 if d % 2 == 1)
    n_b = sum(1 for d in kept1 if d % 2 == 0)
    assert abs(n_a / 2000 - 0.3) < 0.05
    assert abs(n_b / 2000 - 0.8) < 0.05
    # a different salt draws an independent sample of similar size
    kept3 = sorted(r["doc_id"] for r in
                   stratified_sample(df, {"a": 0.3, "b": 0.8},
                                     salt="mix2:").collect())
    assert kept3 != kept1
    assert abs(len(kept3) - len(kept1)) < 0.1 * len(kept1)


def test_stratified_sample_validates_fractions(spark, docs_df):
    with pytest.raises(ValueError):
        stratified_sample(docs_df, {"web": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(docs_df, {}, default_fraction=-0.1)


def test_stratified_sample_plan_is_filter_only(spark, docs_df):
    plan = plans.executed_plan(stratified_sample(docs_df, {"web": 0.5}))
    assert "Exchange" not in plan          # pure filter: no shuffle


def test_rowlocal_contamination_equals_join_version(spark, docs_df):
    from pysemanticcomplexity_spark.operators.corpus import (
        contamination_flags_rowlocal)
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string")
    a = {r["id"]: (r["n_shingles"], r["n_contaminated"], r["contamination"])
         for r in contamination_flags(docs_df, bench).collect()}
    b = {r["id"]: (r["n_shingles"], r["n_contaminated"], r["contamination"])
         for r in contamination_flags_rowlocal(docs_df, bench).collect()}
    assert a == b


def test_rowlocal_contamination_equals_join_on_testdata(spark):
    from pysemanticcomplexity_spark.operators.corpus import (
        contamination_flags_rowlocal)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter("doc_id % 7 = 0")
    a = sorted(map(tuple, contamination_flags(docs, bench).collect()))
    b = sorted(map(tuple, contamination_flags_rowlocal(docs, bench).collect()))
    assert a == b


def test_rowlocal_contamination_zero_shuffle(spark, docs_df):
    from pysemanticcomplexity_spark.operators.corpus import (
        contamination_flags_rowlocal)
    bench = spark.createDataFrame([(100, "quick brown fox")],
                                  "doc_id long, text string")
    plan = plans.executed_plan(contamination_flags_rowlocal(docs_df, bench))
    assert "Exchange" not in plan


def test_rowlocal_contamination_streams(spark, tmp_path):
    """Stateless => legal mid-stream with no watermark: an AvailableNow
    drain over a file stream must produce exactly the batch result."""
    from pysemanticcomplexity_spark.operators.corpus import (
        contamination_flags_rowlocal)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    docs.coalesce(2).write.parquet(src)
    bench = spark.createDataFrame([(100, "quick brown fox jumps high")],
                                  "doc_id long, text string")
    stream = spark.readStream.schema(
        "doc_id long, text string, source string").parquet(src)
    q = (contamination_flags_rowlocal(stream, bench)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, contamination_flags_rowlocal(docs, bench).collect()))
    assert got == want
