"""Resumable-write crash-safety and lineage-recount scan pruning."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark.lineage import (
    _new_bucket_counts, completed_buckets, read_lineage, resumable_write)


def _df(spark, n=40, buckets=4):
    return (spark.range(n)
            .select(F.col("id"),
                    (F.col("id") % buckets).cast("int").alias("bucket")))


def test_basic_write_and_lineage(spark, tmp_path):
    out = str(tmp_path / "o")
    df = _df(spark)
    resumable_write(df, out, "s", run_id="r1")
    assert sorted(completed_buckets(spark, out, "s")) == [0, 1, 2, 3]
    lin = read_lineage(spark, out)
    rows = {r["bucket"]: r["rows"] for r in lin.collect()}
    assert rows == {0: 10, 1: 10, 2: 10, 3: 10}
    assert spark.read.parquet(out + "/s").count() == 40


def test_empty_dataframe_write_is_a_noop(spark, tmp_path):
    """A run where every row was filtered out must no-op, not crash: the
    empty write leaves only _SUCCESS in the target, and the post-write
    recount used to die on UNABLE_TO_INFER_SCHEMA reading it back."""
    out = str(tmp_path / "o")
    resumable_write(_df(spark, n=0), out, "s", run_id="r0")   # must not raise
    assert read_lineage(spark, out).count() == 0
    assert completed_buckets(spark, out, "s") == []
    # a later run with real rows proceeds normally on the same dir
    resumable_write(_df(spark), out, "s", run_id="r1")
    assert spark.read.parquet(out + "/s").count() == 40
    assert sorted(completed_buckets(spark, out, "s")) == [0, 1, 2, 3]


def test_crash_before_lineage_is_idempotent(spark, tmp_path):
    """A bucket whose data landed but whose lineage row did NOT (crash
    between the two steps) must be REPLACED on resume, not appended to."""
    out = str(tmp_path / "o")
    target = out + "/s"
    df = _df(spark)
    # simulate the crashed first attempt: partial data for bucket 0 written,
    # no lineage recorded
    (df.filter("bucket = 0").limit(3)
     .write.mode("append").partitionBy("bucket").parquet(target))
    assert completed_buckets(spark, out, "s") == []

    resumable_write(df, out, "s", run_id="retry", resume=True)
    got = spark.read.parquet(target)
    assert got.count() == 40                       # no duplicate rows
    assert got.filter("bucket = 0").count() == 10
    lin = {r["bucket"]: r["rows"] for r in read_lineage(spark, out).collect()}
    assert lin == {0: 10, 1: 10, 2: 10, 3: 10}     # counts match the data


def test_resume_skips_done_buckets(spark, tmp_path):
    out = str(tmp_path / "o")
    df = _df(spark)
    resumable_write(df.filter("bucket < 2"), out, "s", run_id="r1")
    resumable_write(df, out, "s", run_id="r2", resume=True)
    got = spark.read.parquet(out + "/s")
    assert got.count() == 40
    lin = read_lineage(spark, out)
    # second run recorded only the two new buckets
    r2 = {r["bucket"] for r in lin.filter("run_id = 'r2'").collect()}
    assert r2 == {2, 3}


def test_recount_scan_prunes_completed_buckets(spark, tmp_path):
    """The lineage recount must read ONLY this run's buckets: the NOT-IN
    filter on the partition column shows up as a PartitionFilter on the scan
    (at 100 TB this is the difference between reading one run's output and
    re-reading the whole table on every stage write)."""
    out = str(tmp_path / "o")
    resumable_write(_df(spark), out, "s", run_id="r1")
    counts = _new_bucket_counts(spark, out + "/s", done={0, 1})
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket NOT-IN predicate is applied at partition level, so the data
    # filters list carries no bucket predicate and pruned partitions are
    # never opened
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "bucket" in pf
    assert {r["bucket"] for r in counts.collect()} == {2, 3}
