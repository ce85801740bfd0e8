"""Checkpointed, resumable writes with per-partition lineage + metrics.

The reference resumes by skipping existing per-document output files
(batchprocessing/semantic/conceptExtraction.py:81-82,
graphCreation.py:75-76). At 10^12 documents the unit of resume is a
partition, not a file: outputs are written partitioned by a deterministic
url-hash ``bucket``; a ``_lineage`` parquet table records
(run_id, stage, bucket, status, rows, wall_ms); a rerun left-anti-joins the
input buckets against completed lineage rows and processes only the
remainder (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Crash-safety contract: the data write and the lineage append are two steps,
so a crash can land between them. The data write therefore uses **dynamic
partition overwrite** (only the buckets present in this run's DataFrame are
replaced; buckets already recorded done are filtered out beforehand and
never touched) — re-running a not-yet-recorded bucket *replaces* its partial
output instead of appending a duplicate copy. Lineage row counts come from a
**partition-pruned** read of only this run's buckets (the pre-write filter
is on the partition column, so the recount never scans previously completed
buckets — asserted by a plan test).
"""
from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["completed_buckets", "resumable_write", "read_lineage"]


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def read_lineage(spark, out_dir: str) -> DataFrame:
    path = _lineage_path(out_dir)
    # cheap local existence check first: avoids the JVM logging a loud
    # PATH_NOT_FOUND stack trace on every fresh output dir (local/file://
    # paths only; remote URIs fall through to the try/except)
    local = path[len("file://"):] if path.startswith("file://") else path
    if "://" not in local and not os.path.exists(local):
        from .schemas import LINEAGE
        return spark.createDataFrame([], LINEAGE)
    try:
        return spark.read.parquet(path)
    except Exception:
        from .schemas import LINEAGE
        return spark.createDataFrame([], LINEAGE)


def completed_buckets(spark, out_dir: str, stage: str):
    lin = read_lineage(spark, out_dir)
    return [r["bucket"] for r in
            (lin.filter((F.col("stage") == stage) & (F.col("status") == "done"))
             .select("bucket").distinct().collect())]


def _new_bucket_counts(spark, target: str, done) -> DataFrame:
    """Per-bucket row counts for buckets NOT in ``done``.

    ``bucket`` is the parquet partition column, so the ``isin`` filter is a
    PartitionFilter: the scan prunes completed buckets' files entirely (at
    100 TB this reads only the buckets written by the current run, never the
    full prior output)."""
    try:
        scan = spark.read.parquet(target)
    except Exception:
        # an EMPTY DataFrame written to a fresh dir leaves only _SUCCESS —
        # no parquet footer to infer a schema from (UNABLE_TO_INFER_SCHEMA).
        # A run where every row was filtered out is a legal no-op, not a
        # crash: it has written zero buckets, so it gets zero lineage rows.
        from .schemas import LINEAGE
        return (spark.createDataFrame([], LINEAGE)
                .select("bucket", "rows"))
    if done:
        scan = scan.filter(~F.col("bucket").isin(sorted(done)))
    return scan.groupBy("bucket").agg(F.count("*").alias("rows"))


def resumable_write(df: DataFrame, out_dir: str, stage: str,
                    run_id: str = "run", resume: bool = True) -> None:
    """Write ``df`` (must carry an int ``bucket`` column) partitioned by
    bucket, skipping buckets already recorded as done; append lineage rows.

    Idempotent per bucket: dynamic partition overwrite means a bucket whose
    previous attempt crashed before its lineage row landed is rewritten from
    scratch on resume (no duplicate rows), while ``done`` buckets are
    excluded from the DataFrame and therefore never overwritten."""
    spark = df.sparkSession
    target = os.path.join(out_dir, stage)
    done = set(completed_buckets(spark, out_dir, stage)) if resume else set()
    remaining = df
    if done:
        remaining = df.filter(~F.col("bucket").isin(sorted(done)))

    t0 = time.time()
    (remaining.write
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite")
     .partitionBy("bucket")
     .parquet(target))
    wall_ms = int((time.time() - t0) * 1000)

    written = _new_bucket_counts(spark, target, done)
    lineage_rows = written.select(
        F.lit(run_id).alias("run_id"), F.lit(stage).alias("stage"),
        F.col("bucket").cast("int").alias("bucket"),
        F.lit("done").alias("status"), F.col("rows").cast("long").alias("rows"),
        F.lit(wall_ms).cast("long").alias("wall_ms"))
    lineage_rows.write.mode("append").parquet(_lineage_path(out_dir))
