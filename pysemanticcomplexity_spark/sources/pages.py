"""Pages-table adapters (S1 equivalent).

The reference scans a directory of .txt files (one doc per file,
batchprocessing/semantic/conceptExtraction.py:65-71); our primary input is a
Common-Crawl-style table (BASELINE.json input_hint). This module adapts the
driver's testdata ``documents.parquet`` into that shape, deterministically
(no wall clock — warc_ts derives from doc_id).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["pages_from_documents", "read_pages"]


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages(url, warc_ts,
    html, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet scan of a materialized pages table (Iceberg-style layout:
    partition columns pruned by Catalyst when present)."""
    from ..schemas import PAGES
    return spark.read.schema(PAGES).parquet(path)
