"""S2-S5 staged table sinks/sources.

The reference persists per-document JSON between stages
(concepts/graphs/concept-info, SURVEY.md §2.1 S2-S4) and a CSV vector sink
(S5, text2vectors.py:91). Our staged layout uses parquet tables bucketed by
a url hash (Iceberg-style partition pruning + resume); this module provides
the readers/writers plus the nested `TextConcepts`-shaped view
(model.py:71-86) and the CSV sink for drop-in compatibility.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["concepts_nested", "write_table", "read_table",
           "write_features_csv", "iceberg_available"]


def concepts_nested(mentions: DataFrame, doc_words: DataFrame) -> DataFrame:
    """concepts(url, nb_words, mentions array<struct<uri, types, scores>>) —
    the DBpediaResource/TextConcepts shape of model.py:41-86."""
    resource = F.struct(
        F.col("uri"),
        F.col("spotlight_types").alias("types"),
        F.struct(
            F.col("offset"), F.col("surface"),
            F.col("similarity_score"),
            F.col("percentage_second_rank"),
            F.col("support"),
        ).alias("scores"))
    agg = (mentions
           .withColumn("resource", resource)
           .groupBy("url")
           .agg(F.sort_array(F.collect_list(
               F.struct(F.col("offset").alias("o"), F.col("resource").alias("r"))))
               .alias("ordered")))
    # keep document order (mentions sorted by offset, as generated)
    agg = agg.select("url", F.col("ordered.r").alias("mentions"))
    return (doc_words.join(agg, "url", "left")
            .select("url", "nb_words",
                    F.coalesce("mentions", F.array().cast(
                        agg.schema["mentions"].dataType)).alias("mentions")))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, n_buckets: int = 64,
                bucket_col: str = "url",
                table_format: str = "parquet") -> None:
    """Bucketed stage-table write.

    ``table_format='parquet'`` (default, always available): deterministic
    ``pmod(xxhash64)`` directory partitioning — the Iceberg-style layout
    every reader/resume path in this repo targets. ``'iceberg'``: the
    same bucketing through Iceberg's NATIVE ``bucket(n, col)`` partition
    transform via ``writeTo`` (``path`` is then the catalog table name).
    The Iceberg runtime jar + a catalog config are deployment choices, so
    the branch is capability-gated: absent the classes it raises with the
    exact spark-submit flags to add rather than failing deep in the JVM.
    """
    if table_format == "parquet":
        (df.withColumn("bucket",
                       F.pmod(F.xxhash64(bucket_col),
                              F.lit(n_buckets)).cast("int"))
         .write.mode("overwrite").partitionBy("bucket").parquet(path))
        return
    if table_format == "iceberg":
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                "Iceberg runtime not on the classpath. Launch with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-"
                "<spark-ver>_<scala-ver>:<iceberg-ver> and configure a "
                "catalog (spark.sql.catalog.<name>=org.apache.iceberg."
                "spark.SparkCatalog); then pass the catalog table name "
                "as `path`.")
        (df.writeTo(path).using("iceberg")
         .partitionedBy(F.bucket(n_buckets, bucket_col))
         .createOrReplace())
        return
    raise ValueError(f"table_format must be 'parquet' or 'iceberg', "
                     f"got {table_format!r}")


def read_table(spark: SparkSession, path: str,
               table_format: str = "parquet") -> DataFrame:
    if table_format == "parquet":
        return spark.read.parquet(path).drop("bucket")
    if table_format == "iceberg":
        return spark.table(path)
    raise ValueError(f"table_format must be 'parquet' or 'iceberg', "
                     f"got {table_format!r}")


def write_features_csv(features: DataFrame, path: str,
                       columns=None) -> None:
    """S5: single CSV with the exact reference column order
    (text2vectors.py:91 pandas to_csv equivalent).

    ``columns`` defaults to the full 25-column order; namespace-restricted
    runs (graphs2vectors -on) pass ``feature_columns(namespaces)``."""
    from .. import FEATURE_COLUMNS
    features.select(*(columns or FEATURE_COLUMNS)).coalesce(1) \
        .write.mode("overwrite").option("header", True).csv(path)
