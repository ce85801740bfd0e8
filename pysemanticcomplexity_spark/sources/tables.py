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

__all__ = ["concepts_nested", "write_table", "read_table", "write_features_csv"]


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


def write_table(df: DataFrame, path: str, n_buckets: int = 64,
                bucket_col: str = "url") -> None:
    """Bucketed parquet write (deterministic pmod(xxhash64) partitioning)."""
    (df.withColumn("bucket",
                   F.pmod(F.xxhash64(bucket_col), F.lit(n_buckets)).cast("int"))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def write_features_csv(features: DataFrame, path: str,
                       columns=None) -> None:
    """S5: single CSV with the exact reference column order
    (text2vectors.py:91 pandas to_csv equivalent).

    ``columns`` defaults to the full 25-column order; namespace-restricted
    runs (graphs2vectors -on) pass ``feature_columns(namespaces)``."""
    from .. import FEATURE_COLUMNS
    features.select(*(columns or FEATURE_COLUMNS)).coalesce(1) \
        .write.mode("overwrite").option("header", True).csv(path)
