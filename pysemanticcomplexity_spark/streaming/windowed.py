"""Watermarked windowed aggregation over a streaming events source.

The reference has no streaming (SURVEY.md §2.9); this is the engine's
forward-looking ingestion analytics surface: event-time tumbling windows
with late-data handling via watermark — e.g. per-window mention/page counts
while a crawl drains in. Works with any streaming source; tests drive it
with a file source + Trigger.AvailableNow for determinism.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_counts(stream: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """(window_start, window_end, key, n, value_sum_cents) with late rows
    beyond the watermark dropped; append-mode compatible.

    Cents conversion goes double -> string -> decimal(20,2): the string
    cast recovers the shortest round-trip literal ("8.845", not the stored
    binary 8.84499...), so half-cent boundary values land on the cent the
    producer wrote — ``round(value*100)`` on the raw double misrounds every
    .xx5 amount one cent low."""
    cents = (F.col("value").cast("string").cast("decimal(20,2)")
             * 100).cast("long")
    return (stream
            # watermarks require TIMESTAMP (parquet often yields TIMESTAMP_NTZ)
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col(key_col).alias("key"))
            .agg(F.count("*").alias("n"),
                 F.sum(cents).alias("value_sum_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "key", "n", "value_sum_cents"))
