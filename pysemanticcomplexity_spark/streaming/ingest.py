"""Incremental ingestion via Structured Streaming (optional extra).

The reference is purely batch (SURVEY.md §2.9); its only incremental
behavior is skip-existing-file resume. The engine's equivalent is the
lineage layer (lineage.py). For continuously arriving page dumps this module
adds a ``Trigger.AvailableNow`` file-stream: exactly-once per input file via
the checkpoint log, draining whatever is available and stopping — the
streaming analogue of the reference's "process new files only" loop.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import PAGES


def ingest_pages_available_now(spark: SparkSession, src_dir: str,
                               dest_dir: str, checkpoint_dir: str,
                               fmt: str = "parquet"):
    """Drain new page files from src_dir into the dest parquet table once.

    Returns the StreamingQuery (already started); call ``awaitTermination``.
    Restart-safe: the checkpoint records processed files, so reruns pick up
    only unseen input (per-file lineage, complementing the per-bucket
    lineage of batch writes).
    """
    stream = (spark.readStream.schema(PAGES).format(fmt).load(src_dir))
    return (stream.writeStream
            .format("parquet")
            .option("path", dest_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
