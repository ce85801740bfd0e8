"""Streaming Bloom-frontier throughput (BENCH/STREAMING.md): replicate
the sf documents table x4 (same text, new ids -> cross-batch duplicates),
drain it as an AvailableNow file stream through streaming_bloom_novel,
and report docs/sec plus the dedup outcome (novel rows must equal the
distinct-text count minus FP losses; with 2^23 bits the expected FP
count at this scale is ~0). Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mft = int(os.environ.get("STREAM_MFT", "4"))
    work = os.environ.get("STREAM_WORK_DIR", "/tmp/stream_bloom_bench")

    import pyspark.sql.functions as F

    from pysemanticcomplexity_spark.session import get_spark
    from pysemanticcomplexity_spark.streaming.dedup import (
        streaming_bloom_novel)

    spark = get_spark(app_name="stream-bloom-bench",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    shutil.rmtree(work, ignore_errors=True)
    src = f"{work}/docs"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    big = (docs.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(3))))
           .select((F.col("doc_id") + F.col("r").cast("long") * 10_000_000)
                   .alias("doc_id"), "text"))
    big.repartition(16).write.mode("overwrite").parquet(src)
    n_rows = big.count()
    n_distinct = docs.select(
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).distinct() \
        .count()

    words_dir, novel_dir = f"{work}/words", f"{work}/novel"
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", mft).parquet(src))
    t0 = time.time()
    q = (stream.writeStream
         .foreachBatch(streaming_bloom_novel(words_dir, novel_dir))
         .option("checkpointLocation", f"{work}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0

    novel = spark.read.parquet(novel_dir).count()
    print(json.dumps({
        "metric": "streaming_bloom_docs_per_sec",
        "value": round(n_rows / wall, 1),
        "unit": "docs/sec",
        "wall_s": round(wall, 3),
        "rows_in": n_rows,
        "novel": novel,
        "distinct_texts": n_distinct,
        "batches": -(-16 // mft),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
