"""Streaming-KG throughput at sf0.1 (BENCH/STREAMING.md): write the sf
pages table as many parquet files, drain it with the AvailableNow streaming
query at several maxFilesPerTrigger pacings, and compare triples/sec with
the one-shot batch fused run on the same session. Prints one JSON line per
configuration.
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
    n_files = int(os.environ.get("STREAM_N_FILES", "64"))
    work = os.environ.get("STREAM_WORK_DIR", "/tmp/stream_kg_bench")

    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.session import get_spark
    from pysemanticcomplexity_spark.sources.pages import pages_from_documents
    from pysemanticcomplexity_spark.streaming.kg import (
        streaming_triples_available_now)

    spark = get_spark(app_name="stream-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    shutil.rmtree(work, ignore_errors=True)
    src = f"{work}/pages"
    pages_from_documents(spark, sf_dir).repartition(n_files) \
        .write.mode("overwrite").parquet(src)

    dims = fixtures.spark_dims(spark)
    gaz, onto = fixtures.gazetteer(), fixtures.ontology_edges()

    # batch reference on the same files/session (fused, triples only)
    pipe = KGPipeline(spark, gaz, onto, dims["instance_types"],
                      dims["kb_triples"])
    from pysemanticcomplexity_spark.sources.pages import read_pages
    batch_pages = read_pages(spark, src)
    pipe.run_fused(batch_pages.limit(64), persist_docs=False,
                   with_features=False).triples.count()        # warm
    t0 = time.time()
    n_batch = pipe.run_fused(batch_pages, persist_docs=False,
                             with_features=False).triples.count()
    batch_wall = time.time() - t0
    results = [{"mode": "batch_fused", "triples": n_batch,
                "wall_s": round(batch_wall, 3),
                "triples_per_sec": round(n_batch / batch_wall, 1)}]
    print(json.dumps(results[-1]))

    for mft in (None, 32, 8):
        dest = f"{work}/out_{mft}"
        ck = f"{work}/ck_{mft}"
        t0 = time.time()
        q = streaming_triples_available_now(
            spark, src, dest, ck, gaz, onto,
            dims["instance_types"], dims["kb_triples"],
            max_files_per_trigger=mft)
        q.awaitTermination()
        wall = time.time() - t0
        n = spark.read.parquet(dest).count()
        batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        results.append({"mode": f"stream_mft_{mft}", "triples": n,
                        "micro_batches": batches, "wall_s": round(wall, 3),
                        "triples_per_sec": round(n / wall, 1)})
        print(json.dumps(results[-1]))
        assert n == n_batch, (n, n_batch)
    spark.stop()
    return results


if __name__ == "__main__":
    main()
