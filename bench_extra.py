"""Side benchmark harness for optimization work (bench.py is FROZEN for
measurement; this file exists so individual queries can be isolated,
re-timed, and their plans captured without touching the frozen harness).

Usage:
    python bench_extra.py [--runs N] [--plans TAG] QUERY [QUERY ...]
    python bench_extra.py --staged            # staged pipeline walls only

* Each QUERY is timed with the noop sink exactly like bench.py (same
  session parameters, same warmup-free best-of-N protocol) and labeled
  via setJobDescription (guide §1.5).
* --plans TAG additionally writes plans/r06/<query>_<TAG>.txt with the
  .explain("formatted") output (guide §7.2).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="write plans/r06/<q>_<TAG>.txt explain output")
    ap.add_argument("--staged", action="store_true",
                    help="time the staged KG pipeline walls")
    ap.add_argument("--fused", action="store_true",
                    help="time the fused KG pipeline walls")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from pysemanticcomplexity_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    sc = spark.sparkContext

    # one tiny warmup so the first timed query does not pay JVM/Arrow start
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8).count()

    results = {}
    qs = E.queries()

    if args.staged or args.fused:
        from pysemanticcomplexity_spark import fixtures
        from pysemanticcomplexity_spark.pipeline import KGPipeline
        from pysemanticcomplexity_spark.sources.pages import pages_from_documents
        pages = pages_from_documents(spark, sf_dir).repartition(cpus)
        dims = fixtures.spark_dims(spark)
        pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                          dims["instance_types"], dims["kb_triples"])
        pipe.run(pages.limit(64)).triples.count()
        pipe.run_fused(pages, persist_docs=False,
                       with_features=False).triples.count()
        spark.catalog.clearCache()
        if args.fused:
            tr, ft = [], []
            for _ in range(args.runs):
                t0 = time.time()
                pipe.run_fused(pages, persist_docs=False,
                               with_features=False).triples.count()
                tr.append(round(time.time() - t0, 3))
                t0 = time.time()
                pipe.run_fused(pages, persist_docs=False,
                               with_features=True).features.count()
                ft.append(round(time.time() - t0, 3))
            results["kg_triples_fused"] = tr
            results["kg_features_fused"] = ft
        if args.staged:
            tr, ft = [], []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                res = pipe.run(pages)
                t0 = time.time(); res.triples.count()
                tr.append(round(time.time() - t0, 3))
                t0 = time.time(); res.features.count()
                ft.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            results["kg_triples_staged"] = tr
            results["kg_features_staged"] = ft

    for name in args.queries:
        fn = qs[name]
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as fh:
                fh.write(buf.getvalue())
        runs = []
        for i in range(args.runs):
            sc.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        results[name] = runs

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
