"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: full KG-construction pipeline (annotate -> enrich -> triples ->
features) over pages synthesized from $SPARK_GRAFT_SF_DIR/documents.parquet,
plus the per-operator headline queries. Extra keys (triples, triples_per_sec,
cpus) document throughput for BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as E
    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.session import get_spark
    from pysemanticcomplexity_spark.sources.pages import pages_from_documents

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))

    timings: dict[str, float] = {}

    def timed(name, fn, runs: int = 2):
        """Best-of-N wall (N=2 default): the sandbox box shows 20-30%
        run-to-run noise on short jobs, and best-of matches the protocol
        every BENCH/*.md scaling run already uses."""
        best, out = None, None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    # warm the JVM/Arrow path once on a tiny slice so the headline numbers
    # measure steady-state throughput, not first-job startup.
    # The sf0.1 documents table is ONE small parquet file -> one scan
    # partition; repartition so the scan-parallel stages actually use the
    # cores (a real corpus has many input files and needs no such step).
    pages = pages_from_documents(spark, sf_dir).repartition(cpus * 4)
    dims = fixtures.spark_dims(spark)
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    pipe.run(pages.limit(64)).triples.count()

    # headline: fused single-pass plan (shuffle-free; the 100 TB path) —
    # triples-only run for the triples/sec metric, full run for features —
    # then the staged DataFrame plan for comparison
    # pipeline headlines run ONCE (runs=1): the fused/staged pipelines
    # persist intermediates, so a second .count() would time the cache
    # read, not the pipeline (the per-query loop below builds a fresh
    # unpersisted plan per run, so best-of-2 is honest there)
    fused_t = pipe.run_fused(pages, persist_docs=False, with_features=False)
    n_triples = timed("kg_triples_fused", lambda: fused_t.triples.count(),
                      runs=2)       # persist_docs=False: honest recompute
    fused = pipe.run_fused(pages)
    timed("kg_features_fused", lambda: fused.features.count(), runs=1)
    res = pipe.run(pages)
    timed("kg_triples_staged", lambda: res.triples.count(), runs=1)
    timed("kg_features_staged", lambda: res.features.count(), runs=1)

    qs = E.queries()
    # per-query timings write to the NOOP sink, not .count(): count() lets
    # Catalyst prune every unused projection, so projection-only queries
    # (T-series, QF4, MM) would time the bare scan instead of the operator
    # (caught in round 4: QF4's pandas-UDF stage was pruned to 0.3 s).
    # Aggregate/join-shaped queries are unaffected either way.
    for name in ["S7_mentions_sql", "G3_triples_sql_model", "M_graph_density",
                 "Q1_lineitem_agg", "J1_join_nation_revenue", "W1_running_sum",
                 "D1_exact_dedup", "D2_ngram_jaccard", "D3_minhash_lsh",
                 "D4_simhash", "S1_cosine_topk", "S2_lsh_topk",
                 "D5b_lsh_neardup", "T2_quality_score",
                 "T3_fingerprint", "C1_contamination", "E2E_corpus_prep",
                 "QF4_model_quality", "C3b_pack_split"]:
        timed(name, lambda n=name: qs[n](spark, sf_dir)
              .write.format("noop").mode("overwrite").save())

    wall = timings["kg_triples_fused"]
    result = {
        "metric": "kg_pipeline_triples_wall",
        "value": wall,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / wall, 1) if wall else None,
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
