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
    # partition; repartition to tasks == cores. A real corpus gets its
    # parallelism from input splits (maxPartitionBytes) and AQE handles
    # stragglers; at bench scale the per-task Python-worker round-trip
    # (~10 ms) dominates, so cpus*4 tasks only added fixed overhead
    # (measured: 128 tasks 1.40 s vs 32 tasks 0.49 s for the same job).
    pages = pages_from_documents(spark, sf_dir).repartition(cpus)
    dims = fixtures.spark_dims(spark)
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    pipe.run(pages.limit(64)).triples.count()
    # warm the fused path at full width too: the first mapInPandas job pays
    # one Python-worker spawn per core (limit(64) collapses to 1 partition
    # and warms only one), which otherwise lands in the first timed run
    pipe.run_fused(pages, persist_docs=False,
                   with_features=False).triples.count()
    spark.catalog.clearCache()

    # headline: fused single-pass plan (shuffle-free; the 100 TB path) —
    # triples-only run for the triples/sec metric, full run for features —
    # then the staged DataFrame plan for comparison. Both fused runs use
    # persist_docs=False (honest recompute) so best-of-2 never times a
    # cache read; the staged pipeline persists intermediates by design, so
    # each staged run rebuilds the pipeline with a fresh cache and best-of-3
    # compares full fresh runs (round-4 verdict: runs=1 staged walls were
    # irreproducible on a box with 20-30% wall noise).
    fused_t = pipe.run_fused(pages, persist_docs=False, with_features=False)
    n_triples = timed("kg_triples_fused", lambda: fused_t.triples.count(),
                      runs=2)
    fused_f = pipe.run_fused(pages, persist_docs=False, with_features=True)
    timed("kg_features_fused", lambda: fused_f.features.count(), runs=2)

    staged_tr, staged_ft = [], []
    for _ in range(3):
        spark.catalog.clearCache()     # fresh persist per staged run
        res = pipe.run(pages)
        t0 = time.time(); res.triples.count()
        staged_tr.append(time.time() - t0)
        t0 = time.time(); res.features.count()   # incremental over persisted stages
        staged_ft.append(time.time() - t0)
    spark.catalog.clearCache()
    timings["kg_triples_staged"] = round(min(staged_tr), 3)
    timings["kg_features_staged"] = round(min(staged_ft), 3)

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
                 "QF4_model_quality", "C3b_pack_split",
                 "C4_upsample", "C6_token_budget", "D9b_span_stats",
                 "L2_pos_lexical", "L3b_syntactic_text",
                 "KG_entity_pmi", "KG_pagerank", "D10_bloom_novelty",
                 "W4_asof_attribution", "Q10_time_rollup",
                 "T7_hll_registers"]:
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
