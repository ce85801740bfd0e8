"""Regenerate PLANS.md: formatted physical plans of headline operators with
commentary on pushdown / broadcast / shuffle structure."""
import io
import sys

sys.path.insert(0, "/root/repo")

from contextlib import redirect_stdout


def fmt(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    import pyspark.sql.functions as F
    import __spark_entry__ as E
    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.session import get_spark
    from pysemanticcomplexity_spark.sources.pages import pages_from_documents

    spark = get_spark(app_name="plans")
    sf = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf)
    dims = fixtures.spark_dims(spark)
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"],
                      persist_intermediate=False)

    sections = []

    fused = pipe.run_fused(pages, persist_docs=False)
    sections.append((
        "Fused pipeline: pages -> triples (single pass)",
        "ZERO exchanges: parquet scan (pruned to url,text) -> one "
        "ArrowEvalPython (mapInPandas) -> generate/explode -> project. "
        "This is the 100 TB hot path: the big table is never shuffled; "
        "gazetteer/closure/concept_info ride in as broadcast variables "
        "(not even broadcast joins — plain Python-side dicts).",
        fmt(fused.triples)))

    res = pipe.run(pages)
    sections.append((
        "Staged pipeline: triples",
        "The general path. Structure: scan -> mapInPandas (annotate) -> "
        "partial/final hash aggregate on (url, uri) [the one mentions-sized "
        "shuffle] -> BroadcastHashJoin with concept_info (itself built from "
        "partial-aggregated counts over the KB dims) -> union of the three "
        "edge branches with the closure BroadcastHashJoin; dedup confined "
        "to the closure branch.",
        fmt(res.triples)))

    q = E.queries()
    sections.append((
        "S7_mentions_sql (SQL mention model)",
        "Single WholeStageCodegen over the parquet scan: 25 literal "
        "regexp_count expressions stacked into an array -> explode -> "
        "filter. ReadSchema is pruned to (doc_id, text); no Python.",
        fmt(q["S7_mentions_sql"](spark, sf))))

    sections.append((
        "G2_closure (iterative frontier expansion)",
        "Driver loop of BroadcastHashJoins with localCheckpoint lineage "
        "truncation per round (without it, plan analysis is exponential).",
        fmt(q["G2_closure"](spark, sf))))

    sections.append((
        "S1_cosine_topk (brute-force ANN baseline)",
        "BroadcastNestedLoopJoin of the 20-query block against the corpus; "
        "dot products are JVM higher-order functions (aggregate/zip_with), "
        "then a single window for the per-query top-k.",
        fmt(q["S1_cosine_topk"](spark, sf))))

    sections.append((
        "S2_lsh_topk (SRP-LSH ANN, pandas-UDF bucket hashing)",
        "Bucket ids come from one ArrowEvalPython per side (a single "
        "batched matmul against the broadcast plane matrix) -> posexplode "
        "-> equi-join on (table, bucket): only bucket-mates are scored. "
        "The previous implementation evaluated the same hashes as a "
        "~5,000-node interpreted Catalyst expression tree (13x slower "
        "bucket stage at sf0.1).",
        fmt(q["S2_lsh_topk"](spark, sf))))

    sections.append((
        "D3_minhash_lsh",
        "Shingle explode -> one partial-aggregated groupBy(id) computing "
        "all 32 min-hashes -> band explode -> self-equi-join on "
        "(band, bucket): candidate pairs meet only inside LSH buckets.",
        fmt(q["D3_minhash_lsh"](spark, sf))))

    sections.append((
        "E2E_corpus_prep (quality -> dedup -> decontaminate -> mix -> rollup)",
        "Round-5 fused (single-scan) form: the JVM-expressible filters "
        "(sampler hash + per-stratum thresholds, full Gopher conjunction, "
        "model-quality margin) run as ONE codegen'd Filter directly on the "
        "scan, BELOW the MapInPandas contamination kernel — Catalyst can't "
        "push predicates through an opaque Python node, so pre-filtering "
        "keeps the rejected share of the corpus out of the Arrow transfer "
        "and the Python shingling entirely; the contamination threshold is "
        "the only post-Python filter. All row-local stages still execute "
        "inside the scan's stage with zero shuffles. The "
        "only other corpus touch is the exact-dedup keep-set (partial/"
        "final min over the 128-bit key) joined back id-keyed (broadcast "
        "at bench scale, AQE sort-merge when it outgrows the threshold), "
        "then one partial/final rollup by source. Two scans + one shuffle "
        "total vs five scans + four joins staged; fused == staged by "
        "pytest and by the driver oracle.",
        fmt(q["E2E_corpus_prep"](spark, sf))))

    sections.append((
        "C3_pack_sequences (scalable prefix sum)",
        "No single-partition stage: the Window is PARTITIONED by the "
        "value bucket (parallel across buckets) and the bucket offsets "
        "are literals folded into the projection; the oracle's global "
        "ORDER BY window would be one partition.",
        fmt(q["C3_pack_sequences"](spark, sf))))

    sections.append((
        "D9b_span_stats (cross-document duplicated n-gram spans)",
        "Two-level hash inside the scan stage (per-token char fold once, "
        "gram combine = integer ops over n token-hashes — no per-gram "
        "string), then ONE partial-aggregated count-distinct per gram "
        "hash, the equi-join back to positions, and a per-document "
        "Window (bounded by doc length) for the gaps-and-islands "
        "interval merge. The hub case — a boilerplate gram in millions "
        "of docs — is one row after partial aggregation.",
        fmt(q["D9b_span_stats"](spark, sf))))

    sections.append((
        "C4_upsample (temperature resampling, fractions above 1)",
        "Row-local: one codegen'd Filter (floor(f) + hash-gated "
        "fractional copy count) feeding Generate explode(sequence) — "
        "zero exchanges, streaming-legal; output rows grow by exactly "
        "the mix's expansion factor.",
        fmt(q["C4_upsample"](spark, sf))))

    sections.append((
        "C5_training_order (deterministic dense epoch shuffle)",
        "The dense global permutation without a single-partition window: "
        "the affine sampling hash is uniform on [0, POLY_MOD), so FIXED "
        "equal-width key ranges are balanced with no sampling pass — "
        "per-bucket row counts become literal offsets and the Window is "
        "partitioned by bucket. ONE narrow shuffle on the bucket id.",
        fmt(q["C5_training_order"](spark, sf))))

    sections.append((
        "C6_token_budget (per-source token budgeting)",
        "Same two-phase shape per (source, hash-bucket): the source "
        "filter is pushed to the scan, per-(source,bucket) token totals "
        "fold back as literal offsets, and the running sum is bucket-"
        "local — a 90%-one-source corpus still parallelizes across its "
        "buckets instead of serializing in one per-source partition.",
        fmt(q["C6_token_budget"](spark, sf))))

    sections.append((
        "L2_pos_lexical (POS-dependent lexical features)",
        "No Expand node: the 12 conditional count-distincts are rewritten "
        "as bool_or type-flags + token sums per (id, word), then per-id "
        "sums of flags — all HashAggregates with map-side partials, so "
        "the shuffle carries one row per distinct (id, word) instead of "
        "~13 copies of every token row. The ordered kept-word list "
        "(positional features) and the single sentences count-distinct "
        "live in their own branch; both branches hash-partition by id "
        "before the final join. Dictionary joins are BroadcastHashJoins.",
        fmt(q["L2_pos_lexical"](spark, sf))))

    sections.append((
        "L3b_syntactic_text (text -> trees -> 23 L2SCA features)",
        "Row-local, streaming-legal: parquet scan (pruned to doc_id, "
        "text) -> ONE MapInPandas -> project; zero Exchanges. All "
        "parsing/matching cost is inside the kernel (label-dispatched "
        "Tregex counting, iterative tree walks, memoized tagger), so the "
        "plan is scan-bound and embarrassingly parallel at any scale.",
        fmt(q["L3b_syntactic_text"](spark, sf))))

    sections.append((
        "C2_stratified_sample (reproducible training mix)",
        "A pure Filter over the scan — zero Exchanges; the affine-finished "
        "poly hash and the stratum CASE both run inside WholeStageCodegen.",
        fmt(q["C2_stratified_sample"](spark, sf))))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical plans of the headline operators\n\n"
            "Regenerate with `python scripts/dump_plans.py`. Each section: "
            "what the plan should look like and the `explain(\"formatted\")` "
            "output proving it does.\n")
        for title, commentary, plan in sections:
            f.write(f"\n## {title}\n\n{commentary}\n\n```\n{plan}```\n")
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
