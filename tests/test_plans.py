"""Physical-plan assertions: the plan we want, not just one that passes.

Checks (SURVEY.md §4): dimension joins go broadcast, scans prune columns,
expression-only stages stay in whole-stage codegen, and the hot path has no
unexpected shuffles.
"""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import fixtures, plans
from pysemanticcomplexity_spark.operators import annotate, enrich, graph


def test_annotator_has_no_shuffle(spark, pages60_df):
    ann = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer())
    assert plans.count_shuffles(ann) == 0


def test_concept_info_join_is_broadcast(spark, dims, pages60_df):
    ann = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer())
    mentions, _ = annotate.split_mentions(ann)
    uris = enrich.distinct_uris(mentions)
    info = enrich.concept_info(uris, dims["instance_types"], dims["kb_triples"])
    res = graph.resource_concepts(mentions, info)
    assert plans.has_broadcast_join(res)


def test_closure_join_is_broadcast(spark, dims, pages60_df):
    ann = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer())
    mentions, _ = annotate.split_mentions(ann)
    uris = enrich.distinct_uris(mentions)
    info = enrich.concept_info(uris, dims["instance_types"], dims["kb_triples"])
    res = graph.resource_concepts(mentions, info)
    closure = graph.closure_table(spark, fixtures.ontology_edges())
    triples = graph.build_triples(res, closure)
    plan = plans.executed_plan(triples)
    assert "BroadcastHashJoin" in plan


def test_bucket_partition_pruning(spark, dims, pages60_df, tmp_path):
    """The bucketed stage layout must prune partitions at the scan: a
    bucket-filtered read touches one partition directory only."""
    from pysemanticcomplexity_spark.sources import tables
    ann = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer())
    mentions, doc_words = annotate.split_mentions(ann)
    path = str(tmp_path / "concepts")
    tables.write_table(tables.concepts_nested(mentions, doc_words), path,
                       n_buckets=8)
    df = spark.read.parquet(path).filter(F.col("bucket") == 3)
    plan = plans.executed_plan(df)
    assert "PartitionFilters: [isnotnull(bucket" in plan
    # pruned scan reads strictly fewer rows than the full table
    assert df.count() < spark.read.parquet(path).count()


def test_textstats_whole_stage_codegen(spark):
    from pysemanticcomplexity_spark.operators import textstats
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = plans.executed_plan(textstats.quality_score(docs))
    # all-JVM expressions: no Python evaluation nodes anywhere in the plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "regexp_extract_all" in plan          # stayed an expression


def test_sql_mention_model_single_codegen_stage(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    df = E.queries()["S7_mentions_sql"](spark, "/root/testdata/sf0.001")
    plan = plans.executed_plan(df)
    assert "EvalPython" not in plan and "InPandas" not in plan
    # the scale-adaptive scan repartition (round 6) makes the plan
    # adaptive, which hides codegen markers until THIS df's own query
    # execution ran (a sink write executes a separate QE) — collect,
    # then assert the FINAL plan: filter + explode + project still
    # collapse into one codegen span (now above the exchange)
    df.collect()
    assert plans.has_wholestage_codegen(df)
    assert plans.read_schema_of_scan(df) != "" and \
        "text" in plans.read_schema_of_scan(df)


def test_syntactic_text_path_shuffle_free(spark):
    """text_syntactic_features must stay scan -> ONE MapInPandas: zero
    exchanges (row-local, streaming-legal) and no per-row Python UDF."""
    from pysemanticcomplexity_spark.operators.syntactic import (
        text_syntactic_features)
    docs = spark.createDataFrame(
        [(1, "The cat sat. It purred loudly."), (2, "Dogs bark.")],
        "doc_id long, text string")
    feats = text_syntactic_features(docs)
    assert plans.count_shuffles(feats) == 0
    plan = plans.executed_plan(feats)
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan     # no row-at-a-time Python


def test_embedding_near_dups_no_second_vector_join(spark):
    """The LSH near-dup path must reuse lsh_topk's cosine (return_sim)
    rather than re-joining both vector tables: exactly ONE join in the
    plan (the bucket equi-join) and exactly 2 scans of the vector source."""
    from pysemanticcomplexity_spark.operators.dedup import embedding_near_dups
    import numpy as np
    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = plans.executed_plan(embedding_near_dups(emb, dim=8))
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct"))
    assert n_joins == 1, plan


def test_mix_recipe_plan_shapes(spark):
    """upsample = row-local (zero exchanges); the two ranked ops pay
    exactly ONE narrow shuffle (their fixed-width hash buckets), never a
    global single-partition window."""
    from pysemanticcomplexity_spark.operators.corpus import (
        take_token_budget, training_order, upsample_stratified)
    df = spark.createDataFrame(
        [(i, f"src{i % 3}", 10 + i % 7) for i in range(300)],
        "doc_id long, source string, n_tokens long")
    up = upsample_stratified(df, {"src0": 2.5, "src1": 1.0})
    assert plans.count_shuffles(up) == 0
    assert "Generate explode" in plans.executed_plan(up)
    assert plans.count_shuffles(training_order(df, num_ranges=8)) == 1
    assert plans.count_shuffles(
        take_token_budget(df, {"src0": 500}, num_ranges=8)) == 1


def test_negative_samples_no_single_partition_window(spark):
    """The vocab index must never be a global ORDER BY window: the plan
    must contain no Exchange SinglePartition (round-6 two-phase
    range-partitioned rank)."""
    from pysemanticcomplexity_spark.operators.kg_analytics import (
        negative_samples)
    kb = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i % 7}") for i in range(50)],
        "subj string, pred string, obj string")
    plan = plans.executed_plan(negative_samples(kb, k=2))
    assert "SinglePartition" not in plan, plan
