"""A1-A4 + S8/S9: KB enrichment as joins (SURVEY.md §2.1, §2.3).

The reference's serial, driver-side SPARQL batching with politeness sleeps
(parsers/semantic/dbpediaClients.py:83-279) becomes three aggregations over
local KB tables plus left joins with zero-fill defaults
(batchprocessing/semantic/conceptsEnrichment.py:36-43):

* A1 distinct mention URIs           — the pipeline's global barrier;
* A2 uri -> collect_set(type)        — *salted two-phase* variant provided for
  hub-entity skew (north_rule: "skew handled explicitly"): plain
  collect_set has no effective map-side reduction for a hot key, so phase 1
  groups by (uri, salt) and phase 2 merges the per-salt sets;
* A3 in/out link counts              — groupBy counts (partial aggregation
  already collapses hot keys map-side; AQE skew-join covers the join side);
* A4 assembly with defaults          — types [] and counts 0 for KB misses.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["distinct_uris", "types_agg", "types_agg_salted",
           "link_counts", "concept_info"]


def distinct_uris(mentions: DataFrame) -> DataFrame:
    """A1 (conceptsEnrichment.py:14-15)."""
    return mentions.select("uri").where(F.col("uri") != "").distinct()


def types_agg(instance_types: DataFrame) -> DataFrame:
    """A2 (dbpediaClients.py:146-158,182-190): uri -> set of type IRIs."""
    return (instance_types.groupBy("uri")
            .agg(F.collect_set("type_uri").alias("types")))


def types_agg_salted(instance_types: DataFrame, buckets: int = 16) -> DataFrame:
    """A2 with explicit two-phase salting for hub entities.

    Phase 1 reduces each (uri, salt) bucket to one set; phase 2 merges the
    ≤`buckets` partial sets per uri. The hot key's state is split across
    `buckets` reducers instead of one.
    """
    salted = instance_types.withColumn(
        "salt", F.pmod(F.xxhash64("type_uri"), F.lit(buckets)))
    partial = (salted.groupBy("uri", "salt")
               .agg(F.collect_set("type_uri").alias("partial_types")))
    return (partial.groupBy("uri")
            .agg(F.array_distinct(F.flatten(F.collect_list("partial_types")))
                 .alias("types")))


def link_counts(kb_triples: DataFrame) -> DataFrame:
    """A3/S9 (dbpediaClients.py:196-208): per-entity in/out link counts.

    Two partial-aggregated counts + one outer merge; equivalent to the
    reference's two GROUP BY SPARQL queries.
    """
    inl = kb_triples.groupBy(F.col("obj").alias("uri")) \
                    .agg(F.count("*").alias("nb_links_in"))
    outl = kb_triples.groupBy(F.col("subj").alias("uri")) \
                     .agg(F.count("*").alias("nb_links_out"))
    return (inl.join(outl, "uri", "full_outer")
            .select("uri",
                    F.coalesce("nb_links_in", F.lit(0)).alias("nb_links_in"),
                    F.coalesce("nb_links_out", F.lit(0)).alias("nb_links_out")))


def concept_info(uris: DataFrame, instance_types: DataFrame,
                 kb_triples: DataFrame, salted: bool = False) -> DataFrame:
    """A4 (conceptsEnrichment.py:36-43): every distinct uri gets a row;
    missing types -> [], missing links -> 0.

    salted=False by default: partial aggregation absorbs realistic hub
    skew (BENCH/SKEW.md measurements); enable salting when a hub key's
    set state may exceed reducer memory."""
    t = types_agg_salted(instance_types) if salted else types_agg(instance_types)
    l = link_counts(kb_triples)
    return (uris
            .join(t, "uri", "left")
            .join(l, "uri", "left")
            .select(
                "uri",
                F.coalesce("types", F.array().cast("array<string>")).alias("types"),
                F.coalesce("nb_links_in", F.lit(0)).alias("nb_links_in"),
                F.coalesce("nb_links_out", F.lit(0)).alias("nb_links_out"),
            ))
