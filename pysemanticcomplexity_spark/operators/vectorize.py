"""M1-M10: per-document semantic-complexity feature vectors.

Per-document graphs are tiny (10^2-10^3 nodes — SURVEY.md §2.6), so the
eccentricity/BFS metrics run inside an Arrow-batched
``cogroup().applyInPandas`` keyed by url: one shuffle of the (small) nodes +
triples tables, zero driver involvement, linear scale-out across documents.

The numeric feature definitions are shared with the pure-Python oracle
(ref_semantics.vectorize_graph — itself a mirror of reference
tranformers.py:40-186); what this module adds is the distributed execution
shape and the graph reconstruction from relational rows. The graph
*construction* path (DataFrame ops) is fully independent of the oracle's.

A pure-DataFrame fast path (``features_df_only``) computes the
SQL-expressible feature subset (M2/M3/M6/M8/M9 — counts, density, ratios,
type/link moments) with partial-aggregated groupBys for workloads that do
not need the BFS metrics; it is also the DuckDB-oracle surface.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .. import FEATURE_COLUMNS, MANAGED_NAMESPACES, PRED_SUBCLASS_OF, VIRTUAL_ROOT
from .. import schemas
from .vectorize_kernel import compute_features

__all__ = ["vectorize", "features_df_only", "pack_graph"]


def pack_graph(nodes: DataFrame, triples: DataFrame) -> DataFrame:
    """Union nodes + edges into one url-grouped table for cogroup (2-way API)."""
    n = nodes.select(
        "url", F.lit("n").alias("kind"), F.col("node_id").alias("a"),
        F.lit(None).cast("string").alias("b"),
        "is_resource", "count", "offset", "nb_types", "nb_links_in", "nb_links_out")
    e = triples.select(
        "url", F.lit("e").alias("kind"), F.col("subj").alias("a"),
        F.col("obj").alias("b"),
        F.lit(None).cast("boolean").alias("is_resource"),
        F.lit(None).cast("long").alias("count"),
        F.lit(None).cast("long").alias("offset"),
        F.lit(None).cast("long").alias("nb_types"),
        F.lit(None).cast("long").alias("nb_links_in"),
        F.lit(None).cast("long").alias("nb_links_out"))
    return n.unionByName(e)


def vectorize(nodes: DataFrame, triples: DataFrame,
              doc_words: DataFrame,
              namespaces: dict = None) -> DataFrame:
    """Feature table: one row per url in ``doc_words`` (zero-mention documents
    get the empty-graph vector), columns = FEATURE_COLUMNS.

    ``namespaces`` restricts the per-namespace column pairs to a subset of
    MANAGED_NAMESPACES keys (reference ``graphs2vectors -on``,
    subprograms/graphs2vectors.py:26-47); None = all three."""
    from .. import MANAGED_NAMESPACES as _ALL_NS, feature_columns
    cols = feature_columns(namespaces)
    ns_dict = (None if namespaces is None
               else {k: _ALL_NS[k] for k in _ALL_NS if k in namespaces})
    schema = T.StructType(
        [T.StructField("filename", T.StringType(), False)]
        + [T.StructField(c, T.DoubleType(), True) for c in cols[1:]])
    packed = pack_graph(nodes, triples)

    def compute_group(url, grp: pd.DataFrame) -> list:
        wpdf = grp[grp["kind"] == "w"]
        nb_words = int(wpdf["count"].iloc[0]) if len(wpdf) else None
        npdf = grp[grp["kind"] == "n"]
        epdf = grp[grp["kind"] == "e"]
        node_ids = list(npdf["a"])
        known = set(node_ids)
        # edge endpoints not in the node table (defensive; shouldn't happen)
        for a, b in zip(epdf["a"], epdf["b"]):
            for x in (a, b):
                if x not in known:
                    known.add(x)
                    node_ids.append(x)
        pad = len(node_ids) - len(npdf)
        is_res = np.concatenate([npdf["is_resource"].to_numpy(dtype=bool),
                                 np.zeros(pad, dtype=bool)])
        f64 = lambda s: np.concatenate([s.to_numpy(dtype="float64"),
                                        np.full(pad, np.nan)])
        feats = compute_features(
            node_ids=node_ids,
            is_resource=is_res,
            counts=np.nan_to_num(f64(npdf["count"])),
            offsets=f64(npdf["offset"]),
            nb_types=f64(npdf["nb_types"]),
            nb_links_in=f64(npdf["nb_links_in"]),
            nb_links_out=f64(npdf["nb_links_out"]),
            edges=list(zip(epdf["a"], epdf["b"])),
            nb_words=nb_words,
            namespaces=ns_dict,
        )
        return [url] + feats

    def run(batches):
        # many documents per Arrow batch: rows arrive url-sorted within
        # the partition, so complete url groups are contiguous; the last
        # url of a batch may continue in the next one and is carried over
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            urls = pdf["url"].to_numpy()
            # first row of the batch-final url group (equality scan, no
            # reliance on comparator parity between Spark and Python)
            first_of_last = int((urls != urls[-1]).nonzero()[0][-1]) + 1 \
                if (urls != urls[-1]).any() else 0
            carry = pdf.iloc[first_of_last:]
            work = pdf.iloc[:first_of_last]
            if len(work):
                yield pd.DataFrame(
                    [compute_group(u, g) for u, g in
                     work.groupby("url", sort=False)], columns=cols)
        if carry is not None and len(carry):
            yield pd.DataFrame(
                [compute_group(u, g) for u, g in
                 carry.groupby("url", sort=False)], columns=cols)

    # The words rows ride the SAME shuffled stream as the packed graph
    # (kind 'w', nb_words in the count column): one hash repartition +
    # in-partition sort by url, then ONE mapInPandas that processes every
    # url group in an Arrow batch per call. The previous
    # cogroup().applyInPandas shape invoked Python once per URL — ~2 ms
    # of per-group Arrow/pandas overhead per document dominated the stage
    # (kg_features_staged 12.2 s -> see OPTIMIZATION_r06.md); group
    # contents and the numeric kernel are unchanged.
    words = doc_words.select(
        "url", F.lit("w").alias("kind"),
        F.lit(None).cast("string").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("boolean").alias("is_resource"),
        F.col("nb_words").cast("long").alias("count"),
        F.lit(None).cast("long").alias("offset"),
        F.lit(None).cast("long").alias("nb_types"),
        F.lit(None).cast("long").alias("nb_links_in"),
        F.lit(None).cast("long").alias("nb_links_out"))
    stream = (packed.unionByName(words)
              .repartition("url")
              .sortWithinPartitions("url"))
    return stream.mapInPandas(run, schema=schema)


def features_df_only(nodes: DataFrame, triples: DataFrame,
                     doc_words: DataFrame) -> DataFrame:
    """SQL-expressible feature subset, pure DataFrame (no Python).

    nbWord, nbConcepts, nbUniqueConcepts, concepts/words ratios, nbNodes,
    density, nbTypes/nbLinkIn/nbLinkOut mean+population-std, and the
    per-namespace node counts (M9 nbNodes_<ns>). Division follows the
    documented NaN-on-zero-words divergence.
    """
    rsc = (nodes.filter("is_resource")
           .groupBy("url")
           .agg(F.sum("count").alias("nbConcepts"),
                F.count("*").alias("nbUniqueConcepts"),
                F.avg("nb_types").alias("nbTypesMean"),
                F.stddev_pop("nb_types").alias("nbTypesStd"),
                F.avg("nb_links_in").alias("nbLinkInMean"),
                F.stddev_pop("nb_links_in").alias("nbLinkInStd"),
                F.avg("nb_links_out").alias("nbLinkOutMean"),
                F.stddev_pop("nb_links_out").alias("nbLinkOutStd")))
    counts = nodes.groupBy("url").agg(F.count("*").alias("nbNodes"))
    edge_counts = triples.groupBy("url").agg(F.count("*").alias("nbEdges"))

    ns_counts = nodes.groupBy("url").agg(*[
        F.sum(F.when(F.col("is_resource")
                     | (F.col("node_id") == VIRTUAL_ROOT)
                     | F.col("node_id").startswith(ns), 1).otherwise(0))
        .alias(f"nbNodes_{key}")
        for key, ns in MANAGED_NAMESPACES.items()])

    out = (doc_words
           .join(rsc, "url", "left").join(counts, "url", "left")
           .join(edge_counts, "url", "left").join(ns_counts, "url", "left"))
    nb_words = F.col("nb_words").cast("double")
    zero = F.lit(0.0)
    # undefined features are NULL (not NaN): Arrow ships pandas NaN as null,
    # so NULL is the engine-wide canonical "undefined" in output tables
    nan = F.lit(None).cast("double")
    n = F.coalesce(F.col("nbNodes"), F.lit(0)).cast("double")
    e = F.coalesce(F.col("nbEdges"), F.lit(0)).cast("double")
    return out.select(
        F.col("url").alias("filename"),
        nb_words.alias("nbWord"),
        F.coalesce(F.col("nbConcepts"), F.lit(0)).cast("double").alias("nbConcepts"),
        F.coalesce(F.col("nbUniqueConcepts"), F.lit(0)).cast("double")
        .alias("nbUniqueConcepts"),
        F.when(nb_words != 0,
               F.coalesce(F.col("nbConcepts"), F.lit(0)) / nb_words)
        .otherwise(nan).alias("conceptsWordsRatio"),
        F.when(nb_words != 0,
               F.coalesce(F.col("nbUniqueConcepts"), F.lit(0)) / nb_words)
        .otherwise(nan).alias("uniqueConceptsWordsRatio"),
        n.alias("nbNodes"),
        F.when(n > 1, F.lit(2.0) * e / (n * (n - F.lit(1.0))))
        .otherwise(F.lit(1.0)).alias("density"),
        F.col("nbTypesMean").cast("double").alias("nbTypesMean"),
        F.col("nbTypesStd").cast("double").alias("nbTypesStd"),
        F.col("nbLinkInMean").cast("double").alias("nbLinkInMean"),
        F.col("nbLinkInStd").cast("double").alias("nbLinkInStd"),
        F.col("nbLinkOutMean").cast("double").alias("nbLinkOutMean"),
        F.col("nbLinkOutStd").cast("double").alias("nbLinkOutStd"),
        *[F.coalesce(F.col(f"nbNodes_{key}"), zero).cast("double")
          .alias(f"nbNodes_{key}") for key in MANAGED_NAMESPACES],
    )
