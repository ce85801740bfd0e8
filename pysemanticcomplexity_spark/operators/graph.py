"""G1-G3 + P7/P8 + A5/J1: concept-graph triple materialization.

Per-document undirected concept graph (reference
parsers/semantic/graphs/builders.py:51-121) re-expressed as two DataFrames:
``triples(url, subj, pred, obj)`` with preds hasType / subClassOf, and
``nodes(url, node_id, is_resource, count, offset, nb_types, nb_links_in,
nb_links_out)``.

Design notes (scale-first):
* The ontology closure is precomputed once in the driver (ontology.py) and
  broadcast — the per-type ancestor walk (ontologies.py:103-109) becomes a
  single broadcast hash join instead of an iterative shuffle. An iterative
  DataFrame-join closure is also provided (``iterative_closure``) for the
  generic case where the taxonomy is NOT broadcastable, and doubles as the
  oracle-checkable recursive query.
* Canonicalization (P7, ontologies.py:52-83) is a pure JVM expression —
  prefix/qname tests + shortest-suffix tie-break via an array-of-structs
  sort — so it stays inside whole-stage codegen (no Python).
* A5 last-mention-wins (builders.py:61-63: ``dict((r.uri, r))`` keeps the
  last mention's offset) maps to ``max(offset)`` because document-level
  offsets are strictly increasing in processing order.
"""
from __future__ import annotations

from typing import Dict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import MANAGED_NAMESPACES, PRED_HAS_TYPE, PRED_SUBCLASS_OF, VIRTUAL_ROOT
from ..ontology import OntologyIndex

__all__ = ["canonicalize_expr", "closure_table", "iterative_closure",
           "resource_concepts", "build_triples", "build_nodes"]


def canonicalize_expr(col: F.Column,
                      namespaces: Dict[str, str] = None) -> F.Column:
    """P7 str_to_managed_uriref (ontologies.py:52-83) as a codegen expression.

    For each managed namespace (insertion order = tie-break order) the input
    either matches ``key:`` (qname) or the namespace URI prefix; candidates
    are ranked by (suffix length, namespace order) and the winner is
    reassembled as namespace + suffix. NULL when unmatched.
    """
    namespaces = namespaces or MANAGED_NAMESPACES
    cands = []
    for order, (key, ns) in enumerate(namespaces.items()):
        qname = key + ":"
        suffix = (
            F.when(col.startswith(qname), F.substring(col, len(qname) + 1, 1 << 30))
            .when(col.startswith(ns), F.substring(col, len(ns) + 1, 1 << 30))
        )
        cands.append(
            F.when(suffix.isNotNull(),
                   F.struct(F.length(suffix).alias("slen"),
                            F.lit(order).alias("ord"),
                            F.concat(F.lit(ns), suffix).alias("canonical")))
        )
    ranked = F.array_sort(F.filter(F.array(*cands), lambda c: c.isNotNull()))
    # F.get is 0-based and ANSI-safe (null out-of-bounds, never an error)
    return F.get(ranked, 0)["canonical"]


def closure_table(spark: SparkSession, ontology_edge_rows,
                  namespace_key: str = None) -> DataFrame:
    """Precomputed ancestor-edge closure dimension: (cls, src, dst).

    Driver-side memoized DFS over the tiny static taxonomy (G2,
    ontologies.py:103-109 — result-identical since graph insertion is
    idempotent); broadcast-joined downstream. ``namespace_key`` restricts
    the ancestor walks to that namespace (builders.py:98-99), for building
    per-namespace subgraph tables.
    """
    idx = OntologyIndex([(c, p) for c, p, *_ in ontology_edge_rows])
    rows = idx.full_closure_table(namespace_key=namespace_key)
    return spark.createDataFrame(rows, "cls string, src string, dst string")


def iterative_closure(edges: DataFrame, max_iters: int = 64,
                      namespace_key: str = None,
                      namespaces: Dict[str, str] = None,
                      checkpoint_dir: str = None) -> DataFrame:
    """G2 as an iterative frontier expansion over (child, parent) edges.

    Returns (cls, anc) = transitive ancestors, virtual root included per the
    G1 rule (parentless classes / walk ends -> #AbstractConcept#). Each round
    is one broadcast self-join; terminates at taxonomy depth (<= ~10 for
    DBpedia/schema/YAGO). Provided for taxonomies too large to close in the
    driver; the pipeline default is the precomputed broadcast closure.

    ``namespace_key`` applies the same restriction as the driver-side path
    (ontologies.py:93-95): parent edges leaving the namespace are dropped
    BEFORE the parentless test, so classes whose parents all live elsewhere
    close straight to the virtual root.

    Per-round lineage truncation defaults to ``localCheckpoint`` (fast, but
    executor-local blocks are NOT recomputable after an executor loss); pass
    ``checkpoint_dir`` (HDFS/S3 on a real cluster) to switch to reliable
    ``checkpoint()`` for fault-tolerant long runs; the session's previous
    checkpoint directory is restored on return (when one was set — Spark
    cannot unset it otherwise).
    """
    from .dedup import reliable_checkpointer

    sc = edges.sparkSession.sparkContext
    with reliable_checkpointer(sc, checkpoint_dir) as ckpt:
        if namespace_key is not None:
            # every class in the original universe whose parents were ALL
            # filtered out closes straight to the virtual root (the reference's
            # per-class generate_parents(cls, ns) empty -> root rule) — this
            # subsumes the parentless-tops rule of the unfiltered branch
            ns = (namespaces or MANAGED_NAMESPACES)[namespace_key]
            universe = (edges.select(F.col("child").alias("n"))
                        .unionByName(edges.select(F.col("parent").alias("n")))
                        .distinct())
            kept = edges.filter(F.col("parent").startswith(ns))
            with_parent = kept.select(F.col("child").alias("n")).distinct()
            orphans = (universe.join(with_parent, "n", "left_anti")
                       .select(F.col("n").alias("child"),
                               F.lit(VIRTUAL_ROOT).alias("parent")))
            e = ckpt(kept.select("child", "parent").unionByName(orphans)
                     .distinct())
        else:
            # root-extended edge set: parentless parents close to the virtual root
            children = edges.select(F.col("child").alias("c")).distinct()
            tops = (edges.select(F.col("parent").alias("child")).distinct()
                    .join(children, F.col("child") == F.col("c"), "left_anti")
                    .select("child", F.lit(VIRTUAL_ROOT).alias("parent")))
            # localCheckpoint truncates lineage each round — without it the
            # logical plan doubles per iteration (anti-join references the
            # running union) and Catalyst analysis time grows exponentially.
            e = ckpt(edges.select("child", "parent").unionByName(tops)
                     .distinct())
        # fresh attribute ids for the join side (self-join disambiguation)
        e_j = e.select(F.col("child").alias("j_child"), F.col("parent").alias("j_parent"))

        result = e.select(F.col("child").alias("cls"), F.col("parent").alias("anc"))
        frontier = result
        for _ in range(max_iters):
            step = (frontier.join(F.broadcast(e_j), frontier["anc"] == e_j["j_child"])
                    .select(frontier["cls"], F.col("j_parent").alias("anc"))
                    .distinct())
            new = ckpt(step.join(result, ["cls", "anc"], "left_anti"))
            if new.isEmpty():
                break
            result = ckpt(result.unionByName(new))
            frontier = new
        return result


def resource_concepts(mentions: DataFrame, concept_info: DataFrame,
                      broadcast_info: bool = True,
                      namespaces: Dict[str, str] = None,
                      namespace_key: str = None) -> DataFrame:
    """A5 + J1 + P8: one row per (url, uri) resource with enrichment and the
    deduped canonical type set.

    * count     = mention multiplicity (Counter, builders.py:62)
    * offset    = last mention's offset (builders.py:63; offsets strictly
                  increase in doc order, so max == last)
    * nb_types  = len(enriched types) ONLY (builders.py:79 — the Spotlight
                  types do not count here)
    * canonical_types = dedup(canonicalize(spotlight_types ∪ enriched types))
                  with unmanaged types dropped (builders.py:106-121)
    * namespace_key: keep only canonical types in that namespace
                  (builders.py:117-118 — build_sub_graph_from_entities'
                  per-namespace graphs; pair with a namespace-restricted
                  closure_table for full parity)
    """
    info = F.broadcast(concept_info) if broadcast_info else concept_info
    per_resource = (
        mentions.filter(F.col("uri") != "")
        .groupBy("url", "uri")
        .agg(F.count("*").alias("count"),
             F.max("offset").alias("offset"),
             # last-mention-wins for the surface types too (builders.py:61-63
             # keeps the LAST mention's row): offsets strictly increase in doc
             # order, so max_by(offset) == last. F.first would be
             # nondeterministic whenever one URI is matched through surfaces
             # carrying different type strings.
             F.max_by("spotlight_types", "offset").alias("spotlight_types"))
        .join(info, "uri", "left")
    )
    merged = F.array_union(
        F.col("spotlight_types"),
        F.coalesce(F.col("types"), F.array().cast("array<string>")))
    canon = F.array_distinct(
        F.filter(F.transform(merged, lambda t: canonicalize_expr(t, namespaces)),
                 lambda c: c.isNotNull()))
    if namespace_key is not None:
        ns = (namespaces or MANAGED_NAMESPACES)[namespace_key]
        canon = F.filter(canon, lambda c: c.startswith(ns))
    return per_resource.select(
        "url", "uri", "count", "offset",
        F.size(F.coalesce(F.col("types"), F.array().cast("array<string>")))
        .cast("long").alias("nb_types"),
        F.coalesce("nb_links_in", F.lit(0)).alias("nb_links_in"),
        F.coalesce("nb_links_out", F.lit(0)).alias("nb_links_out"),
        canon.alias("canonical_types"),
    )


def build_triples(resources: DataFrame, closure: DataFrame,
                  strict_edge_dedup: bool = False) -> DataFrame:
    """G3 (builders.py:69-104): hasType edges + broadcast-closure subClassOf
    edges + typeless->root edges.

    Dedup analysis (saves shuffling the two larger branches): hasType rows
    are unique by construction (resources are unique per (url, uri) and
    canonical_types is already distinct, P8); typeless rows likewise; the
    three branches cannot collide with each other (different preds / node
    roles) **provided resource URIs and managed class URIs are disjoint** —
    true for DBpedia resources (``/resource/``) vs ontology classes
    (``/ontology/`` etc.), and for every fixture. Only the closure branch
    produces duplicates (documents whose classes share ancestors), so the
    distinct is applied there alone — global output is then duplicate-free
    without a global shuffle.

    When the disjointness constraint cannot be assumed (a mention URI that is
    itself a managed taxonomy class would make the reference's nx.Graph merge
    the undirected hasType/subClassOf edges into one, first-insert pred
    winning — builders.py:69-104 inserts hasType edges before closure edges),
    pass ``strict_edge_dedup=True``: one extra shuffle dedups the union on
    the undirected (url, node-pair) key with hasType precedence.
    """
    typed = resources.select(
        "url", "uri", F.explode("canonical_types").alias("cls"))

    has_type = typed.select(
        "url", F.col("uri").alias("subj"),
        F.lit(PRED_HAS_TYPE).alias("pred"), F.col("cls").alias("obj"))

    # ancestor walk: left join so classes unknown to the taxonomy close to
    # the virtual root (empty objects() -> root, ontologies.py:96-101)
    doc_classes = typed.select("url", "cls").distinct()
    sub_class = (doc_classes.join(F.broadcast(closure),
                                  doc_classes["cls"] == closure["cls"], "left")
                 .select("url",
                         F.coalesce(closure["src"], doc_classes["cls"]).alias("subj"),
                         F.lit(PRED_SUBCLASS_OF).alias("pred"),
                         F.coalesce(closure["dst"], F.lit(VIRTUAL_ROOT)).alias("obj"))
                 .dropDuplicates(["url", "subj", "obj"]))

    typeless = (resources.filter(F.size("canonical_types") == 0)
                .select("url", F.col("uri").alias("subj"),
                        F.lit(PRED_HAS_TYPE).alias("pred"),
                        F.lit(VIRTUAL_ROOT).alias("obj")))

    out = has_type.unionByName(sub_class).unionByName(typeless)
    if strict_edge_dedup:
        prec = F.when(F.col("pred") == PRED_HAS_TYPE, 0).otherwise(1)
        out = (out.groupBy("url", F.least("subj", "obj").alias("_lo"),
                           F.greatest("subj", "obj").alias("_hi"))
               .agg(F.min_by(F.struct("subj", "pred", "obj"),
                             F.struct(prec.alias("p"), F.col("subj").alias("s")))
                    .alias("e"))
               .select("url", "e.subj", "e.pred", "e.obj"))
    return out


def resource_nodes(resources: DataFrame) -> DataFrame:
    """The RESOURCE rows of the node table — a pure projection of
    resources, no shuffle. The vectorizer needs only these: class/root
    nodes are exactly the triple endpoints absent from the resource set,
    and the feature kernel re-adds unknown endpoints as attribute-less
    non-resource nodes with the same values the full node table carries
    (False / NULL->NaN), so features(resource_nodes, triples) ==
    features(build_nodes(...), triples) — asserted in
    tests/test_vectorize.py."""
    return resources.select(
        "url", F.col("uri").alias("node_id"), F.lit(True).alias("is_resource"),
        "count", "offset", "nb_types", "nb_links_in", "nb_links_out")


def build_nodes(resources: DataFrame, triples: DataFrame) -> DataFrame:
    """Node table with attrs; class/root nodes carry nulls (builders.py:199-225)."""
    rsc_nodes = resource_nodes(resources)
    endpoint = (triples.select("url", F.col("obj").alias("node_id"))
                .unionByName(
                    triples.filter(F.col("pred") == PRED_SUBCLASS_OF)
                    .select("url", F.col("subj").alias("node_id")))
                .distinct())
    cls_nodes = (endpoint
                 .join(rsc_nodes.select("url", "node_id"), ["url", "node_id"],
                       "left_anti")
                 .select("url", "node_id", F.lit(False).alias("is_resource"),
                         F.lit(None).cast("long").alias("count"),
                         F.lit(None).cast("long").alias("offset"),
                         F.lit(None).cast("long").alias("nb_types"),
                         F.lit(None).cast("long").alias("nb_links_in"),
                         F.lit(None).cast("long").alias("nb_links_out")))
    return rsc_nodes.unionByName(cls_nodes)
