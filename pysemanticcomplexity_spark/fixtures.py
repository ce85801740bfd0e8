"""Deterministic synthetic fixture data (seed=42, no wall clock, no network).

Replaces the reference's external services with local tables, per FIXTURES.md:

* ``surface_forms``  — gazetteer standing in for DBpedia Spotlight
  (/root/reference/parsers/semantic/dbpediaClients.py:21-76).
* ``ontology_edges`` — rdfs:subClassOf taxonomy standing in for the vendor RDF
  files (/root/reference/utils/resources.py:21-28, parsers/semantic/graphs/ontologies.py:38-50).
* ``instance_types`` — rdf:type facts standing in for the SPARQL types endpoint
  (dbpediaClients.py:83-90).
* ``kb_triples``     — generic KB triples driving in/out link counts
  (dbpediaClients.py:197-208).
* ``pages``          — Common-Crawl-style input table per BASELINE.json input_hint.

All generators return plain Python lists of tuples/dicts so the pure-Python
reference oracle (ref_semantics.py) and Spark can consume identical data.
"""
from __future__ import annotations

from datetime import datetime, timedelta
from typing import Dict, List, Tuple

import numpy as np

from . import MANAGED_NAMESPACES

DBR = "http://dbpedia.org/resource/"
DBO = MANAGED_NAMESPACES["DBPedia"]
SCHEMA = MANAGED_NAMESPACES["Schema"]
YAGO = MANAGED_NAMESPACES["yago"]
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"  # unmanaged -> dropped by P7

SEED = 42

# ---------------------------------------------------------------------------
# Gazetteer (surface -> candidate entities).  Vocabulary matches the driver's
# /root/testdata documents tables so mentions fire on real testdata too.
# Columns: surface, uri, support, prior, spotlight_types (comma-joined, the
# '@types' shape of dbpediaClients.py:63-64).
# ---------------------------------------------------------------------------

GAZETTEER_ROWS: List[Tuple[str, str, int, float, str]] = [
    # unambiguous unigrams
    ("spark",    DBR + "Apache_Spark",      907, 1.0, "DBPedia:Software,DBpedia:Software"),
    ("table",    DBR + "Table_(database)",  520, 1.0, ""),
    ("window",   DBR + "Window_function",   210, 1.0, ""),
    ("customer", DBR + "Customer",          330, 1.0, "Schema:Person"),
    ("hash",     DBR + "Hash_function",     640, 1.0, ""),
    ("join",     DBR + "Join_(SQL)",        415, 1.0, ""),
    ("merge",    DBR + "Merge_algorithm",   150, 1.0, ""),
    ("sort",     DBR + "Sorting_algorithm", 505, 1.0, ""),
    ("scan",     DBR + "Table_scan",         88, 1.0, ""),
    ("stream",   DBR + "Stream_processing", 260, 1.0, ""),
    ("vector",   DBR + "Vector_space",      470, 1.0, ""),
    ("column",   DBR + "Column_(database)", 190, 1.0, ""),
    ("query",    DBR + "Query_language",    380, 1.0, ""),
    ("batch",    DBR + "Batch_processing",  140, 1.0, ""),
    # hub entity: many frequent surfaces -> one uri (skew exercise)
    ("data",     DBR + "Data",             9000, 1.0, ""),
    ("value",    DBR + "Data",             9000, 1.0, ""),
    ("row",      DBR + "Data",             9000, 1.0, ""),
    ("line",     DBR + "Data",             9000, 1.0, ""),
    # ambiguous surface, resolvable (best similarity 0.6 >= 0.5)
    ("key",      DBR + "Primary_key",       300, 0.6, ""),
    ("key",      DBR + "Key_(cryptography)", 200, 0.4, ""),
    # ambiguous surface, NOT resolvable at confidence 0.5 (best 0.4 < 0.5)
    ("part",     DBR + "Partition_(database)", 90, 0.4, ""),
    ("part",     DBR + "Part_(music)",         70, 0.3, ""),
    ("part",     DBR + "Particle",             60, 0.3, ""),
    # multi-token surfaces incl. nested/overlapping forms (longest-match)
    ("hash join",      DBR + "Hash_join",       75, 1.0, ""),
    ("sort merge",     DBR + "Merge_sort",      66, 1.0, ""),
    ("group by",       DBR + "Group_by",        55, 1.0, ""),
    ("window function", DBR + "Window_function", 210, 1.0, ""),
    ("data stream",    DBR + "Data_stream",     48, 1.0, ""),
    # entity absent from every KB table (zero-fill path, conceptsEnrichment.py:36-43)
    ("filter",   DBR + "Filter_(software)",  77, 1.0, ""),
]


def gazetteer() -> List[Tuple[str, str, int, float, str]]:
    return list(GAZETTEER_ROWS)


def gazetteer_index() -> Dict[str, List[Tuple[str, int, float, str]]]:
    """surface -> [(uri, support, prior, spotlight_types_csv)] (stable order)."""
    idx: Dict[str, List[Tuple[str, int, float, str]]] = {}
    for surface, uri, support, prior, types in GAZETTEER_ROWS:
        idx.setdefault(surface, []).append((uri, support, prior, types))
    return idx


# ---------------------------------------------------------------------------
# Ontology: three namespaces, depth 4-6, multi-parent DAG, shared ancestors,
# a suffix present in two namespaces, roots with no parent row (virtual-root
# rule ontologies.py:91-101).  (child, parent, ns)
# ---------------------------------------------------------------------------

ONTOLOGY_EDGES: List[Tuple[str, str, str]] = [
    # DBPedia namespace
    (DBO + "Engine", DBO + "Software", "DBPedia"),
    (DBO + "Database", DBO + "Software", "DBPedia"),
    (DBO + "Software", DBO + "Work", "DBPedia"),
    (DBO + "Work", DBO + "Thing", "DBPedia"),          # dbo:Thing: implicit root
    (DBO + "Table", DBO + "DataStructure", "DBPedia"),
    (DBO + "Index", DBO + "DataStructure", "DBPedia"),
    (DBO + "DataStructure", DBO + "Thing", "DBPedia"),
    # multi-parent class (DAG): SortingAlgorithm under Algorithm AND Method
    (DBO + "SortingAlgorithm", DBO + "Algorithm", "DBPedia"),
    (DBO + "SortingAlgorithm", DBO + "Method", "DBPedia"),
    (DBO + "Algorithm", DBO + "Thing", "DBPedia"),
    (DBO + "Method", DBO + "Thing", "DBPedia"),
    (DBO + "Person", DBO + "Agent", "DBPedia"),
    (DBO + "Agent", DBO + "Thing", "DBPedia"),
    (DBO + "Customer", DBO + "Person", "DBPedia"),
    (DBO + "StreamProcessor", DBO + "Engine", "DBPedia"),   # depth-5 chain
    # Schema namespace (suffix "Customer"/"Person" exist in both namespaces)
    (SCHEMA + "SoftwareApplication", SCHEMA + "CreativeWork", "Schema"),
    (SCHEMA + "Dataset", SCHEMA + "CreativeWork", "Schema"),
    (SCHEMA + "CreativeWork", SCHEMA + "Thing", "Schema"),  # schema:Thing: root
    (SCHEMA + "Person", SCHEMA + "Thing", "Schema"),
    (SCHEMA + "Customer", SCHEMA + "Person", "Schema"),
    (SCHEMA + "Table", SCHEMA + "CreativeWork", "Schema"),
    # yago namespace: one deep chain (depth 6)
    (YAGO + "Software106566077", YAGO + "Code106355894", "yago"),
    (YAGO + "Code106355894", YAGO + "CodingSystem106353757", "yago"),
    (YAGO + "CodingSystem106353757", YAGO + "Writing106362953", "yago"),
    (YAGO + "Writing106362953", YAGO + "WrittenCommunication106349220", "yago"),
    (YAGO + "WrittenCommunication106349220", YAGO + "Communication100033020", "yago"),
    (YAGO + "Communication100033020", YAGO + "Abstraction100002137", "yago"),
    (YAGO + "Algorithm105847438", YAGO + "Rule105846932", "yago"),
    (YAGO + "Rule105846932", YAGO + "Procedure101023820", "yago"),
    (YAGO + "Procedure101023820", YAGO + "Activity100407535", "yago"),
    (YAGO + "Activity100407535", YAGO + "Abstraction100002137", "yago"),
]


def ontology_edges() -> List[Tuple[str, str, str]]:
    return list(ONTOLOGY_EDGES)


# ---------------------------------------------------------------------------
# instance_types: entity -> rdf:type facts (SPARQL stand-in).  Includes
# unmanaged types (dropped by canonicalization, builders.py:113-116), typeless
# entities (root edge, builders.py:101-104), and entities absent entirely.
# ---------------------------------------------------------------------------

INSTANCE_TYPES: List[Tuple[str, str]] = [
    (DBR + "Apache_Spark", DBO + "Engine"),
    (DBR + "Apache_Spark", SCHEMA + "SoftwareApplication"),
    (DBR + "Apache_Spark", YAGO + "Software106566077"),
    (DBR + "Apache_Spark", OWL_THING),                    # unmanaged -> dropped
    (DBR + "Table_(database)", DBO + "Table"),
    (DBR + "Table_(database)", SCHEMA + "Table"),
    (DBR + "Window_function", DBO + "Software"),
    (DBR + "Customer", DBO + "Customer"),
    (DBR + "Customer", SCHEMA + "Customer"),
    (DBR + "Hash_function", DBO + "Algorithm"),
    (DBR + "Hash_function", YAGO + "Algorithm105847438"),
    (DBR + "Join_(SQL)", DBO + "Method"),
    (DBR + "Sorting_algorithm", DBO + "SortingAlgorithm"),
    (DBR + "Table_scan", DBO + "Method"),
    (DBR + "Stream_processing", DBO + "StreamProcessor"),
    (DBR + "Vector_space", YAGO + "Abstraction100002137"),
    (DBR + "Column_(database)", DBO + "DataStructure"),
    (DBR + "Query_language", DBO + "Software"),
    (DBR + "Query_language", SCHEMA + "Dataset"),
    (DBR + "Batch_processing", OWL_THING),                # only unmanaged -> typeless
    (DBR + "Primary_key", DBO + "Index"),
    (DBR + "Key_(cryptography)", YAGO + "Code106355894"),
    (DBR + "Hash_join", DBO + "Algorithm"),
    (DBR + "Merge_sort", DBO + "SortingAlgorithm"),
    (DBR + "Group_by", DBO + "Method"),
    (DBR + "Data_stream", SCHEMA + "Dataset"),
    # DBR+Data (hub): deliberately typeless -> resource->root edge
    # DBR+Merge_algorithm, DBR+Filter_(software): absent entirely -> types []
]


def instance_types() -> List[Tuple[str, str]]:
    return list(INSTANCE_TYPES)


# ---------------------------------------------------------------------------
# kb_triples: generic (subj, pred, obj) KB used for link counts; hub entity
# DBR+Data receives ~40% of inlinks (skew per FIXTURES.md §5).
# ---------------------------------------------------------------------------

def kb_triples(n_rows: int = 2000, seed: int = SEED) -> List[Tuple[str, str, str]]:
    rng = np.random.RandomState(seed)
    entities = sorted({uri for _, uri, _, _, _ in GAZETTEER_ROWS
                       if uri != DBR + "Merge_algorithm"
                       and uri != DBR + "Filter_(software)"})
    preds = [DBO + "wikiPageWikiLink", DBO + "related", DBO + "uses"]
    hub = DBR + "Data"
    rows: List[Tuple[str, str, str]] = []
    for _ in range(n_rows):
        pred = preds[rng.randint(len(preds))]
        subj = entities[rng.randint(len(entities))]
        if rng.rand() < 0.4:
            obj = hub
        else:
            obj = entities[rng.randint(len(entities))]
        rows.append((subj, pred, obj))
    return rows


# ---------------------------------------------------------------------------
# pages: Common-Crawl-style input (url, warc_ts, html, text, lang).
# ---------------------------------------------------------------------------

_FILLER = ["the", "a", "slow", "fast", "small", "big", "order", "group",
           "agg", "dup", "naïve", "café"]
_CONTROL_CHARS = ["\x00", "\x07", "\x0b", "\x1f", "\x85", "\x9c"]
_EPOCH = datetime(2026, 1, 1)


def _make_paragraph(rng: np.random.RandomState, n_tokens: int,
                    with_mentions: bool = True) -> str:
    surfaces = sorted(gazetteer_index().keys())
    words: List[str] = []
    while len(words) < n_tokens:
        r = rng.rand()
        if with_mentions and r < 0.45:
            s = surfaces[rng.randint(len(surfaces))]
            if rng.rand() < 0.1:
                s = s.capitalize()          # case-insensitive matching exercise
            words.extend(s.split(" "))
        else:
            words.append(_FILLER[rng.randint(len(_FILLER))])
    text = " ".join(words)
    if rng.rand() < 0.3:                    # sprinkle control chars (P1 exercise)
        pos = rng.randint(max(len(text), 1))
        c = _CONTROL_CHARS[rng.randint(len(_CONTROL_CHARS))]
        text = text[:pos] + c + text[pos:]
    return text


def pages(n_docs: int = 100, seed: int = SEED) -> List[dict]:
    """Deterministic pages rows (plain dicts; binary html as bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_docs):
        mode = i % 17
        if mode == 0:
            text = ""                                        # empty doc
        elif mode == 1:
            text = _make_paragraph(rng, 8)                   # single short para (filtered)
        elif mode == 2:
            text = "\n\n".join(_make_paragraph(rng, 6) for _ in range(3))
        elif mode == 3:                                      # no-mention doc
            text = _make_paragraph(rng, 60, with_mentions=False)
        else:
            n_paras = 1 + rng.randint(6)
            paras = []
            for _ in range(n_paras):
                # lengths straddle the 150-char threshold (text.py:17,35-36)
                n_tok = 10 + rng.randint(70)
                paras.append(_make_paragraph(rng, n_tok))
            text = "\n\n".join(paras)
        rows.append({
            "url": f"https://ex{i % 97}.org/p/{i}",
            "warc_ts": _EPOCH + timedelta(seconds=i),
            "html": b"<html><body>" + text.encode("utf-8", "replace") + b"</body></html>",
            "text": text,
            "lang": "en" if i % 11 else "fr",
        })
    return rows


# ---------------------------------------------------------------------------
# Spark / DuckDB adapters
# ---------------------------------------------------------------------------

def spark_dims(spark):
    """Create the dimension DataFrames (gazetteer, ontology, types, kb)."""
    gaz = spark.createDataFrame(
        gazetteer(), "surface string, uri string, support long, prior double, spotlight_types string")
    onto = spark.createDataFrame(ontology_edges(), "child string, parent string, ns string")
    itypes = spark.createDataFrame(instance_types(), "uri string, type_uri string")
    kb = spark.createDataFrame(kb_triples(), "subj string, pred string, obj string")
    return {"surface_forms": gaz, "ontology_edges": onto,
            "instance_types": itypes, "kb_triples": kb}


def spark_pages(spark, n_docs: int = 100, seed: int = SEED):
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
    rows = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
            for r in pages(n_docs, seed)]
    return spark.createDataFrame(rows, schema)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def values_cte(name: str, columns: List[str], rows: List[tuple]) -> str:
    """Render rows as a SQL VALUES CTE body usable by both Spark SQL and DuckDB.

    Lets oracle_sql() embed the deterministic dimension tables inline, since
    the DuckDB oracle only pre-registers the testdata views.
    """
    rendered = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, str):
                vals.append(_sql_quote(v))
            elif isinstance(v, float):
                vals.append(repr(v))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        rendered.append("(" + ", ".join(vals) + ")")
    cols = ", ".join(columns)
    return f"{name}({cols}) AS (VALUES " + ",\n".join(rendered) + ")"
