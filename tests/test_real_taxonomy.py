"""End-to-end parity on the reference's REAL vendor taxonomy (1394 edges).

Runs both pipelines with the actual dbpedia.nt + schema.nt subClassOf
edges (parsed by the S6 reader from /root/reference, read-only) and
instance types over real DBpedia classes, and checks exact agreement with
the pure-Python reference oracle — evidence the closure/canonicalization
path holds beyond the hand-crafted fixture DAG.
"""
import os

import pytest

from pysemanticcomplexity_spark import fixtures, ref_semantics as R
from pysemanticcomplexity_spark.pipeline import KGPipeline
from pysemanticcomplexity_spark.sources import ntriples

BASE = "/root/reference/vendor/dbpedia"
DBR = fixtures.DBR

REAL_INSTANCE_TYPES = [
    (DBR + "Apache_Spark", "http://dbpedia.org/ontology/Software"),
    (DBR + "Apache_Spark", "http://schema.org/SoftwareApplication"),
    (DBR + "Customer", "http://dbpedia.org/ontology/Person"),
    (DBR + "Customer", "http://schema.org/Person"),
    (DBR + "Hash_function", "http://dbpedia.org/ontology/TopicalConcept"),
    (DBR + "Sorting_algorithm", "http://dbpedia.org/ontology/TopicalConcept"),
    (DBR + "Table_(database)", "http://schema.org/CreativeWork"),
    (DBR + "Join_(SQL)", "http://dbpedia.org/ontology/UnitOfWork"),
    (DBR + "Window_function", "http://dbpedia.org/ontology/Work"),
    (DBR + "Query_language", "http://dbpedia.org/ontology/ProgrammingLanguage"),
    (DBR + "Batch_processing", "http://www.w3.org/2002/07/owl#Thing"),
]


@pytest.mark.skipif(not os.path.exists(f"{BASE}/dbpedia.nt"),
                    reason="vendor files absent")
def test_pipeline_on_real_taxonomy(spark, pages60, pages60_df):
    dbp = ntriples.subclass_edges(spark, f"{BASE}/dbpedia.nt", "DBPedia")
    sch = ntriples.subclass_edges(spark, f"{BASE}/schema.nt", "Schema")
    onto_edges = [(r["child"], r["parent"], r["ns"])
                  for r in dbp.unionByName(sch).collect()]
    assert len(onto_edges) == 769 + 625

    itypes_df = spark.createDataFrame(REAL_INSTANCE_TYPES,
                                      "uri string, type_uri string")
    kb_df = spark.createDataFrame(fixtures.kb_triples(),
                                  "subj string, pred string, obj string")

    pipe = KGPipeline(spark, fixtures.gazetteer(), onto_edges,
                      itypes_df, kb_df)
    staged = {(r["url"], r["subj"], r["pred"], r["obj"])
              for r in pipe.run(pages60_df).triples.collect()}
    fused = {(r["url"], r["subj"], r["pred"], r["obj"])
             for r in pipe.run_fused(pages60_df).triples.collect()}

    _, _, ref_triples, _ = R.run_reference_pipeline(
        pages60, fixtures.gazetteer(), REAL_INSTANCE_TYPES,
        fixtures.kb_triples(), onto_edges)

    assert staged == ref_triples
    assert fused == ref_triples
    # the real taxonomy produced actual ancestor chains
    classes = {t[3] for t in ref_triples if t[2] == "subClassOf"}
    assert len(classes) >= 5
