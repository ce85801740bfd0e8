"""S6: N-Triples ontology file scan as a DataFrame parser.

The reference parses vendor RDF files with rdflib
(parsers/semantic/graphs/ontologies.py:38-50; files registered at
utils/resources.py:21-28). Here: ``spark.read.text`` + ``regexp_extract`` —
distributed, no Python, handles the subset of N-Triples/Turtle the taxonomy
files actually use (one ``<s> <p> <o> .`` triple per line).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SUBCLASS_PRED = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

_TRIPLE_RE = r"^\s*<([^>]+)>\s+<([^>]+)>\s+<([^>]+)>\s*\.\s*$"


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """(subj, pred, obj) from an N-Triples file; non-triple lines dropped."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _TRIPLE_RE, 1).alias("subj"),
        F.regexp_extract("value", _TRIPLE_RE, 2).alias("pred"),
        F.regexp_extract("value", _TRIPLE_RE, 3).alias("obj"))
    return parsed.filter(F.col("subj") != "")


def subclass_edges(spark: SparkSession, path: str, ns_key: str = None) -> DataFrame:
    """(child, parent[, ns]) rows from the file's rdfs:subClassOf triples."""
    df = (read_ntriples(spark, path)
          .filter(F.col("pred") == SUBCLASS_PRED)
          .select(F.col("subj").alias("child"), F.col("obj").alias("parent")))
    if ns_key is not None:
        df = df.withColumn("ns", F.lit(ns_key))
    return df
