"""Library API — the reference's SemanticTransformer equivalent.

Reference: fullTransformers.py:38-71 — `SemanticTransformer.fit_transform
(texts) -> np.ndarray` runs the 4 phases over in-memory strings and returns
the raw feature matrix; `get_features_names` lists columns (:70-71).
"""
from __future__ import annotations

from typing import Iterable, List

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from . import FEATURE_COLUMNS


def get_features_names() -> List[str]:
    """24 feature names, reference order (tranformers.py:60-64,167-170)."""
    return list(FEATURE_COLUMNS[1:])


def transform_texts(spark: SparkSession, texts: Iterable[str],
                    gazetteer_rows=None, ontology_edge_rows=None,
                    instance_types_df: DataFrame = None,
                    kb_triples_df: DataFrame = None,
                    confidence: float = 0.5) -> np.ndarray:
    """fit_transform equivalent: texts -> (n_texts, 24) float matrix, row
    order == input order. Dimensions default to the fixture tables (the
    local replacements for the reference's remote services)."""
    from . import fixtures
    from .pipeline import KGPipeline

    texts = list(texts)
    if gazetteer_rows is None:
        gazetteer_rows = fixtures.gazetteer()
    if ontology_edge_rows is None:
        ontology_edge_rows = fixtures.ontology_edges()
    dims = None
    if instance_types_df is None or kb_triples_df is None:
        dims = fixtures.spark_dims(spark)
        instance_types_df = instance_types_df or dims["instance_types"]
        kb_triples_df = kb_triples_df or dims["kb_triples"]

    pages = spark.createDataFrame(
        [(f"text://{i}", t) for i, t in enumerate(texts)],
        "url string, text string")
    pipe = KGPipeline(spark, gazetteer_rows, ontology_edge_rows,
                      instance_types_df, kb_triples_df, confidence=confidence)
    feats = pipe.run_fused(pages).features
    rows = {r["filename"]: [r[c] for c in FEATURE_COLUMNS[1:]]
            for r in feats.collect()}
    out = np.full((len(texts), len(FEATURE_COLUMNS) - 1), np.nan)
    for i in range(len(texts)):
        row = rows[f"text://{i}"]
        out[i] = [np.nan if v is None else v for v in row]
    return out
