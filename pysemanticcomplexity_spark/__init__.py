"""pysemanticcomplexity_spark — a PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first re-expression of the data-processing capabilities of
afel-project/pySemanticComplexity (reference at /root/reference, cited by
file:line throughout):

  pages(url, warc_ts, html, text, lang)
    -> clean/split/filter/tokenize          (reference parsers/preprocessing/text.py)
    -> deterministic gazetteer annotation   (replaces Spotlight REST,
                                             parsers/semantic/dbpediaClients.py:21-76)
    -> entity disambiguation                (groupBy.applyInPandas / shuffle-free local)
    -> KB enrichment joins                  (replaces SPARQL endpoints,
                                             dbpediaClients.py:79-279)
    -> concept-graph triples + ontology closure
                                            (parsers/semantic/graphs/builders.py,
                                             ontologies.py)
    -> per-document 25-feature semantic-complexity vectors
                                            (parsers/semantic/graphs/tranformers.py)

Everything is DataFrame API + Arrow-vectorized pandas UDFs; no RDDs, no
row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"

VIRTUAL_ROOT = "#AbstractConcept#"
"""Virtual taxonomy root. Reference: ontologies.py:17 (`_CONCEPT_URIREF`)."""

# Managed namespaces, insertion order matters for canonicalization tie-breaks.
# Reference: utils/resources.py:21-28 (keys DBPedia/Schema/yago).
MANAGED_NAMESPACES = {
    "DBPedia": "http://dbpedia.org/ontology/",
    "Schema": "http://schema.org/",
    "yago": "http://dbpedia.org/class/yago/",
}

FEATURE_COLUMNS = [
    # Reference order: tranformers.py:60-64 (18 global) then per-namespace
    # pairs in managed-namespace insertion order (tranformers.py:167-186);
    # `filename` prepended as in subprograms/text2vectors.py:85-91.
    "filename",
    "nbWord", "nbConcepts", "nbUniqueConcepts",
    "conceptsWordsRatio", "uniqueConceptsWordsRatio",
    "nbNodes", "radius", "diameter", "assortativity", "density",
    "textDensityMean", "textDensityStd",
    "nbTypesMean", "nbTypesStd",
    "nbLinkInMean", "nbLinkInStd",
    "nbLinkOutMean", "nbLinkOutStd",
    "nbNodes_DBPedia", "density_DBPedia",
    "nbNodes_Schema", "density_Schema",
    "nbNodes_yago", "density_yago",
]

PRED_HAS_TYPE = "hasType"
PRED_SUBCLASS_OF = "subClassOf"


def feature_columns(namespaces=None):
    """FEATURE_COLUMNS restricted to a managed-namespace subset.

    Mirrors the reference's ``graphs2vectors -on`` behaviour
    (subprograms/graphs2vectors.py:26-47, minus its latent dict-unpack bug):
    the 19 global columns are always present; per-namespace (nbNodes_<ns>,
    density_<ns>) pairs appear only for the selected namespaces, in managed
    insertion order."""
    if namespaces is None:
        return list(FEATURE_COLUMNS)
    unknown = [k for k in namespaces if k not in MANAGED_NAMESPACES]
    if unknown:
        raise ValueError(f"unknown namespace key(s) {unknown}; "
                         f"expected a subset of {list(MANAGED_NAMESPACES)}")
    cols = FEATURE_COLUMNS[:19]
    for key in MANAGED_NAMESPACES:        # keep canonical order, not arg order
        if key in namespaces:
            cols += [f"nbNodes_{key}", f"density_{key}"]
    return cols


def __getattr__(name):
    # lazy convenience exports (avoid importing pyspark at package import)
    if name == "KGPipeline":
        from .pipeline import KGPipeline
        return KGPipeline
    if name == "get_spark":
        from .session import get_spark
        return get_spark
    if name == "transform_texts":
        from .api import transform_texts
        return transform_texts
    raise AttributeError(name)
