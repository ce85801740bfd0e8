"""Fused single-pass pipeline == staged pipeline == reference oracle."""
import math

from pysemanticcomplexity_spark import FEATURE_COLUMNS, fixtures
from pysemanticcomplexity_spark.pipeline import KGPipeline


def _und(x):
    return x is None or (isinstance(x, float) and math.isnan(x))


def test_fused_equals_staged_and_oracle(spark, dims, pages60_df, oracle60):
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    fused = pipe.run_fused(pages60_df)

    _, _, ref_triples, ref_vectors = oracle60
    got_triples = {(r["url"], r["subj"], r["pred"], r["obj"])
                   for r in fused.triples.collect()}
    assert got_triples == ref_triples

    got = {r["filename"]: [r[c] for c in FEATURE_COLUMNS[1:]]
           for r in fused.features.collect()}
    assert set(got) == set(ref_vectors)
    for url, ref_v in ref_vectors.items():
        for name, a, b in zip(FEATURE_COLUMNS[1:], got[url], ref_v):
            if _und(a) or _und(b):
                assert _und(a) and _und(b), (url, name, a, b)
            else:
                assert abs(a - b) < 1e-9, (url, name, a, b)


def test_fused_plan_is_shuffle_free(spark, dims, pages60_df):
    from pysemanticcomplexity_spark import plans
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    fused = pipe.run_fused(pages60_df, persist_docs=False)
    assert plans.count_shuffles(fused.triples) == 0
    assert plans.count_shuffles(fused.features) == 0


def test_fused_docs_row_per_page(spark, dims, pages60, pages60_df):
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    fused = pipe.run_fused(pages60_df, persist_docs=False)
    assert fused.docs.count() == len(pages60)


def test_doc_assembler_plans_are_lazy():
    """Plan entries materialize only for keys a document actually mentions
    — an eager build walks the ontology closure for the entire gazetteer
    universe once per task, which inverts the amortization for small
    tasks (streaming micro-batches against a large gazetteer)."""
    from pysemanticcomplexity_spark.annotation_core import GazetteerMatcher
    from pysemanticcomplexity_spark.ontology import OntologyIndex
    from pysemanticcomplexity_spark.operators.fused import (
        DocAssembler, _document_kernel)

    matcher = GazetteerMatcher(fixtures.gazetteer())
    onto = OntologyIndex([(c, p) for c, p, *_ in fixtures.ontology_edges()])
    assembler = DocAssembler(matcher, onto, {})
    assert len(assembler.plan) == 0            # nothing built up front

    # > PARAGRAPH_THRESHOLD (150) chars so the P3 filter keeps it
    text = ("The spark job wrote a table using a window. " * 4).strip()
    nb_words, triples, feats = _document_kernel("u1", text, assembler)
    built = set(assembler.plan)
    assert 0 < len(built) < len(matcher._best)  # only the touched keys
    assert nb_words > 0 and triples

    # memoized: a second document with the same mentions adds no entries
    _document_kernel("u2", text, assembler)
    assert set(assembler.plan) == built

    # lazy == eager: forcing every key yields identical plan tuples to a
    # fresh assembler fully materialized the same way
    full = DocAssembler(matcher, onto, {})
    for key in matcher._best:
        assert assembler.plan[key] == full.plan[key]
