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
