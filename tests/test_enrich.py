"""A1-A4 enrichment joins vs the pure-Python oracle."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import fixtures, ref_semantics as R
from pysemanticcomplexity_spark.operators import enrich

DBR = fixtures.DBR


def test_concept_info_matches_oracle(spark, dims):
    uris = sorted({uri for _, uri, _, _, _ in fixtures.gazetteer()})
    ref = R.enrich(uris, fixtures.instance_types(), fixtures.kb_triples())
    uris_df = spark.createDataFrame([(u,) for u in uris], "uri string")
    got = {r["uri"]: r for r in
           enrich.concept_info(uris_df, dims["instance_types"],
                               dims["kb_triples"]).collect()}
    assert set(got) == set(ref)
    for uri, info in ref.items():
        assert sorted(got[uri]["types"]) == info["types"], uri
        assert got[uri]["nb_links_in"] == info["nb_links_in"], uri
        assert got[uri]["nb_links_out"] == info["nb_links_out"], uri


def test_zero_fill_for_absent_entity(spark, dims):
    uris_df = spark.createDataFrame([(DBR + "Filter_(software)",)], "uri string")
    row = enrich.concept_info(uris_df, dims["instance_types"],
                              dims["kb_triples"]).collect()[0]
    assert row["types"] == [] and row["nb_links_in"] == 0 and row["nb_links_out"] == 0


def test_salted_types_agg_equals_plain(spark, dims):
    plain = {r["uri"]: sorted(r["types"])
             for r in enrich.types_agg(dims["instance_types"]).collect()}
    salted = {r["uri"]: sorted(r["types"])
              for r in enrich.types_agg_salted(dims["instance_types"]).collect()}
    assert plain == salted


def test_hub_skew_present_in_fixture(dims):
    """kb_triples must actually be skewed (FIXTURES.md §5) so the salting
    path is exercised meaningfully."""
    counts = (dims["kb_triples"].groupBy("obj").count()
              .orderBy(F.desc("count")).collect())
    assert counts[0]["obj"] == DBR + "Data"
    total = sum(r["count"] for r in counts)
    assert counts[0]["count"] / total > 0.35
