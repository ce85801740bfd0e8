"""S7 annotator + disambiguation variants."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import fixtures
from pysemanticcomplexity_spark.annotation_core import GazetteerMatcher
from pysemanticcomplexity_spark.operators import annotate, disambiguate

DBR = fixtures.DBR


def _matcher(confidence=0.5):
    return GazetteerMatcher(fixtures.gazetteer(), confidence=confidence)


def test_longest_match_wins():
    m = _matcher()
    out = list(m.annotate("a hash join b"))
    assert len(out) == 1
    off, surface, uri, *_ = out[0]
    assert uri == DBR + "Hash_join" and surface == "hash join" and off == 2


def test_non_overlapping_advance():
    m = _matcher()
    # "hash hash join": first "hash" matches alone, then "hash join"
    uris = [o[2] for o in m.annotate("hash hash join")]
    assert uris == [DBR + "Hash_function", DBR + "Hash_join"]


def test_case_insensitive_and_offset():
    m = _matcher()
    out = list(m.annotate("xx Spark yy"))
    assert out[0][2] == DBR + "Apache_Spark"
    assert out[0][0] == 3 and out[0][1] == "Spark"


def test_ambiguous_resolved_and_confidence_filter():
    m = _matcher()
    # "key": priors .6/.4 -> Primary_key kept with sim 0.6
    out = list(m.annotate("the key is here and the sort is fast"))
    key = [o for o in out if o[1] == "key"][0]
    assert key[2] == DBR + "Primary_key"
    assert abs(key[4] - 0.6) < 1e-12
    assert abs(key[5] - (0.4 / 0.6)) < 1e-12     # percentage_second_rank
    # "part": best sim 0.4 < 0.5 -> suppressed
    assert not list(m.annotate("this part here"))


def test_unicode_offsets_are_char_based():
    m = _matcher()
    out = list(m.annotate("café naïve spark"))
    # char offset 11, not byte offset (conceptExtraction.py:29 uses str chars)
    assert out[0][0] == 11


def test_disambiguation_variants_agree(spark, pages60_df):
    cands = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer(),
                                    emit="candidates")
    best_local = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer(),
                                         emit="best")

    def key_set(df):
        return {(r["url"], r["offset"], r["uri"]) for r in
                df.filter(F.col("uri") != "").collect()}

    agg = disambiguate.disambiguate_agg(cands)
    app = disambiguate.disambiguate_apply(cands)
    expected = key_set(best_local)
    assert key_set(agg) == expected
    assert key_set(app) == expected


def test_sentinel_rows_cover_all_docs(spark, pages60, pages60_df):
    annotated = annotate.annotate_pages(spark, pages60_df, fixtures.gazetteer())
    _, doc_words = annotate.split_mentions(annotated)
    assert doc_words.count() == len(pages60)
