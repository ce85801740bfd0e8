"""Text-analysis operators: language-ID, quality, fingerprint."""
import pytest

from pysemanticcomplexity_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and it is a good day for the dog"),
        (1, "le chat est sur la table et il est un bon jour pour les chiens"),
        (2, "xyzzy qwerty asdf"),
        (3, ""),
        (4, "a!!! b??? ### $$$ %%%"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id(spark, docs):
    out = {r["id"]: r["lang_pred"] for r in textstats.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "fr"
    assert out[2] == "und"
    assert out[3] == "und"


def test_quality_score_bounds(spark, docs):
    for r in textstats.quality_score(docs).collect():
        assert 0.0 <= r["score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    rows = {r["id"]: r for r in textstats.quality_score(docs).collect()}
    assert rows[0]["score"] > rows[4]["score"]   # punct noise hurts
    assert rows[0]["n_tokens"] == 15


def test_fingerprint_golden(spark, docs):
    """fp must equal the hand-rolled polynomial hash."""
    def py_fp(text):
        acc = 0
        for ch in text:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc
    out = {r["id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    for i, text in [(0, "the cat sat on the mat and it is a good day for the dog"),
                    (2, "xyzzy qwerty asdf"), (3, "")]:
        assert out[i] == py_fp(text), i
