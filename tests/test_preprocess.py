"""P1-P6 unit tests: byte-identical text invariant + offset window."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import fixtures, ref_semantics as R
from pysemanticcomplexity_spark.operators import preprocess as P


def test_clean_text_byte_identical(spark, pages60, pages60_df):
    """input_hint per-row invariant: cleaned text must equal the reference's
    clean_text byte-for-byte (text.py:12-14,29-30)."""
    got = {r["url"]: r["text_clean"]
           for r in P.with_clean_text(pages60_df).select("url", "text_clean").collect()}
    for p in pages60:
        assert got[p["url"]] == R.clean_text(p["text"]), p["url"]


def test_clean_excludes_0x9f_and_tab_newline():
    # range(0x80, 0x9f) excludes \x9f; \x0a (newline) is preserved
    assert R.clean_text("a\x9fb") == "a\x9fb"
    assert R.clean_text("a\nb") == "a\nb"
    assert R.clean_text("a\tb") == "a b"
    assert R.clean_text("a\x00\x08\x0b\x1f\x80\x9eb") == "a      b"


def test_paragraphs_match_reference(spark, pages60, pages60_df):
    got = {}
    for r in P.paragraphs(pages60_df).collect():
        got.setdefault(r["url"], []).append((r["para_idx"], r["para"]))
    for p in pages60:
        ref = R.process_to_paragraphs(p["text"])
        mine = [para for _, para in sorted(got.get(p["url"], []))]
        assert mine == ref, p["url"]


def test_offset_base_window(spark, pages60, pages60_df):
    """P6: offset_base = sum of lengths of previous kept paragraphs."""
    got = {(r["url"], r["para"]): r["offset_base"]
           for r in P.paragraphs_with_offsets(pages60_df).collect()}
    for p in pages60:
        ref = R.process_to_paragraphs(p["text"])
        base = 0
        for para in ref:
            assert got[(p["url"], para)] == base
            base += len(para)


def test_doc_word_counts(spark, pages60, pages60_df):
    from pysemanticcomplexity_spark.treebank import count_words
    got = {r["url"]: r["nb_words"] for r in P.doc_word_counts(pages60_df).collect()}
    assert len(got) == len(pages60)
    for p in pages60:
        paras = R.process_to_paragraphs(p["text"])
        expected = sum(count_words(x) for x in paras) if paras else 0
        assert got[p["url"]] == expected, p["url"]


def test_filter_strictly_greater(spark):
    df = spark.createDataFrame(
        [("u", "x" * 150 + "\n\n" + "y" * 151)], "url string, text string")
    rows = P.paragraphs(df).collect()
    assert len(rows) == 1 and rows[0]["para"] == "y" * 151


def test_scan_prunes_columns(spark, pages60_df, tmp_path):
    """Column pruning must reach the parquet scan: ReadSchema excludes html."""
    path = str(tmp_path / "pages")
    pages60_df.write.parquet(path)
    plan = (P.paragraphs(spark.read.parquet(path))
            ._jdf.queryExecution().executedPlan().toString())
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "html" not in read_schema[0]
    assert "url" in read_schema[0] and "text" in read_schema[0]
