"""Syntactic-complexity operators: text -> constituency trees -> the 23
L2SCA features, Spark-first.

Reference chain (``parsers/syntactic/stanford.py:50-61``): text ->
Stanford LexicalizedParser (vendored Java, absent here) -> Penn trees ->
13 Tregex counts (``-C -o``) -> count merge -> ratio block.  Exactly as
the gazetteer annotator replaces DBpedia Spotlight for S7 and the
rule-table tagger replaces the Stanford POS tagger for L2, this module
splits the chain at the reference's own seam:

* :func:`det_parse` — a DETERMINISTIC approximate constituency parser
  (rule-table tagger from :mod:`operators.pos_lexical` + a cascaded
  chunker: NP/PP/VP/ADJP/ADVP chunks, SBAR subordination with
  recursion, phrase- and clause-level coordination, S/FRAG sentence
  labels).  Documented approximation: it is NOT a treebank-accurate
  parser; it is a deterministic tree source so the full pipeline runs
  with zero vendored jars.  Users with real parser output feed Penn
  strings straight into :func:`syntactic_features_from_penn` (parse
  once with any constituency parser, store the trees, compute at scale
  — the natural 100 TB shape) and get reference-exact semantics from
  the Tregex engine in :mod:`pysemanticcomplexity_spark.tregex`.
* :func:`text_syntactic_features` — the fused Spark operator: ONE
  mapInPandas over the documents scan (row-local, shuffle-free,
  streaming-legal); patterns are compiled once per executor at module
  import, every batch is pure per-document compute.  At 100 TB this is
  scan + map, embarrassingly parallel, zero exchanges.

The TEMPLATE corpus at the bottom backs the ``L3_syntactic`` registry
entry MM2-style: trees are chosen from a fixed template library purely
by ``doc_id`` arithmetic, so the DuckDB oracle re-derives the node
table from literals and re-implements all 13 Tregex patterns
independently in SQL (recursive CTE for dominance) — a genuine
cross-engine check of the pattern matcher.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Iterator, List, Optional, Sequence, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..tregex import (Node, SYNTACTIC_FEATURES, head_child, parse_penn,
                      syntactic_features, to_penn)
from .pos_lexical import (FEATURE_COLUMNS as LEX_FEATURE_COLUMNS,
                          SENTENCE_SPLIT_RE, TOKEN_RE, _DEFAULT_TAG,
                          _TAG_RULES)

import re

__all__ = [
    "tag_word", "det_parse", "parse_trees_df", "syntactic_features_from_penn",
    "text_syntactic_features", "SYN_COLUMNS", "TEMPLATES",
    "template_indices", "template_trees", "template_node_rows",
    "template_word_counts", "template_counts_sql", "node_rows",
    "synlex_vectors", "clean_joined_text", "SYNLEX_CSV_COLUMNS",
]

# sanitized column names for the 23 features (registry/SQL-safe; the CLI
# maps them back to the reference's exact CSV header incl. "C/S" forms)
SYN_COLUMNS = ["w", "s", "vp", "c", "t", "dc", "ct", "cp", "cn",
               "mls", "mlt", "mlc", "c_s", "vp_t", "c_t", "dc_c", "dc_t",
               "t_s", "ct_t", "cp_t", "cp_c", "cn_t", "cn_c"]
_N_COUNTS = 9  # w..cn are counts; the rest are ratios

_TOKEN_PAT = re.compile(TOKEN_RE)
_SENT_PAT = re.compile(SENTENCE_SPLIT_RE)


# ---------------------------------------------------------------------------
# plain-Python interpretation of the shared L2 rule table (single source
# of truth with pos_tag's Spark Columns and tagger_sql's DuckDB CASE)

@lru_cache(maxsize=65536)
def tag_word(w: str) -> str:
    """The rule-table tag (lowercase) of one ``[a-z0-9]+`` token —
    byte-identical semantics to ``pos_lexical._tag_column``.  Pure in
    the word, so memoized (bounded) — real corpora are Zipfian and the
    rule scan dominates the chunker otherwise."""
    for kind, arg, tag in _TAG_RULES:
        if kind == "regex":
            if re.search(arg, w):
                return tag
        elif kind == "word":
            if w in arg:
                return tag
        elif kind == "suffix":
            suf, min_len = arg
            if w.endswith(suf) and len(w) >= min_len:
                return tag
        elif kind == "suffixes":
            sufs, min_len = arg
            if len(w) >= min_len and any(w.endswith(s) for s in sufs):
                return tag
        else:  # plural
            if (w.endswith("s") and not w.endswith(("ss", "us", "is"))
                    and len(w) >= 4):
                return tag
    return _DEFAULT_TAG


# PARSER-LOCAL verb lexicon (the shared L2 rule table stays untouched —
# its oracle pins it): common base verbs and irregular pasts so real text
# grows finite VPs.  Standard English vocabulary — public knowledge.
_COMMON_VERBS = frozenset(
    "go see make take eat know think say want need use work call try ask "
    "feel seem look give tell find get come put mean keep let begin help "
    "talk turn start show hear move like live believe hold bring happen "
    "write provide sit stand lose pay meet include continue set learn "
    "change lead understand watch follow stop create speak read allow "
    "add spend grow open walk win offer remember love consider appear "
    "buy wait serve die send expect build stay fall cut reach remain "
    "run play".split())
_IRREGULAR_PAST = frozenset(
    "went saw made took ate knew thought said felt gave told found got "
    "came put meant kept began heard held brought wrote sat stood lost "
    "paid met set led understood spoke grew won bought sent built fell "
    "cut left ran spent read".split())

# finer verb forms than the L2 table needs: the clause patterns test
# MD|VBZ|VBP|VBD, so the closed be/have/do forms are mapped to their
# Penn finite tags (deterministic surface-form map)
_VERB_FORM = {
    "is": "VBZ", "am": "VBZ", "has": "VBZ", "does": "VBZ",
    "are": "VBP", "do": "VBP", "have": "VBP",
    "was": "VBD", "were": "VBD", "did": "VBD", "had": "VBD",
    "been": "VBN", "done": "VBN",
    "being": "VBG", "having": "VBG", "doing": "VBG",
    "be": "VB",
}
_PENN_TAG = {"cd": "CD", "md": "MD", "dt": "DT", "prp": "PRP", "cc": "CC",
             "in": "IN", "rb": "RB", "vbg": "VBG", "vbd": "VBD",
             "jj": "JJ", "nns": "NNS", "nn": "NN"}

_WH_TAGS = {"which": "WDT", "who": "WP", "whom": "WP", "whose": "WP$"}
_SUBORDINATORS = frozenset(
    "because although while if that since when where whether though "
    "unless until before after why how".split())

_NP_TAGS = frozenset(["DT", "JJ", "CD", "NN", "NNS"])
_VERB_TAGS = frozenset(["MD", "VB", "VBZ", "VBP", "VBD", "VBN", "VBG"])
_FINITE = frozenset(["MD", "VBZ", "VBP", "VBD"])
_COORD_LABELS = frozenset(["NP", "VP", "ADJP", "ADVP"])


def _penn_tag(w: str) -> str:
    t = tag_word(w)
    if t == "vb":
        return _VERB_FORM.get(w, "VB")
    if t == "nn":
        if w in _IRREGULAR_PAST:
            return "VBD"
        if w in _COMMON_VERBS:
            return "VBP"
    if t == "nns" and w[:-1] in _COMMON_VERBS:
        return "VBZ"
    return _PENN_TAG[t]


def _pre(tag: str, word: str) -> Node:
    return Node(tag, [Node(word)])


def _has_finite_vp(node: Node) -> bool:
    # iterative: coordination chains in run-on crawl text nest deeper
    # than the Python recursion limit
    stack = [node]
    while stack:
        nd = stack.pop()
        if nd.label == "VP":
            h = head_child(nd)
            if h is not None and h.label in _FINITE:
                return True
        stack.extend(nd.children)
    return False


def _parse_chunks(toks: Sequence[Tuple[str, str]]) -> List[Node]:
    """One cascaded pass over (word, PennTag) pairs -> chunk list.
    SBAR opens at a non-initial wh-word/subordinator and consumes the
    rest of the token stream, attaching into an open VP when one
    precedes.  Nesting is handled with an explicit frame stack (not
    Python recursion, which crawl junk full of subordinators would
    overflow) producing the identical tree: each subordinator freezes
    the enclosing clause's (chunks, open VP, opener) and starts a fresh
    clause; the unwind at end-of-tokens folds each inner clause into an
    SBAR emitted into its enclosing frame, innermost first.  Documented
    approximation: no clause-boundary detection beyond sentence splits."""
    out: List[Node] = []
    open_vp: Optional[Node] = None
    frames: List[Tuple[List[Node], Optional[Node], Node]] = []
    clause_start = 0
    i = 0
    n = len(toks)

    def emit(ch: Node, into_vp: bool) -> None:
        nonlocal open_vp
        if into_vp and open_vp is not None:
            ch.parent = open_vp
            ch.idx = len(open_vp.children)
            open_vp.children.append(ch)
        else:
            out.append(ch)

    while i < n:
        w, tag = toks[i]
        if i > clause_start and (w in _WH_TAGS or w in _SUBORDINATORS):
            if w in _WH_TAGS:
                opener = Node("WHNP", [_pre(_WH_TAGS[w], w)])
            else:
                opener = _pre("IN", w)
            frames.append((out, open_vp, opener))
            out, open_vp = [], None
            clause_start = i + 1
            i += 1
            continue
        if tag in _VERB_TAGS:
            vg = [_pre(tag, w)]
            i += 1
            while i < n and toks[i][1] in (_VERB_TAGS | {"RB"}):
                vg.append(_pre(toks[i][1], toks[i][0]))
                i += 1
            vp = Node("VP", vg)
            emit(vp, into_vp=False)
            open_vp = vp
            continue
        if tag in _NP_TAGS or tag == "PRP":
            if tag == "PRP":
                np = Node("NP", [_pre("PRP", w)])
                i += 1
            else:
                grp = []
                while i < n and toks[i][1] in _NP_TAGS:
                    grp.append(_pre(toks[i][1], toks[i][0]))
                    i += 1
                np = Node("NP", grp)
            emit(np, into_vp=True)
            continue
        if tag == "IN":
            j = i + 1
            np_kids = []
            if j < n and toks[j][1] == "PRP":
                np_kids = [_pre("PRP", toks[j][0])]
                j += 1
            else:
                while j < n and toks[j][1] in _NP_TAGS:
                    np_kids.append(_pre(toks[j][1], toks[j][0]))
                    j += 1
            kids: List[Node] = [_pre("IN", w)]
            if np_kids:
                kids.append(Node("NP", np_kids))
            emit(Node("PP", kids), into_vp=True)
            i = j
            continue
        if tag == "RB":
            emit(Node("ADVP", [_pre("RB", w)]), into_vp=True)
            i += 1
            continue
        if tag == "JJ":
            emit(Node("ADJP", [_pre("JJ", w)]), into_vp=True)
            i += 1
            continue
        if tag == "CC":
            emit(_pre("CC", w), into_vp=False)
            open_vp = None
            i += 1
            continue
        # CD outside an NP run, or anything unexpected: bare NP
        # (MD never reaches here — it is in _VERB_TAGS)
        emit(Node("NP", [_pre(tag, w)]), into_vp=True)
        i += 1

    # unwind nested clauses: innermost chunks become (SBAR opener (S ...))
    # emitted into the enclosing frame exactly as the recursive form did
    chunks = _coordinate(out)
    while frames:
        out, open_vp, opener = frames.pop()
        if chunks:
            sbar = Node("SBAR", [opener, Node("S", chunks)])
        else:
            sbar = Node("SBAR", [opener])
        emit(sbar, into_vp=True)
        chunks = _coordinate(out)
    return chunks


def _coordinate(chunks: List[Node]) -> List[Node]:
    """Merge X CC X neighbours (same label in NP/VP/ADJP/ADVP) into a
    coordinated phrase — the structure the CP pattern counts.  Single
    shift-reduce pass: reducing the top of the stack whenever the last
    three items form X CC X yields the same left-nested tree as the
    leftmost-first restart scan, in O(n) instead of O(n^2) (a run-on
    crawl sentence can hold tens of thousands of conjuncts)."""
    res: List[Node] = []
    for c in chunks:
        res.append(c)
        while (len(res) >= 3 and res[-2].label == "CC"
               and res[-1].label == res[-3].label
               and res[-1].label in _COORD_LABELS):
            b = res.pop()
            cc = res.pop()
            a = res.pop()
            res.append(Node(a.label, [a, cc, b]))
    return res


def _clause_split(chunks: List[Node]) -> List[Node]:
    """Clause-level coordination: if top-level CCs separate segments
    that each contain a VP, wrap the segments in S nodes (the shape the
    T-unit pattern's ``$--`` branch counts)."""
    cc_pos = [k for k, c in enumerate(chunks) if c.label == "CC"]
    if not cc_pos:
        return chunks
    segments: List[List[Node]] = []
    bounds = [-1] + cc_pos + [len(chunks)]
    for a, b in zip(bounds, bounds[1:]):
        segments.append(chunks[a + 1:b])
    if sum(1 for seg in segments
           if any(ch.label == "VP" for ch in seg)) < 2:
        return chunks
    out: List[Node] = []
    for k, seg in enumerate(segments):
        if k:
            out.append(chunks[cc_pos[k - 1]])
        if seg:
            out.append(Node("S", seg))
    return out


def det_parse(text: str) -> List[Node]:
    """Deterministic approximate constituency parse: one (ROOT (S|FRAG
    ...)) per ``[.!?;]+`` sentence of the lowercased text, tokens
    ``[a-z0-9]+`` (the shared P5/T1/L1/L2 token model)."""
    roots: List[Node] = []
    for raw in _SENT_PAT.split(text.lower()):
        words = _TOKEN_PAT.findall(raw)
        if not words:
            continue
        toks = [(w, _penn_tag(w)) for w in words]
        chunks = _clause_split(_parse_chunks(toks))
        label = "S" if any(_has_finite_vp(c) for c in chunks) else "FRAG"
        sent = Node(label, chunks)
        roots.append(Node("ROOT", [sent]))
    return roots


# ---------------------------------------------------------------------------
# Spark operators

def parse_trees_df(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """text -> (id, penn): the deterministic parser as ONE mapInPandas
    over the scan — row-local, shuffle-free, streaming-legal.  Column
    pruning reaches the parquet scan (only id+text read)."""
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col)
                      .alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            penn = [
                "\n".join(to_penn(t) for t in det_parse(x or ""))
                for x in b["text"]
            ]
            yield pd.DataFrame({"id": b["id"], "penn": penn})

    id_t = src.schema["id"].dataType.simpleString()
    return src.mapInPandas(gen, schema=f"id {id_t}, penn string")


def _features_frame(ids, penns) -> pd.DataFrame:
    rows = [syntactic_features(parse_penn(p), penn_text=p) for p in penns]
    cols = {"id": ids}
    for j, name in enumerate(SYN_COLUMNS):
        vals = [r[j] for r in rows]
        if j < _N_COUNTS:
            cols[name] = pd.Series(vals, dtype="int64")
        else:
            cols[name] = pd.Series([round(v, 9) for v in vals],
                                   dtype="float64")
    return pd.DataFrame(cols)


def _syn_schema(src: DataFrame) -> str:
    """Output schema, keyed by whatever type the id column carries
    (doc_id BIGINT in the registry, url STRING in the CLI)."""
    id_t = src.schema["id"].dataType.simpleString()
    return (f"id {id_t}, " +
            ", ".join(f"{c} long" for c in SYN_COLUMNS[:_N_COUNTS]) +
            ", " +
            ", ".join(f"{c} double" for c in SYN_COLUMNS[_N_COUNTS:]))


def syntactic_features_from_penn(trees_df: DataFrame, id_col: str = "id",
                                 penn_col: str = "penn") -> DataFrame:
    """Penn-tree column -> the 23 L2SCA features (reference-exact
    pattern/merge/ratio semantics; ``division`` -> 0 on zero operands,
    stanford.py:84-87).  Counts are BIGINT, ratios DOUBLE rounded to 9.
    One mapInPandas, row-local: the scale path for pre-parsed corpora."""
    src = trees_df.select(F.col(id_col).alias("id"),
                          F.col(penn_col).alias("penn"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _features_frame(b["id"], b["penn"])

    return src.mapInPandas(gen, schema=_syn_schema(src))


def text_syntactic_features(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Fused text -> trees -> features in ONE kernel (no intermediate
    penn materialization): the flagship syntactic operator.  Plan shape:
    scan -> MapInPandas, zero exchanges."""
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col)
                      .alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            penns = ["\n".join(to_penn(t) for t in det_parse(x or ""))
                     for x in b["text"]]
            yield _features_frame(b["id"], penns)

    return src.mapInPandas(gen, schema=_syn_schema(src))


# ---------------------------------------------------------------------------
# template corpus for the cross-engine L3 oracle (MM2 pattern: derived
# from doc_id alone, so DuckDB reconstructs it without running Python)

# each template = one or more Penn trees; together they exercise every
# one of the 13 patterns (coordination, subordination, WH-relatives,
# imperatives, fragments, SQ inversion, gerund subjects)
TEMPLATES: Tuple[Tuple[str, ...], ...] = (
    # 0: simple copular clause
    ("(ROOT (S (NP (DT the) (NN cat)) (VP (VBZ is) (ADJP (JJ happy)))))",),
    # 1: coordinated independent clauses (2 T-units)
    ("(ROOT (S (S (NP (PRP he)) (VP (VBD left))) (CC and) "
     "(S (NP (PRP she)) (VP (VBD cried)))))",),
    # 2: object complement clause (DC, CT, CN2 via IN-that SBAR under VP)
    ("(ROOT (S (NP (PRP he)) (VP (VBD said) (SBAR (IN that) "
     "(S (NP (PRP they)) (VP (VBD won) (NP (DT the) (NN game))))))))",),
    # 3: WH relative clause before the main VP (CN2 via WHNP head + $+ VP)
    ("(ROOT (S (NP (DT the) (NN dog)) (SBAR (WHNP (WDT which)) "
     "(S (VP (VBD barked)))) (VP (VBZ is) (NP (DT a) (JJ good) "
     "(NN dog)))))",),
    # 4: coordinate noun phrase + PP complement (CP, CN1 via << JJ)
    ("(ROOT (S (NP (NP (NNS dogs)) (CC and) (NP (NNS cats))) "
     "(VP (VBP play) (PP (IN in) (NP (DT the) (JJ big) (NN park))))))",),
    # 5: imperative + fragment (clause via <, VP<#VB; FC/FT)
    ("(ROOT (S (VP (VB be) (ADJP (JJ quiet)))))",
     "(ROOT (FRAG (NP (DT the) (JJ red) (NN ball))))"),
    # 6: SQ inversion (VP2 pattern; SQ clause/T-unit)
    ("(ROOT (SQ (VBZ is) (NP (PRP it)) (ADJP (JJ true))))",),
    # 7: gerund-subject complex nominal (CN3)
    ("(ROOT (S (S (VP (VBG swimming))) (VP (VBZ is) (ADJP (JJ fun)))))",),
)

_N_TEMPLATES = len(TEMPLATES)
_TEMPLATE_TREES = [parse_penn("\n".join(t)) for t in TEMPLATES]


def template_indices(doc_id: int) -> List[int]:
    """Which templates document ``doc_id`` gets — pure arithmetic so the
    DuckDB oracle derives the same assignment in SQL:
    ``1 + doc_id % 4`` trees, slot j -> ``(doc_id*3 + j*5) % 8``."""
    return [(doc_id * 3 + j * 5) % _N_TEMPLATES
            for j in range(1 + doc_id % 4)]


def template_trees(doc_id: int) -> Tuple[List[Node], str]:
    """(trees, penn_text) of the template document for ``doc_id``."""
    penn = "\n".join("\n".join(TEMPLATES[k])
                     for k in template_indices(doc_id))
    return parse_penn(penn), penn


def node_rows(tree_groups: Sequence[Sequence[Node]]
              ) -> List[Tuple[int, int, Optional[int], int, str,
                              bool, bool]]:
    """Tree groups -> node table rows
    (tmpl, id, parent_id, idx, label, is_leaf, is_head).  ``is_head`` is
    the Collins head-daughter flag; node ids are pre-order within a
    group, roots have NULL parent."""
    rows: List[Tuple[int, int, Optional[int], int, str, bool, bool]] = []
    for tmpl, trees in enumerate(tree_groups):
        counter = [0]

        def walk(node: Node, parent_id: Optional[int]) -> None:
            # iterative pre-order (deep trees exceed the recursion limit)
            stack: List[Tuple[Node, Optional[int]]] = [(node, parent_id)]
            while stack:
                nd, pid = stack.pop()
                nid = counter[0]
                counter[0] += 1
                head = (nd.parent is not None
                        and head_child(nd.parent) is nd)
                rows.append((tmpl, nid, pid, nd.idx, nd.label,
                             nd.is_leaf, head))
                stack.extend((c, nid) for c in reversed(nd.children))

        for root in trees:
            walk(root, None)
    return rows


def template_node_rows() -> List[Tuple[int, int, Optional[int], int, str,
                                       bool, bool]]:
    """The template library as a node table, inlined as a VALUES literal
    by the L3 oracle (head flags pinned by the head-finder golden
    tests)."""
    return node_rows(_TEMPLATE_TREES)


def template_word_counts() -> List[int]:
    """Per-template W (the reference's uppercase-tag terminal regex over
    the Penn string).  The templates contain only single-leaf
    preterminals with ``[A-Z]+\\$?`` tags, so this equals the SQL
    oracle's preterminal count — asserted by tests."""
    from ..tregex import WORD_COUNT_RE
    return [len(WORD_COUNT_RE.findall("\n".join(t))) for t in TEMPLATES]


# ---------------------------------------------------------------------------
# the independent SQL re-implementation of the 13 Tregex patterns for the
# DuckDB oracle.  Hand-translated from the PATTERN STRINGS (not from the
# Python matcher), so the two engines share nothing but the node table —
# a genuine cross-check of relation semantics, grouping/precedence, head
# flags, and the -C -o counting model.

_FINITE_SQL = "('MD', 'VBZ', 'VBP', 'VBD')"


class _Alias:
    """Fresh SQL aliases so nested EXISTS never collide."""

    def __init__(self):
        self.n = 0

    def __call__(self, stem: str) -> str:
        self.n += 1
        return f"{stem}{self.n}"


def _clause_body_sql(x: str, al: _Alias) -> str:
    """The bracketed body of the L2SCA clause pattern, for node ``x``:
    ``[> ROOT <, (VP <# VB) | <# MD|VBZ|VBP|VBD | < (VP [<# finite |
    < CC < (VP <# finite)])]``."""
    p, fc, h0, h1, v, h2, cc, vv, h3 = (al("p"), al("fc"), al("h"),
                                        al("h"), al("v"), al("h"),
                                        al("cc"), al("vv"), al("h"))
    return f"""(
      (EXISTS (SELECT 1 FROM nodes {p} WHERE {p}.tmpl = {x}.tmpl
               AND {p}.id = {x}.parent AND {p}.label = 'ROOT')
       AND EXISTS (SELECT 1 FROM nodes {fc} WHERE {fc}.tmpl = {x}.tmpl
               AND {fc}.parent = {x}.id AND {fc}.idx = 0
               AND {fc}.label = 'VP'
               AND EXISTS (SELECT 1 FROM nodes {h0}
                           WHERE {h0}.tmpl = {fc}.tmpl
                           AND {h0}.parent = {fc}.id AND {h0}.is_head
                           AND {h0}.label = 'VB')))
      OR EXISTS (SELECT 1 FROM nodes {h1} WHERE {h1}.tmpl = {x}.tmpl
               AND {h1}.parent = {x}.id AND {h1}.is_head
               AND {h1}.label IN {_FINITE_SQL})
      OR EXISTS (SELECT 1 FROM nodes {v} WHERE {v}.tmpl = {x}.tmpl
               AND {v}.parent = {x}.id AND {v}.label = 'VP' AND (
            EXISTS (SELECT 1 FROM nodes {h2} WHERE {h2}.tmpl = {v}.tmpl
                    AND {h2}.parent = {v}.id AND {h2}.is_head
                    AND {h2}.label IN {_FINITE_SQL})
            OR (EXISTS (SELECT 1 FROM nodes {cc} WHERE {cc}.tmpl = {v}.tmpl
                        AND {cc}.parent = {v}.id AND {cc}.label = 'CC')
                AND EXISTS (SELECT 1 FROM nodes {vv}
                        WHERE {vv}.tmpl = {v}.tmpl
                        AND {vv}.parent = {v}.id AND {vv}.label = 'VP'
                        AND EXISTS (SELECT 1 FROM nodes {h3}
                                WHERE {h3}.tmpl = {vv}.tmpl
                                AND {h3}.parent = {vv}.id AND {h3}.is_head
                                AND {h3}.label IN {_FINITE_SQL}))))))"""


def _parent_label_sql(x: str, labels: str, al: _Alias) -> str:
    p = al("p")
    return (f"EXISTS (SELECT 1 FROM nodes {p} WHERE {p}.tmpl = {x}.tmpl "
            f"AND {p}.id = {x}.parent AND {p}.label IN {labels})")


def _tunit_def_sql(x: str, al: _Alias) -> str:
    """The T-unit pattern for node ``x``: ``S|SBARQ|SINV|SQ > ROOT |
    [$-- S|SBARQ|SINV|SQ !>> SBAR|VP]``."""
    sib, an = al("sib"), al("an")
    return f"""({x}.label IN ('S', 'SBARQ', 'SINV', 'SQ') AND (
      {_parent_label_sql(x, "('ROOT')", al)}
      OR (EXISTS (SELECT 1 FROM nodes {sib} WHERE {sib}.tmpl = {x}.tmpl
                  AND {sib}.parent = {x}.parent AND {sib}.idx < {x}.idx
                  AND {sib}.label IN ('S', 'SBARQ', 'SINV', 'SQ'))
          AND NOT EXISTS (SELECT 1 FROM anc {an}
                  JOIN nodes an_n ON an_n.tmpl = {an}.tmpl
                       AND an_n.id = {an}.anc_id
                  WHERE {an}.tmpl = {x}.tmpl AND {an}.node_id = {x}.id
                  AND an_n.label IN ('SBAR', 'VP')))))"""


def _desc_sql(x: str, cond_fn, al: _Alias) -> str:
    """EXISTS a proper descendant d of x with cond_fn(d)."""
    a, d = al("a"), al("d")
    return (f"EXISTS (SELECT 1 FROM anc {a} JOIN nodes {d} "
            f"ON {d}.tmpl = {a}.tmpl AND {d}.id = {a}.node_id "
            f"WHERE {a}.tmpl = {x}.tmpl AND {a}.anc_id = {x}.id "
            f"AND ({cond_fn(d)}))")


def template_counts_sql(rows=None) -> str:
    """WITH-clause body (``nodes``, ``anc``, ``tc``, ``merged``) computing
    per-template [w, s, vp, c, t, dc, ct, cp, cn] in pure SQL from the
    inlined node table (default: the template library; tests pass
    :func:`node_rows` of arbitrary trees for the property-based
    cross-check).  Compose with ``WITH RECURSIVE`` + a doc assignment
    CTE (see the L3 oracle in ``__spark_entry__``), or run standalone
    via ``SELECT * FROM merged``."""
    if rows is None:
        rows = template_node_rows()
    vals = ",\n    ".join(
        f"({t}, {i}, {'NULL' if p is None else p}, {ix}, "
        f"'{lb}', {str(bool(lf)).upper()}, {str(bool(hd)).upper()})"
        for t, i, p, ix, lb, lf, hd in rows)

    al = _Alias()
    x = "x"
    # the 13 patterns, same order as L2SCA_PATTERN_STRINGS
    p_s = f"{x}.label = 'ROOT'"
    _ssq = "('S', 'SINV', 'SQ')"
    p_vp = (f"{x}.label = 'VP' AND "
            f"{_parent_label_sql(x, _ssq, al)}")
    p_c = (f"{x}.label IN ('S', 'SINV', 'SQ') AND "
           f"{_clause_body_sql(x, al)}")
    p_t = _tunit_def_sql(x, al)

    def dc_inner(d):
        a2 = al("s")
        return (f"{d}.label = 'SBAR' AND EXISTS (SELECT 1 FROM nodes {a2} "
                f"WHERE {a2}.tmpl = {d}.tmpl AND {a2}.parent = {d}.id "
                f"AND {a2}.label IN ('S', 'SINV', 'SQ') "
                f"AND {_clause_body_sql(a2, al)})")

    p_dc = dc_inner(x)
    p_ct = f"{_tunit_def_sql(x, al)} AND {_desc_sql(x, dc_inner, al)}"
    cc1 = al("cc")
    p_cp = (f"{x}.label IN ('ADJP', 'ADVP', 'NP', 'VP') AND EXISTS "
            f"(SELECT 1 FROM nodes {cc1} WHERE {cc1}.tmpl = {x}.tmpl "
            f"AND {cc1}.parent = {x}.id AND {cc1}.label = 'CC')")

    def cn1_inner(d):
        s2, ns = al("s"), al("ns")
        return (f"{d}.label = 'NP' AND EXISTS (SELECT 1 FROM nodes {s2} "
                f"WHERE {s2}.tmpl = {d}.tmpl AND {s2}.parent = {d}.parent "
                f"AND {s2}.idx > {d}.idx AND {s2}.label = 'NP') "
                f"AND NOT EXISTS (SELECT 1 FROM nodes {ns} "
                f"WHERE {ns}.tmpl = {d}.tmpl AND {ns}.parent = {d}.parent "
                f"AND {ns}.idx = {d}.idx + 1 AND {ns}.label = 'CC')")

    _np = "('NP')"
    p_cn1 = (f"{x}.label = 'NP' "
             f"AND NOT {_parent_label_sql(x, _np, al)} AND ("
             + _desc_sql(
                 x, lambda d: f"{d}.label IN "
                 "('JJ', 'POS', 'PP', 'S', 'VBG')", al)
             + f" OR {_desc_sql(x, cn1_inner, al)})")
    hw, hi, wl, fcs, nsb, pv = (al("h"), al("h"), al("w"), al("fc"),
                                al("ns"), al("p"))
    p_cn2 = f"""{x}.label = 'SBAR' AND (
      EXISTS (SELECT 1 FROM nodes {hw} WHERE {hw}.tmpl = {x}.tmpl
              AND {hw}.parent = {x}.id AND {hw}.is_head
              AND {hw}.label = 'WHNP')
      OR EXISTS (SELECT 1 FROM nodes {hi} WHERE {hi}.tmpl = {x}.tmpl
              AND {hi}.parent = {x}.id AND {hi}.is_head
              AND {hi}.label = 'IN'
              AND EXISTS (SELECT 1 FROM nodes {wl}
                      WHERE {wl}.tmpl = {hi}.tmpl
                      AND {wl}.parent = {hi}.id
                      AND {wl}.label IN ('That', 'that', 'For', 'for')))
      OR EXISTS (SELECT 1 FROM nodes {fcs} WHERE {fcs}.tmpl = {x}.tmpl
              AND {fcs}.parent = {x}.id AND {fcs}.idx = 0
              AND {fcs}.label = 'S')
    ) AND (
      EXISTS (SELECT 1 FROM nodes {nsb} WHERE {nsb}.tmpl = {x}.tmpl
              AND {nsb}.parent = {x}.parent AND {nsb}.idx = {x}.idx + 1
              AND {nsb}.label = 'VP')
      OR EXISTS (SELECT 1 FROM nodes {pv} WHERE {pv}.tmpl = {x}.tmpl
              AND {pv}.id = {x}.parent AND {pv}.label = 'VP'))"""
    v3, h4, ns3 = al("v"), al("h"), al("ns")
    p_cn3 = f"""{x}.label = 'S'
      AND EXISTS (SELECT 1 FROM nodes {v3} WHERE {v3}.tmpl = {x}.tmpl
              AND {v3}.parent = {x}.id AND {v3}.label = 'VP'
              AND EXISTS (SELECT 1 FROM nodes {h4}
                      WHERE {h4}.tmpl = {v3}.tmpl
                      AND {h4}.parent = {v3}.id AND {h4}.is_head
                      AND {h4}.label IN ('VBG', 'TO')))
      AND EXISTS (SELECT 1 FROM nodes {ns3} WHERE {ns3}.tmpl = {x}.tmpl
              AND {ns3}.parent = {x}.parent AND {ns3}.idx = {x}.idx + 1
              AND {ns3}.label = 'VP')"""

    def fc_inner(d):
        return (f"{d}.label IN ('S', 'SINV', 'SQ') AND "
                f"{_clause_body_sql(d, al)}")

    _root = "('ROOT')"
    p_fc = (f"{x}.label = 'FRAG' AND "
            f"{_parent_label_sql(x, _root, al)} "
            f"AND NOT {_desc_sql(x, fc_inner, al)}")
    p_ft = (f"{x}.label = 'FRAG' AND "
            f"{_parent_label_sql(x, _root, al)} "
            f"AND NOT {_desc_sql(x, lambda d: _tunit_def_sql(d, al), al)}")
    sq, vc = al("p"), al("c")
    p_vp2 = (f"{x}.label IN {_FINITE_SQL} AND EXISTS "
             f"(SELECT 1 FROM nodes {sq} WHERE {sq}.tmpl = {x}.tmpl "
             f"AND {sq}.id = {x}.parent AND {sq}.label = 'SQ' "
             f"AND NOT EXISTS (SELECT 1 FROM nodes {vc} "
             f"WHERE {vc}.tmpl = {sq}.tmpl AND {vc}.parent = {sq}.id "
             f"AND {vc}.label = 'VP'))")
    lc = al("c")
    w_pre = (f"NOT {x}.is_leaf AND regexp_matches({x}.label, "
             f"'^[A-Z]+\\$?$') AND NOT EXISTS (SELECT 1 FROM nodes {lc} "
             f"WHERE {lc}.tmpl = {x}.tmpl AND {lc}.parent = {x}.id "
             f"AND NOT {lc}.is_leaf)")

    conds = [("w", w_pre), ("s", p_s), ("vp", p_vp), ("c", p_c),
             ("t", p_t), ("dc", p_dc), ("ct", p_ct), ("cp", p_cp),
             ("cn1", p_cn1), ("cn2", p_cn2), ("cn3", p_cn3),
             ("fc", p_fc), ("ft", p_ft), ("vp2", p_vp2)]
    sums = ",\n    ".join(
        f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS {name}"
        for name, cond in conds)
    return f"""nodes(tmpl, id, parent, idx, label, is_leaf, is_head) AS (
  VALUES
    {vals}),
anc(tmpl, node_id, anc_id) AS (
  SELECT tmpl, id, parent FROM nodes WHERE parent IS NOT NULL
  UNION ALL
  SELECT a.tmpl, a.node_id, n.parent FROM anc a
  JOIN nodes n ON n.tmpl = a.tmpl AND n.id = a.anc_id
  WHERE n.parent IS NOT NULL),
tc AS (
  SELECT x.tmpl,
    {sums}
  FROM nodes x GROUP BY x.tmpl),
merged AS (
  -- reference stanford.py:73-78 count merging
  SELECT tmpl, w, s, vp + vp2 AS vp, c + fc AS c, t + ft AS t,
         dc, ct, cp, cn1 + cn2 + cn3 AS cn
  FROM tc)"""


def l3_template_features(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """The L3 registry query: deterministic template trees per doc_id ->
    the REAL Tregex engine -> 23 features.  Cross-checked against the
    independent SQL re-implementation of the 13 patterns in the DuckDB
    oracle.  Plan: scan (id only, pruned) -> one MapInPandas."""
    src = docs.select(F.col(id_col).alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].astype("int64")
            penns = [template_trees(int(d))[1] for d in ids]
            yield _features_frame(ids, penns)

    return src.mapInPandas(gen, schema=_syn_schema(src))


# ---------------------------------------------------------------------------
# the synlex vector (texts2synLexVectors parity)

# the reference CSV header (stanfordSynLex.get_full_features_names:
# syntactic get_features() then lexical get_features()), minus the two
# unseeded-random lexical columns ndwerz/ndwesz (stanford.py:136-156 —
# irreproducible by design, excluded exactly as in operators/pos_lexical)
SYNLEX_CSV_COLUMNS = (["filename"] + SYNTACTIC_FEATURES
                      + list(LEX_FEATURE_COLUMNS))


def clean_joined_text(col: F.Column) -> F.Column:
    """The reference's synlex preprocation (stanfordSynLex.py:27):
    ``"\\n".join(TextPreprocessor.process_to_paragraphs(text))`` as one
    JVM expression — P1 control-char clean, P2 paragraph split, P3
    length filter, newline join."""
    from .preprocess import PARAGRAPH_THRESHOLD, clean_text_col
    return F.array_join(
        F.filter(F.split(clean_text_col(col), "\n\n"),
                 lambda p: F.length(p) > PARAGRAPH_THRESHOLD),
        "\n")


def synlex_vectors(docs: DataFrame, id_col: str = "url",
                   text_col: str = "text") -> DataFrame:
    """``texts2synLexVectors`` (subprograms/texts2synLexVectors.py:35-46,
    stanfordSynLex.dir_to_vectors) re-expressed Spark-first: cleaned text
    -> 23 syntactic features (deterministic parse + Tregex engine, one
    mapInPandas) joined with the 32 deterministic POS-lexical features
    (rule-table tagger, one aggregation pass) — columns in the
    reference's exact CSV order, ``filename`` carried from the id.

    Shape at scale: the syntactic side is scan+map (zero exchanges); the
    lexical side is explode -> broadcast joins -> ONE groupBy(id); the
    final join co-partitions two per-doc-row tables.
    """
    from .pos_lexical import pos_lexical_features, pos_tag
    cleaned = docs.select(F.col(id_col).alias("id"),
                          clean_joined_text(F.col(text_col)).alias("text"))
    syn = text_syntactic_features(cleaned, id_col="id", text_col="text")
    lex = pos_lexical_features(pos_tag(cleaned, id_col="id",
                                       text_col="text"))
    syn_named = syn.select(
        "id", *[F.col(c).alias(name) for c, name
                in zip(SYN_COLUMNS, SYNTACTIC_FEATURES)])
    # a doc whose cleaned text has no tokens has no tagged rows: left
    # join keeps it with NULL lexical features (the reference would have
    # raised ZeroDivisionError there; documented, ANSI-safe)
    return (syn_named.join(lex, "id", "left")
            .select(F.col("id").alias("filename"),
                    *SYNTACTIC_FEATURES, *LEX_FEATURE_COLUMNS))
