"""Pure-Python constituency-tree toolkit: Penn-bracket reader, Collins
head finder, a Tregex-subset matcher, and the L2SCA syntactic-complexity
feature computation.

This closes the reference's syntactic pipeline
(``parsers/syntactic/stanford.py:13-106``) WITHOUT its vendored Java
stack: the reference shells out to Stanford's LexicalizedParser for
trees and to ``edu.stanford.nlp.trees.tregex.TregexPattern`` with
``-C -o`` for pattern counts (``utils/stanfordResources.py:109-159``).
Here the trees arrive as a DataFrame column of Penn bracket strings
(parse once with any constituency parser, store, then compute at scale
— the natural 100 TB shape), or from the deterministic approximate
parser in :mod:`operators.syntactic`; the matcher below re-implements
the Tregex sublanguage the 13 L2SCA patterns use.

Counting semantics = the reference's exact flags (``-C -o``,
stanfordResources.py:128): a node is counted ONCE if the pattern can
match with that node as the root, no matter how many variable
assignments satisfy it — so :func:`count_matches` counts distinct
matching nodes.

Sources (all public):
* Tregex relation semantics — the Stanford TregexPattern javadoc
  (``<`` parent-of, ``>`` child-of, ``<<`` dominates, ``>>`` dominated,
  ``<,`` first child, ``<#`` immediate head, ``$+``/``$-`` immediate
  left/right sister, ``$++``/``$--`` left/right sister, ``!`` negation,
  ``[...]`` grouping, ``&`` conjunction binding tighter than ``|``).
* Head rules — Collins (1999) thesis appendix A as implemented by
  Stanford's CollinsHeadFinder (the head finder Tregex's ``<#`` uses).
* The 13 patterns + count merging + 23 features — Lu (2010), "Automatic
  analysis of syntactic complexity in second language writing" (L2SCA);
  reference ``parsers/syntactic/stanford.py:16-34`` (patterns),
  ``:66-78`` (merging), ``:82-106`` (ratios, ``division`` -> 0 on any
  zero operand), ``:36,63-64`` (word-count regex over the Penn string).
"""
from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence, Tuple

__all__ = [
    "Node", "parse_penn", "to_penn", "head_child", "TregexPattern",
    "count_matches", "L2SCA_PATTERNS", "SYNTACTIC_FEATURES",
    "syntactic_pattern_counts", "syntactic_features", "WORD_COUNT_RE",
]


# ---------------------------------------------------------------------------
# trees

class Node:
    """One constituency-tree node.  Leaves (words) have no children;
    preterminals (POS tags) have exactly one leaf child."""

    __slots__ = ("label", "children", "parent", "idx")

    def __init__(self, label: str, children: Optional[List["Node"]] = None):
        self.label = label
        self.children = children if children is not None else []
        self.parent: Optional[Node] = None
        self.idx = 0
        for i, c in enumerate(self.children):
            c.parent = self
            c.idx = i

    @property
    def is_leaf(self) -> bool:
        return not self.children

    def descendants(self) -> Iterable["Node"]:
        """Proper descendants, pre-order (iterative: the matcher visits
        every node under every candidate, so no yield-from chains)."""
        stack = self.children[::-1]
        while stack:
            n = stack.pop()
            yield n
            if n.children:
                stack.extend(n.children[::-1])

    def ancestors(self) -> Iterable["Node"]:
        n = self.parent
        while n is not None:
            yield n
            n = n.parent

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Node({to_penn(self)})"


_PENN_TOK = re.compile(r"\(|\)|[^\s()]+")


def parse_penn(text: str) -> List[Node]:
    """Parse a string of one or more Penn-bracket trees into roots.
    Tolerates arbitrary whitespace between/inside trees."""
    roots: List[Node] = []
    stack: List[Tuple[str, List[Node]]] = []
    toks = _PENN_TOK.findall(text)
    i, n = 0, len(toks)
    while i < n:
        tok = toks[i]
        if tok == "(":
            i += 1
            if i >= n or toks[i] in "()":
                raise ValueError("malformed Penn tree: '(' without label")
            stack.append((toks[i], []))
        elif tok == ")":
            if not stack:
                raise ValueError("malformed Penn tree: unbalanced ')'")
            label, children = stack.pop()
            # Node(label, children) wires parent/idx for every child, so
            # the tree is fully connected as parents close — the node's own
            # parent is set when ITS parent's Node(...) runs
            node = Node(label, children)
            if stack:
                stack[-1][1].append(node)
            else:
                roots.append(node)
        else:
            if not stack:
                raise ValueError("malformed Penn tree: token outside tree")
            stack[-1][1].append(Node(tok))
        i += 1
    if stack:
        raise ValueError("malformed Penn tree: unbalanced '('")
    return roots


def to_penn(node: Node) -> str:
    # iterative (crawl junk can produce trees deeper than the Python
    # recursion limit, e.g. one giant run-on coordination); emits the
    # exact string of the recursive form
    out: List[str] = []
    stack: List = [node]
    while stack:
        x = stack.pop()
        if isinstance(x, str):
            out.append(x)
        elif x.is_leaf:
            out.append(x.label)
        else:
            out.append("(" + x.label + " ")
            items: List = []
            for k, c in enumerate(x.children):
                if k:
                    items.append(" ")
                items.append(c)
            items.append(")")
            stack.extend(reversed(items))
    return "".join(out)


# ---------------------------------------------------------------------------
# Collins head rules (Collins 1999 appendix A / Stanford CollinsHeadFinder)

# direction 'left': for each category in order, scan children left->right;
# 'right': scan right->left; '*dis': one scan in that direction matching
# ANY category of the set.  First pass that finds a child wins; a pass
# with an empty list degenerates to "first child from that direction".
_HEAD_RULES = {
    "ADJP": [("left", "NNS QP NN $ ADVP JJ VBN VBG ADJP JJR NP JJS DT FW "
                      "RBR RBS SBAR RB".split())],
    "ADVP": [("right", "RB RBR RBS FW ADVP TO CD JJR JJ IN NP JJS NN"
              .split())],
    "CONJP": [("right", "CC RB IN".split())],
    "FRAG": [("right", [])],
    "INTJ": [("left", [])],
    "LST": [("right", "LS :".split())],
    "NAC": [("left", "NN NNS NNP NNPS NP NAC EX $ CD QP PRP VBG JJ JJS "
                     "JJR ADJP FW".split())],
    "PP": [("right", "IN TO VBG VBN RP FW".split())],
    "PRN": [("left", [])],
    "PRT": [("right", ["RP"])],
    "QP": [("left", "$ IN NNS NN JJ RB DT CD NCD QP JJR JJS".split())],
    "RRC": [("right", "VP NP ADVP ADJP PP".split())],
    "S": [("left", "TO IN VP S SBAR ADJP UCP NP".split())],
    "SBAR": [("left", "WHNP WHPP WHADVP WHADJP IN DT S SQ SINV SBAR FRAG"
              .split())],
    "SBARQ": [("left", "SQ S SINV SBARQ FRAG".split())],
    "SINV": [("left", "VBZ VBD VBP VB MD VP S SINV ADJP NP".split())],
    "SQ": [("left", "VBZ VBD VBP VB MD VP SQ".split())],
    "UCP": [("right", [])],
    "VP": [("left", "TO VBD VBN MD VBZ VB VBG VBP VP ADJP NN NNS NP"
            .split())],
    "WHADJP": [("left", "CC WRB JJ ADJP".split())],
    "WHADVP": [("right", "CC WRB".split())],
    "WHNP": [("left", "WDT WP WP$ WHADJP WHPP WHNP".split())],
    "WHPP": [("right", "IN TO FW".split())],
    "X": [("right", [])],
    "ROOT": [("left", "S SQ SINV SBAR FRAG".split())],
    "TOP": [("left", "S SQ SINV SBAR FRAG".split())],
    # NP is special-cased in head_child (POS rule + multi-pass).
    "NP": [
        ("rightdis", "NN NNP NNPS NNS NX POS JJR".split()),
        ("left", ["NP"]),
        ("rightdis", "$ ADJP PRN".split()),
        ("rightdis", ["CD"]),
        ("rightdis", "JJ JJS RB QP".split()),
        ("right", []),
    ],
}
_HEAD_RULES["NX"] = _HEAD_RULES["NP"]


def head_child(node: Node) -> Optional[Node]:
    """The head daughter of ``node`` per the Collins rules — the relation
    Tregex's ``<#`` tests.  Leaves have no head; unknown categories fall
    back to the leftmost child (documented approximation)."""
    kids = node.children
    if not kids:
        return None
    if node.label in ("NP", "NX") and kids[-1].label == "POS":
        return kids[-1]
    passes = _HEAD_RULES.get(node.label)
    if passes is None:
        return kids[0]
    for direction, cats in passes:
        ordered = kids if direction.startswith("left") else kids[::-1]
        if direction.endswith("dis"):
            catset = set(cats)
            for k in ordered:
                if k.label in catset:
                    return k
        elif cats:
            for cat in cats:
                for k in ordered:
                    if k.label == cat:
                        return k
        else:
            return ordered[0]
    # no pass matched: default from the FIRST pass's direction
    return kids[0] if passes[0][0].startswith("left") else kids[-1]


# ---------------------------------------------------------------------------
# Tregex-subset patterns

_RELOPS = ("<<,", "<<#", "<<-", "<<", "<,", "<#", "<-", "<:", "<",
           ">>", ">", "$++", "$--", "$+", "$-")


class _NodePat:
    __slots__ = ("labels", "expr")

    def __init__(self, labels, expr):
        self.labels = labels            # frozenset of exact labels
        self.expr = expr                # None | _And | _Or | _Not | _Rel


class _And:
    __slots__ = ("items",)

    def __init__(self, items):
        self.items = items


class _Or:
    __slots__ = ("items",)

    def __init__(self, items):
        self.items = items


class _Not:
    __slots__ = ("item",)

    def __init__(self, item):
        self.item = item


class _Rel:
    __slots__ = ("op", "target", "neg")

    def __init__(self, op, target, neg):
        self.op = op
        self.target = target
        self.neg = neg


def _lex(pattern: str) -> List:
    """Tokens: '(' ')' '[' ']' '!' '&' 'OR' ('REL', op) ('ATOM', txt).
    A '|' inside an atom is label alternation; a standalone '|' is the
    boolean OR (Tregex writes the boolean one whitespace-separated)."""
    out: List = []
    for piece in pattern.split():
        while piece:
            ch = piece[0]
            if ch in "([!&":
                out.append(ch)
                piece = piece[1:]
                continue
            matched_rel = None
            for op in _RELOPS:
                if piece.startswith(op):
                    matched_rel = op
                    break
            if matched_rel:
                out.append(("REL", matched_rel))
                piece = piece[len(matched_rel):]
                continue
            closers = ""
            while piece and piece[-1] in ")]":
                closers = piece[-1] + closers
                piece = piece[:-1]
            if piece == "|":
                out.append("OR")
            elif piece:
                out.append(("ATOM", piece))
            out.extend(closers)
            piece = ""
    return out


class _Stream:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok


class TregexPattern:
    """A compiled pattern over the Tregex subset used by the 13 L2SCA
    patterns: relations ``< > << >> <, <# $+ $- $++ $--``, negation,
    ``[...]`` grouping, ``&``/juxtaposition conjunction (binding tighter
    than ``|``), label alternation ``A|B``, and parenthesized target
    subtrees.  Unsupported Tregex syntax raises ValueError at compile.
    """

    def __init__(self, pattern: str):
        self.pattern = pattern
        s = _Stream(_lex(pattern))
        self._root = self._parse_node(s)
        if s.peek() is not None:
            raise ValueError(f"trailing tokens in tregex pattern: {pattern}")

    # -- parsing ------------------------------------------------------
    def _parse_node(self, s: _Stream) -> _NodePat:
        tok = s.next()
        if not isinstance(tok, tuple) or tok[0] != "ATOM":
            raise ValueError(f"expected node description, got {tok!r}")
        labels = frozenset(tok[1].split("|"))
        expr = self._parse_or(s)
        return _NodePat(labels, expr)

    def _parse_or(self, s: _Stream):
        terms = [self._parse_and(s)]
        while s.peek() == "OR":
            s.next()
            terms.append(self._parse_and(s))
        if len(terms) == 1:
            return terms[0]
        return _Or(terms)

    def _parse_and(self, s: _Stream):
        items = []
        while True:
            tok = s.peek()
            if tok == "&":
                s.next()
                continue
            if tok == "!" or tok == "[" or (isinstance(tok, tuple)
                                            and tok[0] == "REL"):
                items.append(self._parse_unit(s))
            else:
                break
        if not items:
            return None
        if len(items) == 1:
            return items[0]
        return _And(items)

    def _parse_unit(self, s: _Stream):
        neg = False
        if s.peek() == "!":
            s.next()
            neg = True
        if s.peek() == "[":
            s.next()
            expr = self._parse_or(s)
            if s.next() != "]":
                raise ValueError("expected ']'")
            return _Not(expr) if neg else expr
        tok = s.next()
        if not (isinstance(tok, tuple) and tok[0] == "REL"):
            raise ValueError(f"expected relation, got {tok!r}")
        target = self._parse_target(s)
        return _Rel(tok[1], target, neg)

    def _parse_target(self, s: _Stream) -> _NodePat:
        if s.peek() == "(":
            s.next()
            node = self._parse_node(s)
            if s.next() != ")":
                raise ValueError("expected ')'")
            return node
        tok = s.next()
        if not (isinstance(tok, tuple) and tok[0] == "ATOM"):
            raise ValueError(f"expected target node, got {tok!r}")
        return _NodePat(frozenset(tok[1].split("|")), None)

    # -- matching -----------------------------------------------------
    def matches(self, node: Node) -> bool:
        return self._match_node(node, self._root)

    @classmethod
    def _match_node(cls, node: Node, pat: _NodePat) -> bool:
        if node.label not in pat.labels:
            return False
        if pat.expr is None:
            return True
        return cls._eval(node, pat.expr)

    @classmethod
    def _eval(cls, node: Node, expr) -> bool:
        if isinstance(expr, _And):
            return all(cls._eval(node, e) for e in expr.items)
        if isinstance(expr, _Or):
            return any(cls._eval(node, e) for e in expr.items)
        if isinstance(expr, _Not):
            return not cls._eval(node, expr.item)
        rel: _Rel = expr
        hit = any(cls._match_node(c, rel.target)
                  for c in cls._related(node, rel.op))
        return hit != rel.neg

    @staticmethod
    def _related(node: Node, op: str) -> Iterable[Node]:
        kids = node.children
        if op == "<":
            return kids
        if op == ">":
            return [node.parent] if node.parent is not None else []
        if op == "<<":
            return node.descendants()      # lazy: any() short-circuits
        if op == ">>":
            return node.ancestors()
        if op == "<,":
            return kids[:1]
        if op == "<-":
            return kids[-1:]
        if op == "<:":
            return kids if len(kids) == 1 else []
        if op == "<#":
            h = head_child(node)
            return [h] if h is not None else []
        if op in ("<<,", "<<-", "<<#"):
            # chain relations: leftmost- / rightmost- / head-descendant at
            # any depth — follow one child per level until a leaf
            step = {"<<,": lambda n: n.children[0] if n.children else None,
                    "<<-": lambda n: n.children[-1] if n.children else None,
                    "<<#": head_child}[op]

            def chain(n=node, step=step):
                cur = step(n)
                while cur is not None:
                    yield cur
                    cur = step(cur)
            return chain()
        parent = node.parent
        if parent is None:
            return []
        sibs = parent.children
        if op == "$+":
            return sibs[node.idx + 1:node.idx + 2]
        if op == "$-":
            return sibs[node.idx - 1:node.idx] if node.idx > 0 else []
        if op == "$++":
            return sibs[node.idx + 1:]
        if op == "$--":
            return sibs[:node.idx]
        raise ValueError(f"unsupported tregex relation {op!r}")


def count_matches(trees: Iterable[Node], pattern: TregexPattern) -> int:
    """Distinct matching nodes across all trees — the reference's
    ``tregex ... -C -o`` count (stanfordResources.py:128)."""
    total = 0
    for root in trees:
        if pattern.matches(root):
            total += 1
        for n in root.descendants():
            if pattern.matches(n):
                total += 1
    return total


# ---------------------------------------------------------------------------
# L2SCA (Lu 2010): 13 patterns -> 8 structure counts -> 23 features

# verbatim the published L2SCA pattern set (reference stanford.py:16-34)
L2SCA_PATTERN_STRINGS = [
    "ROOT",                                                      # sentence
    "VP > S|SINV|SQ",                                            # verb phrase
    "S|SINV|SQ [> ROOT <, (VP <# VB) | <# MD|VBZ|VBP|VBD | < "
    "(VP [<# MD|VBP|VBZ|VBD | < CC < (VP <# MD|VBP|VBZ|VBD)])]",  # clause
    "S|SBARQ|SINV|SQ > ROOT | [$-- S|SBARQ|SINV|SQ !>> SBAR|VP]",  # T-unit
    "SBAR < (S|SINV|SQ [> ROOT <, (VP <# VB) | <# MD|VBZ|VBP|VBD | < "
    "(VP [<# MD|VBP|VBZ|VBD | < CC < (VP <# MD|VBP|VBZ|VBD)])])",  # dep clause
    "S|SBARQ|SINV|SQ [> ROOT | [$-- S|SBARQ|SINV|SQ !>> SBAR|VP]] << "
    "(SBAR < (S|SINV|SQ [> ROOT <, (VP <# VB) | <# MD|VBZ|VBP|VBD | < "
    "(VP [<# MD|VBP|VBZ|VBD | < CC < (VP <# MD|VBP|VBZ|VBD)])]))",  # complex T
    "ADJP|ADVP|NP|VP < CC",                                      # coord phrase
    "NP !> NP [<< JJ|POS|PP|S|VBG | << (NP $++ NP !$+ CC)]",     # CN1
    "SBAR [<# WHNP | <# (IN < That|that|For|for) | <, S] & [$+ VP | > VP]",
    "S < (VP <# VBG|TO) $+ VP",                                  # CN3
    "FRAG > ROOT !<< (S|SINV|SQ [> ROOT <, (VP <# VB) | <# MD|VBZ|VBP|VBD "
    "| < (VP [<# MD|VBP|VBZ|VBD | < CC < (VP <# MD|VBP|VBZ|VBD)])])",  # FC
    "FRAG > ROOT !<< (S|SBARQ|SINV|SQ > ROOT | [$-- S|SBARQ|SINV|SQ !>> "
    "SBAR|VP])",                                                 # frag T-unit
    "MD|VBZ|VBP|VBD > (SQ !< VP)",                               # VP2
]

L2SCA_PATTERNS = [TregexPattern(p) for p in L2SCA_PATTERN_STRINGS]

# label -> [(pattern index, pattern)] dispatch: a node can only match a
# pattern whose root label set contains its label, so the counting loop
# tests ~1-2 patterns per node instead of all 13 (built once at import)
_L2SCA_BY_LABEL: dict = {}
for _i, _p in enumerate(L2SCA_PATTERNS):
    for _lab in _p._root.labels:
        _L2SCA_BY_LABEL.setdefault(_lab, []).append((_i, _p))

# reference stanford.py:36 — counts terminals with an uppercase POS tag
# over the Penn STRING (PRP$-style tags included; punctuation tags not).
WORD_COUNT_RE = re.compile(r"\([A-Z]+\$? [^)(]+\)")

SYNTACTIC_FEATURES = ["W", "S", "VP", "C", "T", "DC", "CT", "CP", "CN",
                      "MLS", "MLT", "MLC", "C/S", "VP/T", "C/T", "DC/C",
                      "DC/T", "T/S", "CT/T", "CP/T", "CP/C", "CN/T", "CN/C"]


def _division(x: float, y: float) -> float:
    # reference stanford.py:84-87: 0 whenever either operand is 0
    if float(x) == 0 or float(y) == 0:
        return 0.0
    return float(x) / float(y)


def syntactic_pattern_counts(trees: Sequence[Node]) -> List[int]:
    """Raw counts of the 13 patterns, then the reference's merge
    (stanford.py:73-78): CN = CN1+CN2+CN3, C += fragment clauses,
    T += fragment T-units, VP += VP2.  Returns [S, VP, C, T, DC, CT,
    CP, CN]."""
    # enumerate every node ONCE and dispatch by label: only patterns
    # whose root label set contains the node's label are evaluated
    # (same counts as matching all 13 per node; far less work in the
    # mapInPandas hot loop)
    raw = [0] * len(L2SCA_PATTERNS)
    for root in trees:
        for n in (root, *root.descendants()):
            for i, p in _L2SCA_BY_LABEL.get(n.label, ()):
                expr = p._root.expr
                if expr is None or p._eval(n, expr):
                    raw[i] += 1
    raw[7] = raw[7] + raw[8] + raw[9]
    raw[2] = raw[2] + raw[10]
    raw[3] = raw[3] + raw[11]
    raw[1] = raw[1] + raw[12]
    return raw[:8]


def syntactic_features(trees: Sequence[Node],
                       penn_text: Optional[str] = None) -> List[float]:
    """The 23 L2SCA features of one document (reference
    stanford.py:50-106).  ``penn_text`` defaults to the serialized
    trees; passing the original parser output preserves byte-level
    parity of the word-count regex."""
    if penn_text is None:
        penn_text = "\n".join(to_penn(t) for t in trees)
    w = len(WORD_COUNT_RE.findall(penn_text))
    s, vp, c, t, dc, ct, cp, cn = syntactic_pattern_counts(trees)
    return [float(w), float(s), float(vp), float(c), float(t), float(dc),
            float(ct), float(cp), float(cn),
            _division(w, s), _division(w, t), _division(w, c),
            _division(c, s), _division(vp, t), _division(c, t),
            _division(dc, c), _division(dc, t), _division(t, s),
            _division(ct, t), _division(cp, t), _division(cp, c),
            _division(cn, t), _division(cn, c)]
