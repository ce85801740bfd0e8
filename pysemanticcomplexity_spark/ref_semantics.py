"""Pure-Python re-implementation of the reference pipeline semantics.

This is the *oracle* used by the test suite (SURVEY.md §5): a non-Spark,
reference-shaped implementation (lists/dicts/sets, per-document loops) of
every stage, mirroring /root/reference file-by-file so the Spark engine can
be checked against it on fixture data. It deliberately follows the
reference's control flow rather than the engine's, so the two
implementations are independent except for the shared annotator spec
(annotation_core.py — the reference's annotator was an external HTTP
service, replaced by that deterministic local spec).

Reference citations:
* text cleaning/splitting/filtering/tokenizing —
  parsers/preprocessing/text.py:29-63
* per-paragraph annotation + offset re-basing  —
  batchprocessing/semantic/conceptExtraction.py:22-46
* enrichment joins + zero-fill defaults        —
  batchprocessing/semantic/conceptsEnrichment.py:14-43,
  parsers/semantic/dbpediaClients.py:83-90,197-208
* graph assembly                               —
  parsers/semantic/graphs/builders.py:51-121,194-240
* feature vectorization                        —
  parsers/semantic/graphs/tranformers.py:40-186

Documented divergences from the reference (both unreachable or crashing
paths in the original):
* zero-word documents: the reference raises ZeroDivisionError on the
  concepts/words ratios (tranformers.py:49-50) — we emit NaN;
* zero-node graphs: reference `feat_text_dentity` returns scalar 0, which
  breaks the fixed 18-wide feature stack (tranformers.py:111-112) — we emit
  (NaN, NaN), consistent with the <2-resource-nodes path.
"""
from __future__ import annotations

import re
from itertools import combinations
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from . import MANAGED_NAMESPACES, VIRTUAL_ROOT
from .annotation_core import GazetteerMatcher
from .ontology import OntologyIndex
from .treebank import count_words

# --------------------------------------------------------------------------
# P1-P5: text preprocessing (text.py:12-63)
# --------------------------------------------------------------------------

_WRONG_CHAR_FILTER = re.compile(
    "[" + "".join(chr(i) for i in range(0, 0x0A))
    + "".join(chr(i) for i in range(0x0B, 0x20))
    + "".join(chr(i) for i in range(0x80, 0x9F)) + "]")
PARAGRAPH_THRESHOLD = 150


def clean_text(text: str) -> str:
    return _WRONG_CHAR_FILTER.sub(" ", text)


def split_to_paragraphs(text: str) -> List[str]:
    return re.split("\n\n", text)


def filter_paragraphs(paragraphs: List[str]) -> List[str]:
    return [p for p in paragraphs if len(p) > PARAGRAPH_THRESHOLD]


def process_to_paragraphs(text: str) -> List[str]:
    return filter_paragraphs(split_to_paragraphs(clean_text(text)))


# --------------------------------------------------------------------------
# S7 + P6: annotation with offset re-basing (conceptExtraction.py:22-46)
# --------------------------------------------------------------------------

def text_to_concepts(text: str, matcher: GazetteerMatcher) -> dict:
    """Mirror of text_to_entities: {'nb_words': int, 'mentions': [dict]}.

    Mentions carry document-level offsets: paragraph offsets shifted by the
    summed char length of previously processed paragraphs (no separators),
    conceptExtraction.py:27-29.
    """
    paragraphs = process_to_paragraphs(text)
    nb_words = sum(count_words(p) for p in paragraphs) if paragraphs else 0
    mentions = []
    offset_span = 0
    for p in paragraphs:
        for (offset, surface, uri, types, sim, psr, support, ncand) in matcher.annotate(p):
            mentions.append({
                "uri": uri, "types": types,
                "offset": offset + offset_span, "surface": surface,
                "similarity_score": sim, "percentage_second_rank": psr,
                "support": support,
            })
        offset_span += len(p)
    return {"nb_words": nb_words, "mentions": mentions}


# --------------------------------------------------------------------------
# A1-A4: enrichment (conceptsEnrichment.py:14-43)
# --------------------------------------------------------------------------

def enrich(uris: Iterable[str],
           instance_types: List[Tuple[str, str]],
           kb_triples: List[Tuple[str, str, str]]) -> Dict[str, dict]:
    """uri -> {'types': [..sorted..], 'nb_links_in': int, 'nb_links_out': int}."""
    types_map: Dict[str, set] = {}
    for uri, type_uri in instance_types:
        types_map.setdefault(uri, set()).add(type_uri)
    inlinks: Dict[str, int] = {}
    outlinks: Dict[str, int] = {}
    for subj, _pred, obj in kb_triples:
        inlinks[obj] = inlinks.get(obj, 0) + 1
        outlinks[subj] = outlinks.get(subj, 0) + 1
    info = {}
    for uri in uris:
        info[uri] = {
            "types": sorted(types_map.get(uri, set())),
            "nb_links_in": inlinks.get(uri, 0),
            "nb_links_out": outlinks.get(uri, 0),
        }
    return info


# --------------------------------------------------------------------------
# G1-G3: graph assembly (builders.py:51-121)
# --------------------------------------------------------------------------

class DocGraph:
    """Undirected simple graph with attr-bearing nodes (nx.Graph stand-in)."""

    def __init__(self, nb_words: Optional[int]):
        self.nb_words = nb_words
        self.nodes: Dict[str, dict] = {}
        self.edges: set = set()          # frozenset pairs
        self.directed: Dict[frozenset, Tuple[str, str]] = {}  # first-insert orientation

    def add_node(self, node: str, **attrs):
        self.nodes.setdefault(node, {}).update(attrs)

    def add_edge(self, a: str, b: str):
        self.nodes.setdefault(a, {})
        self.nodes.setdefault(b, {})
        key = frozenset((a, b)) if a != b else frozenset((a,))
        self.edges.add(key)
        self.directed.setdefault(key, (a, b))

    def degree(self) -> Dict[str, int]:
        deg = {n: 0 for n in self.nodes}
        for e in self.edges:
            pair = tuple(e)
            if len(pair) == 1:
                deg[pair[0]] += 2
            else:
                deg[pair[0]] += 1
                deg[pair[1]] += 1
        return deg

    def adjacency(self) -> Dict[str, List[str]]:
        adj: Dict[str, List[str]] = {n: [] for n in self.nodes}
        for e in self.edges:
            pair = tuple(e)
            if len(pair) == 2:
                adj[pair[0]].append(pair[1])
                adj[pair[1]].append(pair[0])
        return adj


def build_graph(concepts: dict, concept_info: Dict[str, dict],
                onto: OntologyIndex, namespace_key: str = None) -> DocGraph:
    """Mirror of GraphBuilder.build_sub_graph_from_entities (builders.py:54-121).

    ``namespace_key`` restricts both the canonical type set
    (builders.py:117-118) and the ancestor walk (builders.py:98-99 ->
    ontologies.py:91-109) to one managed namespace."""
    mentions = concepts["mentions"]
    counter: Dict[str, int] = {}
    for m in mentions:
        counter[m["uri"]] = counter.get(m["uri"], 0) + 1
    last: Dict[str, dict] = {}
    for m in mentions:                     # dict((r.uri, r)): last mention wins
        last[m["uri"]] = m

    g = DocGraph(nb_words=concepts["nb_words"])
    for uri, mention in last.items():
        attrs = {"resource": True, "count": counter[uri], "offset": mention["offset"]}
        info = concept_info.get(uri)
        if info is not None:               # builders.py:77-83
            attrs["nbTypes"] = len(info["types"])
            attrs["nbLinksIn"] = info["nb_links_in"]
            attrs["nbLinksOut"] = info["nb_links_out"]
        g.add_node(uri, **attrs)

        # P8 type assembly (builders.py:106-121)
        raw_types = list(mention["types"])
        if info is not None:
            raw_types.extend(info["types"])
        types = set()
        for t in raw_types:
            c = onto.str_to_managed_uri(t)
            if c is None:
                continue
            if namespace_key is not None and \
                    not c.startswith(onto.namespaces[namespace_key]):
                continue
            types.add(c)

        if types:
            for rsc_type in sorted(types):
                g.add_node(rsc_type, resource=False)
                g.add_edge(uri, rsc_type)
                for (cl, parent) in sorted(
                        onto.closure_edges(rsc_type, namespace_key)):
                    g.add_node(parent, resource=False)
                    g.add_edge(cl, parent)
        else:                              # builders.py:101-104
            g.add_edge(uri, VIRTUAL_ROOT)
    return g


def graph_triples(url: str, g: DocGraph) -> set:
    """Directed triple view of the graph for P/R comparison:
    (url, subj, pred, obj) with pred hasType (resource->type / resource->root)
    and subClassOf (class->class edges)."""
    triples = set()
    resources = {n for n, a in g.nodes.items() if a.get("resource") is True}
    for e in g.edges:
        a, b = g.directed[e]             # first-insert orientation:
        if a in resources:               # resource->type / resource->root,
            triples.add((url, a, "hasType", b))
        else:                            # class->parent
            triples.add((url, a, "subClassOf", b))
    return triples


# --------------------------------------------------------------------------
# M1-M10: vectorization (tranformers.py:40-186)
# --------------------------------------------------------------------------

def _bfs_lengths(adj: Dict[str, List[str]], src: str) -> Dict[str, int]:
    dist = {src: 0}
    frontier = [src]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def _eccentricities(g: DocGraph) -> List[int]:
    adj = g.adjacency()
    eccs = []
    n = len(g.nodes)
    for node in g.nodes:
        dist = _bfs_lengths(adj, node)
        if len(dist) != n:
            raise ValueError("graph is disconnected; eccentricity undefined")
        eccs.append(max(dist.values()))
    return eccs


def _assortativity(g: DocGraph) -> float:
    """nx.degree_pearson_correlation_coefficient equivalent: Pearson r of
    endpoint degrees over both orientations of every edge (tranformers.py:92-97)."""
    deg = g.degree()
    xs, ys = [], []
    for e in g.edges:
        pair = tuple(e)
        if len(pair) == 1:
            # nx.node_degree_xy yields a self-loop's (d, d) pair ONCE,
            # unlike a normal edge's two orientations (verified empirically)
            u = pair[0]
            xs.append(deg[u])
            ys.append(deg[u])
        else:
            u, v = pair
            xs.extend((deg[u], deg[v]))
            ys.extend((deg[v], deg[u]))
    if not xs:
        return float("nan")
    x = np.array(xs, dtype=float)
    y = np.array(ys, dtype=float)
    with np.errstate(invalid="ignore", divide="ignore"):
        sx = x.std()
        sy = y.std()
        if sx == 0 or sy == 0:
            return float("nan")
        return float(((x - x.mean()) * (y - y.mean())).mean() / (sx * sy))


def _density(n_nodes: int, n_edges: int) -> float:
    return 2.0 * n_edges / (n_nodes * (n_nodes - 1)) if n_nodes > 1 else 1.0


def vectorize_graph(g: DocGraph,
                    namespaces: Dict[str, str] = None) -> List[float]:
    """24 features in reference order (tranformers.py:40-58 + 162-186)."""
    namespaces = namespaces or MANAGED_NAMESPACES
    nb_words = g.nb_words if g.nb_words is not None else -1

    resources = {n: a for n, a in g.nodes.items() if a.get("resource") is True}
    nb_concepts = sum(a["count"] for a in resources.values())
    nb_unique = len(resources)
    nb_nodes = len(g.nodes)
    n_edges = len(g.edges)

    if g.nodes:
        eccs = _eccentricities(g)
        radius = float(min(eccs))
        diameter = float(max(eccs))
        assort = _assortativity(g)
    else:
        radius = diameter = 0.0
        assort = 0.0                      # tranformers.py:93-97 else-branch

    density = _density(nb_nodes, n_edges)

    # ratios — divergence: NaN instead of ZeroDivisionError for nb_words == 0
    if nb_words:
        cw_ratio = nb_concepts / nb_words
        ucw_ratio = nb_unique / nb_words
    else:
        cw_ratio = ucw_ratio = float("nan")

    # M7 textDensity (tranformers.py:104-131)
    if not g.nodes:
        td_mean = td_std = float("nan")   # divergence: scalar-0 path
    else:
        text_len = g.nb_words
        if text_len is None:
            text_len = max(a.get("offset") for a in resources.values())
        adj = g.adjacency()
        pairs = list(combinations(list(resources.keys()), 2))
        if pairs:
            d_graph = []
            for m, n in pairs:
                d_graph.append(_bfs_lengths(adj, m)[n])
            with np.errstate(invalid="ignore", divide="ignore"):
                dists_graph = np.array(d_graph, dtype=float) / diameter
                dists_text = np.abs(np.array(
                    [g.nodes[n]["offset"] - g.nodes[m]["offset"] for m, n in pairs],
                    dtype=float)) / text_len
                densities = dists_text * dists_text * np.sqrt(dists_graph)
            td_mean = float(np.mean(densities))
            td_std = float(np.std(densities))
        else:
            td_mean = td_std = float("nan")

    # M8 type/link stats (tranformers.py:133-154): skip nodes missing the attr
    stats = {"nbTypes": [], "nbLinksIn": [], "nbLinksOut": []}
    for _n, attrs in resources.items():
        for key, lst in stats.items():
            if attrs.get(key) is not None:
                lst.append(int(attrs[key]))
    with np.errstate(invalid="ignore", divide="ignore"):
        tl = [float(np.mean(stats["nbTypes"])) if stats["nbTypes"] else float("nan"),
              float(np.std(stats["nbTypes"])) if stats["nbTypes"] else float("nan"),
              float(np.mean(stats["nbLinksIn"])) if stats["nbLinksIn"] else float("nan"),
              float(np.std(stats["nbLinksIn"])) if stats["nbLinksIn"] else float("nan"),
              float(np.mean(stats["nbLinksOut"])) if stats["nbLinksOut"] else float("nan"),
              float(np.std(stats["nbLinksOut"])) if stats["nbLinksOut"] else float("nan")]

    feats = [float(nb_words), float(nb_concepts), float(nb_unique),
             float(cw_ratio), float(ucw_ratio), float(nb_nodes),
             radius, diameter, float(assort), float(density),
             td_mean, td_std] + tl

    # M9 per-namespace partials (tranformers.py:172-182)
    for ns_uri in namespaces.values():
        kept = {n for n, a in g.nodes.items()
                if a.get("resource") is True or n == VIRTUAL_ROOT
                or n.startswith(ns_uri)}
        sub_edges = [e for e in g.edges if set(e) <= kept]
        feats.extend([float(len(kept)), float(_density(len(kept), len(sub_edges)))])
    return feats


# --------------------------------------------------------------------------
# End-to-end oracle
# --------------------------------------------------------------------------

def run_reference_pipeline(pages: List[dict],
                           gazetteer_rows,
                           instance_types_rows,
                           kb_rows,
                           ontology_edge_rows,
                           confidence: float = 0.5):
    """Full pipeline over plain-Python pages; returns (concepts, info, triples,
    vectors) exactly as the reference staging would produce them."""
    matcher = GazetteerMatcher(gazetteer_rows, confidence=confidence)
    onto = OntologyIndex([(c, p) for c, p, _ns in ontology_edge_rows])

    concepts = {p["url"]: text_to_concepts(p["text"], matcher) for p in pages}
    uris = sorted({m["uri"] for c in concepts.values() for m in c["mentions"]})
    info = enrich(uris, instance_types_rows, kb_rows)

    triples = set()
    vectors = {}
    for url, c in concepts.items():
        g = build_graph(c, info, onto)
        triples |= graph_triples(url, g)
        vectors[url] = vectorize_graph(g)
    return concepts, info, triples, vectors


# --------------------------------------------------------------------------
# POS-dependent lexical features (parsers/lexical/stanford.py:113-302)
# --------------------------------------------------------------------------

import string as _string


def _lex_is_letter_number(character: str) -> int:
    # stanford.py:115-118
    if (character in _string.printable
            and character not in _string.punctuation):
        return 1
    return 0


def _lex_is_sentence(line: str) -> int:
    # stanford.py:119-124
    for character in line:
        if _lex_is_letter_number(character):
            return 1
    return 0


def _lex_getndwfirstz(z, lemmalist):
    # stanford.py:127-132
    ndwfirstztype = {}
    for lemma in lemmalist[:z]:
        ndwfirstztype[lemma] = 1
    return len(ndwfirstztype.keys())


def _lex_getmsttr(z, lemmalist):
    # stanford.py:159-171
    samples = 0
    msttr = 0.0
    while len(lemmalist) >= z:
        samples += 1
        msttrtype = {}
        for lemma in lemmalist[:z]:
            msttrtype[lemma] = 1
        msttr += len(msttrtype.keys()) / float(z)
        lemmalist = lemmalist[z:]
    return msttr / samples


def pos_tags_to_complexity(line_generator: Iterable[str],
                           wordranks: List[str],
                           adjdict: Dict[str, int],
                           word_rank_limit: int = 2000,
                           sample_size_mini: int = 50) -> Dict[str, float]:
    """Reference-faithful mirror of StanfordLexicalTransformer.
    pos_tags_to_complexity (stanford.py:177-302) over lemma_pos lines.

    Returns a name->value dict of the 32 deterministic features
    (``ndwerz``/``ndwesz``, stanford.py:136-156, excluded: unseeded RNG).
    Where the reference raises ZeroDivisionError (no words / no lexical
    tokens / no verbs / no nouns / no sentences) or returns non-finite
    values (uber at types==tokens, logttr at tokens==1), the affected
    features are ``None`` — matching the engine's NULL policy.
    """
    frequent = wordranks[-word_rank_limit:] if word_rank_limit > 0 else []
    wordtypes, swordtypes = {}, {}
    lextypes, slextypes = {}, {}
    verbtypes, sverbtypes = {}, {}
    adjtypes, advtypes, nountypes = {}, {}, {}
    wordtokens = swordtokens = lextokens = slextokens = 0
    verbtokens = nountokens = 0
    sentences = 0
    lemmalist: List[str] = []

    for lemline in line_generator:
        lemline = lemline.strip().lower()
        if not _lex_is_sentence(lemline):
            continue
        sentences += 1
        for lemma in lemline.split():
            word = lemma.split("_")[0]
            pos = lemma.split("_")[-1]
            if (pos not in _string.punctuation) and pos != "sent" \
                    and pos != "sym":
                lemmalist.append(word)
                wordtokens += 1
                wordtypes[word] = 1
                if (word not in frequent) and pos != "cd":
                    swordtypes[word] = 1
                    swordtokens += 1
                if pos[0] == "n":
                    lextypes[word] = 1
                    nountypes[word] = 1
                    lextokens += 1
                    nountokens += 1
                    if word not in frequent:
                        slextypes[word] = 1
                        slextokens += 1
                elif pos[0] == "j":
                    lextypes[word] = 1
                    adjtypes[word] = 1
                    lextokens += 1
                    if word not in frequent:
                        slextypes[word] = 1
                        slextokens += 1
                elif pos[0] == "r" and (
                        word in adjdict
                        or (word[-2:] == "ly" and word[:-2] in adjdict)):
                    lextypes[word] = 1
                    advtypes[word] = 1
                    lextokens += 1
                    if word not in frequent:
                        slextypes[word] = 1
                        slextokens += 1
                elif pos[0] == "v" and word not in ["be", "have"]:
                    verbtypes[word] = 1
                    verbtokens += 1
                    lextypes[word] = 1
                    lextokens += 1
                    if word not in frequent:
                        sverbtypes[word] = 1
                        slextypes[word] = 1
                        slextokens += 1

    def div(num, den):
        return num / float(den) if den else None

    z = sample_size_mini
    nw, nt = wordtokens, len(wordtypes)
    ndw = ndwz = nt
    if len(lemmalist) >= z:
        ndwz = _lex_getndwfirstz(z, lemmalist)
    ttr = msttr = div(nt, nw)
    if len(lemmalist) >= z:
        msttr = _lex_getmsttr(z, lemmalist)
    cttr = nt / np.sqrt(2.0 * nw) if nw else None
    rttr = nt / np.sqrt(float(nw)) if nw else None
    logttr = float(np.log(nt) / np.log(nw)) if nw > 1 else None
    uber = (float((np.log10(nw) * np.log10(nw)) / np.log10(nw / float(nt)))
            if nw > 1 and nt < nw else None)
    return {
        "sentences": sentences, "wordtypes": nt,
        "swordtypes": len(swordtypes), "lextypes": len(lextypes),
        "slextypes": len(slextypes), "wordtokens": nw,
        "swordtokens": swordtokens, "lextokens": lextokens,
        "slextokens": slextokens,
        "ld": div(lextokens, nw),
        "ls1": div(slextokens, lextokens),
        "ls2": div(len(swordtypes), nt),
        "vs1": div(len(sverbtypes), verbtokens),
        "vs2": div(len(sverbtypes) ** 2, verbtokens),
        "cvs1": (len(sverbtypes) / np.sqrt(2.0 * verbtokens)
                 if verbtokens else None),
        "ndw": ndw, "ndwz": ndwz, "ttr": ttr, "msttr": msttr,
        "cttr": cttr, "rttr": rttr, "logttr": logttr, "uber": uber,
        "lv": div(len(lextypes), lextokens),
        "vv1": div(len(verbtypes), verbtokens),
        "svv1": div(len(verbtypes) ** 2, verbtokens),
        "cvv1": (len(verbtypes) / np.sqrt(2.0 * verbtokens)
                 if verbtokens else None),
        "vv2": div(len(verbtypes), lextokens),
        "nv": div(len(nountypes), nountokens),
        "adjv": div(len(adjtypes), lextokens),
        "advv": div(len(advtypes), lextokens),
        "modv": div(len(advtypes) + len(adjtypes), lextokens),
    }
