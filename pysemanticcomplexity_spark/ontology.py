"""Ontology management: namespace canonicalization + subClassOf closure.

Pure-Python, driver-side: the taxonomy is a tiny static dimension even at a
10^12-document design point (DBpedia+schema.org+YAGO subClassOf is O(10^5)
edges), so we precompute the full ancestor-edge closure once in the driver and
ship it as a broadcast DataFrame / dict — no iterative shuffles at run time.

Reference semantics mirrored exactly:
* ``str_to_managed_uriref`` — /root/reference/parsers/semantic/graphs/ontologies.py:52-83
  (qname ``key:Suffix`` or full-URI prefix test; across namespaces pick the
  candidate with the *shortest suffix*, ties broken by namespace insertion
  order; None when unmatched).
* ``generate_parents``   — ontologies.py:91-101 (no parents -> virtual root).
* ``generate_ancestors`` — ontologies.py:103-109 (full (class, parent) edge
  walk to the root; duplicates collapse because graph insertion is
  idempotent, builders.py:208,224,240 — our closure is a set, result-identical).
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Set, Tuple

from . import MANAGED_NAMESPACES, VIRTUAL_ROOT

__all__ = ["OntologyIndex"]

_CANON_MISS = object()      # memo sentinel (None is a valid cached result)


class OntologyIndex:
    """Immutable taxonomy index built from (child, parent) subClassOf edges."""

    def __init__(self, edges: Iterable[Tuple[str, str]],
                 namespaces: Dict[str, str] = None):
        self.namespaces: Dict[str, str] = dict(namespaces or MANAGED_NAMESPACES)
        self.parents: Dict[str, List[str]] = {}
        for child, parent in edges:
            lst = self.parents.setdefault(child, [])
            if parent not in lst:
                lst.append(parent)
        self._closure_cache: Dict[str, frozenset] = {}
        self._canon_cache: Dict[str, Optional[str]] = {}

    # -- P7 canonicalization ------------------------------------------------
    def str_to_managed_uri(self, ref: str, namespace_key: str = None) -> Optional[str]:
        """Mirror of ontologies.py:52-83 (returns full URI string, not URIRef).

        The no-namespace form is memoized per instance: the fused kernel
        canonicalizes every mention's spotlight types, but the distinct type
        vocabulary is tiny (dozens) versus hundreds of thousands of calls —
        the memo removes ~10% of the triples-only kernel wall (pure function
        of the string, so caching cannot change results)."""
        if namespace_key is None:
            hit = self._canon_cache.get(ref, _CANON_MISS)
            if hit is not _CANON_MISS:
                return hit
            out = self._canonicalize_uncached(ref)
            self._canon_cache[ref] = out
            return out
        return self._canonicalize_uncached(ref, namespace_key)

    def _canonicalize_uncached(self, ref: str,
                               namespace_key: str = None) -> Optional[str]:
        if namespace_key is not None:
            ns = self.namespaces[namespace_key]
            if ref.startswith(namespace_key + ":"):
                return ref[len(namespace_key) + 1:]
            if ref.startswith(ns):
                return ref[len(ns):]
            return None
        candidates = []
        for ns_key, ns in self.namespaces.items():   # insertion order = tie-break
            suffix = self.str_to_managed_uri(ref, ns_key)
            if suffix is not None:
                candidates.append((ns, suffix))
        if not candidates:
            return None
        # stable sort by suffix length; first wins (ontologies.py:76-81)
        ns, suffix = sorted(candidates, key=lambda x: len(x[1]))[0]
        return ns + suffix

    def ref_namespace_key(self, ref: str) -> Optional[str]:
        for ns_key, ns in self.namespaces.items():
            if ref.startswith(ns):
                return ns_key
        return None

    # -- G1 parents ----------------------------------------------------------
    def generate_parents(self, cls: str, namespace_key: str = None) -> List[str]:
        """Parents of a class; virtual root if none (ontologies.py:91-101).

        With ``namespace_key``, parents outside that namespace are dropped
        BEFORE the emptiness test (ontologies.py:93-95), so a class whose
        parents all live elsewhere closes straight to the virtual root."""
        parents = self.parents.get(cls, [])
        if namespace_key is not None:
            ns = self.namespaces[namespace_key]
            parents = [p for p in parents if p.startswith(ns)]
        return list(parents) if parents else [VIRTUAL_ROOT]

    # -- G2 ancestor-edge closure ---------------------------------------------
    def closure_edges(self, cls: str, namespace_key: str = None) -> frozenset:
        """All (child, parent) edges on every ancestor walk from ``cls``.

        Memoized DFS (the reference re-walks shared ancestors without
        memoization, ontologies.py:103-109; identical edge *set*). With
        ``namespace_key`` the walk is restricted to in-namespace parents
        (generate_ancestors(cl, namespace_key), ontologies.py:103-109).
        """
        cache_key = (cls, namespace_key)
        cached = self._closure_cache.get(cache_key)
        if cached is not None:
            return cached
        edges: Set[Tuple[str, str]] = set()
        stack = [cls]
        seen: Set[str] = set()
        while stack:
            cur = stack.pop()
            if cur in seen or cur == VIRTUAL_ROOT:
                continue
            seen.add(cur)
            for parent in self.generate_parents(cur, namespace_key):
                edges.add((cur, parent))
                if parent != VIRTUAL_ROOT:
                    stack.append(parent)
        result = frozenset(edges)
        self._closure_cache[cache_key] = result
        return result

    def all_classes(self) -> Set[str]:
        cs: Set[str] = set()
        for child, parents in self.parents.items():
            cs.add(child)
            cs.update(parents)
        cs.discard(VIRTUAL_ROOT)
        return cs

    def full_closure_table(self, extra_classes: Iterable[str] = (),
                           namespace_key: str = None) -> List[Tuple[str, str, str]]:
        """(cls, src, dst) rows: for every class, its complete ancestor-edge set.

        This is the broadcast dimension used by the Spark triple builder; a
        class unknown to the taxonomy closes straight to the virtual root
        (empty `objects()` iterator -> root, ontologies.py:96-101). With
        ``namespace_key`` the per-class walk is namespace-restricted
        (builders.py:98-99 passes the key into generate_ancestors).
        """
        rows: List[Tuple[str, str, str]] = []
        classes = set(self.all_classes())
        classes.update(extra_classes)
        for cls in sorted(classes):
            for src, dst in sorted(self.closure_edges(cls, namespace_key)):
                rows.append((cls, src, dst))
        return rows
