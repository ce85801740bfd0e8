"""S7: deterministic gazetteer annotation — the pipeline's hot path.

One ``mapInPandas`` pass fuses P1-P6 + S7 per page row (clean -> split ->
filter -> Treebank count -> longest-match annotate -> offset re-base). All
of that is row-local, so the 100 TB ``pages`` scan is processed with ZERO
shuffles: Catalyst prunes the scan to (url, text), Arrow ships batches to
Python once, and the gazetteer rides along as a
``SparkContext.broadcast`` (one copy per executor, like the reference's
shared-memory ontology — utils/commons.py:19-30 forced joblib threading for
the same reason).

Output: one sentinel row per document (uri = '', offset = -1) carrying
``nb_words`` — so zero-mention documents still produce feature rows — plus
one row per detected mention with document-level offsets
(conceptExtraction.py:22-31 re-basing; no skip branch since there is no
network — divergence documented in SURVEY.md §2.2 P6).

``annotate_pages(..., emit='candidates')`` keeps all gazetteer candidates
per mention for the explicit groupBy(url, mention).applyInPandas
disambiguation stage (operators/disambiguate.py).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..annotation_core import GazetteerMatcher
from ..ref_semantics import process_to_paragraphs
from ..treebank import count_words

__all__ = ["annotate_pages", "broadcast_gazetteer"]


def broadcast_gazetteer(spark: SparkSession, gazetteer_rows,
                        confidence: float = 0.5, support: int = None,
                        types=None, policy: str = "whitelist"):
    """Ship the gazetteer once per executor (matcher built lazily per worker).

    support/types/policy mirror the reference's Spotlight parameters
    (dbpediaClients.py:34-51) — see annotation_core.GazetteerMatcher."""
    if policy not in ("whitelist", "blacklist"):
        # fail at plan-build time, not inside an executor UDF
        raise ValueError(f"policy must be 'whitelist' or 'blacklist', "
                         f"got {policy!r}")
    return spark.sparkContext.broadcast(
        {"rows": list(gazetteer_rows), "confidence": confidence,
         "support": support, "types": list(types) if types else None,
         "policy": policy})


def _process_document(text: str, matcher: GazetteerMatcher):
    """Fused P1-P6+S7 for one document; yields (nb_words, mentions)."""
    paragraphs = process_to_paragraphs(text or "")
    nb_words = sum(count_words(p) for p in paragraphs) if paragraphs else 0
    mentions = []
    offset_span = 0
    for p in paragraphs:
        for m in matcher.annotate(p):
            (offset, surface, uri, types, sim, psr, support, ncand) = m
            mentions.append((offset + offset_span, surface, uri, types,
                             sim, psr, support, ncand))
        offset_span += len(p)
    return nb_words, mentions


def _candidates_document(text: str, matcher: GazetteerMatcher):
    paragraphs = process_to_paragraphs(text or "")
    nb_words = sum(count_words(p) for p in paragraphs) if paragraphs else 0
    mentions = []
    offset_span = 0
    for p in paragraphs:
        for m in matcher.annotate_candidates(p):
            (offset, surface, uri, types, sim, psr, support, ncand) = m
            mentions.append((offset + offset_span, surface, uri, types,
                             sim, psr, support, ncand))
        offset_span += len(p)
    return nb_words, mentions


def annotate_pages(spark: SparkSession, pages: DataFrame, gazetteer_rows,
                   confidence: float = 0.5, emit: str = "best",
                   support: int = None, types=None,
                   policy: str = "whitelist") -> DataFrame:
    """pages -> mention rows (schema schemas.MENTIONS) + per-doc sentinels.

    emit='best'        : disambiguated mention per span (shuffle-free).
    emit='candidates'  : all candidates per span (feed disambiguate stage).
    support/types/policy: Spotlight-parameter filters (dbpediaClients.py:34-51).
    """
    bc = broadcast_gazetteer(spark, gazetteer_rows, confidence,
                             support=support, types=types, policy=policy)
    process = _process_document if emit == "best" else _candidates_document

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg = bc.value
        matcher = GazetteerMatcher(cfg["rows"], confidence=cfg["confidence"],
                                   support=cfg.get("support"),
                                   types=cfg.get("types"),
                                   policy=cfg.get("policy", "whitelist"))
        for pdf in batches:
            out = {k: [] for k in ("url", "nb_words", "offset", "surface", "uri",
                                   "spotlight_types", "similarity_score",
                                   "percentage_second_rank", "support",
                                   "n_candidates")}
            for url, text in zip(pdf["url"], pdf["text"]):
                nb_words, mentions = process(text, matcher)
                rows = [( -1, "", "", [], 0.0, 0.0, 0, 0)] + mentions
                for (off, surface, uri, types, sim, psr, support, ncand) in rows:
                    out["url"].append(url)
                    out["nb_words"].append(nb_words)
                    out["offset"].append(off)
                    out["surface"].append(surface)
                    out["uri"].append(uri)
                    out["spotlight_types"].append(types)
                    out["similarity_score"].append(sim)
                    out["percentage_second_rank"].append(psr)
                    out["support"].append(support)
                    out["n_candidates"].append(ncand)
            yield pd.DataFrame(out)

    return (pages.select("url", "text")
            .mapInPandas(run, schema=schemas.MENTIONS))


def split_mentions(annotated: DataFrame):
    """(mentions, doc_words): drop/keep the per-document sentinel rows."""
    import pyspark.sql.functions as F
    mentions = annotated.filter(F.col("uri") != "")
    doc_words = annotated.filter(F.col("uri") == "").select("url", "nb_words")
    return mentions, doc_words
