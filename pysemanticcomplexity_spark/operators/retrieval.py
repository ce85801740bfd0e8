"""Lexical retrieval over the corpus: term statistics + BM25 top-k.

The keyword-side complement to ``operators/similarity.py`` (dense ANN):
a training-data pipeline needs sparse retrieval for benchmark-query
decontamination audits, targeted corpus slicing ("every doc matching
these domain terms"), and retrieval-augmented eval set construction.

Scale shape:
* :func:`term_stats` is the postings table — one ``(doc, term, tf)`` row
  per distinct doc-term pair from ONE tokenize-explode-aggregate pass
  (map-side combined groupBy). This IS the inverted index in relational
  form: partition/bucket it by ``term`` and a term lookup is a pruned
  scan.
* :func:`bm25_topk` filters the corpus to the QUERY'S terms **before**
  any shuffle (a literal ``isin`` over a handful of terms, pushed to the
  scan), so per-query cost is proportional to the matching postings, not
  the corpus. Document frequencies and the average document length are
  tiny aggregates; the final ranking shuffles only matched docs.

Determinism: tf/df/dl are integers; the BM25 idf keeps its pre-log form
``idf_ratio = (2N - 2df + 1) / (2df + 1)`` as ONE exact IEEE division of
int64s (bitwise engine-portable, same pattern as kg_analytics.pmi_ratio)
— the conventional ``idf = ln(idf_ratio)`` and the final score are
transcendental and pinned against a python replica in pytest instead of
the cross-engine hash (the per-libm last bits differ).
"""
from __future__ import annotations

from typing import List

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textstats import TOKEN_PATTERN

__all__ = ["term_stats", "bm25_topk"]


def term_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               terms: List[str] = None) -> DataFrame:
    """Postings table ``(doc_id, term, tf, dl)``: term frequency per
    distinct doc-term pair plus the document's total token count.

    ``terms`` restricts the postings to those terms with a scan-side
    filter BEFORE the aggregation shuffle — the per-query path. Tokens
    are lowercase ``[a-z0-9]+`` runs (the corpus-wide convention shared
    with P5 / QF4 / L1)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_PATTERN), F.lit(0))
    base = (docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
            .filter(F.col("doc_id").isNotNull())
            .select("doc_id", F.size("_t").cast("long").alias("dl"),
                    F.explode("_t").alias("term")))
    if terms is not None:
        base = base.filter(F.col("term").isin(*[str(t).lower()
                                                for t in terms]))
    return (base.groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf"),
                 F.first("dl").alias("dl")))


def bm25_topk(docs: DataFrame, query: List[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Okapi BM25 top-k documents for a SET-of-terms query:
    ``(doc_id, n_match_terms, score)`` ordered by score desc, doc_id asc
    (deterministic tie-break), limited to ``k`` rows.

    Query-term multiplicity is deliberately ignored (the ``isin`` filter
    + per-(doc, term) grouping collapse repeats), i.e. Okapi's qtf
    weight is fixed at 1 — the common practice for short keyword
    queries, where repeating a term is noise rather than emphasis.
    Callers needing qtf weighting can score each term separately and
    weight the sums; the operator's contract is the set semantics.

    score = sum over matched query terms of
    ``ln(idf_ratio) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf_ratio = (2N - 2df + 1)/(2df + 1)`` (the BM25+-style strictly
    positive idf). N counts all docs; avgdl averages all doc lengths —
    both corpus-level scalars computed once per query batch (a real
    deployment materializes them with the postings table).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not query:
        raise ValueError("query must contain at least one term")
    # corpus scalars: one tiny aggregate over token counts
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_PATTERN), F.lit(0))
    lens = (docs.filter(F.col(id_col).isNotNull())
            .select(F.size(toks).cast("long").alias("dl"))
            .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
            .collect()[0])
    n_docs, avgdl = int(lens["n"]), float(lens["avgdl"] or 0.0)
    if n_docs == 0:
        return term_stats(docs, id_col, text_col, terms=query) \
            .select("doc_id", F.lit(0).cast("long").alias("n_match_terms"),
                    F.lit(0.0).alias("score"))

    stats = term_stats(docs, id_col, text_col, terms=query)
    dfreq = (stats.groupBy("term")
             .agg(F.count("*").cast("long").alias("df")))
    idf_ratio = ((2 * F.lit(n_docs) - 2 * F.col("df") + 1).cast("double")
                 / (2 * F.col("df") + 1))
    term_score = (F.log(idf_ratio)
                  * (F.col("tf") * (k1 + 1))
                  / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    scored = (stats.join(F.broadcast(dfreq), "term")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_match_terms"),
                   F.sum(term_score).alias("score")))
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
