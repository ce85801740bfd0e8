"""Entity disambiguation over candidate sets keyed by (url, mention).

Two implementations with identical results:

* ``disambiguate_agg``  — pure-DataFrame ``groupBy(...).agg(max_by(...))``.
  Spark performs partial (map-side) aggregation, so the shuffle carries at
  most one pre-reduced row per (url, mention) per map task — the scalable
  default at 10^12 documents.
* ``disambiguate_apply`` — ``groupBy(...).applyInPandas`` stage (the shape
  called for by BASELINE.json north_star). Same keying, full shuffle of the
  candidate rows; used when per-mention logic outgrows SQL (e.g. learned
  scorers).

Rule (annotation_core.py spec): keep the candidate with max
similarity_score, ties broken by lexicographically smallest uri; drop the
mention when the best similarity < confidence (Spotlight confidence filter,
subprograms/text2vectors.py:134-135).
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .. import schemas

KEY = ["url", "offset", "surface"]     # one mention = one text span in a doc


def disambiguate_agg(candidates: DataFrame, confidence: float = 0.5) -> DataFrame:
    """max_by(struct(all), struct(similarity, inverted-uri)) per mention key.

    The uri ascending tie-break is encoded by max_by on a (similarity, neg)
    pair: Spark compares structs lexicographically, so we invert the uri via
    a descending sort key trick — max over (sim, reverse_rank) where
    reverse_rank orders uris descending is equivalent to min-uri-on-tie.
    """
    payload = F.struct(*[F.col(c) for c in candidates.columns])
    # Rank candidates per key: highest sim first, then uri ascending; pick rn=1
    # via min_by on the rank struct (sim desc == negative sim asc).
    order = F.struct((-F.col("similarity_score")).alias("neg_sim"),
                     F.col("uri").alias("uri"))
    best = (candidates
            .filter(F.col("uri") != "")
            .groupBy(*KEY)
            .agg(F.min_by(payload, order).alias("best"))
            .select("best.*")
            .filter(F.col("similarity_score") >= F.lit(confidence)))
    sentinels = candidates.filter(F.col("uri") == "")
    return best.unionByName(sentinels)


def disambiguate_apply(candidates: DataFrame, confidence: float = 0.5) -> DataFrame:
    """groupBy(url, mention).applyInPandas variant (north_star shape)."""

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["uri"] == "").any():        # sentinel group: pass through
            return pdf
        pdf = pdf.sort_values(["similarity_score", "uri"],
                              ascending=[False, True], kind="mergesort")
        top = pdf.iloc[:1]
        return top[top["similarity_score"] >= confidence]

    return (candidates
            .groupBy(*KEY)
            .applyInPandas(pick, schema=schemas.MENTIONS))
