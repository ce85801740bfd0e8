"""Deterministic lexical-complexity features (the token-only subset of the
reference's lexical pipeline).

The reference computes 34 lexical features over Stanford-POS-tagged lemmas
(parsers/lexical/stanford.py:82-302). The POS tagger is a Java dependency
that does not exist here, and several features are POS-partitioned
(verb/noun/adj/adv variations) or deliberately random (_getndwerz/_getndwesz,
stanford.py:137-156, use the *unseeded* stdlib RNG — irreproducible by
design). This module implements the deterministic, token-only subset — the
NDW base counts and the full TTR family (stanford.py:96-135, 276-287) — over
the same SQL token model used by P5/T1 (lowercased ``[a-z0-9]+`` runs, which
also subsumes the reference's punctuation-token exclusion at
stanford.py:209). Tokens stand in for POS-lemmas; documented divergence.

Features (z = sample_size_mini = 50, the reference default):

* wordtokens — token count
* wordtypes / ndw — distinct-token count (ndw == wordtypes, stanford.py:276)
* ndwz  — distinct among the FIRST z tokens (_getndwfirstz, stanford.py:128)
* ttr   — wordtypes / wordtokens
* msttr — mean TTR over consecutive complete z-token segments
          (_getmsttr, stanford.py:159-171; == ttr when tokens < z)
* cttr  — wordtypes / sqrt(2 * wordtokens)
* rttr  — wordtypes / sqrt(wordtokens)
* logttr — log(wordtypes) / log(wordtokens)
* uber  — log10(wordtokens)^2 / log10(wordtokens / wordtypes)

Divergences (documented, ANSI-safe): ratios are NULL when undefined
(wordtokens == 0; logttr at wordtokens <= 1; uber when wordtypes ==
wordtokens where the reference emits inf/raises).

Everything is a single-pass JVM expression over the token array (array
higher-order functions; no shuffle, no Python) — at 100 TB this runs at
parquet-scan speed with predicate pushdown intact.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["lexical_features", "TOKEN_RE", "SAMPLE_Z"]

TOKEN_RE = "[a-z0-9]+"
SAMPLE_Z = 50          # reference sample_size_mini (stanford.py:89)


def lexical_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", z: int = SAMPLE_Z) -> DataFrame:
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE),
                                F.lit(0))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("t"))

    n = F.size("t").cast("long")
    types = F.size(F.array_distinct("t")).cast("long")
    nd = n.cast("double")
    td = types.cast("double")

    ttr = F.when(n > 0, td / nd)
    # distinct among the first z tokens; == ndw when the doc is shorter
    ndwz = F.when(n >= z, F.size(F.array_distinct(F.slice("t", 1, z)))
                  .cast("long")).otherwise(types)
    # mean segmental TTR over the floor(n/z) complete segments
    blocks = (n / z).cast("long")
    seg_ttrs = F.transform(
        F.sequence(F.lit(0).cast("long"), blocks - 1),
        lambda b: F.size(F.array_distinct(
            F.slice("t", (b * z + 1).cast("int"), z))).cast("double") / z)
    msttr = F.when(n >= z,
                   F.aggregate(seg_ttrs, F.lit(0.0), lambda acc, x: acc + x)
                   / blocks.cast("double")).otherwise(ttr)

    cttr = F.when(n > 0, td / F.sqrt(2.0 * nd))
    rttr = F.when(n > 0, td / F.sqrt(nd))
    logttr = F.when(n > 1, F.log(td) / F.log(nd))
    uber = F.when((n > 1) & (types < n),
                  (F.log10(nd) * F.log10(nd)) / F.log10(nd / td))

    return base.select(
        "id", n.alias("wordtokens"), types.alias("wordtypes"),
        types.alias("ndw"), ndwz.alias("ndwz"),
        ttr.cast("double").alias("ttr"),
        msttr.cast("double").alias("msttr"),
        cttr.cast("double").alias("cttr"),
        rttr.cast("double").alias("rttr"),
        logttr.cast("double").alias("logttr"),
        uber.cast("double").alias("uber"))
