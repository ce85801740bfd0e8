"""URL canonicalization + re-crawl dedup — the crawl-side front door of a
web-scale corpus pipeline (no counterpart in the reference, which reads a
local directory; input_hint's Common-Crawl-style pages carry a url column).

Common Crawl fetches the same logical page under many textual urls
(scheme/host case, default ports, tracking parameters, fragments,
trailing slashes, query-parameter order). Canonicalizing BEFORE any
url-keyed stage (dedup, lineage bucketing, per-site rollups) is what makes
"per url" well-defined. Everything here is pure JVM expressions
(whole-stage codegen, scan speed, RE2-safe so the DuckDB oracles replicate
them verbatim).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["canonicalize_url_expr", "host_expr", "url_dedup", "host_rollup",
           "TRACKING_PARAM_PATTERN"]

# query parameters that never change page identity (the usual scrub list)
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def _parts(col):
    """(scheme, authority, path, query) — fragment already stripped."""
    u = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    query = F.when(u.contains("?"),
                   F.regexp_extract(u, r"\?([^#]*)", 1)).otherwise(F.lit(""))
    return scheme, auth, path, query


def host_expr(col) -> F.Column:
    """Lowercased host with any :port stripped."""
    _s, auth, _p, _q = _parts(col)
    return F.regexp_replace(auth, ":[0-9]+$", "")


def canonicalize_url_expr(col) -> F.Column:
    """Canonical form: lowercase scheme+authority, default port stripped
    (:80 for http, :443 for https), fragment dropped, tracking query
    parameters removed, remaining parameters SORTED, trailing slashes
    trimmed from the path. Non-url strings (no scheme) pass through
    unchanged, so the expression is safe on dirty crawl data."""
    scheme, auth, path, query = _parts(col)
    auth = F.when(scheme == "http",
                  F.regexp_replace(auth, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    path = F.regexp_replace(path, "/+$", "")
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAM_PATTERN)))
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), auth, path,
        F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs))
        .otherwise(F.lit("")))
    return F.when(F.length(scheme) > 0, canon).otherwise(col)


def url_dedup(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts") -> DataFrame:
    """Re-crawl dedup: one row per canonical url — the EARLIEST fetch wins
    (min (ts, raw url): deterministic under same-instant refetches).
    Returns (canonical_url, url, warc_ts, n_fetches).

    Scale shape: one partial-aggregated groupBy on the canonical url
    (min(struct) + count — map-side combinable); the canonicalization
    itself is scan-side codegen."""
    canon = canonicalize_url_expr(F.col(url_col))
    return (pages
            .select(canon.alias("canonical_url"),
                    F.struct(F.col(ts_col).alias("warc_ts"),
                             F.col(url_col).alias("url")).alias("_w"))
            .groupBy("canonical_url")
            .agg(F.min("_w").alias("_win"), F.count("*").alias("n_fetches"))
            .select("canonical_url", F.col("_win.url").alias("url"),
                    F.col("_win.warc_ts").alias("warc_ts"),
                    F.col("n_fetches").cast("long").alias("n_fetches")))


def host_rollup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl governance per host: (host, n_pages, n_urls) — fetch volume vs
    distinct canonical pages (their gap = per-site duplication). One
    groupBy, both aggregates map-side combinable (distinct via partial
    HLL-free exact count on the canonical key)."""
    canon = canonicalize_url_expr(F.col(url_col))
    return (pages.select(host_expr(F.col(url_col)).alias("host"),
                         canon.alias("c"))
            .groupBy("host")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.countDistinct("c").cast("long").alias("n_urls")))
