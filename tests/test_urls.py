"""URL canonicalization + re-crawl dedup (operators/urls.py)."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark.operators.urls import (
    canonicalize_url_expr, host_expr, host_rollup, url_dedup)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(canonicalize_url_expr(F.col("url")).alias("c"),
                     host_expr(F.col("url")).alias("h")).collect()
    return [(r["c"], r["h"]) for r in rows]


def test_canonicalize_cases(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/Path/To/Page/?utm_source=x&b=2&a=1#f",
        "http://example.com:80/a//",
        "http://example.com:8080/a",          # non-default port kept
        "https://example.com/?gclid=zz",      # all params tracking
        "https://example.com/p?a=1&utm_campaign=c&ref=h",
        "not a url",                          # passthrough
        "ftp://Host.Com:21/File",             # unknown scheme: port kept
        "https://example.com",                # no path
    ])
    assert got == [
        ("https://www.example.com/Path/To/Page?a=1&b=2", "www.example.com"),
        ("http://example.com/a", "example.com"),
        ("http://example.com:8080/a", "example.com"),
        ("https://example.com", "example.com"),
        ("https://example.com/p?a=1", "example.com"),
        ("not a url", ""),
        ("ftp://host.com:21/File", "host.com"),
        ("https://example.com", "example.com"),
    ]


def test_url_dedup_keeps_earliest_fetch(spark):
    rows = [
        ("https://a.com/x", 5),
        ("HTTPS://A.COM:443/x/?utm_source=s", 9),    # same page, later
        ("https://a.com/x?v=2", 1),                  # different page
        ("http://b.com/y", 3),
    ]
    pages = spark.createDataFrame(rows, "url string, fetch_seq long")
    out = {r["canonical_url"]: r
           for r in url_dedup(pages, ts_col="fetch_seq").collect()}
    assert out["https://a.com/x"]["url"] == "https://a.com/x"
    assert out["https://a.com/x"]["n_fetches"] == 2
    assert out["https://a.com/x"]["warc_ts"] == 5
    assert out["https://a.com/x?v=2"]["n_fetches"] == 1
    assert out["http://b.com/y"]["n_fetches"] == 1

    roll = {r["host"]: (r["n_pages"], r["n_urls"])
            for r in host_rollup(pages).collect()}
    assert roll == {"a.com": (3, 2), "b.com": (1, 1)}


def test_canonicalize_plan_is_scan_side(spark):
    from pysemanticcomplexity_spark import plans
    df = spark.createDataFrame([("https://x.com/a?b=1",)], "url string")
    plan = plans.executed_plan(
        df.select(canonicalize_url_expr(F.col("url")).alias("c")))
    assert "Exchange" not in plan and "EvalPython" not in plan
