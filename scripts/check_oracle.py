"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every queries() entry at the given sf dir, executes the matching
oracle_sql() in DuckDB over the same parquet views, and compares:
row count, column names, and values (exact for non-floats; floats must
match bitwise after round-tripping, with a report of max abs diff).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
Env:   ORACLE_ANSI=1 runs under a driver-like session (ANSI on, default
       shuffle partitions) to prove the queries don't depend on our own
       session config.
"""
from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bf = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            diff = np.abs(af - bf)
            diff[both_nan] = 0.0
            bad = np.isnan(diff) | (diff > 0)
            n_exact_bad = int(bad.sum())
            if n_exact_bad:
                mx = np.nanmax(diff[~np.isnan(diff)]) if (~np.isnan(diff)).any() else float("inf")
                problems.append(
                    f"col {c}: {n_exact_bad}/{len(af)} rows differ bitwise, max|Δ|={mx:.3e}")
        else:
            neq = av != bv
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(f"col {c}: {int(neq.sum())} rows differ, "
                                f"e.g. {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    if os.environ.get("ORACLE_ANSI"):
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("oracle-check-ansi")
                 .config("spark.sql.ansi.enabled", "true")
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from pysemanticcomplexity_spark.session import get_spark
        spark = get_spark(app_name="oracle-check")
    con = duck_connection(sf_dir)
    qs, os_ = E.queries(), E.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name:28s} spark error: {ex}")
            failures += 1
            continue
        if name not in os_:
            print(f"rows  {name:28s} {len(sdf):>8} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name:28s} duckdb error: {str(ex).splitlines()[0][:120]}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name:28s} {problems[:3]}")
        else:
            print(f"ok    {name:28s} {len(sdf):>8} rows [{time.time()-t0:.1f}s]")
    print("failures:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
