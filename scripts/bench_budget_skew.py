"""Skew evidence for take_token_budget: a 90%-one-source corpus must not
serialize in a single per-source window partition.

Builds a synthetic (doc_id, source, n_tokens) corpus with 90% of rows in
one dominant source, then times the SAME budget selection two ways in one
JVM (local[N]):

* num_ranges=64 — the production two-phase shape: the running sum is
  bucket-local per (source, hash-range), so the dominant source spreads
  over 64 buckets;
* num_ranges=1  — degenerates to the naive per-source ORDER BY window
  (one partition holds 90% of the corpus), which is what a straight
  Window.partitionBy(source) implementation would always do.

Identical kept sets are asserted before timing. Best of 2 per variant.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from pysemanticcomplexity_spark.operators.corpus import (  # noqa: E402
    take_token_budget)
from pysemanticcomplexity_spark.session import get_spark  # noqa: E402

N_ROWS = int(__import__("os").environ.get("BUDGET_SKEW_ROWS", 4_000_000))
BUDGETS = {"web": 150_000_000, "code": 5_000_000, "books": 5_000_000,
           "wiki": 5_000_000}


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark(app_name="budget-skew", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    src = (F.when(F.col("id") % 10 < 9, "web")
           .when(F.col("id") % 10 == 9,
                 F.element_at(F.array(F.lit("code"), F.lit("books"),
                                      F.lit("wiki")),
                              (F.col("id") % 3 + 1).cast("int")))
           .otherwise("web"))
    docs = (spark.range(N_ROWS)
            .select(F.col("id").alias("doc_id"), src.alias("source"),
                    (100 + F.col("id") % 900).alias("n_tokens"))
            .persist())
    docs.count()

    def run(num_ranges):
        df = take_token_budget(docs, BUDGETS, num_ranges=num_ranges)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best, df

    # equality first (kept sets must not depend on bucketing)
    w2, two = run(64)
    w1, one = run(1)
    a = two.select("id", "tokens_before")
    b = one.select("id", "tokens_before")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    n_kept = two.count()
    print(f'{{"rows": {N_ROWS}, "kept": {n_kept}, "cpus": {cpus}, '
          f'"wall_two_phase_s": {round(w2, 3)}, '
          f'"wall_single_bucket_s": {round(w1, 3)}, '
          f'"speedup": {round(w1 / w2, 2)}}}')
    spark.stop()


if __name__ == "__main__":
    main()
