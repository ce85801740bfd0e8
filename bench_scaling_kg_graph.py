"""Scaling evidence for the round-5 KG-graph additions (round-5 verdict
item 7): triangle_stats and link_prediction_common_neighbors on a
deterministic synthetic co-occurrence graph at N and 4N local cores in
separate JVMs (the BENCH/BASELINE.md protocol), plus a star-hub corpus
for the skew story and a BM25 postings-build scaling point over a
replicated document corpus. Efficiency = tp_4N / (4 * tp_N); appends the
rows to BENCH/KG_ANALYTICS.md by hand (see that file, round-6 section).

Graph generation is hash-deterministic (xxhash64 of the edge index), so
every JVM sees the identical edge multiset:

* uniform: V = 200k nodes, E = 2M distinct undirected pairs;
* star90:  same E, but 90% of edges touch the single hub node 0 — the
  degree-ordered orientation must keep the wedge join bounded (a star
  hub produces ZERO wedges at the hub).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import pyspark.sql.functions as F
from pysemanticcomplexity_spark.operators.kg_analytics import (
    link_prediction_common_neighbors, triangle_stats)
from pysemanticcomplexity_spark.operators.retrieval import term_stats
from pysemanticcomplexity_spark.session import get_spark

cpus, job, shape = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app_name=f"kg-graph-scale{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2)

V, E = 200_000, 2_000_000

def edges(shape):
    ids = spark.range(E).select(F.col("id"))
    if shape == "star90":
        a = F.when(F.col("id") %% 10 < 9, F.lit(0)) \
             .otherwise(F.pmod(F.xxhash64("id"), V))
    else:
        a = F.pmod(F.xxhash64("id"), V)
    b = F.pmod(F.xxhash64(F.lit(1), F.col("id")), V)
    return (ids.select(F.least(a, b).alias("src"),
                       F.greatest(a, b).alias("dst"))
            .filter(F.col("src") != F.col("dst")).distinct())

def docs64():
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text")
    return (base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(63))))
            .select((F.col("doc_id") + F.col("r").cast("long") * 10_000_000)
                    .alias("doc_id"), "text")
            .repartition(cpus * 4))

if job == "triangles":
    df = lambda: triangle_stats(edges(shape))
    n_in = E
elif job == "linkpred":
    df = lambda: link_prediction_common_neighbors(
        edges(shape), min_common=2, max_degree=64)
    n_in = E
elif job == "bm25_postings":
    big = docs64()
    n_in = big.count()
    df = lambda: term_stats(big)
else:
    raise SystemExit(f"unknown job {job}")

df().limit(64).count()   # warmup (codegen/arrow)
best = None
for _ in range(2):
    t0 = time.time()
    df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps(
    {"cpus": cpus, "job": job, "shape": shape,
     "wall_s": round(best, 3), "inputs": n_in,
     "tp": round(n_in / best, 1)}))
spark.stop()
"""


def run(cpus: int, job: str, shape: str) -> dict:
    code = RUNNER % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", code, str(cpus), job, shape],
                         capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    rows = []
    for job, shape in (("triangles", "uniform"), ("triangles", "star90"),
                       ("linkpred", "uniform"), ("linkpred", "star90"),
                       ("bm25_postings", "-")):
        lo = run(2, job, shape)
        hi = run(8, job, shape)
        eff = round(hi["tp"] / (4 * lo["tp"]), 3)
        rows.append({"job": job, "shape": shape,
                     "wall_2": lo["wall_s"], "wall_8": hi["wall_s"],
                     "eff_2_8": eff, "inputs": lo["inputs"]})
        print(json.dumps(rows[-1]))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
