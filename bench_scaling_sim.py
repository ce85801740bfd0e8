"""Similarity-family scaling evidence (BENCH/BASELINE.md protocol applied
to S2 SRP-LSH top-k and S3 IVF top-k): the identical ANN job on the
identical replicated input at N and 4N local cores in separate JVMs;
vectors/sec at each level and efficiency = T_N / (4 * T_4N); writes
BENCH/SIMILARITY.md.

Replication detail: each replica multiplies the vector elementwise by a
replica-specific deterministic sign pattern. A sign flip is an isometry —
cosine structure WITHIN a replica is exactly preserved (the top-k results
per query are the within-replica ones, modulo rare cross-replica noise
verified away by exact cosine) — while the SRP bucket bits and IVF cell
assignments of different replicas scatter independently, so bucket/cell
populations grow LINEARLY in the replica count. Naive replication (identical
copies) would instead put all K copies into the same buckets and inflate the
candidate join quadratically (K^2 per bucket) — measuring a pathology, not
the operator (same trap as BENCH/DEDUP.md's replica-local shingles).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

PREP = r"""
import sys
sys.path.insert(0, __REPO__)
import pyspark.sql.functions as F
from pysemanticcomplexity_spark.session import get_spark

sf_dir, out, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="sim-scale-prep")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
# per-(replica, dim) deterministic sign pattern: an isometry per replica
flipped = F.transform(
    "embedding",
    lambda x, i: x * F.when(F.xxhash64(F.col("r"), i) % 2 == 0,
                            F.lit(1.0)).otherwise(F.lit(-1.0)).cast("float"))
# r*10M must be LONG arithmetic: int32 r*10_000_000 silently wraps at
# r >= 215 (replicas > 214), colliding vec_ids across replicas
big = (emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
       .select((F.col("vec_id")
                + F.col("r").cast("long") * F.lit(10_000_000).cast("long"))
               .alias("vec_id"),
               flipped.alias("embedding")))
big.repartition(64).write.mode("overwrite").parquet(out)
print("PREP", big.count())
spark.stop()
"""

RUNNER = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, __REPO__)
import pyspark.sql.functions as F
from pysemanticcomplexity_spark.operators.similarity import ivf_topk, lsh_topk
from pysemanticcomplexity_spark.session import get_spark

cpus = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(app_name=f"sim-scale{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2,
                  extra_conf={
                      "spark.sql.files.maxPartitionBytes": "1m",
                      "spark.sql.files.openCostInBytes": "64k",
                  })
emb = spark.read.parquet(path)
n_vec = emb.count()
queries = emb.filter(F.col("vec_id") % 10_000_000 < 100)   # 100 per replica
cents = np.random.RandomState(7).randn(16, 64)
cents /= np.linalg.norm(cents, axis=1, keepdims=True)   # spherical: data is unit-norm

def lsh_job():
    return lsh_topk(emb, queries, k=5).count()

def ivf_job():
    return ivf_topk(emb, queries, k=5, centroids=cents, nprobe=4).count()

def ivf_blas_job():
    return ivf_topk(emb, queries, k=5, centroids=cents, nprobe=4,
                    kernel="blas").count()

lsh_topk(emb.limit(512), queries.limit(32), k=5).count()    # warmup
out = {"cpus": cpus, "vectors": n_vec}
import os as _os
fams = _os.environ.get("SIM_SCALE_FAMILIES", "lsh,ivf,ivf_blas").split(",")
all_jobs = {"lsh": lsh_job, "ivf": ivf_job, "ivf_blas": ivf_blas_job}
for name, job in [(f, all_jobs[f]) for f in fams]:
    best, rows = None, None
    for _ in range(2):
        t0 = time.time(); rows = job(); dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    out[name] = {"rows": rows, "wall_s": round(best, 3),
                 "vec_per_sec": round(n_vec / best, 1)}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run(script: str, *args, timeout=3000) -> str:
    p = subprocess.run([sys.executable, "-c", script.replace("__REPO__", repr(REPO)), *args],
                       capture_output=True, text=True, timeout=timeout)
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-4000:])
    return p.stdout


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SIM_SCALE_REPLICAS", "16"))
    work = os.environ.get("SIM_SCALE_DIR", "/tmp/sim_scale_emb")
    print(run(PREP, sf_dir, work, str(replicas)).strip())
    results = []
    for cpus in (2, 8, 32):
        out = run(RUNNER, str(cpus), work)
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        res = json.loads(line[len("RESULT "):])
        results.append(res)
        print(json.dumps(res))
    fams = os.environ.get("SIM_SCALE_FAMILIES", "lsh,ivf,ivf_blas").split(",")
    for fam in fams:
        t = {r["cpus"]: r[fam]["wall_s"] for r in results}
        print(fam, "eff 2->8:", round(t[2] / (4 * t[8]), 3),
              "8->32:", round(t[8] / (4 * t[32]), 3))
    return results


if __name__ == "__main__":
    main()
