"""As-of join under key skew: measure the hub-key window cost.

The union+window as-of has ONE shuffle keyed by the join key; a hub key
(one user owning most of both tables) lands in one window partition and
sorts/scans serially there — AQE can split skewed JOIN partitions but
NOT window partitions, so this is the operator's honest skew ceiling.
Measured here: identical row counts, uniform keys vs 90%-one-key, best
of 2, local[16]. Writes a row for BENCH/SKEW.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from pysemanticcomplexity_spark.operators.temporal import asof_join  # noqa: E402
from pysemanticcomplexity_spark.session import get_spark  # noqa: E402


def build(spark, n, skew):
    key = (F.when(F.rand(7) < 0.9, F.lit("hub"))
           .otherwise(F.concat(F.lit("k"), (F.col("id") % 997)
                               .cast("string")))) if skew else \
        F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
    base = spark.range(n).withColumn("key", key) \
        .withColumn("ts", (F.col("id") * 7 % 1_000_003).cast("double"))
    left = base.select(F.col("id").alias("lid"), "key", "ts")
    right = base.select(F.col("id").alias("rid"), "key",
                        (F.col("ts") + 0.5).alias("ts"),
                        F.col("id").cast("double").alias("payload"))
    return left, right


def main():
    n = int(os.environ.get("ASOF_SKEW_N", "2000000"))
    spark = get_spark(app_name="asof-skew", master="local[16]",
                      shuffle_partitions=32)
    out = {}
    # widths: ts spans [0, 1e6); 20_000 gives ~50 buckets, splitting the
    # 90% hub key's timeline into ~50 parallel window partitions
    for label, skew, width in (("uniform", False, None),
                               ("skew90", True, None),
                               ("uniform_bucketed", False, 20_000.0),
                               ("skew90_bucketed", True, 20_000.0)):
        left, right = build(spark, n, skew)
        best = None
        for _ in range(2):
            t0 = time.time()
            asof_join(left, right, on="key", tiebreak="rid",
                      hub_bucket_width=width) \
                .write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[label] = round(best, 3)
    out["ratio"] = round(out["skew90"] / out["uniform"], 2)
    out["ratio_bucketed"] = round(out["skew90_bucketed"]
                                  / out["uniform"], 2)
    out["rows"] = n
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
