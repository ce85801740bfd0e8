"""spark-submit entry point (north_rule: `spark-submit --py-files` launch).

Cluster usage:
    cd /root/repo && zip -r /tmp/pysemcom.zip pysemanticcomplexity_spark
    spark-submit --master <cluster> --py-files /tmp/pysemcom.zip \
        scripts/submit_pipeline.py <pages_parquet> <out_dir> [n_buckets]

Local sandbox equivalent:
    python scripts/submit_pipeline.py /tmp/pages /tmp/out 64

Runs the staged pipeline with bucketed, lineage-tracked, resumable writes
(triples + features); idempotent on rerun.

Dimension tables come from env vars (parquet paths) when set —
PIPE_GAZETTEER (surface, uri, support, prior, types), PIPE_ONTOLOGY
(child, parent[, ns]), PIPE_INSTANCE_TYPES, PIPE_KB — otherwise the
built-in fixtures are used and a loud notice is printed (this script is
the demo/smoke entry; the production CLI refuses to substitute fixtures).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pages_path = sys.argv[1]
    out_dir = sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.session import get_spark
    from pysemanticcomplexity_spark.sources.pages import read_pages

    spark = get_spark(app_name="kg-pipeline")
    env = os.environ
    if env.get("PIPE_GAZETTEER"):
        gaz = [tuple(r) for r in
               spark.read.parquet(env["PIPE_GAZETTEER"]).collect()]
        onto = [tuple(r) for r in
                spark.read.parquet(env["PIPE_ONTOLOGY"]).collect()]
        it_df = spark.read.parquet(env["PIPE_INSTANCE_TYPES"])
        kb_df = spark.read.parquet(env["PIPE_KB"])
    else:
        print("NOTICE: no PIPE_GAZETTEER/... env vars set — running on the "
              "built-in FIXTURE gazetteer/ontology/KB (demo data).",
              file=sys.stderr)
        dims = fixtures.spark_dims(spark)
        gaz, onto = fixtures.gazetteer(), fixtures.ontology_edges()
        it_df, kb_df = dims["instance_types"], dims["kb_triples"]
    pipe = KGPipeline(spark, gaz, onto, it_df, kb_df)
    pipe.run_and_write(read_pages(spark, pages_path), out_dir,
                       n_buckets=n_buckets, run_id=os.environ.get(
                           "RUN_ID", "submit"), resume=True)
    spark.stop()


if __name__ == "__main__":
    main()
