"""The north-rule launch surface: ``spark-submit --py-files <pkg.zip>``.

The script under test is COPIED out of the repo into the temp dir, so its
own ``sys.path.insert(repo_parent_of_script)`` points at a directory with
no package — every ``pysemanticcomplexity_spark`` import inside the driver
must resolve through the ``--py-files`` zip, exactly as on a cluster whose
workers never see the repo checkout.
"""
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest: str) -> None:
    pkg = os.path.join(REPO, "pysemanticcomplexity_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not on this box")
def test_spark_submit_py_files_launch(spark, pages60_df, tmp_path):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    pages60_df.write.parquet(pages)
    want_triples = None  # computed below from the in-process pipeline

    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    dims = fixtures.spark_dims(spark)
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"],
                      persist_intermediate=False)
    res = pipe.run_fused(pages60_df, persist_docs=False)
    want_triples = res.triples.count()

    zip_path = str(tmp_path / "pysemcom.zip")
    _zip_package(zip_path)
    script = str(tmp_path / "submit_pipeline.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_pipeline.py"), script)

    env = dict(os.environ)
    env.pop("PIPE_GAZETTEER", None)          # force the fixture demo path
    env["MASTER"] = "local[2]"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         script, pages, out, "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    got_t = spark.read.parquet(out + "/triples")
    got_f = spark.read.parquet(out + "/features")
    assert got_t.count() == want_triples
    assert got_f.count() == pages60_df.count()
    # per-partition lineage rows cover both tables, sums == table counts
    lin = spark.read.parquet(out + "/_lineage")
    sums = {r["stage"]: r["s"] for r in
            lin.groupBy("stage").agg({"rows": "sum"})
               .withColumnRenamed("sum(rows)", "s").collect()}
    assert sums == {"triples": want_triples,
                    "features": pages60_df.count()}

    # rerun is idempotent (resume sees every bucket complete)
    proc2 = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         script, pages, out, "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    assert spark.read.parquet(out + "/triples").count() == want_triples
