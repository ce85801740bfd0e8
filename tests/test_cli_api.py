"""Staged CLI roundtrip + library API parity."""
import math

import numpy as np
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import FEATURE_COLUMNS, fixtures
from pysemanticcomplexity_spark import api


def test_staged_cli_roundtrip(spark, dims, tmp_path, oracle60):
    """texts2concepts -> concepts2info -> concepts2graphs -> graphs2vectors
    == direct pipeline == oracle (S2-S5 table shapes round-trip)."""
    from pysemanticcomplexity_spark import cli

    pages_dir = str(tmp_path / "pages")
    fixtures.spark_pages(spark, 60).write.parquet(pages_dir)
    c_dir = str(tmp_path / "concepts")
    i_dir = str(tmp_path / "info")
    g_dir = str(tmp_path / "graphs")
    v_dir = str(tmp_path / "vectors")

    cli.main(["texts2concepts", pages_dir, c_dir, "--buckets", "8",
              "--fixtures"])
    cli.main(["concepts2info", c_dir, i_dir, "--fixtures"])
    cli.main(["concepts2graphs", c_dir, i_dir, g_dir, "--buckets", "8",
              "--fixtures"])
    cli.main(["graphs2vectors", g_dir, v_dir])

    _, _, ref_triples, ref_vectors = oracle60
    got_triples = {(r["url"], r["subj"], r["pred"], r["obj"])
                   for r in spark.read.parquet(g_dir + "/triples").collect()}
    assert got_triples == ref_triples

    csv = (spark.read.option("header", True).csv(v_dir))
    assert csv.columns == FEATURE_COLUMNS
    got = {r["filename"]: [float(r[c]) if r[c] not in (None, "") else None
                           for c in FEATURE_COLUMNS[1:]]
           for r in csv.collect()}
    assert set(got) == set(ref_vectors)
    for url, ref_v in ref_vectors.items():
        for a, b in zip(got[url], ref_v):
            a_und = a is None or math.isnan(a)
            if a_und or math.isnan(b):
                assert a_und and math.isnan(b), (url, a, b)
            else:
                assert abs(a - b) < 1e-6, (url, a, b)


def test_printgraph_dot(spark, dims, pages60_df, tmp_path):
    from pysemanticcomplexity_spark import cli
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    res = pipe.run(pages60_df)
    url = (res.triples.groupBy("url").count()
           .orderBy(F.desc("count")).first()["url"])
    nodes = res.nodes.filter(F.col("url") == url).collect()
    triples = res.triples.filter(F.col("url") == url).collect()
    dot = cli.to_dot(url, nodes, triples)
    assert dot.startswith(f'graph "{url}"') and dot.endswith("}")
    assert "shape=box" in dot and "style=dashed" in dot


def test_api_transform_texts(spark):
    texts = [
        "x" * 151 + " spark and the window function run a hash join here",
        "",
        "short",
    ]
    mat = api.transform_texts(spark, texts)
    assert mat.shape == (3, 24)
    names = api.get_features_names()
    nb_word = mat[:, names.index("nbWord")]
    assert nb_word[0] > 0 and nb_word[1] == 0 and nb_word[2] == 0
    assert mat[0, names.index("nbConcepts")] >= 3
    assert np.isnan(mat[1, names.index("conceptsWordsRatio")])


def test_cli_fails_loudly_without_dimensions(spark, tmp_path):
    """No --gazetteer/--ontology/... path and no explicit --fixtures ->
    loud SystemExit naming the missing dimension, never a silent fixture
    substitution."""
    import pytest

    from pysemanticcomplexity_spark import cli, fixtures

    pages_dir = str(tmp_path / "pages")
    fixtures.spark_pages(spark, 5).write.parquet(pages_dir)
    with pytest.raises(SystemExit, match="gazetteer"):
        cli.main(["texts2concepts", pages_dir, str(tmp_path / "c")])
    with pytest.raises(SystemExit, match="ontology"):
        cli.main(["concepts2graphs", str(tmp_path / "c"),
                  str(tmp_path / "i"), str(tmp_path / "g")])


def test_cli_accepts_parquet_dimension_overrides(spark, tmp_path):
    """Real-run path: dimensions supplied as parquet are honored."""
    from pysemanticcomplexity_spark import cli, fixtures

    pages_dir = str(tmp_path / "pages")
    fixtures.spark_pages(spark, 10).write.parquet(pages_dir)
    gaz_path = str(tmp_path / "gaz")
    # columns deliberately written in a SHUFFLED physical order: the CLI
    # must select the documented names, not trust positional layout
    spark.createDataFrame(
        fixtures.gazetteer(),
        "surface string, uri string, support long, prior double, "
        "types_csv string"
    ).select("types_csv", "prior", "surface", "support", "uri") \
        .write.parquet(gaz_path)

    out = str(tmp_path / "concepts")
    cli.main(["texts2concepts", pages_dir, out,
              "--gazetteer", gaz_path, "--buckets", "4"])
    got = spark.read.parquet(out)
    assert got.count() > 0


def test_graphs2vectors_namespace_flag(spark, dims, tmp_path, pages60_df):
    """`graphs2vectors -on <ns>` (reference subprograms/graphs2vectors.py:26)
    restricts the CSV to the 19 global columns + the selected namespace
    pairs, with values equal to the unrestricted run's columns."""
    from pysemanticcomplexity_spark import cli, feature_columns, fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.sources import tables
    from pysemanticcomplexity_spark.operators import graph

    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    res = pipe.run(pages60_df)
    g_dir = str(tmp_path / "graphs")
    tables.write_table(res.triples, g_dir + "/triples", n_buckets=4)
    tables.write_table(res.nodes, g_dir + "/nodes", n_buckets=4)
    res.doc_words.write.parquet(g_dir + "/doc_words")

    v_all = str(tmp_path / "v_all")
    v_sub = str(tmp_path / "v_sub")
    cli.main(["graphs2vectors", g_dir, v_all])
    cli.main(["graphs2vectors", g_dir, v_sub, "-on", "Schema", "-on", "yago"])

    cols = feature_columns(["Schema", "yago"])
    sub = spark.read.option("header", True).csv(v_sub)
    assert sub.columns == cols
    assert "nbNodes_DBPedia" not in sub.columns
    full = {r["filename"]: r
            for r in spark.read.option("header", True).csv(v_all).collect()}
    rows = sub.collect()
    assert len(rows) == len(full) > 0
    for r in rows:
        f = full[r["filename"]]
        for c in cols[1:]:
            a = float(r[c]) if r[c] not in (None, "") else None
            b = float(f[c]) if f[c] not in (None, "") else None
            a_und = a is None or math.isnan(a)
            b_und = b is None or math.isnan(b)
            assert (a_und and b_und) or abs(a - b) < 1e-9, \
                (r["filename"], c, a, b)


def test_texts2vectors_force_flag(spark, tmp_path):
    """`-f/--force` (reference subprograms/texts2concepts.py:32) disables
    lineage resume: a rerun over a completed output recomputes rather than
    short-circuiting, and the output stays correct."""
    from pysemanticcomplexity_spark import cli, fixtures

    pages_dir = str(tmp_path / "pages")
    fixtures.spark_pages(spark, 12).write.parquet(pages_dir)
    out = str(tmp_path / "out")
    cli.main(["texts2vectors", pages_dir, out, "--buckets", "4",
              "--fixtures"])
    t1 = {tuple(r) for r in
          spark.read.parquet(out + "/triples")
          .select("url", "subj", "pred", "obj").collect()}
    assert len(t1) > 0
    # delete one committed bucket's data while its lineage row still says
    # "done": a resume rerun must skip it (rows stay missing), --force must
    # rebuild it
    import glob as _glob
    import shutil
    victim = sorted(_glob.glob(out + "/triples/bucket=*"))[0]
    shutil.rmtree(victim)
    cli.main(["texts2vectors", pages_dir, out, "--buckets", "4",
              "--fixtures"])
    resumed = {tuple(r) for r in
               spark.read.parquet(out + "/triples")
               .select("url", "subj", "pred", "obj").collect()}
    assert resumed < t1          # resume honored lineage: bucket not rebuilt
    cli.main(["texts2vectors", pages_dir, out, "--buckets", "4",
              "--fixtures", "--force"])
    t2 = {tuple(r) for r in
          spark.read.parquet(out + "/triples")
          .select("url", "subj", "pred", "obj").collect()}
    assert t2 == t1
