"""S1/S6 sources: pages adapter, N-Triples parser, streaming ingest."""
import pyspark.sql.functions as F

from pysemanticcomplexity_spark import fixtures
from pysemanticcomplexity_spark.sources import ntriples, pages as pages_src


def test_pages_from_documents_schema(spark):
    p = pages_src.pages_from_documents(spark, "/root/testdata/sf0.001")
    assert [f.name for f in p.schema.fields] == \
        ["url", "warc_ts", "html", "text", "lang"]
    row = p.orderBy("url").first()
    assert row["url"].startswith("doc://")
    assert bytes(row["html"]).startswith(b"<html><body>")
    assert row["warc_ts"] is not None


def test_pages_deterministic(spark):
    a = pages_src.pages_from_documents(spark, "/root/testdata/sf0.001") \
        .select("url", "warc_ts").collect()
    b = pages_src.pages_from_documents(spark, "/root/testdata/sf0.001") \
        .select("url", "warc_ts").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ntriples_parser(spark, tmp_path):
    nt = tmp_path / "onto.nt"
    lines = []
    for child, parent, _ns in fixtures.ontology_edges():
        lines.append(f"<{child}> <{ntriples.SUBCLASS_PRED}> <{parent}> .")
    lines.append("# a comment line")
    lines.append(f"<http://x/a> <http://x/other> <http://x/b> .")
    lines.append("malformed junk")
    nt.write_text("\n".join(lines))

    edges = ntriples.subclass_edges(spark, str(nt), ns_key="DBPedia")
    got = {(r["child"], r["parent"]) for r in edges.collect()}
    expected = {(c, p) for c, p, _ in fixtures.ontology_edges()}
    assert got == expected
    assert edges.columns == ["child", "parent", "ns"]

    allt = ntriples.read_ntriples(spark, str(nt))
    assert allt.count() == len(fixtures.ontology_edges()) + 1


def test_streaming_ingest_available_now(spark, tmp_path):
    from pysemanticcomplexity_spark.streaming.ingest import (
        ingest_pages_available_now)
    src = tmp_path / "src"
    dest = str(tmp_path / "dest")
    chk = str(tmp_path / "chk")
    fixtures.spark_pages(spark, 20).write.parquet(str(src))

    q = ingest_pages_available_now(spark, str(src), dest, chk)
    q.awaitTermination(120)
    assert spark.read.parquet(dest).count() == 20

    # rerun: no new files -> no duplicates (exactly-once per file)
    q2 = ingest_pages_available_now(spark, str(src), dest, chk)
    q2.awaitTermination(120)
    assert spark.read.parquet(dest).count() == 20
