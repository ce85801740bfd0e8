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


def test_ntriples_on_real_vendor_ontologies(spark):
    """Parse the reference's own vendor RDF files (read-only) with the S6
    parser: 769 dbpedia + 625 schema subClassOf triples (SURVEY.md §2.1 S6),
    then close the real taxonomy."""
    import os

    import pytest as _pytest
    base = "/root/reference/vendor/dbpedia"
    if not os.path.exists(f"{base}/dbpedia.nt"):
        _pytest.skip("vendor files absent")
    dbp = ntriples.subclass_edges(spark, f"{base}/dbpedia.nt", ns_key="DBPedia")
    sch = ntriples.subclass_edges(spark, f"{base}/schema.nt", ns_key="Schema")
    assert dbp.count() == 769
    assert sch.count() == 625

    from pysemanticcomplexity_spark.ontology import OntologyIndex
    edges = [(r["child"], r["parent"]) for r in dbp.collect()] + \
            [(r["child"], r["parent"]) for r in sch.collect()]
    idx = OntologyIndex(edges)
    owl_thing = "http://www.w3.org/2002/07/owl#Thing"
    closure = idx.closure_edges("http://dbpedia.org/ontology/BasketballLeague")
    assert ("http://dbpedia.org/ontology/BasketballLeague",
            "http://dbpedia.org/ontology/SportsLeague") in closure
    # every walk terminates at the virtual root
    assert any(p == "#AbstractConcept#" for _c, p in closure)
    # canonicalization on a real class: owl#Thing is unmanaged -> None
    assert idx.str_to_managed_uri(owl_thing) is None


def test_streaming_windowed_counts(spark, tmp_path):
    """Watermarked tumbling-window agg over a file stream == batch groupBy."""
    from pysemanticcomplexity_spark.streaming.windowed import (
        windowed_event_counts)
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "events_out")
    chk = str(tmp_path / "events_chk")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (windowed_event_counts(stream, window="1 hour")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", chk)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["window_start"], r["key"]): (r["n"], r["value_sum_cents"])
           for r in spark.read.parquet(out).collect()}
    # append mode only emits windows the final watermark has passed:
    # window_end <= max(ts) - 30min (the default watermark delay)
    import datetime
    max_ts = events.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(minutes=30)
    expected = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in
                (events.groupBy(F.window("ts", "1 hour").alias("w"),
                                "event_type")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.round(F.col("value") * 100).cast("long"))
                      .alias("s"))
                 .select(F.col("w.start").alias("ws"),
                         F.col("w.end").alias("we"), "event_type", "n", "s")
                 .collect()) if r["we"] <= cutoff}
    assert got == expected and len(got) > 0


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
