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
                      F.sum((F.col("value").cast("string")
                             .cast("decimal(20,2)") * 100).cast("long"))
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


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a page stream: one survivor per
    normalized text; survivor count == batch exact_dedup group count."""
    from pysemanticcomplexity_spark.operators.dedup import (
        exact_dedup, normalize_text)
    from pysemanticcomplexity_spark.streaming.dedup import streaming_exact_dedup

    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "pages_out")
    chk = str(tmp_path / "pages_chk")
    pages = fixtures.spark_pages(spark, 30)
    # plant exact duplicates (same text, later timestamp, distinct url)
    dups = (pages.limit(8)
            .withColumn("url", F.concat("url", F.lit("#dup")))
            .withColumn("warc_ts",
                        F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES")))
    all_pages = pages.unionByName(dups)
    all_pages.write.parquet(src)

    stream = spark.readStream.schema(all_pages.schema).parquet(src)
    q = (streaming_exact_dedup(stream)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", chk)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    n_groups = exact_dedup(all_pages, id_col="url", text_col="text").count()
    assert got.count() == n_groups              # one survivor per text group
    # survivors are themselves duplicate-free
    assert got.groupBy("text_key_hi", "text_key_lo").count() \
        .filter("count > 1").isEmpty()


def test_streaming_dup_counts_stateful(spark, tmp_path):
    """applyInPandasWithState keyed dup counter: state carries across
    micro-batches (two file drops), keep_id = min id, n_seen = total."""
    from pysemanticcomplexity_spark.streaming.dedup import streaming_dup_counts

    src = tmp_path / "docs_src"
    out = str(tmp_path / "docs_out")
    chk = str(tmp_path / "docs_chk")
    src.mkdir()
    docs1 = spark.createDataFrame(
        [(10, "aaa bbb"), (11, "ccc ddd"), (12, "aaa bbb")],
        "doc_id long, text string")
    docs1.write.parquet(str(src / "b1"))

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src) + "/*"))
        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        q = (streaming_dup_counts(stream)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", chk)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    docs2 = spark.createDataFrame(
        [(5, "aaa bbb"), (13, "eee fff")], "doc_id long, text string")
    docs2.write.parquet(str(src / "b2"))
    drain()                                    # resumes from checkpoint state

    rows = spark.read.parquet(out).collect()
    # latest emission per key wins (update-mode emissions accumulate in files)
    latest = {}
    for r in rows:
        k = (r["text_key_hi"], r["text_key_lo"])
        cur = latest.get(k)
        if cur is None or r["n_seen"] > cur["n_seen"]:
            latest[k] = r
    by_count = sorted((r["n_seen"], r["keep_id"]) for r in latest.values())
    # "aaa bbb": seen 3x total (ids 10,12 then 5 -> keep_id 5);
    # "ccc ddd" and "eee fff": once each
    assert by_count == [(1, 11), (1, 13), (3, 5)]


def test_streaming_kg_triples_equal_batch(spark, dims, tmp_path):
    """The fused kernel over a page STREAM produces exactly the batch
    pipeline's triples (shared kernel, stateless mapInPandas), with
    exactly-once-per-file on rerun."""
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    from pysemanticcomplexity_spark.streaming.kg import (
        streaming_triples_available_now)

    src = tmp_path / "pages_src"
    out = str(tmp_path / "triples_out")
    chk = str(tmp_path / "chk")
    src.mkdir()
    pages = fixtures.spark_pages(spark, 30)
    pages.limit(20).coalesce(1).write.parquet(str(src / "b1"))

    def drain():
        q = streaming_triples_available_now(
            spark, str(src) + "/*", out, chk, fixtures.gazetteer(),
            fixtures.ontology_edges(), dims["instance_types"],
            dims["kb_triples"])
        q.awaitTermination(180)

    drain()
    # second file arrives; rerun drains ONLY the new file
    pages.subtract(pages.limit(20)).coalesce(1).write.parquet(str(src / "b2"))
    drain()
    drain()                                  # idempotent: nothing new

    got = {(r["url"], r["subj"], r["pred"], r["obj"])
           for r in spark.read.parquet(out).collect()}
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    want = {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in pipe.run_fused(pages).triples.collect()}
    assert got == want
    # no duplicates from the triple drains
    assert spark.read.parquet(out).count() == len(got)


def test_windowed_cents_half_cent_boundary(spark):
    """round(value*100) on the raw double misrounds every .xx5 amount one
    cent low (8.845 is stored as 8.84499...); the decimal path recovers the
    shortest round-trip literal and lands on the producer's cent."""
    from pysemanticcomplexity_spark.streaming.windowed import (
        windowed_event_counts)
    rows = [("a", "2024-01-01 00:05:00", 8.845),
            ("a", "2024-01-01 00:06:00", 0.005),
            ("a", "2024-01-01 00:07:00", 2.10)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    out = windowed_event_counts(df).collect()
    assert len(out) == 1
    # 8.845 -> 885, 0.005 -> 1 (round(0.4999..) was 0), 2.10 -> 210
    assert out[0]["value_sum_cents"] == 885 + 1 + 210
    assert out[0]["n"] == 3


def test_streaming_dup_spans_equal_batch(spark, tmp_path):
    """Custom stateful span dedup: pending occurrences are emitted
    retroactively at the min_docs crossing, so the union of emissions over
    an arbitrary batch split equals the BATCH flagged (id, pos) set
    exactly — including the doc that arrived before its gram was known to
    be duplicated."""
    from pysemanticcomplexity_spark.operators.dedup import (
        duplicate_gram_positions)
    from pysemanticcomplexity_spark.streaming.dedup import (
        streaming_dup_span_positions)

    shared = "alpha bravo charlie delta echo"
    b1 = [(0, f"start {shared} end one"),
          (1, "totally different text here now")]
    b2 = [(2, f"prefix {shared} suffix two"),        # crosses min_docs=2
          (3, f"again {shared} third copy"),         # already open
          (4, "still nothing shared anywhere here")]
    schema = "doc_id long, text string"

    src = tmp_path / "span_src"
    out = str(tmp_path / "span_out")
    chk = str(tmp_path / "span_chk")
    src.mkdir()

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src) + "/*"))

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out)

        q = (streaming_dup_span_positions(stream, n=5, min_docs=2)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", chk)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)

    spark.createDataFrame(b1, schema).write.parquet(str(src / "b1"))
    drain()
    # nothing duplicated yet: no emissions in batch 1
    import os
    got1 = (spark.read.parquet(out).count()
            if os.path.exists(out) else 0)
    assert got1 == 0
    spark.createDataFrame(b2, schema).write.parquet(str(src / "b2"))
    drain()                                 # resumes from checkpoint state

    got = {(r["id"], r["pos"]) for r in spark.read.parquet(out).collect()}
    batch_docs = spark.createDataFrame(b1 + b2, schema)
    want = {(r["id"], r["pos"]) for r in
            duplicate_gram_positions(batch_docs, n=5, min_docs=2).collect()}
    assert got == want
    assert {i for i, _ in got} == {0, 2, 3}   # doc 0 flagged retroactively


def test_iceberg_gate_and_parquet_default(spark, tmp_path):
    """The Iceberg branch is capability-gated with actionable guidance;
    the parquet default is unchanged."""
    import pytest as _pytest
    from pysemanticcomplexity_spark.sources import tables
    df = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v long")
    assert tables.iceberg_available(spark) is False   # no jars in sandbox
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        tables.write_table(df, "cat.db.t", table_format="iceberg")
    with _pytest.raises(ValueError, match="table_format"):
        tables.write_table(df, str(tmp_path / "t"), table_format="orc")
    path = str(tmp_path / "t")
    tables.write_table(df, path, n_buckets=4)
    got = tables.read_table(spark, path)
    assert sorted((r["url"], r["v"]) for r in got.collect()) == \
        [("u1", 1), ("u2", 2)]
