"""CLI mirroring the reference's staged subcommands (pysemcom.py:52-80,
SURVEY.md §3.2), re-based on parquet stage tables:

  python -m pysemanticcomplexity_spark.cli texts2vectors  <pages_dir> <out_dir>
  python -m pysemanticcomplexity_spark.cli texts2concepts <pages_dir> <out_dir>
  python -m pysemanticcomplexity_spark.cli concepts2info   <concepts_dir> <out_dir>
  python -m pysemanticcomplexity_spark.cli concepts2graphs <concepts_dir> <info_dir> <out_dir>
  python -m pysemanticcomplexity_spark.cli graphs2vectors  <graphs_dir> <out_csv_dir>

The fixture gazetteer/ontology/KB stand in for the reference's remote
services (--gazetteer/--ontology flags accept parquet overrides). Designed
for `spark-submit --py-files pysemanticcomplexity_spark.zip cli.py ...` on a
real cluster; runs on local[N] here.
"""
from __future__ import annotations

import argparse
import sys

import pyspark.sql.functions as F


def _spark(args):
    from pyspark.sql import SparkSession

    from .session import get_spark
    preexisting = SparkSession.getActiveSession() is not None
    return get_spark(app_name=f"pysemcom-{args.cmd}"), preexisting


class DimensionError(SystemExit):
    """Loud failure: a required dimension was neither provided nor
    explicitly requested as fixture data."""


def _dims(spark, args, *needed):
    """Resolve the dimension tables a subcommand needs.

    Real runs pass parquet paths (--gazetteer/--ontology/--instance-types/
    --kb); test/demo runs opt in explicitly with --fixtures. Silently
    substituting fixture data for a missing path would hand a real user
    synthetic gazetteers/KBs — fail loudly instead."""
    from . import fixtures
    out = {}
    for name in needed:
        path = getattr(args, name.replace("-", "_"), None)
        if path:
            df = spark.read.parquet(path)
            # select the documented columns BY NAME (and fail loudly if one
            # is missing): positional tuple(r) would silently mis-assign
            # fields when a parquet carries them in a different physical
            # order — several are strings, so no type error would save us
            expected = {"gazetteer": ["surface", "uri", "support", "prior",
                                      "types_csv"],
                        "ontology": ["child", "parent"]}.get(name)
            if expected is not None:
                missing = [c for c in expected if c not in df.columns]
                if missing:
                    raise DimensionError(
                        f"error: --{name} parquet at {path} is missing "
                        f"required column(s) {missing}; expected {expected}")
                if name == "ontology" and "ns" in df.columns:
                    expected = expected + ["ns"]
                out[name] = [tuple(r) for r in df.select(*expected).collect()]
            else:
                out[name] = df
        elif args.fixtures:
            if name == "gazetteer":
                out[name] = fixtures.gazetteer()
            elif name == "ontology":
                out[name] = fixtures.ontology_edges()
            else:
                fx = fixtures.spark_dims(spark)
                out[name] = fx["instance_types" if name == "instance_types"
                               else "kb_triples"]
        else:
            raise DimensionError(
                f"error: subcommand '{args.cmd}' needs the '{name}' "
                f"dimension: pass --{name} <parquet_path>, or pass "
                f"--fixtures to explicitly run on built-in fixture data")
    return out



def main(argv=None):
    ap = argparse.ArgumentParser(prog="pysemanticcomplexity_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, nargs in [("texts2vectors", 2), ("texts2concepts", 2),
                        ("concepts2info", 2), ("concepts2graphs", 3),
                        ("graphs2vectors", 2), ("printgraph", 2),
                        ("texts2synlexvectors", 2)]:
        p = sub.add_parser(name)
        p.add_argument("paths", nargs=nargs)
        p.add_argument("--buckets", type=int, default=64)
        p.add_argument("--fixtures", action="store_true",
                       help="explicitly run on the built-in fixture "
                            "gazetteer/ontology/KB (test/demo data)")
        p.add_argument("--gazetteer", help="parquet of (surface, uri, "
                       "support, prior, types_csv) rows")
        p.add_argument("--ontology", help="parquet of (child, parent[, ns]) "
                       "subClassOf edges")
        p.add_argument("--instance-types", dest="instance_types",
                       help="parquet of (uri, type_uri) rows")
        p.add_argument("--kb", help="parquet of (subj, pred, obj) KB triples")
        if name == "graphs2vectors":
            # reference `-on/--ontology` (subprograms/graphs2vectors.py:26,
            # minus its latent dict-unpack bug); --ontology here already
            # names the edges parquet, so the filter is -on/--namespace
            p.add_argument("-on", "--namespace", action="append",
                           dest="namespace", metavar="KEY",
                           help="restrict per-namespace feature columns to "
                                "these managed-namespace keys (repeatable; "
                                "default: all)")
        if name == "texts2vectors":
            # reference `-f/--force` (subprograms/texts2concepts.py:32):
            # ignore existing per-bucket outputs and recompute everything
            p.add_argument("-f", "--force", action="store_true",
                           help="recompute all buckets even if a previous "
                                "run left committed outputs (disables "
                                "lineage resume)")
    args = ap.parse_args(argv)

    spark, preexisting = _spark(args)
    from .operators import annotate, enrich, vectorize
    from .sources import tables
    from .sources.pages import read_pages

    # resolve (and loudly validate) required dimensions BEFORE any work
    needed = {"texts2vectors": ("gazetteer", "ontology", "instance_types",
                                "kb"),
              "texts2concepts": ("gazetteer",),
              "concepts2info": ("instance_types", "kb"),
              "concepts2graphs": ("ontology",),
              "graphs2vectors": (), "printgraph": (),
              "texts2synlexvectors": ()}[args.cmd]
    d = _dims(spark, args, *needed)

    if args.cmd == "texts2vectors":
        src, out = args.paths
        from .pipeline import KGPipeline
        pipe = KGPipeline(spark, d["gazetteer"], d["ontology"],
                          d["instance_types"], d["kb"])
        pipe.run_and_write(read_pages(spark, src), out, n_buckets=args.buckets,
                           resume=not args.force)

    elif args.cmd == "texts2concepts":
        src, out = args.paths
        ann = annotate.annotate_pages(spark, read_pages(spark, src),
                                      d["gazetteer"])
        mentions, doc_words = annotate.split_mentions(ann)
        tables.write_table(tables.concepts_nested(mentions, doc_words), out,
                           n_buckets=args.buckets)

    elif args.cmd == "concepts2info":
        src, out = args.paths
        concepts = tables.read_table(spark, src)
        uris = (concepts.select(F.explode("mentions.uri").alias("uri"))
                .distinct())
        info = enrich.concept_info(uris, d["instance_types"], d["kb"])
        info.write.mode("overwrite").parquet(out)

    elif args.cmd == "concepts2graphs":
        src, info_dir, out = args.paths
        from .operators import graph
        concepts = tables.read_table(spark, src)
        info = spark.read.parquet(info_dir)
        mentions = concepts.select(
            "url", F.explode("mentions").alias("m")).select(
            "url", "m.uri", F.col("m.scores.offset").alias("offset"),
            F.col("m.types").alias("spotlight_types"))
        resources = graph.resource_concepts(mentions, info)
        closure = graph.closure_table(spark, d["ontology"])
        triples = graph.build_triples(resources, closure)
        nodes = graph.build_nodes(resources, triples)
        tables.write_table(triples, out + "/triples", n_buckets=args.buckets)
        tables.write_table(nodes, out + "/nodes", n_buckets=args.buckets)
        doc_words = concepts.select("url", "nb_words")
        doc_words.write.mode("overwrite").parquet(out + "/doc_words")

    elif args.cmd == "graphs2vectors":
        src, out = args.paths
        triples = tables.read_table(spark, src + "/triples")
        nodes = tables.read_table(spark, src + "/nodes")
        doc_words = spark.read.parquet(src + "/doc_words")
        from . import feature_columns
        ns = args.namespace or None
        feats = vectorize.vectorize(nodes, triples, doc_words, namespaces=ns)
        tables.write_features_csv(feats, out, columns=feature_columns(ns))

    elif args.cmd == "texts2synlexvectors":
        # reference subprograms/texts2synLexVectors.py:35-46: texts ->
        # one CSV of 23 syntactic + 32 deterministic lexical features
        # (the two unseeded-random ndw-variants excluded by design; -nc/
        # --mem-* java flags have no Spark equivalent — parallelism and
        # memory come from the session)
        src, out = args.paths
        from .operators.syntactic import SYNLEX_CSV_COLUMNS, synlex_vectors
        feats = synlex_vectors(read_pages(spark, src))
        tables.write_features_csv(feats, out, columns=SYNLEX_CSV_COLUMNS)

    elif args.cmd == "printgraph":
        # reference subprograms/printGraph.py equivalent: dump one document's
        # concept graph as DOT on stdout
        graphs_dir, url = args.paths
        triples = tables.read_table(spark, graphs_dir + "/triples") \
            .filter(F.col("url") == url)
        nodes = tables.read_table(spark, graphs_dir + "/nodes") \
            .filter(F.col("url") == url)
        print(to_dot(url, nodes.collect(), triples.collect()))

    if not preexisting:        # embedded callers keep their session
        spark.stop()


def to_dot(url: str, node_rows, triple_rows) -> str:
    """Graphviz DOT text for one document's concept graph."""
    lines = [f'graph "{url}" {{']
    for r in sorted(node_rows, key=lambda x: x["node_id"]):
        shape = "box" if r["is_resource"] else "ellipse"
        label = r["node_id"].rsplit("/", 1)[-1]
        lines.append(f'  "{r["node_id"]}" [shape={shape}, label="{label}"];')
    for r in sorted(triple_rows, key=lambda x: (x["subj"], x["obj"])):
        style = "solid" if r["pred"] == "hasType" else "dashed"
        lines.append(f'  "{r["subj"]}" -- "{r["obj"]}" [style={style}];')
    lines.append("}")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
