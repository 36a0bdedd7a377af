"""Command-line entry points — the reference's three mains re-expressed:

  build   IndexBuilder.main (index build with flags)     Main.java / IndexBuilder.java:15
  query   Main.main (single interactive-style query)     Main.java:16-62
  batch   TestPerformance.main (efficiency/effectiveness) TestPerformance.java:24

Usage (spark-submit or plain python):
  python -m searchengine_spark build --input /root/testdata/sf0.01 --index /tmp/idx
  python -m searchengine_spark query --index /tmp/idx --text "spark join" --k 10
  python -m searchengine_spark batch --index /tmp/idx --queries q.tsv --mode efficiency
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(cpus: int | None):
    b = SparkSession.builder.appName("searchengine-spark")
    if cpus:
        b = b.master(f"local[{cpus}]").config(
            "spark.sql.shuffle.partitions", str(cpus)
        )
    return b.config("spark.sql.adaptive.enabled", "true").getOrCreate()


def cmd_build(args) -> None:
    from .config import EngineConfig
    from .index.builder import build_index
    from .sources.corpus import load_documents_as_corpus

    spark = _spark(args.cpus)
    cfg = EngineConfig(
        stopstem=not args.no_sws,
        compression=args.compression,
        skip_threshold=args.skip_threshold,
    )
    corpus = load_documents_as_corpus(spark, args.input)
    manifest = build_index(spark, corpus, args.index, cfg, resume=not args.no_resume)
    print(json.dumps({s: v.get("duration_sec") for s, v in manifest["stages"].items()}))


def cmd_query(args) -> None:
    from .query.engine import SearchEngine

    spark = _spark(args.cpus)
    engine = SearchEngine(spark, args.index)
    rows = engine.search(
        args.text,
        k=args.k,
        mode="conjunctive" if args.conjunctive else "disjunctive",
        scorer=args.scorer,
        algo=args.algo,
        with_docno=True,
    ).collect()
    for r in sorted(rows, key=lambda r: r["rank"]):
        print(f"{r['rank']:>4}  {r['score']:>12.6f}  {r['doc_id']:>10}  {r['docno']}")


def cmd_batch(args) -> None:
    from .query.engine import SearchEngine
    from .query.trec import efficiency_report, trec_run_df, write_trec_run

    spark = _spark(args.cpus)
    engine = SearchEngine(spark, args.index)
    queries = []
    with open(args.queries) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or "\t" not in line:
                continue  # reference skips malformed query lines
            qid, text = line.split("\t", 1)
            queries.append((qid, text))
    if args.mode == "efficiency":
        print(json.dumps(efficiency_report(engine, queries, k=args.k, algo=args.algo)))
    else:
        run = trec_run_df(engine, queries, k=args.k, algo=args.algo)
        write_trec_run(run, args.out)
        print(f"wrote {args.out}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="searchengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--no-sws", action="store_true", help="disable stopword+stem")
    b.add_argument("--compression", action="store_true")
    b.add_argument("--skip-threshold", type=int, default=1024)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--cpus", type=int)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--k", type=int, default=10, choices=[10, 20, 100])
    q.add_argument("--conjunctive", action="store_true")
    q.add_argument("--scorer", choices=["bm25", "tfidf"], default="bm25")
    q.add_argument("--algo", choices=["daat", "maxscore"], default="daat")
    q.add_argument("--cpus", type=int)
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("batch")
    t.add_argument("--index", required=True)
    t.add_argument("--queries", required=True, help="TSV: qid\\ttext")
    t.add_argument("--mode", choices=["efficiency", "effectiveness"], default="efficiency")
    t.add_argument("--k", type=int, default=10)
    t.add_argument("--algo", choices=["daat", "maxscore"], default="daat")
    t.add_argument("--out", default="run.txt")
    t.add_argument("--cpus", type=int)
    t.set_defaults(fn=cmd_batch)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
