#!/usr/bin/env python
"""spark-submit job for the north_rule scaling protocol.

Runs the FULL pipeline — index build from the canonical corpus + the
benchmark BM25 query set — at the parallelism of the submitting master,
and writes a JSON report with:

  * build wall time + docs/sec throughput
  * per-query latency + p50 (BM25, k=10)
  * a sha256 over the full (rank, doc_id, round(score, 9)) top-k output
    of every query — byte-identical hashes across parallelism levels are
    the rank-identity criterion of BASELINE.md's scaling protocol.

Launched by scripts/run_scaling.py via
  spark-submit --master local[N] --py-files searchengine_spark.zip \
      scripts/scaling_job.py --sf-dir ... --out report_N.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import statistics
import time

from pyspark.sql import SparkSession

QUERIES = [
    ("q1", "spark table join fast"),
    ("q2", "window agg customer stream"),
    ("q3", "index merge batch"),
    ("q4", "fast sort shuffle partition"),
    ("q5", "stream state checkpoint"),
    ("q6", "row column vector batch"),
    ("q7", "query plan optimizer cost"),
    ("q8", "hash join broadcast skew"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--index-dir", required=True)
    args = ap.parse_args()

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.sources.corpus import load_documents_as_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    cfg = EngineConfig(stopstem=True, skip_threshold=64, shuffle_partitions=cpus)
    shutil.rmtree(args.index_dir, ignore_errors=True)

    corpus = load_documents_as_corpus(spark, args.sf_dir)
    n_docs = corpus.count()

    t0 = time.time()
    build_index(spark, corpus, args.index_dir, cfg, resume=False)
    build_sec = time.time() - t0

    engine = SearchEngine(spark, args.index_dir)
    lat, digest = [], hashlib.sha256()
    for qid, text in QUERIES:
        t0 = time.time()
        rows = engine.search(text, k=10).collect()
        lat.append(time.time() - t0)
        for r in rows:
            digest.update(
                f"{qid}|{r['rank']}|{r['doc_id']}|{round(r['score'], 9)}\n".encode()
            )

    report = {
        "cpus": cpus,
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "build_docs_per_sec": round(n_docs / build_sec, 2),
        "query_p50_sec": round(statistics.median(lat), 4),
        "query_mean_sec": round(sum(lat) / len(lat), 4),
        "query_lat_sec": [round(x, 4) for x in lat],
        "topk_sha256": digest.hexdigest(),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
