#!/usr/bin/env python
"""spark-submit job for the EXECUTOR-SHARDED scaling protocol
(run_scaling_executors.py): build the index of one or more corpus
shards, run the benchmark query set against each shard index, report
per-shard build seconds and per-shard query rows.

One pinned JVM = one pseudo-executor. The N-executor level submits this
job once with ALL shards (sequential builds in one JVM); the
4N-executor level submits four concurrent jobs, one shard each, pinned
to disjoint cores. Shard indexes are bit-identical across levels (same
input, same code), so the runner's merged top-k hash must match — the
rank-identity criterion."""

from __future__ import annotations

import argparse
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
    ap.add_argument("--shard-dirs", required=True,
                    help="comma-separated shard parquet dirs")
    ap.add_argument("--index-base", required=True,
                    help="shard i's index goes to <index-base>_<shard name>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    args = ap.parse_args()

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.query.engine import SearchEngine

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(
        stopstem=True, skip_threshold=64, shuffle_partitions=args.cpus
    )

    shard_dirs = args.shard_dirs.split(",")

    # warm-up build on a slice of the first shard: JVM JIT + Python
    # worker pool spin-up is steady-state on a long-lived executor and
    # excluded from throughput (same control as scaling_job.py)
    warm_src = spark.read.parquet(shard_dirs[0]).sample(0.05, seed=1)
    warm_dir = args.index_base + "_warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, warm_src, warm_dir, cfg, resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)

    shards = []
    for sd in shard_dirs:
        name = sd.rstrip("/").rsplit("/", 1)[-1]
        idx = f"{args.index_base}_{name}"
        shutil.rmtree(idx, ignore_errors=True)
        corpus = spark.read.parquet(sd)
        n = corpus.count()
        t0 = time.time()
        build_index(spark, corpus, idx, cfg, resume=False)
        build_sec = time.time() - t0

        engine = SearchEngine(spark, idx)
        lat, results = [], {}
        for qid, text in QUERIES:
            t0 = time.time()
            rows = engine.search(text, k=10).collect()
            lat.append(time.time() - t0)
            results[qid] = [
                [r["doc_id"], round(r["score"], 9)] for r in rows
            ]
        shards.append(
            {
                "shard": name,
                "n_docs": n,
                "build_sec": round(build_sec, 3),
                "query_p50_sec": round(statistics.median(lat), 4),
                "results": results,
            }
        )

    with open(args.out, "w") as f:
        json.dump({"cpus": args.cpus, "shards": shards}, f)
    spark.stop()


if __name__ == "__main__":
    main()
