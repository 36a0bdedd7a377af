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
import os
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
    ap.add_argument(
        "--replicas",
        type=int,
        default=100,
        help="deterministic corpus expansion factor: each source row becomes"
        " R rows with distinct paths (r<j>/<path>) and unchanged content."
        " The 5k-doc sf0.1 table finishes in seconds — far too little work"
        " for a core-scaling measurement; throughput must be CPU-bound,"
        " not job-overhead-bound, for the N-vs-4N criterion to mean"
        " anything.",
    )
    ap.add_argument("--warmup", action="store_true", default=True)
    ap.add_argument("--no-warmup", dest="warmup", action="store_false")
    ap.add_argument(
        "--cpus",
        type=int,
        default=0,
        help="total cores across executors (shuffle-partition hint);"
        " defaults to sparkContext.defaultParallelism, which local-cluster"
        " masters may report before executors register — pass explicitly"
        " there",
    )
    args = ap.parse_args()

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.sources.corpus import load_documents_as_corpus

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = args.cpus or spark.sparkContext.defaultParallelism

    cfg = EngineConfig(stopstem=True, skip_threshold=64, shuffle_partitions=cpus)
    shutil.rmtree(args.index_dir, ignore_errors=True)

    corpus = load_documents_as_corpus(spark, args.sf_dir)
    if args.replicas > 1:
        # Materialize the expanded corpus as MULTI-FILE parquet before the
        # timed run: a real corpus at scale arrives as thousands of splits;
        # generating it lazily from the one-file source table would feed
        # the whole build through a single scan task — an artifact of the
        # synthetic setup, not something the engine should be graded on.
        from pyspark.sql import functions as F

        src_dir = f"/tmp/scaling_corpus_r{args.replicas}"
        if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
            reps = spark.range(args.replicas).select(
                F.col("id").cast("string").alias("_rep")
            )
            (
                corpus.crossJoin(F.broadcast(reps))
                .select(
                    "repo",
                    F.concat(F.lit("r"), "_rep", F.lit("/"), "path").alias("path"),
                    "commit",
                    "lang",
                    "content",
                )
                .repartition(64)
                .write.mode("overwrite")
                .parquet(src_dir)
            )
        corpus = spark.read.parquet(src_dir)
    n_docs = corpus.count()

    # Warm-up build on a 1/8 slice: spins up the Python worker pool AND
    # lets the JVM JIT compile the whole-stage-codegen / parquet writer
    # paths (first-build stage times are ~2x slower purely from cold JIT).
    # Cluster bring-up + JIT warmth is steady-state on a real cluster and
    # excluded from throughput, as in the reference's timings.
    if args.warmup:
        warm_dir = args.index_dir + "_warmup"
        shutil.rmtree(warm_dir, ignore_errors=True)
        frac = min(0.125, max(0.02, 100_000 / max(n_docs, 1)))
        build_index(
            spark,
            corpus.sample(fraction=frac, seed=1),
            warm_dir,
            cfg,
            resume=False,
        )
        shutil.rmtree(warm_dir, ignore_errors=True)

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

    # --- materialized banded-LSH ANN at scale: build over the expanded
    # embeddings table, then partition-pruned probes. The claim under
    # test: the probe reads only its bands' partitions, so query latency
    # is ~flat in corpus size while build throughput scales with cores.
    emb_path = os.path.join(args.sf_dir, "embeddings.parquet")
    ann = {}
    if os.path.exists(emb_path):
        from searchengine_spark.pipeline import similarity as SIM

        emb = spark.read.parquet(emb_path)
        if args.replicas > 1:
            esrc = f"/tmp/scaling_emb_r{args.replicas}"
            if not os.path.exists(os.path.join(esrc, "_SUCCESS")):
                reps = spark.range(args.replicas).select(F.col("id").alias("_rep"))
                n_src = emb.count()
                (
                    emb.crossJoin(F.broadcast(reps))
                    .select(
                        (F.col("vec_id") + F.col("_rep") * n_src).alias("vec_id"),
                        "embedding",
                        "label",
                    )
                    .repartition(64)
                    .write.mode("overwrite")
                    .parquet(esrc)
                )
            emb = spark.read.parquet(esrc)
        n_vecs = emb.count()
        qvs = [r["embedding"] for r in
               spark.read.parquet(emb_path).orderBy("vec_id").limit(5).collect()]
        dim = len(qvs[0])
        ann_dir = args.index_dir + "_ann"
        shutil.rmtree(ann_dir, ignore_errors=True)
        t0 = time.time()
        SIM.ann_build_lsh(emb, ann_dir, dim=dim, n_planes=16, bands=4)
        ann_build_sec = time.time() - t0
        alat, ad = [], hashlib.sha256()
        for i, qv in enumerate(qvs):
            t0 = time.time()
            rows = SIM.ann_query_lsh(spark, ann_dir, qv, k=10, max_hamming=8).collect()
            alat.append(time.time() - t0)
            for r in rows:
                ad.update(f"{i}|{r['vec_id']}|{r['cosine']}\n".encode())
        ann = {
            "ann_n_vectors": n_vecs,
            "ann_build_sec": round(ann_build_sec, 3),
            "ann_build_vecs_per_sec": round(n_vecs / ann_build_sec, 1),
            "ann_query_p50_sec": round(statistics.median(alat), 4),
            "ann_sha256": ad.hexdigest(),
        }

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
        **ann,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
