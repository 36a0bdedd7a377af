#!/usr/bin/env python
"""Zipfian-corpus scale datapoints (BASELINE.md §"Realistic-vocabulary
measurements") — the evidence the 24-term `documents` table cannot give:

1. MaxScore vs DAAT p50 on a 1M-doc / 200k-term index with
   mixed-selectivity queries (rare + mid + 2 common terms), interleaved
   best-of-3 per query, identical top-k asserted.
2. 1000-query batch amortization at the same 1M-doc index — queries
   drawn rotating through the full df-rank space (realistic low term
   overlap), ONE Spark job.
3. Banded-LSH ANN probe latency at three corpus sizes (the
   partition-pruned probe should be ~flat in corpus size).

Writes ZIPF_SCALE.json at the repo root. Corpora and indexes are cached
under /tmp keyed by their parameters; a cold run is ~10 min at
local[32], a warm one ~2 min.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 1_000_000
VOCAB = 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from bench import make_spark

    from searchengine_spark.config import EngineConfig
    from searchengine_spark.index.builder import build_index
    from searchengine_spark.pipeline import similarity as SIM
    from searchengine_spark.query.engine import SearchEngine
    from searchengine_spark.sources.synth import (
        mixed_selectivity_queries,
        zipf_corpus,
    )
    from pyspark.sql import functions as F

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": N_DOCS, "vocab": VOCAB, "cpus": CPUS}

    src = f"/tmp/se_zipf_{N_DOCS}_{VOCAB}_src"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        t0 = time.time()
        zipf_corpus(spark, N_DOCS, vocab_size=VOCAB).write.mode(
            "overwrite"
        ).parquet(src)
        out["gen_sec"] = round(time.time() - t0, 1)
    idx = f"/tmp/se_zipf_{N_DOCS}_{VOCAB}_idx"
    cfg = EngineConfig(stopstem=True, skip_threshold=64, shuffle_partitions=CPUS)
    if not os.path.exists(os.path.join(idx, "stats.json")):
        t0 = time.time()
        build_index(spark, spark.read.parquet(src), idx, cfg, resume=False)
        out["build_sec"] = round(time.time() - t0, 1)
        out["build_docs_per_sec"] = round(N_DOCS / out["build_sec"], 1)
    engine = SearchEngine(spark, idx)
    out["build_tokens_per_sec"] = (
        round(engine.stats["tot_doc_len"] / out["build_sec"], 1)
        if "build_sec" in out
        else None
    )

    # --- 1. MaxScore vs DAAT, interleaved best-of-3 ---
    lex = [
        (r["term"], r["df"])
        for r in engine.lexicon.select("term", "df").collect()
    ]
    queries = mixed_selectivity_queries(lex, 16)
    engine.search(queries[0], k=10).collect()
    engine.search(queries[0], k=10, algo="maxscore").collect()
    best = {"daat": [], "maxscore": []}
    digests = {"daat": hashlib.sha256(), "maxscore": hashlib.sha256()}
    for q in queries:
        per = {"daat": [], "maxscore": []}
        for _ in range(3):
            for algo in ("daat", "maxscore"):
                t0 = time.time()
                rows = engine.search(q, k=10, algo=algo).collect()
                per[algo].append(time.time() - t0)
        for a in per:
            best[a].append(min(per[a]))
        for algo in ("daat", "maxscore"):
            for r in engine.search(q, k=10, algo=algo).collect():
                digests[algo].update(
                    f"{q}|{r['rank']}|{r['doc_id']}|{round(r['score'], 9)}\n".encode()
                )
    assert digests["daat"].hexdigest() == digests["maxscore"].hexdigest(), (
        "MaxScore results differ from DAAT"
    )
    out["query_daat_p50"] = round(statistics.median(best["daat"]), 3)
    out["query_daat_mean"] = round(sum(best["daat"]) / len(best["daat"]), 3)
    out["query_maxscore_p50"] = round(statistics.median(best["maxscore"]), 3)
    out["query_maxscore_mean"] = round(
        sum(best["maxscore"]) / len(best["maxscore"]), 3
    )
    out["maxscore_equals_daat"] = True
    out["maxscore_wins"] = sum(
        m < d for m, d in zip(best["maxscore"], best["daat"])
    )
    out["n_queries"] = len(queries)

    # --- 2. batch-1000 amortization at 1M docs ---
    # rotate through the df-rank space: realistic low overlap between
    # queries (the 24-term table's degenerate every-term-in-every-query
    # overlap is exactly what this corpus avoids)
    ranked = [t for t, _ in sorted(lex, key=lambda r: (-r[1], r[0]))]
    nt = len(ranked)
    big_qs = [
        (
            f"b{i:04d}",
            f"{ranked[(i * 37) % (nt // 2)]} {ranked[nt // 2 + (i * 101) % (nt // 3)]}",
        )
        for i in range(1000)
    ]
    t0 = time.time()
    n_rows = engine.batch_search(big_qs, k=10).count()
    batch_sec = time.time() - t0
    out["batch_1000_sec"] = round(batch_sec, 2)
    out["batch_1000_amortized_sec"] = round(batch_sec / 1000, 4)
    out["batch_1000_result_rows"] = n_rows

    # --- 3. ANN probe latency vs corpus size ---
    emb_src = "/root/testdata/sf0.1/embeddings.parquet"
    emb = spark.read.parquet(emb_src)
    n_src = emb.count()
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    probes = {}
    for reps in (1, 20, 400):
        if reps == 1:
            e = emb
        else:
            esrc = f"/tmp/se_zipf_emb_r{reps}"
            if not os.path.exists(os.path.join(esrc, "_SUCCESS")):
                rr = spark.range(reps).select(F.col("id").alias("_rep"))
                (
                    emb.crossJoin(F.broadcast(rr))
                    .select(
                        (F.col("vec_id") + F.col("_rep") * n_src).alias(
                            "vec_id"
                        ),
                        "embedding",
                        "label",
                    )
                    .repartition(min(64, CPUS * 2))
                    .write.mode("overwrite")
                    .parquet(esrc)
                )
            e = spark.read.parquet(esrc)
        ann_dir = f"/tmp/se_zipf_ann_r{reps}"
        if not os.path.exists(ann_dir):
            SIM.ann_build_lsh(e, ann_dir, dim=len(qv), n_planes=16, bands=4)
        lat = []
        SIM.ann_query_lsh(spark, ann_dir, qv, k=10, max_hamming=8).collect()
        for _ in range(3):
            t0 = time.time()
            SIM.ann_query_lsh(spark, ann_dir, qv, k=10, max_hamming=8).collect()
            lat.append(time.time() - t0)
        probes[f"{reps * n_src}_vectors"] = round(min(lat), 4)
    out["ann_probe_best_sec_by_corpus"] = probes

    with open(os.path.join(REPO, "ZIPF_SCALE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
