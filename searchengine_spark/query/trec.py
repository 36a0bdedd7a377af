"""TREC run sink + batch evaluation — the reference's TestPerformance
modes (test/TestPerformance.java:58-147) as batch DataFrame jobs.

S10 run-file sink: lines ``qid Q0 docno rank score run_id``
(TestPerformance.java:131-140 formats exactly these six columns).
"""

from __future__ import annotations

import os
import statistics
import time
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import SearchEngine


def read_query_tsv(path: str) -> list[tuple[str, str]]:
    """S2 query-set scan: ``qid\\ttext`` lines -> (qid, text) pairs.
    Blank lines and lines without a tab are skipped — the reference
    ignores malformed query lines the same way
    (TestPerformance.java:63-70)."""
    queries: list[tuple[str, str]] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or "\t" not in line:
                continue
            qid, text = line.split("\t", 1)
            queries.append((qid, text))
    return queries


def parse_trec_run(path: str) -> list[tuple[str, str, str, int, float, str]]:
    """Inverse of :func:`write_trec_run`: parse run-file lines back to
    (query_id, 'Q0', docno, rank, score, run_id) tuples — the round-trip
    that pins the sink's on-disk format."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 6:
                continue
            qid, q0, docno, rank, score, run_id = parts
            rows.append((qid, q0, docno, int(rank), float(score), run_id))
    return rows


def trec_run_df(
    engine: SearchEngine,
    queries: Sequence[tuple[str, str]],
    k: int = 100,
    run_id: str = "RUN-01",
    results: DataFrame | None = None,
    **search_kw,
) -> DataFrame:
    """(query_id, 'Q0', docno, rank, score, run_id) for the query set —
    top-100 per query like the reference's effectiveness mode
    (TestPerformance.java:111-141). Pass precomputed ``results``
    (batch_search output) to reuse one batch job for both the run file
    and metric computation."""
    if results is None:
        results = engine.batch_search(queries, k=k, **search_kw)
    # broadcast the (k * |queries|)-row result; stream the doctable past it
    return (
        engine.doctable.select("doc_id", "docno")
        .join(F.broadcast(results), "doc_id")
        .select(
            "query_id",
            F.lit("Q0").alias("q0"),
            "docno",
            "rank",
            "score",
            F.lit(run_id).alias("run_id"),
        )
        .orderBy("query_id", "rank")
    )


def write_trec_run(run_df: DataFrame, path: str) -> None:
    """Write the run as whitespace-separated lines (trec_eval input).
    Single text file — run files are k*|queries| rows, driver-sized."""
    rows = run_df.collect()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(
                f"{r['query_id']} Q0 {r['docno']} {r['rank']} "
                f"{r['score']:.6f} {r['run_id']}\n"
            )


def efficiency_report(
    engine: SearchEngine,
    queries: Sequence[tuple[str, str]],
    k: int = 10,
    **search_kw,
) -> dict:
    """Per-query + aggregate wall-clock latency — the reference's
    efficiency mode (TestPerformance.java:58-104). Serial per-query jobs:
    measures interactive latency. For throughput over a large query set
    use :func:`batch_efficiency_report` (one job, amortized cost)."""
    per_query = {}
    for qid, text in queries:
        t0 = time.time()
        engine.search(text, k=k, **search_kw).collect()
        per_query[qid] = round(time.time() - t0, 4)
    lat = list(per_query.values())
    if not lat:
        return {"per_query_sec": {}, "mean_sec": None, "p50_sec": None,
                "max_sec": None, "k": k}
    return {
        "per_query_sec": per_query,
        "mean_sec": round(sum(lat) / len(lat), 4),
        "p50_sec": round(statistics.median(lat), 4),
        "max_sec": round(max(lat), 4),
        "k": k,
    }


def batch_efficiency_report(
    engine: SearchEngine,
    queries: Sequence[tuple[str, str]],
    k: int = 10,
    **search_kw,
) -> dict:
    """Amortized throughput over the query set via the single-job batch
    path (engine.batch_search): one wall-clock for N queries. This is the
    number that stays ~flat per added query — the scale story the serial
    report can't show (its cost is N x job-submission overhead)."""
    t0 = time.time()
    # ONE action: the per-query result counts ride the same job as the
    # total (a groupBy over the <= N*k result rows), and unlike the
    # latencies they are DETERMINISTIC — the driver oracle pins them
    per_counts = {
        r["query_id"]: r["count"]
        for r in engine.batch_search(queries, k=k, **search_kw)
        .groupBy("query_id")
        .count()
        .collect()
    }
    total = time.time() - t0
    for qid, _text in queries:
        per_counts.setdefault(qid, 0)  # all-unknown-term queries: 0 rows
    n_rows = int(sum(per_counts.values()))
    n = max(len(queries), 1)
    return {
        "n_queries": len(queries),
        "result_rows": n_rows,
        "per_query_results": per_counts,
        "total_sec": round(total, 4),
        "amortized_sec_per_query": round(total / n, 4),
        "queries_per_sec": round(n / total, 2) if total > 0 else None,
        "k": k,
    }
