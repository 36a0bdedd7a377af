"""Retrieval-effectiveness metrics — the reference evaluates its TREC
run files with the EXTERNAL trec_eval tool (Documentation.pdf §5,
README.md:40); these are the same two reported metrics (reciprocal rank,
nDCG@k) as native DataFrame aggregations, so the whole
build → batch-query → evaluate loop runs inside the engine.

Inputs:
  run    (query_id, rank, doc_id, ...) — engine.batch_search /
         trec_run_df output; rank is 1-based, unique per query.
  qrels  (query_id, doc_id, rel) — graded relevance judgments
         (rel > 0 means relevant; graded values feed nDCG's gains).

Both functions return one row per query plus aggregate helpers; queries
with no relevant judgments are dropped (trec_eval behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reciprocal_rank(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """(query_id, rr): 1/rank of the first relevant result, 0.0 when no
    relevant doc was retrieved. Mean over queries = MRR (the reference's
    'RR' in Documentation.pdf Table 5)."""
    rel = qrels.filter(F.col("rel") > 0).select("query_id", "doc_id")
    hits = run.join(rel, ["query_id", "doc_id"]).groupBy("query_id").agg(
        (F.lit(1.0) / F.min("rank")).alias("rr")
    )
    all_q = rel.select("query_id").distinct()
    return all_q.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("rr", F.lit(0.0)).alias("rr")
    )


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, ndcg): DCG@k with graded gains (2^rel - 1)/log2(rank+1)
    over the run's ranking, normalized by the ideal DCG@k from the
    query's judgments sorted by rel desc."""
    graded = qrels.filter(F.col("rel") > 0).select(
        "query_id", "doc_id", F.col("rel").cast("double").alias("rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0)

    def _rank_ordered_sum(df, rank_col, alias):
        # ORDER-DETERMINISTIC sum: fold the <=k addends in rank order
        # (same trick as the engine's per-term score fold) so the value
        # is bit-identical at any parallelism — and ulp-exact against a
        # DuckDB ``sum(... ORDER BY rank)`` oracle.
        return df.groupBy("query_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(rank_col, "g"))),
                F.lit(0.0),
                lambda acc, s: acc + s["g"],
            ).alias(alias)
        )

    dcg = _rank_ordered_sum(
        run.filter(F.col("rank") <= k)
        .join(graded, ["query_id", "doc_id"])
        .withColumn("g", gain / F.log2(F.col("rank") + 1.0)),
        "rank",
        "dcg",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = _rank_ordered_sum(
        graded.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .withColumn("g", gain / F.log2(F.col("irank") + 1.0)),
        "irank",
        "idcg",
    )
    return ideal.join(dcg, "query_id", "left").select(
        "query_id",
        (F.coalesce("dcg", F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
    )


def effectiveness_report(
    run: DataFrame, qrels: DataFrame, k: int = 10
) -> dict:
    """Aggregate MRR + mean nDCG@k — the reference's Table-5 pair."""
    rr = reciprocal_rank(run, qrels).agg(F.avg("rr")).collect()[0][0]
    nd = ndcg_at_k(run, qrels, k).agg(F.avg("ndcg")).collect()[0][0]
    n_q = qrels.filter(F.col("rel") > 0).select("query_id").distinct().count()
    return {
        "n_queries": n_q,
        "mrr": round(rr, 6) if rr is not None else None,
        f"mean_ndcg@{k}": round(nd, 6) if nd is not None else None,
    }
