"""RR / nDCG@k vs hand-computed values (the reference's trec_eval
metrics, Documentation.pdf §5 Table 5, computed natively)."""

import math

import pytest

from searchengine_spark.query.metrics import (
    effectiveness_report,
    ndcg_at_k,
    reciprocal_rank,
)

# run: q1 ranks docs [10, 11, 12]; q2 ranks [20, 21]; q3 ranks [30]
RUN = [
    ("q1", 1, 10), ("q1", 2, 11), ("q1", 3, 12),
    ("q2", 1, 20), ("q2", 2, 21),
    ("q3", 1, 30),
]
# qrels: q1 -> 11 (rel 2), 12 (rel 1); q2 -> 21 (rel 1); q3 -> 99 (missed)
QRELS = [
    ("q1", 11, 2), ("q1", 12, 1),
    ("q2", 21, 1),
    ("q3", 99, 1),
    ("q4", 40, 1),  # query absent from the run entirely
]


@pytest.fixture(scope="module")
def frames(spark):
    run = spark.createDataFrame(RUN, "query_id string, rank int, doc_id long")
    qrels = spark.createDataFrame(QRELS, "query_id string, doc_id long, rel int")
    return run, qrels


def test_reciprocal_rank(frames):
    run, qrels = frames
    rr = {r["query_id"]: r["rr"] for r in reciprocal_rank(run, qrels).collect()}
    assert rr == {"q1": pytest.approx(1 / 2), "q2": pytest.approx(1 / 2),
                  "q3": 0.0, "q4": 0.0}


def test_ndcg_at_k(frames):
    run, qrels = frames
    nd = {r["query_id"]: r["ndcg"] for r in ndcg_at_k(run, qrels, k=10).collect()}
    # q1: DCG = (2^2-1)/log2(3) + (2^1-1)/log2(4);
    #     IDCG = 3/log2(2) + 1/log2(3)
    dcg1 = 3 / math.log2(3) + 1 / math.log2(4)
    idcg1 = 3 / math.log2(2) + 1 / math.log2(3)
    assert nd["q1"] == pytest.approx(dcg1 / idcg1)
    # q2: relevant at rank 2 -> DCG = 1/log2(3), IDCG = 1
    assert nd["q2"] == pytest.approx(1 / math.log2(3))
    assert nd["q3"] == 0.0 and nd["q4"] == 0.0


def test_effectiveness_report(frames):
    run, qrels = frames
    rep = effectiveness_report(run, qrels, k=10)
    assert rep["n_queries"] == 4
    assert rep["mrr"] == pytest.approx(round((0.5 + 0.5 + 0 + 0) / 4, 6))
    assert rep["mean_ndcg@10"] > 0


def test_perfect_ranking_is_one(spark):
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, rank int, doc_id long"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 3), ("q", 2, 1)], "query_id string, doc_id long, rel int"
    )
    assert reciprocal_rank(run, qrels).collect()[0]["rr"] == 1.0
    assert ndcg_at_k(run, qrels).collect()[0]["ndcg"] == pytest.approx(1.0)
