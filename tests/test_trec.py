"""TREC run sink + efficiency reports over the single-job batch path."""

import pytest

from searchengine_spark.query.engine import SearchEngine
from searchengine_spark.query.trec import (
    batch_efficiency_report,
    efficiency_report,
    trec_run_df,
    write_trec_run,
)

QS = [("q1", "spark table join fast"), ("q2", "window agg")]


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return SearchEngine(spark, index_dir)


def test_trec_run_df_shape_and_order(engine):
    rows = trec_run_df(engine, QS, k=5, run_id="T1").collect()
    assert {r["query_id"] for r in rows} == {"q1", "q2"}
    for r in rows:
        assert r["q0"] == "Q0" and r["run_id"] == "T1"
        assert r["docno"] and "/" in r["docno"]
    q1 = [r for r in rows if r["query_id"] == "q1"]
    assert [r["rank"] for r in q1] == sorted(r["rank"] for r in q1)
    scores = [r["score"] for r in sorted(q1, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_trec_run_matches_single_queries(engine):
    """Run-file rows (built on the batch path) must equal the per-query
    search results exactly."""
    rows = trec_run_df(engine, QS, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text in QS:
        got = sorted(by_q[qid], key=lambda r: r["rank"])
        want = engine.search(text, k=5, with_docno=True).collect()
        assert [(r["docno"], r["score"]) for r in got] == [
            (r["docno"], r["score"]) for r in sorted(want, key=lambda r: r["rank"])
        ]


def test_write_trec_run_format(engine, tmp_path):
    path = str(tmp_path / "run.txt")
    write_trec_run(trec_run_df(engine, QS, k=3, run_id="R9"), path)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 6
    for line in lines:
        qid, q0, docno, rank, score, run_id = line.split(" ")
        assert q0 == "Q0" and run_id == "R9"
        int(rank)
        float(score)


def test_efficiency_reports(engine):
    serial = efficiency_report(engine, QS, k=5)
    assert set(serial["per_query_sec"]) == {"q1", "q2"}
    assert serial["p50_sec"] > 0
    batch = batch_efficiency_report(engine, QS, k=5)
    assert batch["n_queries"] == 2 and batch["result_rows"] == 10
    assert batch["amortized_sec_per_query"] > 0
    # the amortized batch cost per query must undercut the serial p50
    # when both issue Spark jobs (one job vs one job per query). The
    # serial report is forced DISTRIBUTED here: the default auto gate
    # routes these tiny queries through the driver-local fast path
    # (~ms, no Spark job), which beats the batch job at toy scale —
    # exactly the trade the fast path exists for.
    serial_dist = efficiency_report(engine, QS, k=5, local=False)
    assert batch["amortized_sec_per_query"] < serial_dist["p50_sec"] * 2


def test_empty_query_set(engine):
    assert efficiency_report(engine, [], k=5)["p50_sec"] is None
    assert batch_efficiency_report(engine, [], k=5)["result_rows"] == 0
