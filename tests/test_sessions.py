"""Sessionization: batch (oracle ground truth) vs streaming
session_window, plus the applyInPandasWithState running-stats operator."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.streaming.sessions import (
    running_user_stats,
    sessionize_batch,
    sessionize_stream,
)
from searchengine_spark.streaming.windows import stream_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").persist()


def test_batch_sessions_properties(events):
    sess = sessionize_batch(events, gap_minutes=30).collect()
    assert sum(s["n_events"] for s in sess) == events.count()
    for s in sess:
        assert s["session_start"] <= s["session_end"]
    # per-user sessions must be non-overlapping and gap-separated
    from collections import defaultdict

    by_user = defaultdict(list)
    for s in sess:
        by_user[s["user_id"]].append(s)
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s["session_start"])
        for a, b in zip(ss, ss[1:]):
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 30 * 60, (user, a, b)


def test_exact_gap_boundary_matches_session_window(spark, tmp_path):
    """An event at EXACTLY the gap after the previous one MERGES into the
    session in BOTH implementations — Spark's session_window merges
    touching windows, and sessionize_batch's strict > matches. An event
    1s past the gap opens a new session."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: second event exactly 30min later -> still ONE session
        (1, t0, 1.0),
        (1, t0 + dt.timedelta(minutes=30), 2.0),
        # user 3: second event 30min 1s later -> TWO sessions
        (3, t0, 1.0),
        (3, t0 + dt.timedelta(minutes=30, seconds=1), 2.0),
        # user 2: second event 29:59 later -> ONE session
        (2, t0, 1.0),
        (2, t0 + dt.timedelta(minutes=29, seconds=59), 2.0),
        # watermark flush: a much later event so append mode finalizes
        # the sessions above before availableNow terminates
        (99, t0 + dt.timedelta(hours=10), 0.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    batch = sessionize_batch(ev, gap_minutes=30)
    counts = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 1, 2: 1, 3: 2, 99: 1}

    # streaming ground truth on the same rows
    input_dir = str(tmp_path / "in_gap")
    ev.coalesce(1).write.parquet(input_dir)
    q = (
        sessionize_stream(
            stream_events(spark, input_dir, 1), gap_minutes=30,
            watermark_minutes=60,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("gap_sessions")
        .option("checkpointLocation", str(tmp_path / "ck_gap"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode only finalizes sessions the watermark passed; compare
    # the finalized subset against batch rows keyed identically
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("gap_sessions").collect()
    }
    batch_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    assert streamed <= batch_keys
    # user 1's exact-gap pair merged into ONE finalized session; user 3's
    # gap+1s pair split into two
    assert (1, t0, t0 + dt.timedelta(minutes=30), 2) in streamed
    assert (3, t0, t0, 1) in streamed
    assert (
        3,
        t0 + dt.timedelta(minutes=30, seconds=1),
        t0 + dt.timedelta(minutes=30, seconds=1),
        1,
    ) in streamed


def test_stream_sessions_match_batch(spark, events, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    events.orderBy("ts").coalesce(1).write.parquet(input_dir)
    q = (
        sessionize_stream(
            stream_events(spark, input_dir, 1), gap_minutes=30,
            watermark_minutes=60,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    assert streamed, "no sessions finalized"
    for k, v in streamed.items():
        assert batch[k] == v, k


def test_running_user_stats_stateful(spark, events, tmp_path):
    input_dir = str(tmp_path / "in2")
    out_dir = str(tmp_path / "out2")
    events.orderBy("ts").repartition(3).write.parquet(input_dir)
    # horizon far beyond the data's time span: no state expires, so the
    # final snapshot must equal the all-time batch totals
    q = (
        running_user_stats(
            stream_events(spark, input_dir, 1), watermark_minutes=10_000_000
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_stats")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table("running_stats")
    # final per-user snapshot (max n_events) must equal the batch totals
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in out.orderBy("n_events")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    }
    truth = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
        )
        .collect()
    }
    assert final == truth


def test_running_user_stats_state_expiry(spark, events, tmp_path):
    """With a short expiry horizon, quiet gaps longer than the horizon
    must reset a user's running totals (event-time timeout removed the
    state) — the final emitted count is then below the all-time total."""
    input_dir = str(tmp_path / "in3")
    events.orderBy("ts").repartition(8).write.parquet(input_dir)
    q = (
        running_user_stats(
            stream_events(spark, input_dir, 1), watermark_minutes=60
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_stats_exp")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final = {
        r["user_id"]: r["n_events"]
        for r in spark.table("running_stats_exp")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    }
    truth = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert any(final[u] < truth[u] for u in truth), "expiry never fired"
    assert all(final[u] <= truth[u] for u in truth)
