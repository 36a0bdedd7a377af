"""Windowed event rollups: batch result == streamed (availableNow +
watermark) result on in-order input, and the streaming query respects
append-mode window finalization."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.streaming.windows import (
    stream_events,
    windowed_event_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_batch_rollup_matches_manual(spark, events):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_rollup(events, 60).collect()
    }
    manual = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
    for r in manual.collect():
        assert got[(r["h"], r["event_type"])] == (r["n"], r["s"])


def test_stream_rollup_matches_batch(spark, events, tmp_path):
    input_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ck = str(tmp_path / "ev_ck")
    # event-time-ordered multi-file input: watermark never drops rows,
    # so streamed append-mode output must equal the batch answer
    events.orderBy("ts").coalesce(1).write.parquet(input_dir)

    rolled = windowed_event_rollup(
        stream_events(spark, input_dir, max_files_per_trigger=1),
        60,
        watermark_minutes=120,
    )
    q = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch = windowed_event_rollup(events, 60)
    streamed = spark.read.parquet(out_dir)
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    s = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streamed.collect()
    }
    # append mode emits a window only once the watermark passes its end:
    # every emitted window must exactly match batch, and every window
    # finalized before the terminal watermark must have been emitted
    # (windows still inside the watermark at termination stay pending —
    # that's the documented semantics, not data loss)
    assert s, "stream emitted no finalized windows"
    for k, v in s.items():
        assert b[k] == v, k
    import datetime

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    terminal_wm = max_ts - datetime.timedelta(minutes=120)
    for (w_start, etype), v in b.items():
        w_end = w_start + datetime.timedelta(minutes=60)
        if w_end <= terminal_wm:
            assert (w_start, etype) in s, (w_start, etype)
