"""Sessionization: group each user's events into sessions separated by
an inactivity gap.

Two implementations with identical semantics:

* ``sessionize_batch`` — exact, window-function form (lag + running sum
  of session starts), ANSI-SQL-expressible for the DuckDB oracle.
* ``sessionize_stream`` — Structured Streaming ``session_window`` with a
  watermark: sessions finalize (append mode) once the watermark passes
  their close. The batch form is the ground truth the streaming tests
  compare against.

A custom stateful variant (``running_user_stats``) shows the
applyInPandasWithState shape for logic session_window can't express:
a per-user running event counter + value total emitted per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) —
    consecutive events of a user belong to one session while the gap to
    the previous event is <= gap_minutes.

    Boundary semantics match Structured Streaming's ``session_window``
    exactly: Spark MERGES touching windows, so an event arriving at
    precisely last_ts + gap still belongs to the same session — hence
    strict ``>`` here (an event must arrive strictly later than the gap
    to open a new session). Pinned empirically by
    tests/test_sessions.py::test_exact_gap_boundary_matches_session_window.
    """
    gap = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts may arrive as TIMESTAMP_NTZ (no direct long cast) — go via
    # timestamp to epoch seconds
    ts_s = F.col("ts").cast("timestamp").cast("long")
    new_sess = ts_s - F.lag(ts_s).over(w) > gap
    sess_id = F.sum(
        F.when(new_sess, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("_sess", sess_id)
        .groupBy("user_id", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_sess")
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark_minutes: int = 60
) -> DataFrame:
    """Streaming sessions via the built-in session_window (dynamic-gap
    event-time windows). Append mode: a session row is emitted once the
    watermark passes session_end + gap."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            # session_window's end is last-event + gap; subtract the gap so
            # the column means the same thing as the batch form (max ts)
            (
                F.col("sw.end") - F.expr(f"INTERVAL {gap_minutes} MINUTES")
            ).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def running_user_stats(events: DataFrame, watermark_minutes: int = 60):
    """Custom stateful operator via applyInPandasWithState: per-user
    running (n_events, sum_value) emitted on every micro-batch the user
    appears in; state expires via event-time timeout after the user goes
    quiet past the watermark. The applyInPandasWithState form exists for
    logic session_window cannot express (cross-session running totals)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, total double, last_ts_ms long"
    expiry_ms = watermark_minutes * 60_000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # user quiet past the watermark + expiry horizon: drop state
            # so the store stays bounded on churning user populations
            state.remove()
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_ms = max(
                    last_ms,
                    int(pd.to_datetime(pdf["ts"]).max().value // 1_000_000),
                )
        state.update((n, round(total, 6), last_ms))
        # event-time timeout: expire once the watermark passes the user's
        # last activity + expiry horizon (clamped above the current
        # watermark — Spark rejects timeouts at or behind it, which
        # happens whenever a user's last event lags the stream's head)
        state.setTimeoutTimestamp(
            max(last_ms + expiry_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
        )

    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
