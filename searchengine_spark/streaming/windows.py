"""Windowed streaming aggregations over the events stream.

The reference engine has no streaming surface; this is the
training-pipeline extension: event-time tumbling-window rollups with
watermarked late-data handling, usable identically over a bounded batch
frame (for the DuckDB correctness oracle) and a ``readStream`` source
(watermark + append-mode sink). Same Column expressions both ways, so
the batch oracle pins the streaming semantics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_rollup(
    events: DataFrame,
    window_minutes: int = 60,
    watermark_minutes: Optional[int] = None,
) -> DataFrame:
    """Tumbling event-time windows per event_type:
    (window_start, window_end, event_type, n_events, sum_value, n_users).

    On a streaming frame pass ``watermark_minutes`` — events later than
    the watermark are dropped and windows finalize (append mode); on a
    batch frame leave it None for the exact answer the oracle checks.
    approx n_users uses exact count_distinct in batch; streaming uses
    approx_count_distinct (exact distinct needs complete mode)."""
    df = events
    streaming = events.isStreaming
    if watermark_minutes is not None:
        df = df.withWatermark("ts", f"{watermark_minutes} minutes")
    users = (
        F.approx_count_distinct("user_id")
        if streaming
        else F.countDistinct("user_id")
    )
    w = F.window("ts", f"{window_minutes} minutes")
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            users.cast("long").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
            "n_users",
        )
    )


def stream_events(spark, input_dir: str, max_files_per_trigger: int = 8):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
