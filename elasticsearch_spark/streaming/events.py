"""Structured Streaming analytics over the events stream.

The reference has no streaming at all (SURVEY.md §2.8); these operators
give the engine the standard stream shapes a web-scale ingest pipeline
needs, with the invariant that **the streaming result over a finite
input equals the batch result** (tested in
tests/test_streaming_events.py):

* ``hourly_rollup_stream`` — watermarked tumbling-window aggregation
  (late data beyond the watermark dropped; with ``availableNow`` over a
  static directory nothing is late, so stream == batch).
* ``session_rollup`` / ``session_rollup_stream`` — per-user session
  windows via the built-in ``session_window`` (gap-based), the
  batch/streaming pair sharing one plan-builder.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_rollup_plan(events: DataFrame) -> DataFrame:
    """(event_type, hour, cnt, sum_value) tumbling 1h windows — the same
    plan body for batch and streaming input."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("hour"),
            "cnt",
            "sum_value",
        )
    )


def hourly_rollup_stream(spark: SparkSession, input_dir: str, checkpoint_dir: str,
                         watermark: str = "2 hours", output_mode: str = "append",
                         query_name: str = "events_hourly") -> DataFrame:
    """Run the rollup as a stream over all currently-available files
    (``availableNow``) into an in-memory sink; returns the result table.

    The watermark bounds aggregation state at real-stream scale: windows
    older than max(ts) - watermark are finalized and evicted.  In append
    mode a finite input's tail windows (newer than the final watermark)
    are therefore withheld — ``output_mode='complete'`` emits everything
    and is what the stream==batch equivalence test uses.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    q = (
        hourly_rollup_plan(stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def session_rollup_plan(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: events within ``gap`` of each other merge into
    one session window (built-in ``session_window`` — no custom state
    UDF needed)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_rollup_stream(spark: SparkSession, input_dir: str, checkpoint_dir: str,
                          gap: str = "30 minutes", watermark: str = "2 hours",
                          query_name: str = "events_sessions") -> DataFrame:
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    q = (
        session_rollup_plan(stream, gap)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
