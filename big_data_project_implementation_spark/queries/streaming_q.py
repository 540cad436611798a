"""Structured Streaming queries (SURVEY §2.12 DStream parity).

The driver contract needs a batch-collectable DataFrame, so streaming
queries run with Trigger.AvailableNow into an in-memory sink and return
the sink table — real readStream → writeStream plumbing, deterministic
results. Richer stateful coverage (applyInPandasWithState timeouts,
stream-stream joins, checkpoint restart) lives in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import events_stream, query


def _run_stream_to_table(sdf: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming DF to completion into a memory sink."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window + watermark over a file stream
    (reference window(windowDuration) DStream.scala:788 → modern
    F.window; watermarks are the SURVEY §2.12 capability upgrade)."""
    sdf = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    out = _run_stream_to_table(sdf, spark)
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "total"
    ).orderBy("window_start", "event_type")


@query(
    "stream_sliding_window",
    oracle="""
    WITH slides AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, value,
             UNNEST([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                     date_trunc('hour', CAST(ts AS TIMESTAMP) - INTERVAL 30 MINUTE)
                       + INTERVAL 30 MINUTE]) AS window_start
      FROM events
    )
    SELECT window_start, COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
    FROM slides
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (1h window, 30m slide) — DStream
    window(win, slide) parity (reference DStream.scala:799)."""
    sdf = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )
    out = _run_stream_to_table(sdf, spark)
    return out.select(
        F.col("window.start").alias("window_start"), "n", "avg_value"
    ).orderBy("window_start")


@query(
    "stream_per_key_counts",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def stream_per_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed running counts — updateStateByKey / mapWithState parity in
    aggregate form (reference PairDStreamFunctions.scala:396; custom
    per-event state lives in tests via applyInPandasWithState)."""
    sdf = (
        events_stream(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    out = _run_stream_to_table(sdf, spark)
    return out.orderBy("user_id", "event_type")
