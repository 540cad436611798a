"""Structured Streaming layer — DStream-surface parity (SURVEY §2.12).

Mapping table (reference STR/dstream/* → here):
- window/reduceByWindow/countByWindow  → windowed_agg (tumbling/sliding)
- updateStateByKey / mapWithState      → stateful sessionize/run_with_state
  (applyInPandasWithState, ProcessingTime/EventTime timeouts)
- foreachRDD / saveAs*                 → sink helpers (foreachBatch, file,
  memory)
- checkpointing                        → checkpoint_location option
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Any = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (reference FileInputDStream); schema required
    for file streams — pass a batch-read schema."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def read_rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Deterministic test source (modern replacement for the reference's
    queueStream test harness)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def windowed_agg(
    sdf: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "1 hour",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time windowed aggregation with watermark
    (reference window/reduceByKeyAndWindow, DStream.scala:788-876;
    watermarks are the modern late-data upgrade)."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    group_cols = [win] + [F.col(k) for k in (keys or [])]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(*group_cols)
        .agg(*(aggs or [F.count("*").alias("n")]))
    )


def run_with_state(
    sdf: DataFrame,
    keys: list[str],
    func: Callable[[Any, Any, GroupState], Any],
    output_schema: str,
    state_schema: str,
    timeout: str = "ProcessingTimeTimeout",
) -> DataFrame:
    """applyInPandasWithState — mapWithState/StateSpec parity including
    idle timeouts (reference STR/StateSpec.scala:73,100; state map
    STR/util/StateMap.scala:84)."""
    timeout_conf = {
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
        "NoTimeout": GroupStateTimeout.NoTimeout,
    }[timeout]
    return sdf.groupBy(*keys).applyInPandasWithState(
        func, output_schema, state_schema, "update", timeout_conf
    )


def dedup_stream(
    sdf: DataFrame,
    keys: list[str],
    watermark_col: str | None = None,
    delay: str | None = None,
) -> DataFrame:
    """Stateful streaming exact-dedup — the streaming counterpart of
    operators.dedup.exact_dedup (beyond-reference: a training-data
    ingest pipeline dedups ON the stream, not in a later batch pass).

    With ``watermark_col`` + ``delay``: dropDuplicatesWithinWatermark —
    keyed state is evicted once the watermark passes, so state size is
    bounded by the key arrival rate x delay (the 100 TB/day path;
    duplicates farther apart than ``delay`` re-emit, by contract).
    Without: global dropDuplicates — exact forever, state grows with
    distinct keys (fine for bounded key domains, documented tradeoff)."""
    if watermark_col is not None:
        if delay is None:
            raise ValueError("watermarked dedup_stream needs a delay")
        return sdf.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
            keys
        )
    return sdf.dropDuplicates(keys)


def to_memory_sink(
    sdf: DataFrame,
    output_mode: str = "update",
    query_name: str | None = None,
    available_now: bool = True,
):
    """Memory sink for tests/driver collection."""
    name = query_name or ("s" + uuid.uuid4().hex[:12])
    writer = sdf.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return name, writer.start()


def foreach_batch_sink(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "update",
    available_now: bool = True,
):
    """foreachRDD parity (reference DStream.scala:659) — per-microbatch
    callback with exactly-once bookkeeping via the checkpoint dir."""
    writer = (
        sdf.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize(
    sdf: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) — absent from the reference
    (SURVEY §2.13); native session_window since Spark 3.2."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
    )
