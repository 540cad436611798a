"""Writer facade — parity with the reference's DataFrameWriter.

Reference: sql/core/src/main/scala/org/apache/spark/sql/DataFrameWriter.scala
(mode:52, partitionBy:127, jdbc:271, json:323, parquet:334, orc:346,
text:362) and the dynamic-partition write path
(sql/core/.../execution/datasources/InsertIntoHadoopFsRelation.scala).

Scale notes baked into the defaults:
- ``partition_by`` produces hive-style directory partitions → partition
  pruning on read.
- ``bucket_by`` (saveAsTable path) co-locates join keys so repeated
  large-large joins skip their shuffle.
- writers never coalesce(1); output file count is governed by the
  upstream partitioning + AQE.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: Any,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — pre-shuffled layout for co-located joins.

    Two tables bucketed by the same key/count join without an exchange
    (the reference could only get this via Hive bucketing;
    sql/hive/.../hive/execution/).
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
