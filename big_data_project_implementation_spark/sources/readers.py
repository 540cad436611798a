"""Reader facade — format parity with the reference's DataFrameReader.

Reference: sql/core/src/main/scala/org/apache/spark/sql/DataFrameReader.scala
(format:66, schema:76, option:89, load:108, jdbc:145, json:244,
parquet:305, orc:329, table:336, text:356). CSV was out-of-tree in 1.6
(spark-csv package); modern Spark has it built in, so we expose it too.

Everything here is a thin, typed pass-through to ``spark.read`` — the
value is the contract + tests, not re-implementation: Catalyst's
DataSource V2 handles pushdown, partition discovery, and schema
merging (reference equivalents:
sql/core/.../execution/datasources/DataSourceStrategy.scala:45,
PartitioningUtils.scala:75, parquet/CatalystSchemaConverter.scala).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# xml is native DataSource V2 since Spark 4 (rowTag option required);
# avro would need the external spark-avro jar, absent in this container
_FORMATS = ("parquet", "json", "csv", "text", "orc", "xml")


def read(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    """Load ``path_or_table`` with format ``fmt``.

    fmt='table' reads a catalog/temp-view table; 'jdbc' expects
    options(url=..., dbtable=...).
    """
    if fmt == "table":
        return spark.table(path_or_table)
    if fmt == "jdbc":
        reader = spark.read.format("jdbc").options(**options)
        return reader.option("dbtable", path_or_table).load()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS + ('table', 'jdbc')}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path_or_table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    **options: Any,
) -> DataFrame:
    """Partitioned JDBC scan (stride on a numeric column), predicate
    pushdown compiled to the remote SQL dialect.

    Reference: sql/core/.../execution/datasources/jdbc/JDBCRelation.scala
    (columnPartition stride logic), JDBCRDD.scala (predicate compile).
    At scale, always pass partitioning bounds — a single connection read
    is a driver bottleneck.

    Connection options (``user``, ``password``, ``driver``,
    ``fetchsize``, ...) go through ``**options`` into the JDBC
    ``properties`` dict — they are NOT ``DataFrameReader.jdbc`` kwargs.
    ``predicates`` is the reference's JDBCPartition alternative: one
    WHERE fragment per partition, for non-numeric splits.
    """
    properties = {k: str(v) for k, v in options.items()}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound and upper_bound "
                f"alongside partition_column={partition_column!r}"
            )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or 8,
            properties=properties,
        )
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=properties)
    return spark.read.jdbc(url, table, properties=properties)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "error",
    **options: Any,
) -> None:
    """JDBC sink (reference: DataFrameWriter.jdbc → JdbcUtils.saveTable).

    Connection options route into ``properties`` like ``read_jdbc``.
    """
    df.write.jdbc(url, table, mode=mode, properties={k: str(v) for k, v in options.items()})


def incremental_read(
    spark,
    path: str,
    bookmark_path: str,
    partition_col: str,
):
    """Incremental batch ingestion over a partitioned table: read ONLY
    the partitions added since the last committed bookmark — the
    batch-side CDC pattern (watermark table + partition-pruned scan)
    that turns a nightly 100 TB reprocess into a read of yesterday's
    partition. Returns (df, commit) where ``df`` scans strictly-newer
    partitions (PartitionFilters prune at the reader — assert it) and
    ``commit()`` durably advances the bookmark AFTER the caller's
    write succeeds, so a failed run re-reads the same increment
    (at-least-once, idempotent when paired with upsert_partitioned).

    The bookmark is a 1-row parquet (no external state store); scoping
    the filter to ``partition_col > bookmark`` keeps the predicate a
    pure partition filter, so the files of already-processed
    partitions are never opened."""
    from pyspark.sql import functions as F

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    bm_hpath = jvm.org.apache.hadoop.fs.Path(bookmark_path)
    fs = bm_hpath.getFileSystem(hconf)
    last = None
    if fs.exists(bm_hpath):
        row = spark.read.parquet(bookmark_path).collect()
        last = row[0]["watermark"] if row else None
    df = spark.read.parquet(path)
    if last is not None:
        df = df.filter(F.col(partition_col) > F.lit(last))

    def commit() -> None:
        from pyspark.sql.types import StructField, StructType

        new_max = df.agg(F.max(partition_col).alias("m")).collect()[0]["m"]
        wm = new_max if new_max is not None else last
        if wm is None:
            return
        # bookmark schema = the partition column's own type (partition
        # directories type-infer — a 'day=2024-01-01' path reads back
        # as DATE, so never guess from the Python value)
        part_type = df.schema[partition_col].dataType
        spark.createDataFrame(
            [(wm,)], StructType([StructField("watermark", part_type)])
        ).write.mode("overwrite").parquet(bookmark_path)

    return df, commit
