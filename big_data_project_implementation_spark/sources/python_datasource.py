"""Python DataSource API (Spark 4, SPARK-44076): the modern extension
point for custom sources — the successor to the reference's
BaseRelation/RelationProvider SPI (EXE/datasources/interfaces.scala).

``SyntheticDocsDataSource`` is a deterministic generator source used to
prove the plumbing: schema declaration, options, PARTITIONED reads
(each partition generates independently on an executor — the property
that matters at 1000 executors), and batch write via
``spark.read.format(...)`` registration.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("text", StringType()),
    ]
)

_WORDS = ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)
    .option("partitions", P).load()`` — N deterministic rows split
    across P independently-generated input partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        # rows striped by id % partitions: deterministic, no cross-
        # partition coordination — generation is embarrassingly parallel
        for doc_id in range(partition.value, self.n_rows, self.n_parts):
            words = [
                _WORDS[(doc_id * (j + 1)) % len(_WORDS)]
                for j in range(3 + doc_id % 4)
            ]
            yield (doc_id, partition.value, " ".join(words))


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
