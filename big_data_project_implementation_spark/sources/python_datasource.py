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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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


class SyntheticDocsStreamDataSource(DataSource):
    """Streaming form of the Python DataSource API (Spark 4
    SimpleDataSourceStreamReader): a bounded deterministic micro-batch
    source — offsets are dict checkpoints, so restart/replay semantics
    are the engine's, not the source's. ``option("limit", N)`` rows
    total, ``option("batch", B)`` rows per micro-batch. The custom-
    connector shape for queue/api-poll ingestion where no built-in
    source exists; exactly-once comes from readBetweenOffsets replay."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> StructType:
        return _SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return SyntheticDocsStreamReader(self.options)


def _doc_row(doc_id: int) -> tuple:
    words = [
        _WORDS[(doc_id * (j + 1)) % len(_WORDS)] for j in range(3 + doc_id % 4)
    ]
    return (doc_id, doc_id % 4, " ".join(words))


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.limit = int(options.get("limit", 40))
        self.batch = int(options.get("batch", 10))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        if pos >= self.limit:
            return iter([]), {"pos": pos}
        nxt = min(pos + self.batch, self.limit)
        # a concrete list: the returned iterator is pickled to the JVM
        return iter([_doc_row(i) for i in range(pos, nxt)]), {"pos": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after restart: offsets fully determine the rows
        return iter([_doc_row(i) for i in range(start["pos"], end["pos"])])


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticDocsStreamDataSource)
