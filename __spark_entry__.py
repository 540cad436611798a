"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q1 shape) on sf0.001.
queries()    — every implemented operator from SURVEY.md §2 + the
               beyond-reference pipeline operators, keyed by name.
oracle_sql() — DuckDB-equivalent SQL for each SQL-expressible query
               (approximate/engine-specific ones are rows-only).

Implementation lives in big_data_project_implementation_spark/queries/ — this module is
a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_project_implementation_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
