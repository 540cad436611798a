"""Source/sink round-trips (SURVEY §2.1): parquet/json/csv/orc/text
read+write, partitioned writes with partition pruning, schema
inference vs declared schema.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark import plans, sources
from tests.conftest import SF_DIR


@pytest.fixture
def tmpdir_():
    d = tempfile.mkdtemp(prefix="io_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _nation(spark):
    return sources.load_table(spark, SF_DIR, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_roundtrip_formats(spark, tmpdir_, fmt):
    df = _nation(spark)
    path = f"{tmpdir_}/{fmt}"
    opts = {"header": "true"} if fmt == "csv" else {}
    sources.write(df, path, fmt=fmt, mode="overwrite", **opts)
    if fmt == "csv":
        back = sources.read(spark, path, fmt=fmt, header="true", inferSchema="true")
    else:
        back = sources.read(spark, path, fmt=fmt)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in df.collect()}
    assert got == want


def test_text_roundtrip(spark, tmpdir_):
    df = _nation(spark).select(F.col("n_name").alias("value"))
    path = f"{tmpdir_}/text"
    sources.write(df, path, fmt="text", mode="overwrite")
    back = sources.read(spark, path, fmt="text")
    assert sorted(r.value for r in back.collect()) == sorted(
        r.value for r in df.collect()
    )


def test_partitioned_write_prunes(spark, tmpdir_):
    df = sources.load_table(spark, SF_DIR, "orders")
    path = f"{tmpdir_}/orders_part"
    sources.write(
        df.withColumn("status", F.col("o_orderstatus")),
        path,
        mode="overwrite",
        partition_by=["status"],
    )
    back = spark.read.parquet(path).filter(F.col("status") == "O")
    plan = plans.formatted_plan(back)
    # partition filter must prune directories, not filter rows post-scan
    assert "PartitionFilters" in plan and "status" in plan
    assert back.count() == df.filter(F.col("o_orderstatus") == "O").count()


def test_json_schema_inference(spark, tmpdir_):
    df = _nation(spark)
    path = f"{tmpdir_}/json_infer"
    sources.write(df, path, fmt="json", mode="overwrite")
    inferred = spark.read.json(path)
    assert set(inferred.columns) == set(df.columns)
    assert dict(inferred.dtypes)["n_nationkey"] == "bigint"  # JSON widens ints


def test_temp_view_catalog(spark):
    sources.register_views(spark, SF_DIR)
    assert spark.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n == 25
    assert spark.catalog.tableExists("lineitem")
