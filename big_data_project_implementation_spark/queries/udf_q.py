"""User-defined function surface (SURVEY §2.10): Arrow-vectorized
pandas UDFs, grouped applyInPandas (UDAF parity), mapInPandas
(MapPartitions parity), and cogrouped applyInPandas (CoGroup parity).

These replace the reference's row-pickling Python UDF path
(EXE/python.scala:356 BatchPythonEvaluation; CORE/api/python/PythonRDD.scala:66)
with Arrow batch transfer — the documented ~10-100x faster modern
surface. Every query here is also SQL-expressible so the oracle still
checks values; the point is exercising the UDF machinery itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5)
               / 100 AS charged
    FROM lineitem
    WHERE l_orderkey % 200 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched; reference Python-UDF parity).

    Cents rounding is spelled out as floor(x*100 + 0.5)/100 on BOTH
    sides: numpy's ``.round`` is half-EVEN while DuckDB's ROUND is
    half-away, and a charge landing exactly on a half-cent flipped the
    sf0.1 hash (38910.585 → .58 vs .59). The explicit form is
    bit-identical for the positive domain on any engine."""

    @F.pandas_udf(DoubleType())
    def charge(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        import numpy as np

        return np.floor(price * (1.0 - discount) * (1.0 + tax) * 100.0 + 0.5) / 100.0

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT user_id,
           FLOOR(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) * 1.0
                 / COUNT(*) / 1000000 * 10000 + 0.5) / 10000 AS mean_value,
           FLOOR((MAX(value) - MIN(value)) * 10000 + 0.5) / 10000 AS value_range
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf — the PySpark UDAF surface (reference
    UserDefinedAggregateFunction, SQLC/expressions/udaf.scala:31;
    SURVEY §7.3 decision: pandas_udf GROUPED_AGG is the supported form).

    The mean runs over micro-unit BIGINTs (value rounded to 6dp ×1e6)
    so the per-group sum is EXACT integer arithmetic: double summation
    is order-sensitive across partial-aggregation orders, and a group
    mean on a rounding boundary flipped the sf0.1 hash (46.99625 →
    .9963 vs .9962). Division back to double is bit-identical on both
    engines given identical integer sums, and the 4dp rounding is the
    explicit floor(x*1e4+0.5)/1e4 form — ROUND-on-double disagrees
    between engines exactly on half boundaries (same trap as
    udf_pandas_scalar's cents)."""
    import math

    @F.pandas_udf(DoubleType())
    def mean_udaf(v: pd.Series) -> float:
        mean = float(v.sum()) / len(v) / 1e6
        return math.floor(mean * 10000.0 + 0.5) / 10000.0

    @F.pandas_udf(DoubleType())
    def range_udaf(v: pd.Series) -> float:
        return math.floor(float(v.max() - v.min()) * 10000.0 + 0.5) / 10000.0

    e = t(spark, sf_dir, "events").withColumn(
        "value_micro", F.round(F.col("value") * 1e6, 0).cast("bigint")
    )
    return (
        e.groupBy("user_id")
        .agg(
            mean_udaf("value_micro").alias("mean_value"),
            range_udaf("value").alias("value_range"),
        )
        .orderBy("user_id")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           ROUND((value - AVG(value) OVER (PARTITION BY user_id))
                 / NULLIF(STDDEV_POP(value) OVER (PARTITION BY user_id), 0), 4)
               AS zscore
    FROM events
    ORDER BY event_id
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas — per-group arbitrary pandas transform (reference
    MapGroups, EXE/basicOperators.scala:342). Z-score within user_id;
    shuffles once on the grouping key, each group processed in one
    Arrow batch."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=0)
        z = (pdf["value"] - mu) / sd if sd > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": z.round(4),
            }
        )

    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .applyInPandas(zscore, "event_id bigint, user_id bigint, zscore double")
        .orderBy("event_id")
    )


@query(
    "udf_map_in_pandas",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                     AS n_chars_py,
           CAST(len(string_split(text, ' ')) AS BIGINT)     AS n_tokens
    FROM documents
    WHERE doc_id % 3 = 0
    ORDER BY doc_id
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas — per-partition Arrow batch iterator (reference
    MapPartitions, EXE/basicOperators.scala:294; the modern rdd.pipe /
    ScriptTransformation escape hatch)."""

    def tokenize(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_py": pdf["text"].str.len().astype("int64"),
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                }
            )

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return d.mapInPandas(
        tokenize, "doc_id bigint, n_chars_py bigint, n_tokens bigint"
    ).orderBy("doc_id")


@query(
    "udf_cogroup",
    oracle="""
    SELECT c.c_custkey AS custkey,
           COALESCE(o.n_orders, 0)         AS n_orders,
           ROUND(COALESCE(o.total, 0.0), 2) AS total_spend
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS total
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey % 4 = 0
    ORDER BY custkey
    """,
)
def udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup(...).applyInPandas — typed CoGroup parity (reference
    EXE/basicOperators.scala:378). Both sides shuffle on the key once;
    each key's two frames meet in a single Python call."""

    def summarize(cust: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            return pd.DataFrame(columns=["custkey", "n_orders", "total_spend"])
        n = len(ords)
        total = round(float(ords["o_totalprice"].sum()), 2) if n else 0.0
        return pd.DataFrame(
            {"custkey": cust["c_custkey"].iloc[:1], "n_orders": n, "total_spend": total}
        )

    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 4 == 0)
    # push the key predicate to BOTH cogroup sides: groups whose customer
    # frame would be empty are discarded anyway, and each surviving key
    # costs one Python invocation — 4x fewer calls
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 4 == 0)
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(summarize, "custkey bigint, n_orders bigint, total_spend double")
        .orderBy("custkey")
    )


@query(
    "udf_classic_python",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END
               AS size_class
    FROM part
    WHERE p_partkey % 8 = 0
    ORDER BY p_partkey
    """,
)
def udf_classic_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — kept for API parity with the
    reference's registerFunction (PY/sql/context.py:199), but
    documented as the slow path; any hot-path use should be a
    pandas_udf or a built-in."""
    from pyspark.sql.types import StringType

    @F.udf(StringType())
    def size_class(size: int) -> str:
        return "S" if size < 10 else ("M" if size < 30 else "L")

    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 8 == 0)
    return p.select("p_partkey", size_class("p_size").alias("size_class")).orderBy(
        "p_partkey"
    )


@query(
    "udf_arrow_python",
    oracle="""
    SELECT o_orderkey,
           lower(string_split(o_orderpriority, '-')[2]) AS prio_word
    FROM orders
    WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)
def udf_arrow_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized classic Python UDF (``useArrow=True``, Spark
    3.5+): same row-function surface as udf_classic_python but the
    exchange with the Python worker is Arrow-batched instead of
    pickled rows — the migration path the reference's
    BatchPythonEvaluation users take before rewriting to pandas_udf."""
    word = F.udf(
        lambda p: p.split("-")[1].lower() if p else None,
        "string",
        useArrow=True,
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey", word("o_orderpriority").alias("prio_word")
    ).orderBy("o_orderkey")


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_arrow
    FROM documents
    WHERE doc_id % 4 = 0
    ORDER BY doc_id
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy batch surface below mapInPandas: the
    function sees raw ``pyarrow.RecordBatch``es (no pandas conversion),
    the right tool when the Python side is itself Arrow-native
    (pyarrow.compute here)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                ],
                ["doc_id", "n_chars_arrow"],
            )

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    return (
        d.select("doc_id", "text")
        .mapInArrow(lengths, "doc_id long, n_chars_arrow long")
        .orderBy("doc_id")
    )


@query(
    "udtf_lateral_split",
    oracle="""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL
    )
    SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS pos, toks[t.i] AS word
    FROM s, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) t
    ORDER BY doc_id, pos
    """,
)
def udtf_lateral_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥ 3.5) through the SQL front door: a
    table-valued tokenizer applied per input row via LATERAL — the
    modern spelling of the reference's UserDefinedGenerator /
    pythonUDF-explode path (CAT/expressions/generators.scala:93).
    The UDTF runs row-at-a-time in Python, so the corpus-scale
    tokenizer stays split+posexplode (text_stats); this query is the
    API-surface parity check, filtered to a 1-in-50 doc slice."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, word: string")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_tokens", SplitTokens)
    from big_data_project_implementation_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, pos, word
        FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0) d,
        LATERAL split_tokens(text)
        ORDER BY doc_id, pos
        """
    )


@query(
    "udf_pipe_subprocess",
    oracle="""
    SELECT doc_id, upper(text) AS piped
    FROM documents
    WHERE text IS NOT NULL
    ORDER BY doc_id
    """,
)
def udf_pipe_subprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-command pipe (round 9, operators.text.pipe_transform):
    the corpus text column piped through ``tr a-z A-Z`` — RDD.pipe /
    Hive TRANSFORM parity (reference core/rdd/PipedRDD.scala:36,
    sql/hive ScriptTransformation.scala) on the modern shape: ONE
    subprocess per Arrow batch via mapInPandas, line-per-row protocol,
    no driver involvement. The DuckDB oracle replays the transform as
    ``upper(text)`` (exact on this all-ASCII fixture), so the hash
    match certifies the full loop: Arrow batch → stdin framing →
    external process → stdout re-alignment → rows. The line-protocol
    escaping is identity here (fixture text has no backslash/newline);
    its round-trip is pinned separately in
    test_pipe_transform_linewise."""
    from big_data_project_implementation_spark.operators import text as text_ops

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return (
        text_ops.pipe_transform(
            d, ["tr", "a-z", "A-Z"], input_col="text", output_col="piped"
        )
        .select("doc_id", "piped")
        .orderBy("doc_id")
    )
