"""Window function coverage: ranking, analytic (lag/lead), aggregates
over ROWS / RANGE frames (SURVEY §2.5; reference EXE/Window.scala:74 —
five frame processors — and SQLC/expressions/Window.scala builder).

Determinism convention: every ORDER BY inside a window spec ends with a
unique key so rank/lag outputs are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROUND(c_acctbal, 2) AS bal,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS prnk,
           ROUND(CUME_DIST()    OVER w, 4) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, rn
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions (reference exposed via Hive UDAF wrappers,
    sql/hive/.../hiveUDFs.scala:266; native in modern Spark)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("prnk"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("c_nationkey", "rn")


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value, 2) AS value,
           ROUND(LAG(value)     OVER w, 2)       AS prev_value,
           ROUND(LEAD(value)    OVER w, 2)       AS next_value,
           ROUND(LAG(value, 2, 0.0) OVER w, 2)   AS prev2_value,
           ROUND(value - LAG(value) OVER w, 2)   AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offset frames (reference EXE/Window.scala:693 offset
    frame processor)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.lag("value", 2, 0.0).over(w), 2).alias("prev2_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    ).orderBy("user_id", "event_id")


@query(
    "window_running_agg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_n,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg3,
           ROUND(MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2)
               AS peak3
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over growing + sliding ROWS frames (reference
    EXE/Window.scala:376-627 frame processors)."""
    e = t(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    growing = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding3 = base.rowsBetween(-2, Window.currentRow)
    centered = base.rowsBetween(-1, 1)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(growing), 2).alias("running_total"),
        F.count("*").over(growing).cast("bigint").alias("running_n"),
        F.round(F.avg("value").over(sliding3), 4).alias("moving_avg3"),
        F.round(F.max("value").over(centered), 2).alias("peak3"),
    ).orderBy("user_id", "event_id")


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price,
           CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                               RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING) AS BIGINT)
               AS peers_within_100
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame — reference SpecifiedWindowFrame RANGE
    mode (CAT/expressions/windowExpressions.scala:194). Fractional
    RANGE bounds need the SQL form (pyspark's rangeBetween is
    integer-only)."""
    t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000
    ).createOrReplaceTempView("orders_small")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price,
               CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                                   RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)
                    AS BIGINT) AS peers_within_100
        FROM orders_small
        ORDER BY o_orderkey
        """
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT n_name, s_suppkey, ROUND(s_acctbal, 2) AS bal
    FROM (
      SELECT n_name, s_suppkey, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    WHERE rn <= 2
    ORDER BY n_name, bal DESC, s_suppkey
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the canonical dedup/rank pattern; Spark plans
    the rank filter as a WindowGroupLimit pushdown in 3.5+ (no full
    materialization of each partition)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("n_name", "s_suppkey", F.round("s_acctbal", 2).alias("bal"))
        .orderBy("n_name", F.desc("bal"), "s_suppkey")
    )


@query(
    "window_share_of_total",
    oracle="""
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice), 2) AS volume,
           ROUND(SUM(l_extendedprice) / SUM(SUM(l_extendedprice)) OVER (), 6)
               AS share
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + empty-over window (share of total) — entire-partition
    frame (reference EXE/Window.scala:376)."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey").agg(F.sum("l_extendedprice").alias("_vol"))
    w = Window.partitionBy()
    return agg.select(
        "l_suppkey",
        F.round("_vol", 2).alias("volume"),
        F.round(F.col("_vol") / F.sum("_vol").over(w), 6).alias("share"),
    ).orderBy("l_suppkey")


@query(
    "window_named_sql",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER w3, 6)       AS avg3,
           CAST(ROW_NUMBER() OVER wo AS BIGINT) AS rn
    FROM (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE user_id < 20)
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wo AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn
    """,
)
def window_named_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named windows through the SQL front door (reference HiveQl
    TOK_WINDOWDEF, sql/hive/.../HiveQl.scala:1628; WithWindowDefinition
    CAT/plans/logical/basicOperators.scala:194): one WINDOW clause
    shared by several OVER references."""
    t(spark, sf_dir, "events").filter(F.col("user_id") < 20).createOrReplaceTempView(
        "events_w"
    )
    return spark.sql(
        """
        SELECT user_id, event_id,
               ROUND(AVG(value) OVER w3, 6)         AS avg3,
               CAST(ROW_NUMBER() OVER wo AS BIGINT) AS rn
        FROM events_w
        WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               wo AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn
        """
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           lead(v, 1 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_obs
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
          FROM events WHERE user_id % 20 = 0)
    ORDER BY event_id
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window frames (last_value / lead) — the
    last-observation-carried-forward gap-fill every sensor/metrics
    time series needs, plus next-observed lookahead. Pure window
    exchange on the entity key; nulls are injected deterministically
    so the oracle sees the identical gap pattern."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            "user_id",
            F.last("v", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("filled"),
            # python lead() has no ignoreNulls param — SQL expression form
            F.expr(
                "lead(v, 1) IGNORE NULLS OVER "
                "(PARTITION BY user_id ORDER BY ts, event_id)"
            ).alias("next_obs"),
        )
        .orderBy("event_id")
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS events_last_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE), 2)
               AS value_last_hour
    FROM events
    WHERE user_id % 25 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (RANGE BETWEEN INTERVAL ... PRECEDING
    over a timestamp ORDER BY) — the sliding-lookback shape behind
    rate limiting, rolling spend caps, and anomaly baselines. Frame
    bounds are event-time, so ties and uneven sampling are handled by
    the frame itself (no resample/explode needed). DECIMAL-summed per
    the registry float convention: the frame's add/remove order is
    engine-specific."""
    t(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0).createOrReplaceTempView(
        "events_tr"
    )
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS events_last_hour,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE), 2)
                   AS value_last_hour
        FROM events_tr
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    )
