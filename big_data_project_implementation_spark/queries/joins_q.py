"""Join operator coverage: inner/left/right/full/semi/anti/cross/theta,
broadcast vs shuffle strategies (SURVEY §2.3).

Strategy notes (mirroring reference SparkStrategies.scala:35-131): the
small side of every dim join carries an explicit ``F.broadcast`` hint;
large-large joins are left to sort-merge + AQE (which also handles
skew splitting — the 1.6 tree had no answer to skew at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "join_inner_shuffle",
    oracle="""
    SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_totalprice > 4000
    ORDER BY o_orderkey, l_linenumber
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large inner equi-join → sort-merge (reference
    EXE/joins/SortMergeJoin.scala:32)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4000)
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_orderkey", "o_totalprice", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey", "l_linenumber")
    )


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name, r_name, COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    ORDER BY n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join on small dims (reference
    EXE/joins/BroadcastHashJoin.scala:38; hint SQLC/functions.scala:814)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_cust"))
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT s_suppkey, s_name, n.n_name
    FROM supplier s LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 2) n
      ON s.s_nationkey = n.n_nationkey
    ORDER BY s_suppkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with nulls on the non-preserved side (reference
    EXE/joins/SortMergeOuterJoin.scala:34 / BroadcastHashOuterJoin)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 2)
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "left")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_nationkey, n_name, s.s_suppkey
    FROM supplier s RIGHT JOIN nation ON s.s_nationkey = n_nationkey
    ORDER BY n_nationkey, s_suppkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — every nation survives, suppliers optional."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .select("n_nationkey", "n_name", "s_suppkey")
        .orderBy("n_nationkey", "s_suppkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.k, sn.k) AS nationkey, cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates."""
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cn.join(sn, cn.k == sn.k, "outer")
        .select(F.coalesce(cn.k, sn.k).alias("nationkey"), "n_cust", "n_supp")
        .orderBy("nationkey")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 4500)
    ORDER BY c_custkey
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join ≡ IN/EXISTS (reference
    EXE/joins/LeftSemiJoinHash.scala:31)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 4500)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join ≡ NOT IN over non-null keys (absent from the 1.6
    reference — SURVEY §2.3 notes it arrived in 2.0; included for the
    complete modern surface)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_name <> r2.r_name
    ORDER BY from_region, to_region
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (reference EXE/joins/CartesianProduct.scala:27)."""
    r1 = t(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    r2 = t(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2)
        .filter(F.col("from_region") != F.col("to_region"))
        .orderBy("from_region", "to_region")
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT p_partkey, p_name, s_suppkey
    FROM part JOIN supplier
      ON p_retailprice BETWEEN s_acctbal * 0.18 AND s_acctbal * 0.19
    ORDER BY p_partkey, s_suppkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi range) join → broadcast nested loop
    (reference EXE/joins/BroadcastNestedLoopJoin.scala:30)."""
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    cond = (p.p_retailprice >= s.s_acctbal * 0.18) & (
        p.p_retailprice <= s.s_acctbal * 0.19
    )
    return (
        p.join(F.broadcast(s), cond)
        .select("p_partkey", "p_name", "s_suppkey")
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "join_self_asof",
    oracle="""
    SELECT event_id, user_id, prev_ts
    FROM (SELECT event_id, user_id,
                 LAG(CAST(ts AS TIMESTAMP)) OVER
                     (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events)
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def join_self_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (previous event per key) — the reference has no as-of join
    operator (SURVEY §2.3 note); expressed Spark-first as a window LAG
    over the time-sorted partition, which shuffles once on user_id
    instead of a quadratic self-join."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("event_id") < 500)
        .select("event_id", "user_id", "prev_ts")
        .orderBy("event_id")
    )
