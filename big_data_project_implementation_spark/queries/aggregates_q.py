"""Aggregation coverage: function library, distinct aggregates, cube /
rollup / grouping sets, pivot, stat & na functions (SURVEY §2.4, §2.8).

Statistical-moment note: Spark's ``skewness``/``kurtosis`` are
population moments (m3/m2^1.5, m4/m2^2 - 3; reference
CAT/expressions/aggregate/CentralMomentAgg.scala) while DuckDB's
built-ins are sample-corrected, so the oracles spell the population
formula out explicitly instead of calling DuckDB's functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "agg_function_library",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                   AS n,
           COUNT(DISTINCT l_suppkey)                  AS n_supp,
           ROUND(SUM(l_quantity), 2)                  AS sum_qty,
           ROUND(MIN(l_extendedprice), 2)             AS min_price,
           ROUND(MAX(l_extendedprice), 2)             AS max_price,
           ROUND(AVG(l_extendedprice), 4)             AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4)     AS sd_price,
           ROUND(STDDEV_POP(l_extendedprice), 4)      AS sdp_price,
           ROUND(VAR_SAMP(l_quantity), 4)             AS var_qty,
           ROUND(VAR_POP(l_quantity), 4)              AS varp_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_qp,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 4)  AS covp_qp
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_function_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate function library (reference CAT/expressions/aggregate/,
    registry FunctionRegistry.scala:181-200)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.stddev_pop("l_extendedprice"), 4).alias("sdp_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("varp_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             AVG(l_quantity) AS mu,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    ), m AS (
      SELECT l.l_returnflag,
             SUM(POW(l.l_quantity - s.mu, 2)) / s.n AS m2,
             SUM(POW(l.l_quantity - s.mu, 3)) / s.n AS m3,
             SUM(POW(l.l_quantity - s.mu, 4)) / s.n AS m4
      FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
      GROUP BY l.l_returnflag, s.n
    )
    SELECT l_returnflag,
           ROUND(m3 / POW(m2, 1.5), 4)   AS skew_qty,
           ROUND(m4 / POW(m2, 2) - 3, 4) AS kurt_qty
    FROM m ORDER BY l_returnflag
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness / kurtosis (population moments — reference
    CAT/expressions/aggregate/CentralMomentAgg.scala)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_first_last_minmax_by",
    oracle="""
    SELECT user_id,
           MIN(event_id)                 AS first_event,
           MAX(event_id)                 AS last_event,
           ARG_MIN(event_type, ts)       AS first_type,
           ARG_MAX(event_type, ts)       AS last_type
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def agg_first_last_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last-style aggregates expressed deterministically:
    min_by/max_by on the event-time axis (reference First/Last were
    order-dependent — CAT/expressions/aggregate/First.scala)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.min_by("event_type", "ts").alias("first_type"),
            F.max_by("event_type", "ts").alias("last_type"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)      AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio,
           COUNT(*)                        AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one Aggregate — planned via
    Expand (reference EXE/aggregate/utils.scala:134
    planAggregateWithOneDistinct; modern planner generalizes)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.countDistinct("o_orderpriority").alias("n_prio"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP lowered to Expand (reference ResolveGroupingAnalytics,
    CAT/analysis/Analyzer.scala:182; API SQLC/DataFrame.scala:836)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (reference logical Cube,
    CAT/plans/logical/basicOperators.scala:370; API DataFrame.scala:859)."""
    c = t(spark, sf_dir, "customer")
    return (
        c.cube("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL front door (reference HiveQl
    TOK_GROUPING_SETS, sql/hive/.../HiveQl.scala:951)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT c_nationkey,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 0), 2) AS automobile,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END), 0), 2) AS building,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END), 0), 2) AS furniture,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END), 0), 2) AS household,
           ROUND(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END), 0), 2) AS machinery
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (reference ResolvePivot,
    CAT/analysis/Analyzer.scala:260; API SQLC/GroupedData.scala:301).
    Explicit value list = single pass, no driver-side distinct scan."""
    c = t(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    piv = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", segs)
        .agg(F.sum("c_acctbal"))
    )
    cols = [F.round(F.coalesce(F.col(s), F.lit(0.0)), 2).alias(s.lower()) for s in segs]
    return piv.select("c_nationkey", *cols).orderBy("c_nationkey")


@query(
    "agg_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS volume
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 100 AND SUM(l_extendedprice) > 100000
    ORDER BY l_suppkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("_volume"),
        )
        .filter((F.col("n") > 100) & (F.col("_volume") > 100000))
        .select("l_suppkey", "n", F.round("_volume", 2).alias("volume"))
        .orderBy("l_suppkey")
    )


@query("agg_approx_count_distinct")  # approximate → rows-only check
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (reference
    CAT/expressions/aggregate/HyperLogLogPlusPlus.scala:51). Sketch
    internals differ across engines → no value oracle; accuracy is
    asserted in tests/test_aggregates.py against the exact count."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
    )


@query("agg_approx_quantile")  # approximate → rows-only check
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approxQuantile / percentile_approx (modern builtin; the 1.6
    reference only had it via Hive UDAF — SURVEY §2.13)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
    # unpack the quantile array → atomic columns (registry convention)
    return li.agg(q.alias("qs")).select(
        F.col("qs").getItem(0).alias("q25"),
        F.col("qs").getItem(1).alias("q50"),
        F.col("qs").getItem(2).alias("q75"),
    )


@query(
    "stat_crosstab_freq",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def stat_crosstab_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency counts — the engine behind df.stat.crosstab
    (reference SQLC/DataFrameStatFunctions.scala:132); emitted long-form
    so it stays distributed rather than pivoting to a driver-width row."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "na_fill_drop_replace",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING')             AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey,
           COALESCE(seg, 'UNKNOWN')      AS seg_filled,
           ROUND(COALESCE(bal, 0.0), 2)  AS bal_filled
    FROM base
    WHERE seg IS NOT NULL OR bal IS NOT NULL
    ORDER BY c_custkey
    """,
)
def na_fill_drop_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.na.fill / drop semantics (reference
    SQLC/DataFrameNaFunctions.scala:44,134) — nulls synthesized first
    since fixtures are null-free."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    filled = c.na.drop(how="all", subset=["seg", "bal"]).na.fill(
        {"seg": "UNKNOWN", "bal": 0.0}
    )
    return filled.select(
        "c_custkey",
        F.col("seg").alias("seg_filled"),
        F.round("bal", 2).alias("bal_filled"),
    ).orderBy("c_custkey")


@query(
    "describe_summary",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(COUNT(l_quantity) AS BIGINT) AS n,
           ROUND(AVG(l_quantity), 4)         AS mean,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd,
           ROUND(MIN(l_quantity), 2)         AS min_v,
           ROUND(MAX(l_quantity), 2)         AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(COUNT(l_discount) AS BIGINT),
           ROUND(AVG(l_discount), 4),
           ROUND(STDDEV_SAMP(l_discount), 4),
           ROUND(MIN(l_discount), 2),
           ROUND(MAX(l_discount), 2)
    FROM lineitem
    ORDER BY col
    """,
)
def describe_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-equivalent summary statistics (reference
    SQLC/DataFrame.scala:1335), emitted typed (not stringly) so the
    result is machine-usable."""
    li = t(spark, sf_dir, "lineitem")

    def stats(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col"),
            F.count(col).alias("n"),
            F.round(F.avg(col), 4).alias("mean"),
            F.round(F.stddev_samp(col), 4).alias("sd"),
            F.round(F.min(col), 2).alias("min_v"),
            F.round(F.max(col), 2).alias("max_v"),
        )

    return stats("l_quantity").unionAll(stats("l_discount")).orderBy("col")


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (SQL `percentile`; reference exposes
    only Hive UDAF percentile_approx — the exact form is the modern
    upgrade, and the oracle pins Spark's linear interpolation against
    DuckDB's quantile_cont bit-for-bit after rounding). The
    approxQuantile/t-digest path for 100 TB cardinalities is
    agg_approx_quantile (rows-only by design); this is its exact
    small-group counterpart."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.round(
                    F.expr(f"percentile(l_extendedprice, {q})"), 6
                ).alias(f"p{int(q * 100)}")
                for q in (0.25, 0.5, 0.95, 0.99)
            ]
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram",
    oracle="""
    WITH s AS (
      SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
             max(CAST(l_extendedprice AS DOUBLE)) AS mx
      FROM lineitem
    )
    SELECT CAST(CASE WHEN mx = mn THEN 0
                     ELSE LEAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn)
                                      / (mx - mn) * 20), 19)
                END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem CROSS JOIN s
    GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice into 20 bins
    (operators.relational.equi_width_histogram): 1-row min/max
    broadcast onto the stream, codegen bucket id, O(buckets)
    map-side-combined rollup — identical-order double arithmetic keeps
    bucket ids engine-deterministic."""
    from big_data_project_implementation_spark.operators import relational

    li = t(spark, sf_dir, "lineitem")
    return relational.equi_width_histogram(li, "l_extendedprice", buckets=20)


@query(
    "agg_mode_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    md AS (
      SELECT l_returnflag, l_quantity FROM (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity ASC) AS rn
        FROM c
      ) WHERE rn = 1
    ),
    disc AS (
      SELECT l_returnflag, min(l_quantity) AS q90 FROM (
        SELECT l_returnflag, l_quantity,
               cume_dist() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_quantity) AS cd
        FROM lineitem
      ) WHERE cd >= 0.9 GROUP BY 1
    ),
    med AS (
      SELECT l_returnflag, median(l_quantity) AS m FROM lineitem GROUP BY 1
    )
    SELECT md.l_returnflag,
           CAST(md.l_quantity AS BIGINT) AS mode_qty,
           ROUND(med.m, 6) AS median_qty,
           CAST(disc.q90 AS BIGINT) AS p90_disc_qty
    FROM md JOIN med USING (l_returnflag) JOIN disc USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (max count, min value tie-break — neither
    engine's built-in ``mode`` pins ties), exact median, and
    percentile_disc(0.9) per return flag. The mode is two map-side-
    combined groupBys + a max_by on the (count, -value) pair — no
    window, no per-group materialization; the exact order statistics
    use Spark's native median/percentile_disc, oracled via the
    cume_dist formulation that IS their documented semantics
    (reference CAT/expressions/aggregate/Percentile.scala)."""
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("cnt")
    )
    mode = counts.groupBy("l_returnflag").agg(
        F.max_by(
            "l_quantity", F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("nq"))
        )
        .cast("bigint")
        .alias("mode_qty")
    )
    stats = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
        .cast("bigint")
        .alias("p90_disc_qty"),
    )
    return mode.join(stats, "l_returnflag").orderBy("l_returnflag")


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, item
    LIMIT 3
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (space-saving sketch, Spark 4): top-3 event types
    with counts. The sketch tracks up to 10,000 items, far above this
    domain's cardinality, where the algorithm is EXACT by construction
    — so the query is oracle-certifiable while still exercising the
    bounded-memory sketch path (the 100 TB story: frequency estimation
    without a distinct-cardinality shuffle). Result rows re-sorted
    (count DESC, item ASC) because intra-array tie order is
    unspecified."""
    from big_data_project_implementation_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT item, CAST(cnt AS BIGINT) AS cnt FROM (
          SELECT inline(approx_top_k(event_type, 3))
              AS (item, cnt)
          FROM events
        )
        ORDER BY cnt DESC, item
        """
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark ≥ 4.0; ANSI string aggregation
    == DuckDB string_agg): deterministic in-group ORDER BY makes the
    concatenated cell hash-stable. Scale note: listagg materializes
    the whole group in one cell — keep it to dimension-sized groups
    (collect_list + array_join is the same plan); corpus-scale
    concatenation belongs in pack_sequences."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        r.join(n, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").cast("bigint").alias("n_nations"),
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
        )
        .orderBy("r_name")
    )


@query(
    "agg_regression",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(epoch(ts)) - 1704067200 AS DECIMAL(11,0)))
                  AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(FLOOR(epoch(ts)) - 1704067200 AS DECIMAL(11,0))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(FLOOR(epoch(ts)) - 1704067200 AS DECIMAL(11,0))
                      * CAST(FLOOR(epoch(ts)) - 1704067200 AS DECIMAL(11,0)))
                  AS DOUBLE) AS sx2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR((n * sxy - sx * sy) / (n * sx2 - sx * sx) * 1e12 + 0.5) / 1e12
               AS slope,
           FLOOR((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n
                 * 1e6 + 0.5) / 1e6 AS intercept
    FROM s ORDER BY event_type
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares trend (value vs event time) from EXACT
    decimal running sums — the distributive five-sum formulation of
    regr_slope/regr_intercept, made hash-certifiable: the builtin
    regr_* aggregates accumulate in doubles, so their low bits depend
    on partial-aggregation order (verified: ~1e-8 relative drift
    between engines); summing in DECIMAL and applying the closed form
    once at the end is order-free on both sides. The builtins
    themselves are pinned against this form (±1e-6 relative) in
    tests/test_round5_ops.py::test_builtin_regr_matches_closed_form."""
    e = t(spark, sf_dir, "events")
    # narrow operands so every decimal PRODUCT fits precision 38
    # exactly — wider operands trigger engine-specific scale reduction
    # (allowPrecisionLoss) that rounds each product differently
    xd = (F.unix_timestamp("ts") - F.lit(1704067200)).cast("decimal(11,0)")
    yd = F.col("value").cast("decimal(18,6)")
    st = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sx2"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return (
        st.select(
            "event_type",
            "n",
            (F.floor(slope * 1e12 + 0.5) / 1e12).alias("slope"),
            (
                F.floor(
                    (F.col("sy") - slope * F.col("sx")) / F.col("n") * 1e6 + 0.5
                )
                / 1e6
            ).alias("intercept"),
        )
        .orderBy("event_type")
    )
