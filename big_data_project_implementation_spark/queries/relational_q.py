"""Core relational operators: project / filter / distinct / set ops /
sort / limit / explode / sample (SURVEY §2.2, §2.6, §2.7, §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "project_filter",
    oracle="""
    SELECT o_orderkey,
           CAST(o_custkey % 100 AS BIGINT) AS cust_bucket,
           ROUND(o_totalprice * 1.1, 3)    AS uplifted,
           o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
    ORDER BY o_orderkey
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + Filter physical operators (reference
    sql/core/.../execution/basicOperators.scala:33,60); arithmetic and
    comparison expressions stay in whole-stage codegen."""
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000.0))
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).cast("bigint").alias("cust_bucket"),
            F.round(F.col("o_totalprice") * 1.1, 3).alias("uplifted"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


@query(
    "predicates_null_in_like",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus IN ('O','F')                    AS in_set,
           (NULLIF(o_orderstatus, 'P') IS NULL)          AS was_p,
           o_orderpriority LIKE '%URGENT'                AS is_urgent,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'none')  AS status_or_none,
           o_totalprice BETWEEN 500 AND 1500             AS mid_price
    FROM orders
    WHERE o_orderkey % 7 = 0
    ORDER BY o_orderkey
    """,
)
def predicates_null_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: IN, IS NULL, LIKE, COALESCE/NULLIF, BETWEEN
    (SURVEY §2.2; reference CAT/expressions/predicates.scala)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    was_p = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").isin("O", "F").alias("in_set"),
        was_p.isNull().alias("was_p"),
        F.col("o_orderpriority").like("%URGENT").alias("is_urgent"),
        F.coalesce(was_p, F.lit("none")).alias("status_or_none"),
        F.col("o_totalprice").between(500, 1500).alias("mid_price"),
    ).orderBy("o_orderkey")


@query(
    "distinct_dropdup",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct → Aggregate rewrite (reference
    CAT/optimizer/Optimizer.scala:912 ReplaceDistinctWithAggregate)."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "union_all",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
    ) ORDER BY src, key
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union (bag semantics, by position) — reference
    EXE/basicOperators.scala:132."""
    a = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src"))
    )
    b = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("src")
    )
    return a.unionAll(b).orderBy("src", "key")


@query(
    "intersect_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — reference EXE/basicOperators.scala:272."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (df.subtract) — reference
    EXE/basicOperators.scala:260; 1.6's RDD.subtract semantics resolved
    in favor of the oracle's EXCEPT DISTINCT (SURVEY §7.3)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "except_all_bag",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    ORDER BY nationkey
    """,
)
def except_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics) — modern exceptAll covers the
    reference's duplicate-preserving RDD.subtract corner."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    rich = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    return c.exceptAll(rich).orderBy("nationkey")


@query(
    "intersect_all_bag",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05
    ORDER BY suppkey
    """,
)
def intersect_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_suppkey").alias("suppkey")
    )
    return a.intersectAll(b).orderBy("suppkey")


@query(
    "topk_order_limit",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (top-k without global
    sort; reference EXE/basicOperators.scala:192)."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT n_name, n_nationkey, n_regionkey
    FROM nation
    ORDER BY n_regionkey DESC, n_name ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort, mixed directions (reference EXE/Sort.scala:35 —
    Tungsten external sort; modern Spark range-partitions first)."""
    return (
        t(spark, sf_dir, "nation")
        .select("n_name", "n_nationkey", "n_regionkey")
        .orderBy(F.desc("n_regionkey"), F.asc("n_name"))
    )


@query(
    "explode_lateral_view",
    oracle="""
    SELECT doc_id, word, COUNT(*) AS n
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 50)
    WHERE length(word) > 4
    GROUP BY doc_id, word
    ORDER BY doc_id, word
    """,
)
def explode_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator / LATERAL VIEW explode (reference EXE/Generate.scala:49,
    CAT/expressions/generators.scala:102)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 4)
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "word")
    )


@query(
    "posexplode_outer",
    oracle="""
    SELECT n_nationkey, part.pos - 1 AS pos, part.tok AS tok
    FROM nation,
         LATERAL (SELECT UNNEST(string_split(n_name, ' ')) AS tok,
                         generate_subscripts(string_split(n_name, ' '), 1) AS pos) part
    ORDER BY n_nationkey, pos
    """,
)
def posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — positional generator (modern extension of the
    reference's Explode; SURVEY §2.9)."""
    n = t(spark, sf_dir, "nation")
    return (
        n.select(
            "n_nationkey",
            F.posexplode(F.split(F.col("n_name"), " ")).alias("pos", "tok"),
        )
        .select("n_nationkey", F.col("pos").cast("bigint").alias("pos"), "tok")
        .orderBy("n_nationkey", "pos")
    )


@query("sample_bernoulli")  # nondeterministic across engines → rows-only check
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample with fixed seed (reference
    EXE/basicOperators.scala:100); no oracle — sampling RNG is
    engine-specific."""
    return (
        t(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "repartition_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def repartition_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange round-trip: hash repartition on the grouping key then
    aggregate — the shuffle is reused, not duplicated (reference
    EXE/Exchange.scala:39; EnsureRequirements)."""
    li = t(spark, sf_dir, "lineitem").repartition(8, "l_returnflag")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy("l_returnflag")
    )


@query(
    "sql_front_door",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql over registered temp views — the SQL entry point
    (reference SQLC/SQLContext.scala:816; SURVEY §3.1)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 4) AS avg_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(c) AS t FROM counts)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS max_count,
           ROUND(MAX(c) / ANY_VALUE(t), 6) AS top_share,
           ROUND(CAST(-SUM(CAST((c / t) * ln(c / t)
                                AS DECIMAL(28,10))) AS DOUBLE), 6) AS entropy
    FROM counts CROSS JOIN tot
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators.relational
    .key_skew_stats) over events.user_id — n_keys / max key share /
    distribution entropy, the measurement that picks between a plain
    shuffle, AQE skew splitting, and salted_join. Entropy terms
    decimal-summed; totals via 1-row broadcast, never a global
    window."""
    from big_data_project_implementation_spark.operators import relational

    e = t(spark, sf_dir, "events")
    return relational.key_skew_stats(e, "user_id")


@query(
    "relational_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             l_quantity AS value FROM lineitem WHERE l_orderkey % 500 = 0
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey % 500 = 0
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem WHERE l_orderkey % 500 = 0
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      FROM lineitem WHERE l_orderkey % 500 = 0
    )
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def relational_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.unpivot (SQL UNPIVOT / melt): wide measure columns to
    long (measure, value) rows — the modern inverse of pivot. A pure
    per-row explode in the physical plan: zero shuffles, predicate
    pushdown unaffected (the filter reaches the scan below the
    Expand)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    ).orderBy("l_orderkey", "l_linenumber", "measure")


@query(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL surface: GROUP BY ALL / ORDER BY ALL (Spark ≥ 3.4 and
    DuckDB both infer the grouping keys from the select list) through
    the SQL front door — the same two-phase hash aggregate underneath."""
    from big_data_project_implementation_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_lateral_join",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.bal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) c
    ORDER BY n.n_name, c.bal DESC, c.c_custkey
    """,
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in FROM (top-2-per-outer-row) — the
    modern SQL spelling of per-group top-k; Catalyst decorrelates it
    into the same window/join plan the DataFrame API produces, so no
    per-row re-execution survives in the physical plan."""
    from big_data_project_implementation_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.bal
        FROM nation n,
        LATERAL (
          SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
          FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) c
        ORDER BY n.n_name, c.bal DESC, c.c_custkey
        """
    )


@query(
    "join_band_self",
    oracle="""
    SELECT a.event_type AS event_type, a.event_id AS id_a,
           b.event_id AS id_b, abs(a.value - b.value) AS delta
    FROM events a JOIN events b
      ON a.event_type = b.event_type
     AND a.event_id < b.event_id
     AND abs(a.value - b.value) <= 0.001
    ORDER BY a.event_type, id_a, id_b
    """,
)
def join_band_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join (|Δvalue| ≤ ε within event_type;
    operators.relational.band_join): eps-bucket quantization turns the
    quadratic theta join into an EQUI-shuffle on (key, bucket) with an
    exact residual filter — candidate volume is linear for spread
    values, and the oracle is the raw theta join."""
    from big_data_project_implementation_spark.operators import relational

    e = t(spark, sf_dir, "events")
    return relational.band_join(
        e, "value", eps=0.001, key_cols=["event_type"], id_col="event_id"
    ).orderBy("event_type", "id_a", "id_b")


@query(
    "relational_zip_with_index",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
               AS idx
    FROM documents
    ORDER BY doc_id
    """,
)
def relational_zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDD zipWithIndex parity (reference CORE/rdd/RDD.scala:1325,
    ZippedWithIndexRDD) without the single-task global window: range
    repartition on the order keys + per-partition counts prefix-summed
    into broadcast offsets + partition-local row_number
    (operators.relational.zip_with_index). Order keys (source, doc_id)
    are unique per row, so the index is deterministic."""
    from big_data_project_implementation_spark.operators import relational

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        relational.zip_with_index(d, ["source", "doc_id"])
        .select("doc_id", "idx")
        .orderBy("doc_id")
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE walk(k, depth) AS (
      SELECT p_partkey, 0 FROM part WHERE p_partkey % 97 = 0 AND p_partkey > 0
      UNION ALL
      SELECT k // 2, depth + 1 FROM walk WHERE k > 1
    )
    SELECT CAST(depth AS BIGINT)    AS depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT)   AS key_sum
    FROM walk GROUP BY depth ORDER BY depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark ≥ 4.0): binary-tree
    ancestor walk from seeded part keys — the BOM-explosion /
    org-chart reachability pattern, grouped into per-depth rollups.
    Spark executes the recursion as an iterated UnionLoop (one join +
    filter per level, O(log K) levels here); unbounded graph closure
    at 100 TB belongs to the dedicated star-contraction operator
    (operators.dedup.connected_components), which this complements as
    the SQL-surface spelling.

    Perf floor (r4 verdict #8, profiled): UnionLoop materializes ONE
    Spark job per recursion level — ~15 levels × ~60ms scheduling ≈
    0.9s irreducible in local mode regardless of data size; DuckDB's
    10ms is a single-process loop with no per-level scheduling. The
    REPARTITION(1) anchor hint trims per-level task count for this
    sub-1%-selectivity seed (measured 1.20s → 0.93s); a wide-seed BOM
    walk would keep the anchor's natural partitioning. No
    `spark.sql.cteRecursion*` conf changes the per-level
    materialization (only level/row safety limits exist)."""
    from big_data_project_implementation_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk(k, depth) AS (
          SELECT /*+ REPARTITION(1) */ p_partkey, 0 FROM part
          WHERE p_partkey % 97 = 0 AND p_partkey > 0
          UNION ALL
          SELECT k DIV 2, depth + 1 FROM walk WHERE k > 1
        )
        SELECT CAST(depth AS BIGINT)    AS depth,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT)   AS key_sum
        FROM walk GROUP BY depth ORDER BY depth
        """
    )


@query(
    "audit_table_fingerprint",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(CAST(('0x' || substr(md5(
                 COALESCE(CAST(l_orderkey AS VARCHAR), chr(0) || 'null')
                 || chr(31) ||
                 COALESCE(CAST(l_linenumber AS VARCHAR), chr(0) || 'null')
                 || chr(31) ||
                 COALESCE(CAST(l_quantity AS VARCHAR), chr(0) || 'null')
               ), 1, 15)) AS BIGINT) AS DECIMAL(38,0)))
             AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
    FROM lineitem
    """,
)
def audit_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free additive content fingerprint
    (operators.relational.table_fingerprint over three lineitem
    columns): the one-scan multiset-equality check for verifying a
    migrated / replicated / engine-swapped copy of a 100 TB table —
    partitioning- and order-invariant by construction (commutative
    decimal addition of md5-derived row hashes)."""
    from big_data_project_implementation_spark.operators import relational

    li = t(spark, sf_dir, "lineitem")
    return relational.table_fingerprint(
        li, ["l_orderkey", "l_linenumber", "l_quantity"]
    )


@query(
    "io_xml_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, text
    FROM documents
    WHERE text IS NOT NULL
    ORDER BY doc_id
    """,
)
def io_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink round-trip (round 8; native in Spark 4 — the
    reference era needed the external spark-xml package): write the
    documents table as element-per-row XML, read it back with the
    DECLARED schema (inference would re-type numeric-looking strings),
    and emit the rows — the oracle reads the ORIGINAL parquet, so the
    hash match certifies byte-exact escaping round-trip of real
    multi-line text through the XML reader/writer pair. NULL-text docs
    are excluded on both sides (an absent element and an empty element
    are indistinguishable to XML, the format's own documented
    limitation, not the engine's). Scale shape: format conversion is a
    pure per-partition map — no shuffle either way beyond the
    presentation sort."""
    import tempfile

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", "source", "text")
    )
    out = tempfile.mkdtemp(prefix="xml_rt_") + "/docs"
    (
        d.write.format("xml")
        .option("rowTag", "doc")
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(d.schema)
        .load(out)
    )
    return back.orderBy("doc_id")


@query(
    "io_avro_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def io_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source/sink round-trip (round 8) through the PURE-PYTHON
    ``pyavro`` DataSource (sources/avro_format.py) — the spark-avro
    jar the reference era shipped externally is absent here, so the
    format is implemented against the public Avro 1.11 container spec
    (zigzag varints, deflate blocks, sync markers) and wired in via
    the Spark 4 Python DataSource SPI. The oracle reads the ORIGINAL
    parquet, so the hash match certifies the wire codec end-to-end:
    every long/string/null of real multi-line text survives
    encode→deflate→decode byte-exactly, INCLUDING the NULL-text docs
    XML cannot represent (Avro's [null, T] union can). Scale shape:
    one container file per task on write, one input partition per
    file on read — no driver funnel either way; the per-row Python
    codec makes this the availability path, parquet stays the perf
    path (documented in the module header)."""
    import tempfile

    from big_data_project_implementation_spark.sources import avro_format

    avro_format.register(spark)
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="avro_rt_") + "/docs"
    d.write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    return back.orderBy("doc_id")


@query(
    "incremental_agg_refresh",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents,
           CAST(SUM(c) * 1000 // COUNT(*) AS BIGINT) AS avg_millicents
    FROM (SELECT o_orderstatus, o_orderpriority,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders)
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate (round 8,
    operators.relational.mergeable_agg_state / merge_agg_states): the
    materialized-view refresh pattern — per-key (n, sum, min, max)
    state computed ONCE over the historical partition, then each
    arriving delta folds in at cost ∝ |state| + |delta|, never the
    base corpus (the batch complement of `sources.incremental_read`'s
    bookmark ingestion; at 100 TB the state is thousands of rows
    while the base is the 100 TB). The measure is exact integer
    cents (micro-unit convention), so the merge algebra is
    associative to the last bit; the ORACLE recomputes from the FULL
    table in one pass, so the hash match IS the auditor's
    refresh-equals-recompute check — a drifted double sum, a lost
    delta, or a double-folded state all break it. Derived stats
    (avg) come off (n, sum) downstream, as in any partial-aggregate
    scheme."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    orders = t(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    cut = F.lit("1997-01-01").cast("date")
    mv = MaterializedView("agg", keys=keys, value=cents)
    base = mv.compute(orders.filter(F.col("o_orderdate") < cut))
    merged = mv.refresh(
        base, delta=orders.filter(F.col("o_orderdate") >= cut)
    )
    return merged.select(
        *keys,
        "n",
        F.col("sum").alias("total_cents"),
        F.col("min").alias("min_cents"),
        F.col("max").alias("max_cents"),
        F.expr("sum * 1000 div n").alias("avg_millicents"),
    ).orderBy(*keys)


@query(
    "incremental_join_refresh",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN view (round 9,
    operators.relational.delta_join_refresh): the orders ⋈ lineitem
    view is materialized over the historical partitions (orders
    before 1997, lineitems shipped before 1996), then BOTH sides'
    arrivals fold in via the exact delta algebra
    M ∪ (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB) — cost ∝ |delta|, never
    |A ⋈ B|, with the deltas broadcast so neither base table
    shuffles. The ORACLE recomputes the full join from scratch, so
    the hash match IS the refresh-equals-recompute audit under bag
    semantics: a row matched twice (cross-delta term double-folded),
    a missed late arrival, or set-semantics dedup all break it.
    Exact-integer measures (qty, price cents) per the micro-unit
    convention."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    b = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "l_shipdate",
    )
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a)
    delta_a = a.filter(F.col("o_orderdate") >= cut_a)
    b_old = b.filter(F.col("l_shipdate") < cut_b)
    delta_b = b.filter(F.col("l_shipdate") >= cut_b)
    mv = MaterializedView("inner", on=["o_orderkey"])
    view = mv.compute(a_old, b_old)
    refreshed = mv.refresh(
        view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    return refreshed.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "incremental_join_increment",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= DATE '1997-01-01'
       OR l.l_shipdate >= DATE '1996-01-01'
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_join_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPEND shape of the maintained join view (round 9,
    operators.relational.delta_join_increment): exactly the join rows
    with a new contributor on either side —
    ΔM = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB) — which a deployment appends to
    the stored view instead of rewriting it, making BOTH compute and
    OUTPUT ∝ |delta| (the refresh twin re-emits the whole view; this
    is what actually moves at 100 TB — tools/ivm_probe.py measures it
    flat at ~1s while full recompute grows with |A ⋈ B|). The ORACLE
    derives the same set independently as 'full join WHERE either
    side's row is new' — so the hash match certifies the delta algebra
    covers every new-contributor row exactly once (a double-folded
    cross-delta term or a missed A_old ⋈ ΔB row breaks it)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    b = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "l_shipdate",
    )
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    inc = MaterializedView("inner", on=["o_orderkey"]).increment(
        a.filter(F.col("o_orderdate") < cut_a),
        a.filter(F.col("o_orderdate") >= cut_a),
        b.filter(F.col("l_shipdate") < cut_b),
        b.filter(F.col("l_shipdate") >= cut_b),
    )
    return inc.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "incremental_agg_retract",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST(MIN(c) AS BIGINT) AS min_cents,
           CAST(MAX(c) AS BIGINT) AS max_cents
    FROM (SELECT o_orderstatus, o_orderpriority,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders WHERE o_orderkey % 13 <> 0)
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def incremental_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION maintenance of the aggregate view (round 9,
    operators.relational.retract_agg_state) — the retraction half of
    the aggregate IVM story, with the classic min/max repair: n and
    sum retract by pure arithmetic (state minus the deleted rows'
    state), while min/max — semilattices, not groups — recount ONLY
    for the keys whose deleted extreme touched the state extreme,
    via a semi-join-pruned pass over the post-delete rows of just
    those keys (never the whole base). Every 13th order is purged
    (the GDPR shape); with ~15 groups and exact integer cents, some
    groups take the arithmetic path and some the repair path, and the
    ORACLE recomputes from the post-delete table so the hash match
    certifies BOTH. Keys fully deleted drop out, matching a
    recomputed GROUP BY."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    orders = t(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    purged = F.col("o_orderkey") % 13 == 0
    mv = MaterializedView("agg", keys=keys, value=cents)
    state = mv.compute(orders)
    out = mv.retract(
        state,
        deleted=orders.filter(purged),
        base_remaining=orders.filter(~purged),
    )
    return out.select(
        *keys,
        "n",
        F.col("sum").alias("total_cents"),
        F.col("min").alias("min_cents"),
        F.col("max").alias("max_cents"),
    ).orderBy(*keys)


@query(
    "incremental_join_retract",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 13 <> 0
      AND (l.l_orderkey + l.l_linenumber) % 11 <> 0
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_join_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION maintenance of the join view (round 9,
    operators.relational.delta_join_retract) — the retraction half of
    the IVM algebra, the GDPR-purge / revoked-source shape: rows are
    deleted from BOTH sides (every 13th order; every 11th lineitem)
    and the maintained view drops exactly the join rows that lost a
    contributor — M exceptAll [(Δ⁻A ⋈ b_new) ∪ (Δ⁻A ⋈ Δ⁻B) ∪
    (a_new ⋈ Δ⁻B)], three disjoint exhaustive terms under bag
    semantics. The ORACLE recomputes the post-delete join from
    scratch, so the hash match is the deletion-audit: a pair removed
    twice (overlapping terms), a survivor dropped, or a deleted-both-
    sides pair kept all break it."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    b = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
    )
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 11 == 0
    mv = MaterializedView("inner", on=["o_orderkey"])
    view = mv.compute(a, b)
    kept = mv.retract(
        view,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~del_b),
        retract_b=b.filter(del_b),
    )
    return kept.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / SQL:2023-era |> operators — a §2.13
    modern-surface row with no 1.6 counterpart): the same logical
    plan as the classic SELECT, spelled as a linear pipeline. The
    ORACLE is the classic spelling, so the hash match certifies that
    the pipe front-end lowers to the identical relational semantics —
    the property that makes the syntax safe to adopt in a production
    codebase."""
    from big_data_project_implementation_spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     ROUND(SUM(o_totalprice), 2) AS total
           GROUP BY o_orderstatus
        |> ORDER BY o_orderstatus
        """
    )


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority, n
    """,
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (modern SQL sugar, §2.13): every
    non-aggregate projection groups, every output column orders —
    the oracle spells both lists explicitly, certifying the
    inference."""
    from big_data_project_implementation_spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 95000.0
    ORDER BY o_orderkey
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named markers — the
    injection-safe front door an application actually uses instead of
    string interpolation; §2.13 modern surface). Parameters bind as
    typed literals in the parsed plan, so pushdown/pruning see real
    constants — the oracle inlines the same values, certifying the
    binding."""
    from big_data_project_implementation_spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        ORDER BY o_orderkey
        """,
        args={"status": "F", "floor": 95000.0},
    )


def _lj_sides(spark: SparkSession, sf_dir: str):
    """Shared orders/lineitem shaping for the LEFT-OUTER IVM rows: the
    synthetic tables have ~1.7% of orders with NO lineitems at all, so
    null-extension rows are real data, not a theoretical branch."""
    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    b = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "l_shipdate",
    )
    return a, b


@query(
    "incremental_left_join_refresh",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_left_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained LEFT OUTER join view (round 10,
    operators.relational.delta_left_join_refresh) — the asymmetry the
    round-9 inner-join algebra left open (reference
    sql/core/.../execution/joins/SortMergeOuterJoin.scala:34): the
    orders ⟕ lineitem view is materialized over the historical
    partitions, then arrivals on BOTH sides fold in — and unlike the
    inner case, an arriving lineitem can FLIP an order's null-extended
    row into matches (2,484 orders flip at sf0.01). The maintained
    view is M exceptAll null_extend(A_old ▷ B_old ⋉ ΔB) ∪
    (ΔA ⟕ B_new) ∪ (A_old ⋈ ΔB); the ORACLE recomputes the full LEFT
    JOIN from scratch, so the hash match is the refresh-equals-
    recompute audit in the presence of the flip: a stale null row
    kept, a flip retracted twice, or an order with no lineitems AT ALL
    (~1.7% of the table — its null row must SURVIVE) all break it."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _lj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a)
    delta_a = a.filter(F.col("o_orderdate") >= cut_a)
    b_old = b.filter(F.col("l_shipdate") < cut_b)
    delta_b = b.filter(F.col("l_shipdate") >= cut_b)
    mv = MaterializedView("left", on=["o_orderkey"])
    view = mv.compute(a_old, b_old)
    refreshed = mv.refresh(
        view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    return refreshed.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "incremental_left_join_increment",
    oracle="""
    WITH a_old AS (SELECT o_orderkey, o_orderstatus FROM orders
                   WHERE o_orderdate < DATE '1997-01-01'),
         delta_a AS (SELECT o_orderkey, o_orderstatus FROM orders
                     WHERE o_orderdate >= DATE '1997-01-01'),
         b_old AS (SELECT l_orderkey, l_linenumber,
                          CAST(l_quantity AS BIGINT) AS qty,
                          CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                            AS price_cents
                   FROM lineitem WHERE l_shipdate < DATE '1996-01-01'),
         delta_b AS (SELECT l_orderkey, l_linenumber,
                            CAST(l_quantity AS BIGINT) AS qty,
                            CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                              AS price_cents
                     FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'),
         b_new AS (SELECT * FROM b_old UNION ALL SELECT * FROM delta_b)
    SELECT da.o_orderkey, b.l_linenumber, da.o_orderstatus,
           b.qty, b.price_cents, FALSE AS is_retraction
    FROM delta_a da LEFT JOIN b_new b ON da.o_orderkey = b.l_orderkey
    UNION ALL
    SELECT ao.o_orderkey, db.l_linenumber, ao.o_orderstatus,
           db.qty, db.price_cents, FALSE AS is_retraction
    FROM a_old ao JOIN delta_b db ON ao.o_orderkey = db.l_orderkey
    UNION ALL
    SELECT ao.o_orderkey, CAST(NULL AS INTEGER) AS l_linenumber,
           ao.o_orderstatus, CAST(NULL AS BIGINT) AS qty,
           CAST(NULL AS BIGINT) AS price_cents, TRUE AS is_retraction
    FROM a_old ao
    WHERE EXISTS (SELECT 1 FROM delta_b db
                  WHERE db.l_orderkey = ao.o_orderkey)
      AND NOT EXISTS (SELECT 1 FROM b_old bo
                      WHERE bo.l_orderkey = ao.o_orderkey)
    ORDER BY o_orderkey, l_linenumber, is_retraction
    """,
)
def incremental_left_join_increment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The (appends, retractions) DELTA PAIR of the maintained LEFT
    OUTER view (round 10, operators.relational.delta_left_join_increment)
    — what a deployment actually ships per refresh cycle: append rows
    ∝ |Δ| plus the null-extension rows the arrivals KILL, flagged
    ``is_retraction``. The ORACLE derives both halves independently —
    appends as the two delta joins spelled out, retractions as the
    correlated EXISTS/NOT-EXISTS ("had no historical lineitem, gained
    one") — so the hash match certifies the anti∘semi flip selection
    row-for-row and the appends exactly once each (a double-folded
    cross-delta term, a missed flip, or a flip of an order that
    already had matches all break it)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _lj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    appends, retractions = MaterializedView(
        "left", on=["o_orderkey"]
    ).increment(
        a.filter(F.col("o_orderdate") < cut_a),
        a.filter(F.col("o_orderdate") >= cut_a),
        b.filter(F.col("l_shipdate") < cut_b),
        b.filter(F.col("l_shipdate") >= cut_b),
    )
    out_cols = [
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents",
    ]
    return (
        appends.select(*out_cols)
        .withColumn("is_retraction", F.lit(False))
        .unionByName(
            retractions.select(*out_cols).withColumn(
                "is_retraction", F.lit(True)
            )
        )
        .orderBy("o_orderkey", "l_linenumber", "is_retraction")
    )


@query(
    "incremental_left_join_retract",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM (SELECT * FROM orders WHERE o_orderkey % 13 <> 0) o
    LEFT JOIN (SELECT * FROM lineitem
               WHERE (l_orderkey + l_linenumber) % 11 <> 0) l
      ON o.o_orderkey = l.l_orderkey
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_left_join_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETION maintenance of the LEFT OUTER join view (round 10,
    operators.relational.delta_left_join_retract) — the REVERSE
    null-flip: purging every 13th order removes its rows outright
    (matched or null-extended), but purging every 11th lineitem can
    delete a surviving order's LAST match, and then the view must
    re-emit that order as a null-extended row, not drop it (361 such
    rows at sf0.01). M' = M exceptAll [(Δ⁻A ⟕ B) ∪ (a_new ⋈ Δ⁻B)] ∪
    null_extend(a_new ⋉ Δ⁻B ▷ b_new); the ORACLE recomputes the
    post-delete LEFT JOIN from scratch, so the hash match certifies
    the flip in this direction too — a survivor silently dropped, a
    re-null missing, or a deleted order's null row kept all break
    it."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _lj_sides(spark, sf_dir)
    a = a.drop("o_orderdate")
    b = b.drop("l_shipdate")
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 11 == 0
    mv = MaterializedView("left", on=["o_orderkey"])
    view = mv.compute(a, b)
    kept = mv.retract(
        view,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~del_b),
        retract_b=b.filter(del_b),
    )
    return kept.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "incremental_join_retract_keyed",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 13 <> 0
      AND (l.l_orderkey + l.l_linenumber) % 11 <> 0
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def incremental_join_retract_keyed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KEYED deletion maintenance of the join view (round 10,
    operators.relational.delta_join_retract_keyed) — the cheap
    deployment shape the keyless round-9 row's docstring promised:
    the view carries each side's row id (o_orderkey; lineitem rowid =
    l_orderkey·8 + l_linenumber, exact since l_linenumber ≤ 7), so the
    same GDPR purge (every 13th order, every 11th lineitem) is TWO
    ANTI-JOINS on broadcast id sets — the view is scanned once and
    never shuffled, vs the keyless exceptAll's view-sized all-column
    shuffle (tools/ivm_probe.py measures the separation at 100×
    history). Same deletions, same ORACLE shape as
    ``incremental_join_retract`` — the hash match certifies the keyed
    algebra reaches the identical post-delete view."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _lj_sides(spark, sf_dir)
    a = a.drop("o_orderdate")
    b = b.drop("l_shipdate").withColumn(
        "lid",
        (F.col("o_orderkey") * 8 + F.col("l_linenumber")).cast("bigint"),
    )
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 11 == 0
    mv = MaterializedView(
        "inner", on=["o_orderkey"], a_id="o_orderkey", b_id="lid"
    )
    view = mv.compute(a, b)
    kept = mv.retract(
        view,
        retract_a=a.filter(del_a).select("o_orderkey"),
        retract_b=b.filter(del_b).select("lid"),
    )
    return kept.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


def _fj_sides(spark: SparkSession, sf_dir: str):
    """Shared customer/orders shaping for the FULL-OUTER IVM rows —
    the late-arriving-dimension scenario where full outer is what a
    warehouse actually materializes: fact rows (orders) can arrive
    BEFORE their dimension row (customer) exists, so the view keeps
    them right-null-extended until the member lands; dimension members
    with no facts yet sit left-null-extended. One in seven members
    (c_custkey % 7 = 3) never resolves at all, so orphan facts are a
    standing population, not a transient."""
    a = t(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 != 3
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("bal_cents"),
    )
    b = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "o_orderdate",
    )
    return a, b


_FJ_COLS = [
    "c_custkey", "c_mktsegment", "bal_cents",
    "o_orderkey", "o_orderstatus", "price_cents",
]


@query(
    "incremental_full_join_refresh",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
           c.c_mktsegment,
           CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
           o.o_orderkey, o.o_orderstatus,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM (SELECT * FROM customer WHERE c_custkey % 7 <> 3) c
    FULL JOIN orders o ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey, o_orderkey
    """,
)
def incremental_full_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained FULL OUTER join view (round 10,
    operators.relational.delta_full_join_refresh) — the last outer
    shape of the IVM algebra (reference full-outer execution:
    sql/core/.../execution/joins/SortMergeOuterJoin.scala:34), on the
    late-arriving-dimension scenario: the customer ⟗ orders view is
    materialized with 20% of customers NOT YET ARRIVED (c_custkey %
    5 = 0) and only pre-1997 orders; then both arrive. Arriving orders
    kill left-null customer rows (49 flips at sf0.01), arriving
    customers kill RIGHT-null order rows (788 flips — the direction
    LEFT-outer IVM cannot express), and arriving orders of
    never-resolved members append as standing right-null rows (1,513).
    The ORACLE recomputes the full
    FULL JOIN from scratch, so the hash match is the refresh-equals-
    recompute audit across both flip directions at once."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _fj_sides(spark, sf_dir)
    cut_b = F.lit("1997-01-01").cast("date")
    a_old = a.filter(F.col("c_custkey") % 5 != 0)
    delta_a = a.filter(F.col("c_custkey") % 5 == 0)
    b_old = b.filter(F.col("o_orderdate") < cut_b).drop("o_orderdate")
    delta_b = b.filter(F.col("o_orderdate") >= cut_b).drop("o_orderdate")
    mv = MaterializedView("full", on=["c_custkey"])
    view = mv.compute(a_old, b_old)
    refreshed = mv.refresh(
        view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    return refreshed.select(*_FJ_COLS).orderBy("c_custkey", "o_orderkey")


@query(
    "incremental_full_join_increment",
    oracle="""
    WITH cust AS (SELECT c_custkey, c_mktsegment,
                         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                           AS bal_cents
                  FROM customer WHERE c_custkey % 7 <> 3),
         a_old AS (SELECT * FROM cust WHERE c_custkey % 5 <> 0),
         delta_a AS (SELECT * FROM cust WHERE c_custkey % 5 = 0),
         b AS (SELECT o_custkey AS c_custkey, o_orderkey, o_orderstatus,
                      CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS price_cents, o_orderdate
               FROM orders),
         b_old AS (SELECT * FROM b WHERE o_orderdate < DATE '1997-01-01'),
         delta_b AS (SELECT * FROM b WHERE o_orderdate >= DATE '1997-01-01')
    SELECT da.c_custkey, da.c_mktsegment, da.bal_cents,
           bn.o_orderkey, bn.o_orderstatus, bn.price_cents,
           FALSE AS is_retraction
    FROM delta_a da LEFT JOIN b bn ON da.c_custkey = bn.c_custkey
    UNION ALL
    SELECT ao.c_custkey, ao.c_mktsegment, ao.bal_cents,
           db.o_orderkey, db.o_orderstatus, db.price_cents,
           FALSE AS is_retraction
    FROM a_old ao JOIN delta_b db ON ao.c_custkey = db.c_custkey
    UNION ALL
    SELECT db.c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment,
           CAST(NULL AS BIGINT) AS bal_cents,
           db.o_orderkey, db.o_orderstatus, db.price_cents,
           FALSE AS is_retraction
    FROM delta_b db
    WHERE NOT EXISTS (SELECT 1 FROM cust c
                      WHERE c.c_custkey = db.c_custkey)
    UNION ALL
    SELECT ao.c_custkey, ao.c_mktsegment, ao.bal_cents,
           CAST(NULL AS BIGINT) AS o_orderkey,
           CAST(NULL AS VARCHAR) AS o_orderstatus,
           CAST(NULL AS BIGINT) AS price_cents,
           TRUE AS is_retraction
    FROM a_old ao
    WHERE EXISTS (SELECT 1 FROM delta_b db
                  WHERE db.c_custkey = ao.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM b_old bo
                      WHERE bo.c_custkey = ao.c_custkey)
    UNION ALL
    SELECT bo.c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment,
           CAST(NULL AS BIGINT) AS bal_cents,
           bo.o_orderkey, bo.o_orderstatus, bo.price_cents,
           TRUE AS is_retraction
    FROM b_old bo
    WHERE bo.c_custkey % 5 = 0 AND bo.c_custkey % 7 <> 3
    ORDER BY c_custkey, o_orderkey, is_retraction
    """,
)
def incremental_full_join_increment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The (appends, retractions) DELTA PAIR of the maintained FULL
    OUTER view (round 10, operators.relational.delta_full_join_increment)
    — what a refresh cycle ships, flagged ``is_retraction``. The
    ORACLE derives all five terms independently: the two matched-
    append joins, the right-null appends as a NOT-EXISTS against the
    whole dimension, the left flips as the EXISTS/NOT-EXISTS
    ("no historical order, gained one"), and the right flips as the
    closed-form membership test (b_old facts of late-arriving
    customers, c_custkey % 5 = 0 — exact because the synthetic data
    has no orphan facts below the split). The hash match certifies
    each append exactly once and both flip selections row-for-row —
    a doomed right-null row materialized for a cross-delta match
    breaks it (the ΔB ▷ A_new term uses A_NEW, not A_old)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _fj_sides(spark, sf_dir)
    cut_b = F.lit("1997-01-01").cast("date")
    appends, retractions = MaterializedView(
        "full", on=["c_custkey"]
    ).increment(
        a.filter(F.col("c_custkey") % 5 != 0),
        a.filter(F.col("c_custkey") % 5 == 0),
        b.filter(F.col("o_orderdate") < cut_b).drop("o_orderdate"),
        b.filter(F.col("o_orderdate") >= cut_b).drop("o_orderdate"),
    )
    return (
        appends.select(*_FJ_COLS)
        .withColumn("is_retraction", F.lit(False))
        .unionByName(
            retractions.select(*_FJ_COLS).withColumn(
                "is_retraction", F.lit(True)
            )
        )
        .orderBy("c_custkey", "o_orderkey", "is_retraction")
    )


@query(
    "incremental_full_join_retract",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
           c.c_mktsegment,
           CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
           o.o_orderkey, o.o_orderstatus,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS price_cents
    FROM (SELECT * FROM customer
          WHERE c_custkey % 7 <> 3 AND c_custkey % 13 <> 0) c
    FULL JOIN (SELECT * FROM orders
               WHERE o_orderdate < DATE '1998-01-01') o
      ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey, o_orderkey
    """,
)
def incremental_full_join_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETION maintenance of the FULL OUTER join view (round 10,
    operators.relational.delta_full_join_retract) — a GDPR purge
    (every 13th customer) plus a retention purge (orders from 1998 on)
    hitting the same refresh: purged customers' matched rows flip to
    RIGHT-null (their orders survive, 446 rows at sf0.01), and
    surviving customers whose orders were ALL recent flip back to
    left-null (17 rows) — the two reverse directions at once, plus
    right-null rows whose order died outright. The ORACLE recomputes
    the post-delete FULL JOIN from scratch; the hash match certifies
    the three disjoint ``gone`` terms retract exactly once each and
    both flip re-emissions land."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _fj_sides(spark, sf_dir)
    b = b.withColumn("_recent", F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")).drop("o_orderdate")
    del_a = F.col("c_custkey") % 13 == 0
    mv = MaterializedView("full", on=["c_custkey"])
    view = mv.compute(a, b).drop("_recent")
    kept = mv.retract(
        view,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~F.coalesce(F.col("_recent"), F.lit(False))).drop(
            "_recent"
        ),
        retract_b=b.filter(F.coalesce(F.col("_recent"), F.lit(False))).drop(
            "_recent"
        ),
    )
    return kept.select(*_FJ_COLS).orderBy("c_custkey", "o_orderkey")


def _topk_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders shaped for the top-k view rows: top purchases per
    account, totally ordered by (price desc, orderkey asc) so
    refresh-equals-recompute is hash-exact."""
    return t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "o_orderdate",
    )


def _topk(df: DataFrame, k: int = 3) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_custkey").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey").asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


@query(
    "topk_view_refresh",
    oracle="""
    SELECT c_custkey, o_orderkey, price_cents
    FROM (SELECT o_custkey AS c_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY FLOOR(o_totalprice * 100 + 0.5) DESC,
                            o_orderkey ASC) AS rn
          FROM orders) s
    WHERE rn <= 3
    ORDER BY c_custkey, o_orderkey
    """,
)
def topk_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-group TOP-K view (round 10,
    operators.relational.topk_view_refresh) — the rank twin of the
    mergeable-aggregate refresh (reference per-query top-k:
    sql/core/.../execution/basicOperators.scala TakeOrderedAndProject,
    here maintained per account): the "top-3 purchases per customer"
    view is materialized over pre-1997 orders, then 1997+ arrivals
    fold in WITHOUT re-reading the base — under inserts the new top-k
    is contained in state ∪ delta, so only the ~64% of accounts the
    delta touches re-rank over delta-sized candidate sets and the rest
    pass through an anti-join probe. The ORACLE recomputes ROW_NUMBER
    over the full table; the hash match is the refresh-equals-
    recompute audit (a stale horizon row kept, an eviction missed, or
    a tie broken differently all break it — the order is total by
    construction)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = _topk_base(spark, sf_dir)
    cut = F.lit("1997-01-01").cast("date")
    state = _topk(base.filter(F.col("o_orderdate") < cut).drop("o_orderdate"))
    delta = base.filter(F.col("o_orderdate") >= cut).drop("o_orderdate")
    mv = MaterializedView(
        "topk",
        keys=["c_custkey"],
        order_by=[F.col("price_cents").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    out = mv.refresh(state, delta=delta)
    return out.orderBy("c_custkey", "o_orderkey")


@query(
    "topk_view_retract",
    oracle="""
    SELECT c_custkey, o_orderkey, price_cents
    FROM (SELECT o_custkey AS c_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY FLOOR(o_totalprice * 100 + 0.5) DESC,
                            o_orderkey ASC) AS rn
          FROM orders WHERE o_orderkey % 11 <> 0) s
    WHERE rn <= 3
    ORDER BY c_custkey, o_orderkey
    """,
)
def topk_view_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION maintenance of the per-group TOP-K view (round 10,
    operators.relational.topk_view_retract) — the rank twin of
    retract_agg_state's surgical min/max repair: purging every 11th
    order dents some accounts' stored top-3, and the replacement rows
    live BELOW the stored horizon — outside the state — so exactly
    those broken groups re-rank from the post-delete base (semi-join-
    pruned; at 100 TB with key-clustered storage that prunes to the
    affected partitions), while groups whose deletions all ranked
    below the horizon pass through untouched. The ORACLE recomputes
    top-3 over the post-delete table; the hash match certifies both
    the value-level broken-group selection (conservative-correct
    under duplicate values) and the repair ranking."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = _topk_base(spark, sf_dir).drop("o_orderdate")
    dead = F.col("o_orderkey") % 11 == 0
    state = _topk(base)
    mv = MaterializedView(
        "topk",
        keys=["c_custkey"],
        order_by=[F.col("price_cents").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    out = mv.retract(
        state, deleted=base.filter(dead), base_remaining=base.filter(~dead)
    )
    return out.orderBy("c_custkey", "o_orderkey")


@query(
    "incremental_join_agg_refresh",
    oracle="""
    SELECT o.o_orderstatus, l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(MIN(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS min_cents,
           CAST(MAX(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS max_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus, l.l_returnflag
    ORDER BY o.o_orderstatus, l.l_returnflag
    """,
)
def incremental_join_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED view maintenance (round 10): an AGGREGATE OVER A JOIN
    — revenue stats per (order status, return flag) over
    orders ⋈ lineitem — maintained end-to-end from deltas alone,
    stacking the two IVM algebras: the join increment
    ΔM = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB) feeds mergeable_agg_state, which
    folds into the stored state via merge_agg_states — so a refresh
    cycle touches |Δ|·match-rate join rows and a keys-sized state,
    NEVER the base join (at 100 TB the interesting case: the join
    view itself may be too big to keep, but the agg-over-join state
    is thousands of rows — this composition maintains it without
    materializing ΔM beyond the shuffle). Composition is exactly why
    the state algebra demands integer measures and bag-exact deltas:
    any slack in either layer and the stacked hash breaks. The ORACLE
    recomputes the full join + GROUP BY from scratch; the hash match
    certifies the increment's multiplicities THROUGH the aggregation
    (a double-folded cross-delta term shifts n; a missed A_old ⋈ ΔB
    row shifts sum)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    b = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
        "l_shipdate",
    )
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a).drop("o_orderdate")
    delta_a = a.filter(F.col("o_orderdate") >= cut_a).drop("o_orderdate")
    b_old = b.filter(F.col("l_shipdate") < cut_b).drop("l_shipdate")
    delta_b = b.filter(F.col("l_shipdate") >= cut_b).drop("l_shipdate")
    keys = ["o_orderstatus", "l_returnflag"]
    jv = MaterializedView("inner", on=["o_orderkey"])
    av = MaterializedView("agg", keys=keys, value="price_cents")
    state = av.compute(jv.compute(a_old, b_old))
    delta_m = jv.increment(a_old, delta_a, b_old, delta_b)
    merged = av.refresh(state, delta=delta_m)
    return merged.select(
        *keys,
        "n",
        F.col("sum").alias("total_cents"),
        F.col("min").alias("min_cents"),
        F.col("max").alias("max_cents"),
    ).orderBy(*keys)


@query(
    "incremental_distinct_apply",
    oracle="""
    SELECT DISTINCT CAST(o_custkey % 100 AS BIGINT) AS cust_bucket,
           o_orderstatus
    FROM orders
    WHERE NOT (o_orderdate < DATE '1997-01-01' AND o_orderkey % 13 = 0)
    ORDER BY cust_bucket, o_orderstatus
    """,
)
def incremental_distinct_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained DISTINCT view (round 10,
    operators.relational.distinct_view_state / distinct_view_apply) —
    the third classic IVM shape: the distinct (customer bucket, order
    status) pairs are materialized as a count-annotated state over the
    historical partition, then ONE apply folds in a batch of arrivals
    (1997+ orders) AND a GDPR purge (every 13th historical order) —
    inserts and deletes in the same cycle, the CDC shape. Counts are a
    group under addition, so there is no repair path: one union +
    map-side-combined groupBy, cost ∝ |state| + |Δ|. The ORACLE
    recomputes SELECT DISTINCT from the post-change base; the hash
    match certifies the multiplicity bookkeeping (a value whose last
    copy died must leave; one surviving duplicate must keep its row;
    a same-batch delete+insert must net out)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    o = t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 100).cast("bigint").alias("cust_bucket"),
        "o_orderstatus",
        "o_orderdate",
        "o_orderkey",
    )
    cut = F.lit("1997-01-01").cast("date")
    old = o.filter(F.col("o_orderdate") < cut)
    cols = ["cust_bucket", "o_orderstatus"]
    mv = MaterializedView("distinct", cols=cols)
    state = mv.compute(old)
    new_state = mv.apply(
        state,
        inserts=o.filter(F.col("o_orderdate") >= cut),
        deletes=old.filter(F.col("o_orderkey") % 13 == 0),
    )
    return new_state.select(*cols).orderBy(*cols)


def _sj_sides(spark: SparkSession, sf_dir: str):
    """Shared shaping for the SEMI/ANTI IVM rows: 'orders with (vs
    without) at least one high-quantity lineitem' — 5,640 vs 9,360 of
    15,000 orders at sf0.01, so both views and both flip directions
    are real populations."""
    a = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    b = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"
    )
    return a, b


@query(
    "incremental_semi_join_refresh",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity >= 45)
    ORDER BY o_orderkey
    """,
)
def incremental_semi_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained LEFT SEMI join view (round 10,
    operators.relational.delta_semi_join_refresh) — with inner, left
    and full outer done, this and the anti twin complete the
    join-TYPE IVM matrix over §2.3 (reference
    sql/core/.../execution/joins/LeftSemiJoinHash.scala:30): the
    'orders with a high-quantity item' view is monotone under
    arrivals, so the refresh is pure append — arriving orders that
    match (ΔA ⋉ B_new) plus historical orders FLIPPED IN by an
    arriving item (A_old ▷ B_old ⋉ ΔB — 1,404 flips at sf0.01, each
    admitted exactly once however many new items match). The ORACLE
    recomputes EXISTS over the full tables; an already-matched order
    re-entering (the ▷ B_old guard) breaks the hash as a duplicate."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _sj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a).drop("o_orderdate")
    delta_a = a.filter(F.col("o_orderdate") >= cut_a).drop("o_orderdate")
    b_old = b.filter(F.col("l_shipdate") < cut_b).drop("l_shipdate")
    delta_b = b.filter(F.col("l_shipdate") >= cut_b).drop("l_shipdate")
    mv = MaterializedView("semi", on=["o_orderkey"])
    view = mv.compute(a_old, b_old)
    out = mv.refresh(
        view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    return out.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")


@query(
    "incremental_semi_join_retract",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE o_orderkey % 13 <> 0
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity >= 45
                    AND (l.l_orderkey + l.l_linenumber) % 3 <> 0)
    ORDER BY o_orderkey
    """,
)
def incremental_semi_join_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETION maintenance of the SEMI join view (round 10,
    operators.relational.delta_semi_join_retract): purging every 13th
    order removes its view row outright, and purging a third of the
    high-quantity items FLIPS OUT exactly the surviving orders whose
    matches ALL died (1,497 at sf0.01) — an order keeping one
    surviving item must stay. The ORACLE recomputes EXISTS over the
    post-delete sides; the exceptAll is state-sized (a semi view is
    at most |A|)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _sj_sides(spark, sf_dir)
    a = a.drop("o_orderdate")
    b = b.drop("l_shipdate")
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 3 == 0
    mv = MaterializedView("semi", on=["o_orderkey"])
    view = mv.compute(a, b)
    out = mv.retract(
        view,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~del_b),
        retract_b=b.filter(del_b),
    )
    return out.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")


@query(
    "incremental_anti_join_refresh",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45)
    ORDER BY o_orderkey
    """,
)
def incremental_anti_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained LEFT ANTI join view (round 10,
    operators.relational.delta_anti_join_refresh) — the NOT EXISTS
    dual: anti-monotone under B arrivals, so the refresh RETRACTS the
    orders an arriving item matches (the semi twin's 1,404 flip-ins
    are exactly this view's retractions — the two views partition the
    order table, and the two rows certify both sides of that identity
    against independent EXISTS / NOT EXISTS oracles) and appends only
    the arriving orders that match nothing. A stale flipped row kept,
    or a ΔA row probed against B_old instead of B_NEW (it must not
    enter if a same-cycle item covers it), breaks the hash."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _sj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a).drop("o_orderdate")
    delta_a = a.filter(F.col("o_orderdate") >= cut_a).drop("o_orderdate")
    b_old = b.filter(F.col("l_shipdate") < cut_b).drop("l_shipdate")
    delta_b = b.filter(F.col("l_shipdate") >= cut_b).drop("l_shipdate")
    mv = MaterializedView("anti", on=["o_orderkey"])
    view = mv.compute(a_old, b_old)
    out = mv.refresh(
        view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    return out.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")


@query(
    "incremental_anti_join_retract",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE o_orderkey % 13 <> 0
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45
                        AND (l.l_orderkey + l.l_linenumber) % 3 <> 0)
    ORDER BY o_orderkey
    """,
)
def incremental_anti_join_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETION maintenance of the ANTI join view (round 10,
    operators.relational.delta_anti_join_retract): deleted orders
    leave, and the semi twin's 1,497 flip-outs FLIP IN here —
    surviving orders whose high-quantity items all died join the
    'no such item' population, each exactly once however many of its
    items were purged (the semi(Δ⁻B keys) ∘ anti(b_new) composition
    admits one row per surviving copy, not per dead match). ORACLE:
    NOT EXISTS over the post-delete sides."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _sj_sides(spark, sf_dir)
    a = a.drop("o_orderdate")
    b = b.drop("l_shipdate")
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 3 == 0
    mv = MaterializedView("anti", on=["o_orderkey"])
    view = mv.compute(a, b)
    out = mv.retract(
        view,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~del_b),
        retract_b=b.filter(del_b),
    )
    return out.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")


@query(
    "view_api_lifecycle",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           l.qty, l.price_cents
    FROM (SELECT o_orderkey, o_orderstatus FROM orders
          WHERE o_orderkey % 13 <> 0) o
    LEFT JOIN (SELECT l_orderkey, l_linenumber,
                      CAST(l_quantity AS BIGINT) AS qty,
                      CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS price_cents
               FROM lineitem
               WHERE (l_orderkey + l_linenumber) % 11 <> 0) l
      ON o.o_orderkey = l.l_orderkey
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def view_api_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified MaterializedView API end-to-end (round 11,
    operators.views.MaterializedView — VERDICT r10 #1): one LEFT OUTER
    view driven through its WHOLE life cycle — ``compute`` over the
    historical partitions, ``refresh`` folding arrivals on BOTH sides
    (null-extension flips included), then ``retract`` applying a purge
    of every 13th order and every 11th lineitem (reverse flips: orders
    whose last match died re-emit null-extended). Each phase is the
    certified round-10 delta algebra, but CHAINED — the refresh output
    is the retract input — so the hash match certifies the phases
    compose (any slack in one phase breaks the next). The ORACLE
    recomputes the final LEFT JOIN of the post-everything sides from
    scratch: lifecycle == recompute, row for row."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    a, b = _lj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    a_old = a.filter(F.col("o_orderdate") < cut_a).drop("o_orderdate")
    delta_a = a.filter(F.col("o_orderdate") >= cut_a).drop("o_orderdate")
    a = a.drop("o_orderdate")
    b_old = b.filter(F.col("l_shipdate") < cut_b).drop("l_shipdate")
    delta_b = b.filter(F.col("l_shipdate") >= cut_b).drop("l_shipdate")
    b = b.drop("l_shipdate")
    mv = MaterializedView("left", on=["o_orderkey"])
    v0 = mv.compute(a_old, b_old)
    v1 = mv.refresh(
        v0, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
    )
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 11 == 0
    v2 = mv.retract(
        v1,
        a_new=a.filter(~del_a),
        retract_a=a.filter(del_a),
        b_new=b.filter(~del_b),
        retract_b=b.filter(del_b),
    )
    return v2.select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


def _wv_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders shaped for the running-window view rows: per-customer
    running spend, totally ordered by (orderdate, orderkey) so
    refresh-equals-recompute is hash-exact."""
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
    )


_WV_ORACLE_CORE = """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders
"""


@query(
    "incremental_window_refresh",
    oracle=_WV_ORACLE_CORE + "    ORDER BY o_custkey, o_orderkey",
)
def incremental_window_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained RUNNING-AGG WINDOW view (round 11,
    operators.relational.window_view_refresh via the MaterializedView
    API — VERDICT r10 stretch #8, the last view shape with no IVM
    story): each customer's running spend, materialized over two
    thirds of the orders (o_orderkey % 3 != 0), then the remaining
    third ARRIVES — and because the split is uncorrelated with the
    date order, arrivals INTERLEAVE: an arriving early-dated order
    must shift every later running value of its customer, the path a
    date-split delta would never exercise. Only touched customers
    re-window over their own state rows ∪ delta (the state is the
    row-level view, so no base rescan); untouched customers pass
    through a broadcast anti probe. The ORACLE recomputes SUM OVER
    from the full table — a stale running value anywhere breaks the
    hash."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = _wv_base(spark, sf_dir)
    old = base.filter(F.col("o_orderkey") % 3 != 0)
    delta = base.filter(F.col("o_orderkey") % 3 == 0)
    mv = MaterializedView(
        "window",
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value="price_cents",
        out_col="running_cents",
    )
    out = mv.refresh(mv.compute(old), delta=delta)
    return out.select("o_custkey", "o_orderkey", "running_cents").orderBy(
        "o_custkey", "o_orderkey"
    )


@query(
    "incremental_window_retract",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders WHERE o_orderkey % 7 <> 0
    ORDER BY o_custkey, o_orderkey
    """,
)
def incremental_window_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION maintenance of the running-window view (round 11,
    operators.relational.window_view_retract via the MaterializedView
    API): purging every 7th order shifts every LATER running value of
    the affected customers — touched customers re-window over their
    surviving state rows (state ⋉ Δ⁻keys exceptAll Δ⁻; NO base rescan,
    the storage-for-maintenance trade dual to retract_agg_state's
    repair scan), untouched ones pass through. The ORACLE recomputes
    SUM OVER from the post-delete table; a running value not re-shifted
    after its predecessor died breaks the hash."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = _wv_base(spark, sf_dir)
    dead = F.col("o_orderkey") % 7 == 0
    mv = MaterializedView(
        "window",
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value="price_cents",
        out_col="running_cents",
    )
    out = mv.retract(mv.compute(base), deleted=base.filter(dead))
    return out.select("o_custkey", "o_orderkey", "running_cents").orderBy(
        "o_custkey", "o_orderkey"
    )


@query(
    "incremental_window_delta",
    oracle="""
    SELECT o_custkey, o_orderkey, running_cents
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS running_cents
          FROM orders) s
    WHERE o_custkey IN (SELECT DISTINCT o_custkey FROM orders
                        WHERE o_orderkey % 3 = 0)
    ORDER BY o_custkey, o_orderkey
    """,
)
def incremental_window_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOYMENT shape of the running-window view (round 11,
    operators.relational.window_view_delta via MaterializedView.delta):
    the rows a refresh REWRITES — every touched customer's rows,
    re-windowed over state ∪ Δ — which a key-partitioned store
    overwrites instead of re-emitting the untouched mass (the measured
    reason: the state IS the base, so re-emission pays two base scans
    and only saves the shuffle — SCALING.md round-11's shuffled-bytes
    table). The ORACLE recomputes SUM OVER from the full table
    restricted to the touched keys (customers with any arriving
    order); the hash match certifies the touched-key selection AND the
    interleaved re-window in one shot."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = _wv_base(spark, sf_dir)
    old = base.filter(F.col("o_orderkey") % 3 != 0)
    delta = base.filter(F.col("o_orderkey") % 3 == 0)
    mv = MaterializedView(
        "window",
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value="price_cents",
        out_col="running_cents",
    )
    out = mv.delta(mv.compute(old), delta)
    return out.select("o_custkey", "o_orderkey", "running_cents").orderBy(
        "o_custkey", "o_orderkey"
    )


@query(
    "view_materialized_lifecycle",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders WHERE o_orderkey % 7 <> 0
    ORDER BY o_custkey, o_orderkey
    """,
)
def view_materialized_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view's STORAGE lifecycle end-to-end (round 12 — VERDICT r11
    #2: the touched-partition-overwrite deployment shape was
    documented but not executable as one call): a running-window view
    is MATERIALIZED into its key-bucketed layout
    (``MaterializedView.materialize``, hive-partitioned by
    ``kb = hash(key) % buckets``), then maintained ON DISK through two
    ``apply_delta`` arrival batches and one ``apply_retract`` purge
    (every 7th order) — each call partition-prunes its state scan to
    the touched buckets and rewrites exactly those partitions
    (``sources.writers.overwrite_partitions``). The returned view is
    READ BACK FROM THE STORE, so the hash certifies the whole storage
    path: the bucket function, the pruned-scan maintenance, the
    dynamic partition overwrite, and the emptied-bucket cleanup — a
    stale file, a bucket routed wrong, or an un-rewritten running
    value all flip it. The ORACLE recomputes SUM OVER from the
    post-purge table (identical text to `incremental_window_retract`'s
    — deliberately: store-mediated lifecycle == in-memory algebra ==
    recompute)."""
    import tempfile

    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    path = tempfile.mkdtemp(prefix="mv_store_") + "/view"
    base = _wv_base(spark, sf_dir)
    old = base.filter(F.col("o_orderkey") % 3 == 1)
    d1 = base.filter(F.col("o_orderkey") % 3 == 2)
    d2 = base.filter(F.col("o_orderkey") % 3 == 0)
    dead = base.filter(F.col("o_orderkey") % 7 == 0)
    mv = MaterializedView(
        "window",
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value="price_cents",
        out_col="running_cents",
    )
    mv.materialize(mv.compute(old), path, buckets=64)
    mv.apply_delta(spark, path, d1)
    mv.apply_delta(spark, path, d2)
    mv.apply_retract(spark, path, dead)
    return (
        mv.read_materialized(spark, path)
        .select("o_custkey", "o_orderkey", "running_cents")
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "view_sql_lifecycle",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderstatus,
           l.qty, l.price_cents
    FROM (SELECT o_orderkey, o_orderstatus FROM orders
          WHERE o_orderkey % 13 <> 0) o
    LEFT JOIN (SELECT l_orderkey, l_linenumber,
                      CAST(l_quantity AS BIGINT) AS qty,
                      CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS price_cents
               FROM lineitem
               WHERE (l_orderkey + l_linenumber) % 11 <> 0) l
      ON o.o_orderkey = l.l_orderkey
    ORDER BY o.o_orderkey, l.l_linenumber
    """,
)
def view_sql_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`view_api_lifecycle` RE-CERTIFIED THROUGH THE SQL FRONT DOOR
    (round 12 — VERDICT r11 #3: the reference's view surface is
    SQL-first, sql/hive/.../CreateViewAsSelect.scala): the same LEFT
    OUTER view driven by statements instead of Python — ``CREATE
    MATERIALIZED VIEW … AS SELECT * FROM a LEFT JOIN b USING (…)``
    (kind and keys INFERRED from the analyzed plan shape, not SQL
    text), ``REFRESH … USING Δa, Δb`` folding both sides' arrivals,
    ``ALTER … RETRACT USING Δ⁻a, Δ⁻b REMAINING a', b'`` applying the
    purge — and the result read back with plain ``spark.table``. Same
    oracle text as `view_api_lifecycle`, deliberately: SQL spelling ==
    Python API == recompute, row for row
    (operators.view_sql.SqlViewCatalog)."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    a, b = _lj_sides(spark, sf_dir)
    cut_a = F.lit("1997-01-01").cast("date")
    cut_b = F.lit("1996-01-01").cast("date")
    del_a = F.col("o_orderkey") % 13 == 0
    del_b = (F.col("o_orderkey") + F.col("l_linenumber")) % 11 == 0
    sides = {
        "sqlv12_a_old": a.filter(F.col("o_orderdate") < cut_a),
        "sqlv12_da": a.filter(F.col("o_orderdate") >= cut_a),
        "sqlv12_b_old": b.filter(F.col("l_shipdate") < cut_b),
        "sqlv12_db": b.filter(F.col("l_shipdate") >= cut_b),
        "sqlv12_ra": a.filter(del_a),
        "sqlv12_rb": b.filter(del_b),
        "sqlv12_anew": a.filter(~del_a),
        "sqlv12_bnew": b.filter(~del_b),
    }
    for n, df in sides.items():
        df.drop("o_orderdate", "l_shipdate").createOrReplaceTempView(n)
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv12_view AS"
        " SELECT * FROM sqlv12_a_old LEFT JOIN sqlv12_b_old"
        " USING (o_orderkey)"
    )
    cat.sql(
        "REFRESH MATERIALIZED VIEW sqlv12_view USING sqlv12_da, sqlv12_db"
    )
    cat.sql(
        "ALTER MATERIALIZED VIEW sqlv12_view RETRACT"
        " USING sqlv12_ra, sqlv12_rb REMAINING sqlv12_anew, sqlv12_bnew"
    )
    return spark.table("sqlv12_view").select(
        "o_orderkey", "l_linenumber", "o_orderstatus", "qty", "price_cents"
    ).orderBy("o_orderkey", "l_linenumber")


@query(
    "view_sql_window",
    oracle=_WV_ORACLE_CORE + "    ORDER BY o_custkey, o_orderkey",
)
def view_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RUNNING-WINDOW view through the SQL front door (round 12,
    operators.view_sql.SqlViewCatalog) — the deepest plan-shape
    inference: partition keys, the total order (direction + null
    placement), the summed measure and the output name are all read
    off the analyzed ``Window`` node, and the parser REFUSES SQL's
    default RANGE frame (it diverges from the maintained rows frame
    under order ties), so the required ``ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW`` spelling is part of the certified
    contract. Same maintenance as `incremental_window_refresh` (same
    oracle), driven by CREATE + REFRESH statements."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    base = _wv_base(spark, sf_dir)
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv12_wold"
    )
    base.filter(F.col("o_orderkey") % 3 == 0).createOrReplaceTempView(
        "sqlv12_wdelta"
    )
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv12_wview AS"
        " SELECT o_custkey, o_orderkey, o_orderdate, price_cents,"
        " SUM(price_cents) OVER (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS running_cents FROM sqlv12_wold"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv12_wview USING sqlv12_wdelta")
    return spark.table("sqlv12_wview").select(
        "o_custkey", "o_orderkey", "running_cents"
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "view_sql_stored",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cents
    FROM orders WHERE o_orderkey % 7 <> 0
    ORDER BY o_custkey, o_orderkey
    """,
)
def view_sql_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round's two headline surfaces COMPOSED (round 12): a
    SQL-defined view physically maintained on the key-bucketed store —
    ``CREATE MATERIALIZED VIEW … STORED AT 'path' BUCKETS 32 AS
    SELECT … SUM() OVER …`` materializes the inferred window view into
    its deployment layout; ``REFRESH … USING Δ`` and ``ALTER … RETRACT
    USING Δ⁻`` then run as TOUCHED-BUCKET partition overwrites on disk
    (`MaterializedView.apply_delta/apply_retract` under the parser),
    and ``spark.table(name)`` reads the maintained store. Same
    post-purge oracle as `view_materialized_lifecycle`, deliberately:
    SQL-driven store == Python-driven store == in-memory algebra ==
    recompute, row for row."""
    import tempfile

    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    path = tempfile.mkdtemp(prefix="mv_sqlstore_") + "/view"
    base = _wv_base(spark, sf_dir)
    base.filter(F.col("o_orderkey") % 3 == 1).createOrReplaceTempView(
        "sqlv12_sold"
    )
    base.filter(F.col("o_orderkey") % 3 != 1).createOrReplaceTempView(
        "sqlv12_sdelta"
    )
    base.filter(F.col("o_orderkey") % 7 == 0).createOrReplaceTempView(
        "sqlv12_sdead"
    )
    cat = SqlViewCatalog(spark)
    cat.sql(
        f"CREATE MATERIALIZED VIEW sqlv12_sview STORED AT '{path}'"
        " BUCKETS 32 AS"
        " SELECT o_custkey, o_orderkey, o_orderdate, price_cents,"
        " SUM(price_cents) OVER (PARTITION BY o_custkey"
        " ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS running_cents FROM sqlv12_sold"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv12_sview USING sqlv12_sdelta")
    cat.sql("ALTER MATERIALIZED VIEW sqlv12_sview RETRACT USING sqlv12_sdead")
    return spark.table("sqlv12_sview").select(
        "o_custkey", "o_orderkey", "running_cents"
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "view_sql_filtered",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS sum,
           MIN(price_cents) AS min, MAX(price_cents) AS max
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
          FROM orders)
    WHERE price_cents % 2 = 0 AND o_orderkey % 11 <> 0
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def view_sql_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED maintained view (round 13 — VERDICT r12 missing #1,
    the single most common view in existence): ``CREATE MATERIALIZED
    VIEW … AS SELECT … FROM t WHERE price_cents % 2 = 0 GROUP BY …`` —
    σ_p commutes with key-local maintenance, so the catalog records
    the predicate at CREATE (read structurally off the analyzed
    ``Filter`` node: deterministic, base-columns-only) and applies it
    to every REFRESH delta and RETRACT stream. Chain: CREATE over
    two-thirds of orders + REFRESH with the rest + RETRACT of the
    ``% 11`` rows — hash-equal to DuckDB recomputing the WHERE'd
    defining query over the post-purge base. Reference surface:
    CreateViewAsSelect.scala accepts arbitrary derived queries
    (recomputing); this maintains the common derivation incrementally
    (operators/view_sql.py)."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    base = _wv_base(spark, sf_dir).drop("o_orderdate")
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv13_fold"
    )
    base.filter(F.col("o_orderkey") % 3 == 0).createOrReplaceTempView(
        "sqlv13_fdelta"
    )
    dead = F.col("o_orderkey") % 11 == 0
    base.filter(dead).createOrReplaceTempView("sqlv13_fdead")
    base.filter(~dead).createOrReplaceTempView("sqlv13_frem")
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv13_fview AS"
        " SELECT o_custkey, COUNT(*) AS n, SUM(price_cents) AS sum,"
        " MIN(price_cents) AS min, MAX(price_cents) AS max"
        " FROM sqlv13_fold WHERE price_cents % 2 = 0 GROUP BY o_custkey"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv13_fview USING sqlv13_fdelta")
    cat.sql(
        "ALTER MATERIALIZED VIEW sqlv13_fview RETRACT USING sqlv13_fdead"
        " REMAINING sqlv13_frem"
    )
    return spark.table("sqlv13_fview").orderBy("o_custkey")


@query(
    "view_sql_attach",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS sum,
           MIN(price_cents) AS min, MAX(price_cents) AS max
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
          FROM orders)
    WHERE price_cents % 2 = 0
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def view_sql_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTART DURABILITY for stored views (round 13 — VERDICT r12
    missing #2): CREATE … STORED AT materializes a FILTERED agg view
    into its key-bucketed layout in one catalog; ``ATTACH MATERIALIZED
    VIEW … AT 'path'`` in a catalog over a FRESH session
    (``spark.newSession()`` — separate temp-view state, so nothing of
    the defining session survives) rebinds the store from its
    ``_MV_LAYOUT`` manifest — kind, keys, measure, AND the derivation
    predicate — with NO recomputation, and REFRESH there keeps
    maintaining the store by touched-bucket overwrite. Hash-equal to
    DuckDB recomputing the WHERE'd query over the merged base
    (operators/view_sql.py ``_attach``,
    operators/views.py ``from_materialized``)."""
    import tempfile

    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    path = tempfile.mkdtemp(prefix="mv_sqlattach_") + "/view"
    base = _wv_base(spark, sf_dir).drop("o_orderdate")
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv13_aold"
    )
    cat = SqlViewCatalog(spark)
    cat.sql(
        f"CREATE MATERIALIZED VIEW sqlv13_aview STORED AT '{path}'"
        " BUCKETS 32 AS"
        " SELECT o_custkey, COUNT(*) AS n, SUM(price_cents) AS sum,"
        " MIN(price_cents) AS min, MAX(price_cents) AS max"
        " FROM sqlv13_aold WHERE price_cents % 2 = 0 GROUP BY o_custkey"
    )
    fresh = spark.newSession()
    _wv_base(fresh, sf_dir).drop("o_orderdate").filter(
        F.col("o_orderkey") % 3 == 0
    ).createOrReplaceTempView("sqlv13_adelta")
    cat2 = SqlViewCatalog(fresh)
    cat2.sql(f"ATTACH MATERIALIZED VIEW sqlv13_aview AT '{path}'")
    cat2.sql("REFRESH MATERIALIZED VIEW sqlv13_aview USING sqlv13_adelta")
    # return through the ORIGINAL session so the driver's comparator
    # collects from the session it owns (the store is the same files)
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    mv = MaterializedView.from_materialized(spark, path)
    return mv.read_materialized(spark, path).orderBy("o_custkey")


@query(
    "view_sql_window_fns",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
           MAX(price_cents) OVER w AS running_max
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
          FROM orders)
    WHERE o_orderkey % 7 <> 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def view_sql_window_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING-WINDOW FUNCTION FAMILY (round 13): maintenance of the
    window view re-windows whole touched keys, so the aggregate is a
    PARAMETER of the rewrite — COUNT(*)/COUNT(v)/MIN/MAX/AVG maintain
    exactly like round 12's SUM (``relational.running_window_view
    fn=``). Two maintained views over the same base — a COUNT(*)
    running count and a MAX running max — each CREATE + REFRESH +
    RETRACT through the SQL catalog, then joined on the row key for
    one certified result against DuckDB recomputing both windows over
    the post-purge base."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    base = _wv_base(spark, sf_dir)
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv13_wfold"
    )
    base.filter(F.col("o_orderkey") % 3 == 0).createOrReplaceTempView(
        "sqlv13_wfdelta"
    )
    base.filter(F.col("o_orderkey") % 7 == 0).createOrReplaceTempView(
        "sqlv13_wfdead"
    )
    cat = SqlViewCatalog(spark)
    for nm, fn_sql in (("sqlv13_wfn", "COUNT(*)"),
                       ("sqlv13_wfm", "MAX(price_cents)")):
        cat.sql(
            f"CREATE MATERIALIZED VIEW {nm} AS"
            f" SELECT o_custkey, o_orderkey, o_orderdate, price_cents,"
            f" {fn_sql} OVER (PARTITION BY o_custkey"
            " ORDER BY o_orderdate, o_orderkey"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS r FROM sqlv13_wfold"
        )
        cat.sql(f"REFRESH MATERIALIZED VIEW {nm} USING sqlv13_wfdelta")
        cat.sql(f"ALTER MATERIALIZED VIEW {nm} RETRACT USING sqlv13_wfdead")
    n = spark.table("sqlv13_wfn").select(
        "o_custkey", "o_orderkey", F.col("r").alias("running_n")
    )
    m = spark.table("sqlv13_wfm").select(
        "o_orderkey", F.col("r").alias("running_max")
    )
    return n.join(m, "o_orderkey").select(
        "o_custkey", "o_orderkey", "running_n", "running_max"
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "view_sql_derived",
    oracle="""
    SELECT o_custkey, n, CAST(sum AS DOUBLE) / n AS avg_cents,
           max - min AS spread_cents
    FROM (SELECT o_custkey, COUNT(*) AS n,
                 CAST(SUM(price_cents) AS BIGINT) AS sum,
                 MIN(price_cents) AS min, MAX(price_cents) AS max
          FROM (SELECT o_custkey, o_orderkey,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS price_cents
                FROM orders)
          WHERE o_orderkey % 11 <> 0
          GROUP BY o_custkey)
    WHERE n > 1
    ORDER BY o_custkey
    """,
)
def view_sql_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DERIVED OUTPUT COLUMNS on a maintained view (round 13): ``AVG``
    and spread derive from the mergeable (n, sum, min, max) state at
    READ — the defining query spells the derivation as an outer SELECT
    over the state subquery, the catalog records the projection chain
    off the analyzed plan, the maintained state stays the full
    mergeable state (REFRESH/RETRACT run the ordinary keyed algebra),
    and the public read replays π (avg, spread) ∘ σ (n > 1). This is
    how every non-mergeable aggregate (avg, ratio, range) becomes a
    maintained view without lossy state. Chain: CREATE + REFRESH +
    RETRACT, hash-equal to DuckDB recomputing the derived query over
    the post-purge base (operators/view_sql.py ``_post_chain``)."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    base = _wv_base(spark, sf_dir).drop("o_orderdate")
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv13_dold"
    )
    base.filter(F.col("o_orderkey") % 3 == 0).createOrReplaceTempView(
        "sqlv13_ddelta"
    )
    dead = F.col("o_orderkey") % 11 == 0
    base.filter(dead).createOrReplaceTempView("sqlv13_ddead")
    base.filter(~dead).createOrReplaceTempView("sqlv13_drem")
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv13_dview AS"
        " SELECT o_custkey, n, CAST(sum AS DOUBLE) / n AS avg_cents,"
        " max - min AS spread_cents FROM"
        " (SELECT o_custkey, COUNT(*) AS n, SUM(price_cents) AS sum,"
        " MIN(price_cents) AS min, MAX(price_cents) AS max"
        " FROM sqlv13_dold GROUP BY o_custkey)"
        " WHERE n > 1"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv13_dview USING sqlv13_ddelta")
    cat.sql(
        "ALTER MATERIALIZED VIEW sqlv13_dview RETRACT USING sqlv13_ddead"
        " REMAINING sqlv13_drem"
    )
    return spark.table("sqlv13_dview").orderBy("o_custkey")


@query(
    "view_sql_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS sum,
           MIN(price_cents) AS min, MAX(price_cents) AS max
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents
          FROM orders)
    WHERE price_cents % 2 = 0 AND o_orderkey % 11 <> 0
    GROUP BY o_custkey
    HAVING COUNT(*) > 1
    ORDER BY o_custkey
    """,
)
def view_sql_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING on a maintained view (round 13): a filter over the
    view's OWN OUTPUT commutes with nothing and needs to — the
    maintained state stays UNFILTERED (every REFRESH/RETRACT runs the
    ordinary keyed algebra) and the public projection applies σ_h at
    read, which is exactly where HAVING sits in the defining query's
    plan. The chain deliberately RETRACTS groups back UNDER the bound:
    the read filter must re-hide them, which recompute-from-scratch
    gets right only if the state under the filter is exact. Same base
    slices as `view_sql_filtered` plus ``HAVING COUNT(*) > 1`` — hash
    -equal to DuckDB recomputing the HAVING'd query over the
    post-purge base (operators/view_sql.py ``_split_post``)."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    base = _wv_base(spark, sf_dir).drop("o_orderdate")
    base.filter(F.col("o_orderkey") % 3 != 0).createOrReplaceTempView(
        "sqlv13_hold"
    )
    base.filter(F.col("o_orderkey") % 3 == 0).createOrReplaceTempView(
        "sqlv13_hdelta"
    )
    dead = F.col("o_orderkey") % 11 == 0
    base.filter(dead).createOrReplaceTempView("sqlv13_hdead")
    base.filter(~dead).createOrReplaceTempView("sqlv13_hrem")
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv13_hview AS"
        " SELECT o_custkey, COUNT(*) AS n, SUM(price_cents) AS sum,"
        " MIN(price_cents) AS min, MAX(price_cents) AS max"
        " FROM sqlv13_hold WHERE price_cents % 2 = 0 GROUP BY o_custkey"
        " HAVING COUNT(*) > 1"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv13_hview USING sqlv13_hdelta")
    cat.sql(
        "ALTER MATERIALIZED VIEW sqlv13_hview RETRACT USING sqlv13_hdead"
        " REMAINING sqlv13_hrem"
    )
    return spark.table("sqlv13_hview").orderBy("o_custkey")


@query(
    "view_sql_exprkey",
    oracle="""
    SELECT date_trunc('day', ts) AS d, event_type, COUNT(*) AS n,
           CAST(SUM(value_cents) AS BIGINT) AS sum,
           MIN(value_cents) AS min, MAX(value_cents) AS max
    FROM (SELECT ts, user_id, event_type,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
          FROM events)
    WHERE event_type <> 'view' AND NOT (user_id % 13 = 0)
    GROUP BY d, event_type
    ORDER BY d, event_type
    """,
)
def view_sql_exprkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPRESSION-KEY maintained view (round 13): ``GROUP BY
    date_trunc('day', ts)`` — the time-bucketed rollup every event
    pipeline keeps — over a derived integer measure (``value_cents``
    computed in a subquery) and a WHERE. Deterministic scalar key
    expressions commute with key-local maintenance exactly like σ_p:
    CREATE records the ordered derivation STAGES (the cents
    projection, the filter, the date_trunc key) off the analyzed plan
    objects and replays them over every REFRESH delta and RETRACT
    stream, so the maintained state is keyed by the COMPUTED day
    column. Chain: CREATE over two-thirds of events + REFRESH with
    the rest + RETRACT of the ``user_id % 13`` rows — hash-equal to
    DuckDB recomputing the derived rollup over the post-purge base.
    Reference surface: CreateViewAsSelect.scala accepts arbitrary
    derived queries (recomputing); this maintains the rollup
    incrementally (operators/view_sql.py ``_base_of``/``_create_agg``)."""
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    e = t(spark, sf_dir, "events").select("event_id", "ts", "user_id",
                                          "event_type", "value")
    e.filter(F.col("event_id") % 3 != 0).createOrReplaceTempView("sqlv13_eold")
    e.filter(F.col("event_id") % 3 == 0).createOrReplaceTempView("sqlv13_edelta")
    dead = F.col("user_id") % 13 == 0
    e.filter(dead).createOrReplaceTempView("sqlv13_edead")
    e.filter(~dead).createOrReplaceTempView("sqlv13_erem")
    cat = SqlViewCatalog(spark)
    cat.sql(
        "CREATE MATERIALIZED VIEW sqlv13_eview AS"
        " SELECT date_trunc('day', ts) AS d, event_type, COUNT(*) AS n,"
        " SUM(value_cents) AS sum, MIN(value_cents) AS min,"
        " MAX(value_cents) AS max"
        " FROM (SELECT ts, user_id, event_type,"
        "       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents"
        "       FROM sqlv13_eold)"
        " WHERE event_type <> 'view'"
        " GROUP BY date_trunc('day', ts), event_type"
    )
    cat.sql("REFRESH MATERIALIZED VIEW sqlv13_eview USING sqlv13_edelta")
    cat.sql(
        "ALTER MATERIALIZED VIEW sqlv13_eview RETRACT USING sqlv13_edead"
        " REMAINING sqlv13_erem"
    )
    return spark.table("sqlv13_eview").orderBy("d", "event_type")


@query(
    "view_join_materialized",
    oracle="""
    SELECT l.o_orderkey, l.lid, l.qty, o.o_orderstatus
    FROM (SELECT l_orderkey AS o_orderkey,
                 l_orderkey * 8 + l_linenumber AS lid,
                 CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
          WHERE (l_orderkey + l_linenumber) % 11 <> 0) l
    JOIN (SELECT o_orderkey, o_orderstatus FROM orders
          WHERE o_orderkey % 13 <> 0) o
      USING (o_orderkey)
    ORDER BY l.o_orderkey, l.lid
    """,
)
def view_join_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-VIEW DISK DEPLOYMENT (round 13 — VERDICT r12 missing #3):
    an inner join view is KEY-LOCAL on its join key, so the bucketed
    store discipline carries over — ``materialize`` lays the view out
    by ``hash(o_orderkey) % 64``, two ``apply_join_delta`` calls fold
    both sides' arrivals as touched-bucket overwrites (the algebra's
    increments only ever land on delta keys), and the KEYED retract
    (``a_id``/``b_id`` row ids — the cheap deployment shape, two anti
    probes) runs on disk through ``apply_join_retract``. The result is
    read BACK FROM THE STORE and hash-matched against DuckDB
    recomputing the join over the post-purge sides
    (operators/views.py apply_join_delta/apply_join_retract)."""
    import tempfile

    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    path = tempfile.mkdtemp(prefix="mv_join_store_") + "/view"
    a = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lid"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_shipdate",
    )
    b = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    cut1, cut2 = (
        F.lit("1995-06-01").cast("date"),
        F.lit("1997-01-01").cast("date"),
    )
    a_old = a.filter(F.col("l_shipdate") < cut1).drop("l_shipdate")
    da1 = a.filter(
        (F.col("l_shipdate") >= cut1) & (F.col("l_shipdate") < cut2)
    ).drop("l_shipdate")
    da2 = a.filter(F.col("l_shipdate") >= cut2).drop("l_shipdate")
    b_old = b.filter(F.col("o_orderdate") < cut1).drop("o_orderdate")
    db1 = b.filter(
        (F.col("o_orderdate") >= cut1) & (F.col("o_orderdate") < cut2)
    ).drop("o_orderdate")
    db2 = b.filter(F.col("o_orderdate") >= cut2).drop("o_orderdate")
    mv = MaterializedView(
        "inner", on=["o_orderkey"], a_id="lid", b_id="o_orderkey"
    )
    mv.materialize(mv.compute(a_old, b_old), path, buckets=64)
    mv.apply_join_delta(spark, path, a_old, da1, b_old, db1)
    mv.apply_join_delta(
        spark, path, a_old.unionByName(da1), da2, b_old.unionByName(db1), db2
    )
    dead_a = a.drop("l_shipdate").filter(
        (F.col("o_orderkey") + F.col("lid") % 8) % 11 == 0
    )
    dead_b = b.drop("o_orderdate").filter(F.col("o_orderkey") % 13 == 0)
    mv.apply_join_retract(spark, path, retract_a=dead_a, retract_b=dead_b)
    return (
        mv.read_materialized(spark, path)
        .select("o_orderkey", "lid", "qty", "o_orderstatus")
        .orderBy("o_orderkey", "lid")
    )
