"""Scalar function library coverage (SURVEY §2.8; reference registry
CAT/analysis/FunctionRegistry.scala:118-286).

Grouped into themed queries — string, regex/JSON, date/time, math,
conditional, complex-type, hash — each oracle-checked against DuckDB
with explicit casts where return types differ by engine (year() is INT
in Spark, BIGINT in DuckDB, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries.registry import query, t


@query(
    "fn_string_basic",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                                   AS lo,
           upper(c_mktsegment)                             AS up,
           CAST(length(c_name) AS BIGINT)                  AS len,
           substr(c_name, 1, 8)                            AS pre,
           concat(c_name, ':', c_mktsegment)               AS joined,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS ws,
           reverse(c_mktsegment)                           AS rev,
           replace(c_name, 'Customer', 'Cust')             AS repl,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0')      AS pad,
           rpad(c_mktsegment, 12, '.')                     AS rpadded,
           trim(concat('  ', c_mktsegment, '  '))          AS trimmed,
           repeat(substr(c_mktsegment, 1, 1), 3)           AS rep,
           CAST(strpos(c_name, '0') AS BIGINT)             AS first_zero,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                                                           AS cap,
           CAST(ascii(c_mktsegment) AS BIGINT)             AS asc_code,
           translate(c_mktsegment, 'AEIOU', 'aeiou')       AS transl
    FROM customer
    WHERE c_custkey % 10 = 0
    ORDER BY c_custkey
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function library (reference stringExpressions.scala)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.length("c_name").cast("bigint").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.concat("c_name", F.lit(":"), "c_mktsegment").alias("joined"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "ws"
        ),
        F.reverse("c_mktsegment").alias("rev"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("pad"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.trim(F.concat(F.lit("  "), "c_mktsegment", F.lit("  "))).alias("trimmed"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("rep"),
        F.instr("c_name", "0").cast("bigint").alias("first_zero"),
        F.initcap(F.lower("c_mktsegment")).alias("cap"),
        F.ascii("c_mktsegment").cast("bigint").alias("asc_code"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("transl"),
    ).orderBy("c_custkey")


@query(
    "fn_regex_split",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1)             AS noun,
           regexp_replace(p_name, '[aeiou]', '_', 'g')        AS devoweled,
           regexp_matches(p_name, '^(red|blue)')              AS is_primary,
           string_split(p_name, ' ')[1]                       AS first_word,
           CAST(len(string_split(p_name, ' ')) AS BIGINT)     AS n_words,
           levenshtein(p_brand, 'Brand#10')                   AS lev
    FROM part
    WHERE p_partkey % 5 = 0
    ORDER BY p_partkey
    """,
)
def fn_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + split functions (reference regexpExpressions.scala:68,119)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("noun"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^(red|blue)").alias("is_primary"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.levenshtein("p_brand", F.lit("Brand#10")).alias("lev"),
    ).orderBy("p_partkey")


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)        AS yr,
           CAST(month(o_orderdate) AS BIGINT)       AS mo,
           CAST(day(o_orderdate) AS BIGINT)         AS dom,
           CAST(dayofyear(o_orderdate) AS BIGINT)   AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(quarter(o_orderdate) AS BIGINT)     AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT)  AS woy,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)        AS od,
           date_trunc('month', o_orderdate)                    AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)   AS plus30,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
                                                    AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)       AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d')        AS formatted
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function library (reference datetimeExpressions.scala;
    registry :244-271)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("bigint").alias("yr"),
        F.month(od).cast("bigint").alias("mo"),
        F.dayofmonth(od).cast("bigint").alias("dom"),
        F.dayofyear(od).cast("bigint").alias("doy"),
        F.dayofweek(od).cast("bigint").alias("dow"),
        F.quarter(od).cast("bigint").alias("qtr"),
        F.weekofyear(od).cast("bigint").alias("woy"),
        od.cast("date").cast("timestamp").alias("od"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(od.cast("date"), 30).cast("timestamp").alias("plus30"),
        F.add_months(od.cast("date"), 3).cast("timestamp").alias("plus3mo"),
        F.last_day(od.cast("date")).cast("timestamp").alias("eom"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        F.unix_timestamp(od).cast("bigint").alias("epoch_s"),
        F.date_format(od, "yyyy-MM-dd").alias("formatted"),
    ).orderBy("o_orderkey")


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 1000), 2)                    AS ab,
           CAST(ceil(l_extendedprice / 100) AS BIGINT)              AS ce,
           CAST(floor(l_extendedprice / 100) AS BIGINT)             AS fl,
           ROUND(sqrt(l_quantity), 6)                               AS sq,
           ROUND(exp(l_discount), 6)                                AS ex,
           ROUND(ln(l_extendedprice), 6)                            AS lg,
           ROUND(log10(l_extendedprice), 6)                         AS l10,
           ROUND(log2(l_quantity), 6)                               AS l2,
           ROUND(pow(l_quantity, 2), 2)                             AS p2,
           CAST(l_orderkey % 7 AS BIGINT)                           AS md,
           CAST(((l_orderkey - 20) % 7 + 7) % 7 AS BIGINT)          AS pmd,
           CAST(sign(l_discount - 0.05) AS DOUBLE)                  AS sg,
           ROUND(degrees(l_discount), 6)                            AS dg,
           ROUND(radians(l_quantity), 6)                            AS rd,
           ROUND(atan2(l_quantity, l_extendedprice), 6)             AS at2,
           ROUND(cbrt(l_quantity), 6)                               AS cb,
           ROUND(sin(l_discount) + cos(l_discount) + tan(l_discount), 6) AS trig,
           CAST(l_quantity AS BIGINT) << 2                          AS shl,
           xor(CAST(l_orderkey AS BIGINT), 255)                     AS bxor,
           CAST(l_orderkey AS BIGINT) & 15                          AS band,
           CAST(l_orderkey AS BIGINT) | 16                          AS bor
    FROM lineitem
    WHERE l_orderkey % 500 = 0 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + bitwise function library (reference mathExpressions.scala,
    bitwiseExpressions.scala, arithmetic.scala)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 500 == 0) & (F.col("l_linenumber") == 1)
    )
    q = F.col("l_quantity")
    ep = F.col("l_extendedprice")
    ok = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(ep - 1000), 2).alias("ab"),
        F.ceil(ep / 100).cast("bigint").alias("ce"),
        F.floor(ep / 100).cast("bigint").alias("fl"),
        F.round(F.sqrt(q), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log(ep), 6).alias("lg"),
        F.round(F.log10(ep), 6).alias("l10"),
        F.round(F.log2(q), 6).alias("l2"),
        F.round(F.pow(q, 2), 2).alias("p2"),
        (ok % 7).cast("bigint").alias("md"),
        F.pmod(ok - 20, F.lit(7)).cast("bigint").alias("pmd"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sg"),
        F.round(F.degrees("l_discount"), 6).alias("dg"),
        F.round(F.radians(q), 6).alias("rd"),
        F.round(F.atan2(q, ep), 6).alias("at2"),
        F.round(F.cbrt(q), 6).alias("cb"),
        F.round(F.sin("l_discount") + F.cos("l_discount") + F.tan("l_discount"), 6)
        .alias("trig"),
        F.shiftleft(q.cast("bigint"), 2).alias("shl"),
        ok.cast("bigint").bitwiseXOR(F.lit(255)).alias("bxor"),
        ok.cast("bigint").bitwiseAND(F.lit(15)).alias("band"),
        ok.cast("bigint").bitwiseOR(F.lit(16)).alias("bor"),
    ).orderBy("l_orderkey")


@query(
    "fn_conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 4000 THEN 'high'
                WHEN o_totalprice > 2000 THEN 'mid'
                ELSE 'low' END                                  AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'final'
                              ELSE 'other' END                  AS status_word,
           greatest(o_totalprice, 1500.0)                       AS hi,
           least(o_totalprice, 1500.0)                          AS lo,
           (o_totalprice IS NOT DISTINCT FROM 1500.0)           AS null_safe_eq,
           isnan(CAST('nan' AS DOUBLE) * o_totalprice)          AS nan_check
    FROM orders
    WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)
def fn_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / if / greatest / least / null-safe equality / NaN
    (reference conditionalExpressions.scala, predicates.scala:384)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 4000, "high").when(tp > 2000, "mid").otherwise("low").alias(
            "price_band"
        ),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "final")
        .otherwise("other")
        .alias("status_word"),
        F.greatest(tp, F.lit(1500.0)).alias("hi"),
        F.least(tp, F.lit(1500.0)).alias("lo"),
        tp.eqNullSafe(F.lit(1500.0)).alias("null_safe_eq"),
        F.isnan(F.lit(float("nan")) * tp).alias("nan_check"),
    ).orderBy("o_orderkey")


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT)   AS k_int,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id % 20 = 0
    ORDER BY event_id
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction: get_json_object / from_json (reference
    jsonExpressions.scala:460; from_json is the modern typed upgrade)."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_mod"),
    ).orderBy("event_id")


@query(
    "fn_complex_types",
    oracle="""
    SELECT n_nationkey,
           toks[1]                                    AS head,
           toks[len(toks)]                            AS tail,
           CAST(len(toks) AS BIGINT)                  AS n_toks,
           list_contains(toks, 'UNITED')              AS has_united,
           array_to_string(list_sort(toks), ',')      AS sorted_toks,
           array_to_string(list_sort(toks), '_')      AS joined,
           to_json({'key': n_nationkey, 'region': n_regionkey}) AS info_struct,
           CAST(n_nationkey + n_regionkey AS BIGINT)  AS struct_sum
    FROM (SELECT n_nationkey, n_regionkey, string_split(n_name, ' ') AS toks
          FROM nation)
    ORDER BY n_nationkey
    """,
)
def fn_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/struct creation + extraction (reference
    complexTypeCreator.scala, complexTypeExtractors.scala,
    collectionOperations.scala).

    Registry convention: array/struct values are exercised internally but
    serialized to strings (array_join / to_json) in the OUTPUT so the
    driver's canonicalizer can sort+hash every cell."""
    n = t(spark, sf_dir, "nation").withColumn("toks", F.split("n_name", " "))
    info = F.struct(
        F.col("n_nationkey").alias("key"), F.col("n_regionkey").alias("region")
    )
    return n.select(
        "n_nationkey",
        F.col("toks").getItem(0).alias("head"),
        F.element_at("toks", -1).alias("tail"),
        F.size("toks").cast("bigint").alias("n_toks"),
        F.array_contains("toks", "UNITED").alias("has_united"),
        F.array_join(F.sort_array("toks"), ",").alias("sorted_toks"),
        F.array_join(F.sort_array("toks"), "_").alias("joined"),
        F.to_json(info).alias("info_struct"),
        (info.getField("key") + info.getField("region"))
        .cast("bigint")
        .alias("struct_sum"),
    ).orderBy("n_nationkey")


@query(
    "fn_higher_order_array",
    oracle="""
    SELECT doc_id,
           CAST(len(words) AS BIGINT)                                  AS n_words,
           CAST(len(list_filter(words, w -> length(w) > 4)) AS BIGINT) AS n_long,
           coalesce(array_to_string(list_transform(list_sort(list_distinct(
               list_filter(words, w -> length(w) > 4))), w -> upper(w)), ','), '') AS long_upper,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_chars
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 30)
    ORDER BY doc_id
    """,
)
def fn_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform/filter/aggregate (modern
    replacements for the reference's UDTF/explode round-trips; SURVEY
    §2.8 'modern bonus')."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .withColumn("words", F.split("text", " "))
    )
    long_words = F.filter("words", lambda w: F.length(w) > 4)
    return d.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size(long_words).cast("bigint").alias("n_long"),
        F.array_join(
            F.transform(
                F.sort_array(F.array_distinct(long_words)), lambda w: F.upper(w)
            ),
            ",",
        ).alias("long_upper"),
        F.aggregate(
            F.transform("words", lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    ).orderBy("doc_id")


@query(
    "fn_hash_digest",
    oracle="""
    SELECT c_custkey,
           md5(c_name)          AS name_md5,
           sha256(c_name)       AS name_sha256
    FROM customer
    WHERE c_custkey % 25 = 0
    ORDER BY c_custkey
    """,
)
def fn_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (reference misc.scala: md5/sha1/sha2/crc32)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    ).orderBy("c_custkey")


@query("fn_partition_introspection")  # engine-specific values → rows-only
def fn_partition_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark_partition_id / input_file_name /
    monotonically_increasing_id (reference misc registry :279-286) —
    values are engine-internal, so no oracle."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.spark_partition_id().alias("pid"),
            F.input_file_name().alias("fname"),
            F.monotonically_increasing_id().alias("mid"),
            F.xxhash64("l_orderkey", "l_linenumber").alias("xx64"),
            F.hash("l_orderkey", "l_linenumber").alias("h32"),
            F.crc32(F.col("l_returnflag").cast("binary")).alias("crc"),
        )
        .groupBy("pid")
        .agg(
            F.count("*").alias("rows_in_partition"),
            F.countDistinct("fname").alias("n_files"),
            F.countDistinct("mid").alias("n_ids"),
            F.countDistinct("xx64").alias("n_xx"),
            F.countDistinct("h32").alias("n_h32"),
            F.countDistinct("crc").alias("n_crc"),
        )
    )


@query(
    "fn_cast_matrix",
    oracle="""
    SELECT l_orderkey,
           CAST(trunc(l_quantity) AS INTEGER)            AS qty_int,
           CAST(l_orderkey AS VARCHAR)                   AS okey_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)     AS ship_date_str,
           CAST(l_linenumber AS DOUBLE)                  AS line_dbl,
           CAST(l_linenumber AS BIGINT)                  AS line_big,
           CAST(CAST(l_discount AS DECIMAL(10,3)) AS VARCHAR) AS disc_dec_str
    FROM lineitem
    WHERE l_orderkey % 97 = 0 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
)
def fn_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast type-pair matrix (reference CAT/expressions/Cast.scala, 940
    LoC — SURVEY §2.2): double→int (truncating — the oracle spells
    trunc() since DuckDB's bare cast rounds), long→string, timestamp→
    date→string, int→double/bigint, double→decimal→string."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_orderkey") % 97 == 0) & (F.col("l_linenumber") == 1))
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.col("l_orderkey").cast("string").alias("okey_str"),
            F.col("l_shipdate").cast("date").cast("string").alias("ship_date_str"),
            F.col("l_linenumber").cast("double").alias("line_dbl"),
            F.col("l_linenumber").cast("bigint").alias("line_big"),
            F.col("l_discount").cast("decimal(10,3)").cast("string").alias("disc_dec_str"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "fn_string_advanced",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, 'red widget') AS BIGINT)      AS lev,
           string_split(p_name, ' ')[1]                           AS first_word,
           CAST(coalesce(list_position(string_split('Brand#1,Brand#2,Brand#3', ','),
                                       p_brand), 0) AS BIGINT)    AS brand_pos,
           upper(to_hex(p_partkey))                               AS key_hex,
           bin(p_partkey)                                         AS key_bin,
           printf('%s/%d', p_brand, p_size)                       AS label
    FROM part
    WHERE p_partkey % 7 = 0
    ORDER BY p_partkey
    """,
)
def fn_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining §2.8 string registry rows: levenshtein,
    substring_index, find_in_set, hex, bin, format_string (reference
    stringExpressions.scala / mathExpressions.scala). soundex and
    format_number have no DuckDB equivalent — covered in pytest."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", F.lit("red widget")).cast("bigint").alias("lev"),
        F.substring_index("p_name", " ", 1).alias("first_word"),
        F.find_in_set("p_brand", F.lit("Brand#1,Brand#2,Brand#3"))
        .cast("bigint")
        .alias("brand_pos"),
        F.hex("p_partkey").alias("key_hex"),
        F.bin("p_partkey").alias("key_bin"),
        F.format_string("%s/%d", "p_brand", "p_size").alias("label"),
    ).orderBy("p_partkey")


@query(
    "fn_map_type",
    oracle="""
    SELECT n_nationkey,
           CAST(2 AS BIGINT)                              AS m_size,
           'nk,rk'                                        AS keys_joined,
           CAST(n_nationkey AS BIGINT)                    AS nk_val,
           CAST(n_regionkey AS BIGINT)                    AS rk_val,
           CAST(n_nationkey + n_regionkey AS BIGINT)      AS val_sum
    FROM nation
    ORDER BY n_nationkey
    """,
)
def fn_map_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType create/access (reference complexTypeCreator.scala:
    CreateMap; complexTypeExtractors.scala m[k]; SURVEY §1.2). The
    oracle computes the same values directly — DuckDB MAP output
    serialization differs, so the map stays engine-internal and the
    query emits scalar extractions."""
    n = t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("nk"), F.col("n_nationkey").cast("bigint"),
        F.lit("rk"), F.col("n_regionkey").cast("bigint"),
    )
    return n.select(
        "n_nationkey",
        F.size(m).cast("bigint").alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, F.lit("nk")).alias("nk_val"),
        F.element_at(m, F.lit("rk")).alias("rk_val"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("val_sum"),
    ).orderBy("n_nationkey")


@query(
    "fn_datetime_advanced",
    oracle="""
    SELECT o_orderkey,
           CAST(datediff('month', DATE '1995-01-01',
                         date_trunc('month', o_orderdate)) AS DOUBLE) AS months_since,
           CAST(CAST(o_orderdate AS DATE)
                + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                            ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER)
                AS VARCHAR)                                          AS next_monday,
           CAST(date_trunc('year', o_orderdate) AS DATE)             AS year_start,
           CAST(CAST(o_orderdate AS DATE) - 15 AS VARCHAR)           AS minus15,
           strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S')                             AS from_unix
    FROM orders
    WHERE o_orderkey % 150 = 0
    ORDER BY o_orderkey
    """,
)
def fn_datetime_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining §2.8 datetime rows: months_between, next_day, trunc,
    date_sub, from_unixtime (reference datetimeExpressions.scala
    registry :244-271). Oracle emulates next_day via isodow arithmetic
    and from_unixtime via make_timestamp (both engines pinned to UTC)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 150 == 0)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.months_between(
            F.date_trunc("month", od), F.lit("1995-01-01").cast("timestamp")
        ).alias("months_since"),
        F.next_day(od.cast("date"), "Mon").cast("string").alias("next_monday"),
        F.trunc(od.cast("date"), "year").alias("year_start"),
        F.date_sub(od.cast("date"), 15).cast("string").alias("minus15"),
        F.from_unixtime(F.unix_timestamp(od)).alias("from_unix"),
    ).orderBy("o_orderkey")


@query(
    "fn_array_setops",
    oracle="""
    WITH base AS (
      SELECT n_nationkey,
             [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT),
              CAST(7 AS BIGINT)] AS a,
             [CAST(7 AS BIGINT), CAST(1 AS BIGINT)] AS b
      FROM nation
    )
    SELECT n_nationkey,
           -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join is ''
           coalesce(array_to_string(
               list_sort(list_distinct(list_concat(a, b))), ','), '')    AS union_ab,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(a, x -> list_contains(b, x)))), ','), '')     AS inter_ab,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_ab,
           coalesce(array_to_string(list_concat(a, b)[2:4], ','), '')    AS sl,
           CAST(coalesce(list_position(a, 7), 0) AS BIGINT)              AS pos7,
           coalesce(array_to_string(list_filter(a, x -> x != 7), ','), '') AS removed,
           coalesce(array_to_string([a[1] + 10, a[2] + 20], ','), '')    AS zipped,
           CAST(greatest(a[1], a[2], 7) AS BIGINT)                       AS mx
    FROM base
    ORDER BY n_nationkey
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations + slicing/zip (reference
    collectionOperations.scala + the modern §2.8 bonus family):
    array_union/intersect/except (distinct semantics — both sides
    sorted so order conventions can't differ), slice, flatten,
    array_position, array_remove, zip_with, array_max."""
    n = t(spark, sf_dir, "nation")
    a = F.transform(
        F.array("n_nationkey", "n_regionkey", F.lit(7)), lambda x: x.cast("bigint")
    )
    b = F.array(F.lit(7).cast("bigint"), F.lit(1).cast("bigint"))
    flat = F.flatten(F.array(a, b))

    def joined(arr, alias):  # serialize array output → driver-hashable
        return F.array_join(arr.cast("array<string>"), ",").alias(alias)

    return n.select(
        "n_nationkey",
        joined(F.array_sort(F.array_union(a, b)), "union_ab"),
        joined(F.array_sort(F.array_intersect(a, b)), "inter_ab"),
        joined(F.array_sort(F.array_except(a, b)), "except_ab"),
        joined(F.slice(flat, 2, 3), "sl"),
        F.array_position(a, 7).cast("bigint").alias("pos7"),
        joined(F.array_remove(a, 7), "removed"),
        joined(
            F.zip_with(
                F.slice(a, 1, 2),
                F.array(F.lit(10).cast("bigint"), F.lit(20).cast("bigint")),
                lambda x, y: x + y,
            ),
            "zipped",
        ),
        F.array_max(a).cast("bigint").alias("mx"),
    ).orderBy("n_nationkey")


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
           upper(json_extract_string(props, '$.k')) IS NOT NULL AS has_k
    FROM events
    WHERE event_id % 20 = 0
    ORDER BY event_id
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json into an
    open-schema variant column, typed path extraction via variant_get —
    the modern engine surface for JSON columns (shredded storage at
    scale; beats per-row get_json_object string re-parsing). DuckDB
    oracles the same paths through its JSON type."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_int"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.k", "string").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@query(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(CASE WHEN l_quantity = 25 THEN NULL
                      ELSE l_extendedprice / (l_quantity - 25) END
                 * 1e4 + 0.5) / 1e4 AS safe_div,
           TRY_CAST(l_returnflag AS INT) AS flag_int,
           CAST(l_linenumber AS INT) AS line_int,
           CASE WHEN l_orderkey = 0 THEN 9223372036854775807
                ELSE CAST(NULL AS BIGINT) END AS over_add,
           l_linestatus AS elem2,
           CAST(NULL AS VARCHAR) AS elem5
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* surface (Spark 3.3+/4): try_divide (null on /0
    instead of error/Inf-adjacent behavior), try_cast (null on
    malformed input), try_add (null on BIGINT overflow —
    MAX_BIGINT + l_orderkey overflows for every key except 0, which
    the oracle pins row-wise WITHOUT doing arithmetic DuckDB would
    refuse to evaluate), try_element_at (null out of bounds). The error-tolerant arithmetic a curation pipeline
    needs under ANSI mode, where plain operators would kill the job on
    one bad row."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    arr = F.array(F.col("l_returnflag"), F.col("l_linestatus"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25)
                * 1e4
                + 0.5
            )
            / 1e4
        ).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("flag_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("line_int"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"), F.col("l_orderkey")
        ).alias("over_add"),
        F.try_element_at(arr, F.lit(2)).alias("elem2"),
        F.try_element_at(arr, F.lit(5)).alias("elem5"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fn_collation",
    oracle="""
    WITH words AS (
      SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w
      FROM part
    ),
    cased AS (
      SELECT CASE p_partkey % 3 WHEN 0 THEN upper(w)
                                WHEN 1 THEN concat(upper(substr(w, 1, 1)),
                                                   substr(w, 2))
                                ELSE w END AS w2
      FROM words
    )
    SELECT lower(w2) AS word, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT w2) AS BIGINT) AS n_case_forms
    FROM cased
    GROUP BY lower(w2)
    ORDER BY word
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): part-name words
    deterministically re-cased 3 ways, then grouped under UTF8_LCASE —
    the engine's comparator does the case folding (no lower() rewrite
    in the plan); the oracle IS the lower() rewrite, so both must
    agree. n_case_forms counts the distinct raw casings folded into
    each group (binary-collated count inside an LCASE group)."""
    w = (
        t(spark, sf_dir, "part")
        .select("p_partkey", F.explode(F.split("p_name", " ")).alias("w"))
        .select(
            "p_partkey",
            F.when(F.col("p_partkey") % 3 == 0, F.upper("w"))
            .when(F.col("p_partkey") % 3 == 1, F.initcap("w"))
            .otherwise(F.col("w"))
            .alias("w2"),
        )
    )
    return (
        w.groupBy(F.collate(F.col("w2"), "UTF8_LCASE").alias("_k"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count_distinct(F.collate(F.col("w2"), "UTF8_BINARY"))
            .cast("bigint")
            .alias("n_case_forms"),
            F.min(F.lower(F.collate(F.col("w2"), "UTF8_BINARY"))).alias("word"),
        )
        .select("word", "n", "n_case_forms")
        .orderBy("word")
    )
