"""Scalar function surface — Q36–Q42 (SURVEY.md §2.2h).

One declared query per family exercises the whole family as a projected tuple
over a key-ordered LIMIT, so a single value-hash covers many functions.
Integer-typed results are cast so both engines emit the same width (DuckDB
promotes SUM(int)→HUGEINT and length()→BIGINT where Spark uses INT/BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspectadb_spark.queries.registry import query, r4, r4c, tables


# --------------------------------------------------------------------------
# Q36 string family
@query(
    "q36_string_suite",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS up, LOWER(p_type) AS lo,
           SUBSTR(p_name, 1, 8) AS sub, CAST(LENGTH(p_name) AS INT) AS len,
           REPLACE(p_type, ' ', '_') AS rep,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS pad,
           REVERSE(p_brand) AS rev, LEFT(p_name, 3) AS l3, RIGHT(p_name, 3) AS r3,
           CAST(STRPOS(p_name, 'a') AS INT) AS pos,
           CONCAT_WS('-', p_brand, p_type) AS cw,
           TRIM(CONCAT(' ', p_brand, ' ')) AS tr
    FROM part ORDER BY p_partkey LIMIT 300
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("up"),
            F.lower("p_type").alias("lo"),
            F.substring("p_name", 1, 8).alias("sub"),
            F.length("p_name").alias("len"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("rep"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("pad"),
            F.reverse("p_brand").alias("rev"),
            F.expr("LEFT(p_name, 3)").alias("l3"),
            F.expr("RIGHT(p_name, 3)").alias("r3"),
            F.instr("p_name", "a").alias("pos"),
            F.concat_ws("-", "p_brand", "p_type").alias("cw"),
            F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("tr"),
        )
        .orderBy("p_partkey")
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q37 date/time family (orders; midnight-stamped dates)
@query(
    "q37_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(DAY(o_orderdate) AS INT) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
           o_orderdate + INTERVAL 7 DAY AS plus7,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS dd,
           CAST(isodow(o_orderdate) AS INT) AS idow,
           last_day(o_orderdate) AS ld,
           epoch_ms(o_orderdate) AS ep,
           make_date(CAST(YEAR(o_orderdate) AS INT), CAST(MONTH(o_orderdate) AS INT), 1) AS md
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("mon"),
            F.expr("o_orderdate + INTERVAL 7 DAY").alias("plus7"),
            F.datediff(F.col("o_orderdate"), F.expr("TIMESTAMP_NTZ '1995-01-01 00:00:00'")).alias("dd"),
            (F.weekday("o_orderdate") + 1).alias("idow"),
            F.last_day("o_orderdate").alias("ld"),
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ep"),
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias("md"),
        )
        .orderBy("o_orderkey")
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q37b sub-day time parts (events; µs-truncated ns timestamps)
@query(
    "q37b_time_parts",
    oracle="""
    SELECT event_id,
           CAST(HOUR(ts) AS INT) AS h, CAST(MINUTE(ts) AS INT) AS mi,
           CAST(SECOND(ts) AS INT) AS s,
           date_trunc('hour', ts) AS th, date_trunc('minute', ts) AS tm
    FROM events ORDER BY event_id LIMIT 300
    """,
)
def q37b(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.select(
            "event_id",
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.second("ts").alias("s"),
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("th"),
            F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("tm"),
        )
        .orderBy("event_id")
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q38 math family (sqrt-based power form avoids libm pow divergence)
@query(
    "q38_math_suite",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ABS(-l_quantity) AS ab,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS ce,
           CAST(FLOOR(l_tax * 100) AS BIGINT) AS fl,
           {r4('l_quantity * SQRT(l_quantity)')} AS p15,
           {r4('POWER(l_quantity, 2.0)')} AS p2,
           {r4('SQRT(l_extendedprice)')} AS sq,
           {r4('LN(l_extendedprice)')} AS lg,
           {r4('LOG10(l_extendedprice)')} AS l10,
           {r4('EXP(l_discount)')} AS ex,
           CAST(SIGN(l_quantity - 25) AS INT) AS sg,
           CAST(MOD(l_orderkey, 7) AS BIGINT) AS md
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(-F.col("l_quantity")).alias("ab"),
            F.ceil(F.col("l_discount") * 100).cast("bigint").alias("ce"),
            F.floor(F.col("l_tax") * 100).cast("bigint").alias("fl"),
            r4c(F.col("l_quantity") * F.sqrt("l_quantity")).alias("p15"),
            r4c(F.pow("l_quantity", F.lit(2.0))).alias("p2"),
            r4c(F.sqrt("l_extendedprice")).alias("sq"),
            r4c(F.log("l_extendedprice")).alias("lg"),
            r4c(F.log10("l_extendedprice")).alias("l10"),
            r4c(F.exp("l_discount")).alias("ex"),
            F.signum(F.col("l_quantity") - 25).cast("int").alias("sg"),
            (F.col("l_orderkey") % 7).cast("bigint").alias("md"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q39 array family (embeddings: fixed-length list<float>)
@query(
    "q39_array_suite",
    oracle=f"""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS n,
           {r4('CAST(embedding[1] AS DOUBLE)')} AS e1,
           {r4('CAST(embedding[64] AS DOUBLE)')} AS e64,
           {r4('CAST(list_min(embedding) AS DOUBLE)')} AS mn,
           {r4('CAST(list_max(embedding) AS DOUBLE)')} AS mx,
           {r4("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))")} AS sm
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["embeddings"]
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("n"),
            r4c(F.element_at("embedding", 1).cast("double")).alias("e1"),
            r4c(F.element_at("embedding", 64).cast("double")).alias("e64"),
            r4c(F.array_min("embedding").cast("double")).alias("mn"),
            r4c(F.array_max("embedding").cast("double")).alias("mx"),
            r4c(
                F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double"))
            ).alias("sm"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q40 higher-order functions (transform / filter / aggregate)
@query(
    "q40_higher_order",
    oracle=f"""
    SELECT vec_id,
           CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT) AS npos,
           {r4("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")} AS ssq
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["embeddings"]
    return (
        e.select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).alias("npos"),
            r4c(
                F.aggregate(
                    "embedding", F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            ).alias("ssq"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q41 map family (literal-constructed — class V; demoted to units if fragile)
@query(
    "q41_map_suite",
    oracle="""
    SELECT p_partkey,
           CAST(map(['sz', 'pk'], [p_size, CAST(p_partkey AS INT)])['sz'][1] AS INT) AS vsz,
           array_to_string(list_sort(map_keys(map(['sz', 'pk'], [p_size, CAST(p_partkey AS INT)]))), ',') AS mk
    FROM part ORDER BY p_partkey LIMIT 200
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["part"]
    m = F.create_map(
        F.lit("sz"), F.col("p_size"),
        F.lit("pk"), F.col("p_partkey").cast("int"),
    )
    return (
        p.select(
            "p_partkey",
            F.element_at(m, "sz").alias("vsz"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("mk"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q42 JSON extraction + aggregation (events.props)
@query(
    "q42_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sk,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sk"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q42c VariantType path: parse props once into a VARIANT column and extract
# typed values — Spark 4's shredded-binary JSON representation (parse once,
# extract many: at 100 TB this beats per-path string re-parsing; the variant
# parse is vectorized and paths read the shredded form).
@query(
    "q42c_variant",
    oracle="""
    SELECT event_type,
           CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS INT) AS mn_k,
           CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INT) AS mx_k,
           COUNT(CASE WHEN CAST(props->>'$.k' AS INTEGER) > 50 THEN 1 END) AS n_big
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q42c(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("mn_k"),
            F.max("k").alias("mx_k"),
            F.count(F.when(F.col("k") > 50, F.lit(1))).alias("n_big"),
        )
        .orderBy("event_type")
    )
