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


# --------------------------------------------------------------------------
# Q105 generator variants with OUTER semantics: rows whose array is empty
# must survive the explode with a NULL element (explode_outer), unlike plain
# explode which drops them. Oracle: LEFT JOIN against the unnested side.
@query(
    "q105_generator_outer",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN n_chars % 7 <> 0
                  THEN string_split(text, ' ')[1:3] ELSE [] END AS toks
      FROM documents),
    ex AS (SELECT doc_id AS d2, unnest(toks) AS tok FROM base)
    SELECT b.doc_id, ex.tok
    FROM base b LEFT JOIN ex ON b.doc_id = ex.d2
    ORDER BY b.doc_id, ex.tok NULLS LAST LIMIT 1000
    """,
    doc="explode_outer preserves empty-array rows as NULL elements; plain "
        "explode drops them (the 3-token slice keeps output bounded).",
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    toks = F.when(
        F.col("n_chars") % 7 != 0, F.slice(F.split("text", " "), 1, 3)
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.col("tok").asc_nulls_last())
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q106 array set algebra. Spark's array_intersect/union/except have
# engine-specific element order, so both sides are expressed with the same
# order-canonical building blocks: filter-by-membership → distinct → sort.
@query(
    "q106_array_algebra",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             generate_series(o_orderkey % 7, o_orderkey % 7 + 5) AS a1,
             generate_series(o_custkey % 9, o_custkey % 9 + 4) AS a2
      FROM orders)
    SELECT o_orderkey,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a1, x -> list_contains(a2, x)))), ','), '') AS inter,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_concat(a1, a2))), ','), '') AS uni,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(a1, x -> NOT list_contains(a2, x)))), ','), '')
             AS diff,
           CAST(list_position(a1, o_orderkey % 7 + 2) AS INT) AS pos,
           list_contains(a2, 5) AS has5
    FROM base ORDER BY o_orderkey LIMIT 400
    """,
    doc="Array set algebra (intersect/union/except/position/contains) in the "
        "order-canonical formulation shared by both dialects.",
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    base = o.select(
        "o_orderkey",
        F.sequence(F.col("o_orderkey") % 7, F.col("o_orderkey") % 7 + 5).alias("a1"),
        F.sequence(F.col("o_custkey") % 9, F.col("o_custkey") % 9 + 4).alias("a2"),
    )
    member = F.expr("filter(a1, x -> array_contains(a2, x))")
    non_member = F.expr("filter(a1, x -> NOT array_contains(a2, x))")
    return (
        base.select(
            "o_orderkey",
            F.concat_ws(",", F.sort_array(F.array_distinct(member)))
            .alias("inter"),
            F.concat_ws(",", F.sort_array(F.array_distinct(F.concat("a1", "a2"))))
            .alias("uni"),
            F.concat_ws(",", F.sort_array(F.array_distinct(non_member)))
            .alias("diff"),
            F.array_position(F.col("a1"), F.col("o_orderkey") % 7 + 2)
            .cast("int").alias("pos"),
            F.array_contains(F.col("a2"), F.lit(5)).alias("has5"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


# --------------------------------------------------------------------------
# Q107 safe casts / error-tolerant arithmetic: TRY_CAST returns NULL instead
# of raising under ANSI mode — the ETL ingest path for dirty columns.
@query(
    "q107_safe_casts",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INT) AS bad_int,
           TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS pri,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_dbl,
           TRY_CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS ts_rt,
           CAST(ROUND(CAST(o_totalprice / NULLIF(o_orderkey % 5, 0)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS safe_div
    FROM orders ORDER BY o_orderkey LIMIT 400
    """,
    doc="TRY_CAST null-on-failure semantics + NULLIF-guarded division, "
        "identical across dialects under ANSI mode.",
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderpriority").try_cast("int").alias("bad_int"),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("pri"),
            F.col("o_orderstatus").try_cast("double").alias("bad_dbl"),
            F.col("o_orderdate").cast("string").try_cast("timestamp_ntz")
            .alias("ts_rt"),
            r4c(
                F.col("o_totalprice")
                / F.nullif(F.col("o_orderkey") % 5, F.lit(0))
            ).alias("safe_div"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


# --------------------------------------------------------------------------
# Q108 regex family: extract / extract-all count / global replace / match
# flag, restricted to the RE2∩Java common subset (SURVEY §1.3.6).
@query(
    "q108_regex_suite",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '[aeiou]{2}') AS first_vv,
           CAST(len(regexp_extract_all(p_name, '[aeiou]{2}')) AS INT) AS n_vv,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
           regexp_extract(p_type, '([A-Z]+)([0-9]+)', 2) AS type_num
    FROM part ORDER BY p_partkey LIMIT 400
    """,
    doc="Regex surface: first-match extract, match counting, global replace, "
        "anchored predicate, group extract. DuckDB needs the 'g' flag where "
        "Spark's regexp_replace is global by default.",
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["part"]
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_name", "[aeiou]{2}", 0).alias("first_vv"),
            F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]{2}"), 0))
            .alias("n_vv"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
            F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
            F.regexp_extract("p_type", "([A-Z]+)([0-9]+)", 2).alias("type_num"),
        )
        .orderBy("p_partkey")
        .limit(400)
    )


# --------------------------------------------------------------------------
# Q109 bitwise family (+ width_bucket, which DuckDB lacks — the oracle uses
# the exact-decimal arithmetic definition instead).
@query(
    "q109_bitwise_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and, o_orderkey | 16 AS b_or,
           xor(o_orderkey, 85) AS b_xor,
           (o_orderkey % 1024) << 2 AS shl, o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS nbits,
           CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 11
                     ELSE FLOOR(CAST(o_totalprice AS DECIMAL(18,6)) / 50000) + 1
                END AS INT) AS bucket
    FROM orders ORDER BY o_orderkey LIMIT 400
    """,
    doc="Bitwise ops (&, |, xor, shifts, popcount) + width_bucket vs its "
        "arithmetic definition (decimal division so bucket edges are exact).",
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    k = F.col("o_orderkey")
    return (
        o.select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("b_and"),
            k.bitwiseOR(F.lit(16)).alias("b_or"),
            k.bitwiseXOR(F.lit(85)).alias("b_xor"),
            F.shiftleft(k % 1024, 2).alias("shl"),
            F.shiftright(k, 3).alias("shr"),
            F.bit_count(k).alias("nbits"),
            F.width_bucket(F.col("o_totalprice"), F.lit(0), F.lit(500000), F.lit(10))
            .cast("int").alias("bucket"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )


# --------------------------------------------------------------------------
# Q110 date/time family 2: calendar parts, week truncation, month clamping.
@query(
    "q110_date_suite2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_wk,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           last_day(o_orderdate) AS mo_end,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_start,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_mo
    FROM orders ORDER BY o_orderkey LIMIT 400
    """,
    doc="Calendar parts (quarter / ISO week / day-of-year), last_day, "
        "ISO-Monday week truncation, end-of-month-clamped month addition.",
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = F.col("o_orderdate")
    return (
        o.select(
            "o_orderkey",
            F.quarter(d).alias("qtr"),
            F.weekofyear(d).alias("iso_wk"),
            F.dayofyear(d).alias("doy"),
            F.last_day(d).alias("mo_end"),
            F.date_trunc("week", d).cast("date").alias("wk_start"),
            F.add_months(d, 1).alias("plus_mo"),
        )
        .orderBy("o_orderkey")
        .limit(400)
    )
