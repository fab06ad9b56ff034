"""Relational core — Q01–Q12, Q14–Q35 (SURVEY.md §2.2a–§2.2g).

Pure DataFrame/SQL plumbing: every operator here maps 1:1 onto a Catalyst
logical operator, so predicate pushdown, column pruning, join selection
(broadcast for the dims), partial aggregation, window-group-limit and
TakeOrderedAndProject all come from the optimizer for free — nothing in this
module executes rows in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspectadb_spark.queries.registry import davg, dec, dsum, query, r4, sql, tables


# --------------------------------------------------------------------------
# Q01 scan + count
@query(
    "q01_scan_count",
    oracle="SELECT COUNT(*) AS n, COUNT(l_orderkey) AS nk, MIN(l_linenumber) AS mn FROM lineitem",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + global counts (vectorized scan, no shuffle)."""
    return tables(spark, sf_dir)["lineitem"].agg(
        F.count("*").alias("n"),
        F.count("l_orderkey").alias("nk"),
        F.min("l_linenumber").alias("mn"),
    )


# --------------------------------------------------------------------------
# Q02 projection / arithmetic / CASE
_Q02_NET = r4("l_extendedprice * (1 - l_discount)")
@query(
    "q02_project_case",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, {_Q02_NET} AS net,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS sz
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables(spark, sf_dir)["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(_Q02_NET).alias("net"),
            F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("sz"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q03 predicate suite (IN / BETWEEN / LIKE / IS NOT NULL) — pushed to the scan
@query(
    "q03_predicates",
    oracle="""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 100000
      AND o_orderpriority LIKE '1%' AND o_custkey IS NOT NULL
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 100000)
            & F.col("o_orderpriority").like("1%")
            & F.col("o_custkey").isNotNull()
        ).agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q04 regex predicate + global top-k (TakeOrderedAndProject)
@query(
    "q04_regex_topk",
    oracle="""
    SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '[aeiou]{2}')
    ORDER BY p_partkey LIMIT 100
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["part"]
    return (
        p.filter(F.col("p_name").rlike("[aeiou]{2}"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q05 inner equi-join + agg
@query(
    "q05_inner_join",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n, {dsum('o_totalprice', 'tot')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.expr(f"CAST(SUM({dec('o_totalprice')}) AS DOUBLE)").alias("tot"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q06 5-way star join (dims broadcast by planner; fact shuffles once for agg)
@query(
    "q06_star_join",
    oracle=f"""
    SELECT n_name, {dsum('l_extendedprice * (1 - l_discount)', 'rev')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY rev DESC, n_name
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.expr(f"CAST(SUM({dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)").alias("rev"))
        .orderBy(F.desc("rev"), "n_name")
    )


# --------------------------------------------------------------------------
# Q07 left outer join
@query(
    "q07_left_join",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey ORDER BY n DESC, c_custkey LIMIT 200
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy(F.desc("n"), "c_custkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q08 full outer join
@query(
    "q08_full_join",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.na AS na, b.nb AS nb
    FROM (SELECT l_partkey AS k, COUNT(*) AS na FROM lineitem GROUP BY 1) a
    FULL JOIN (SELECT p_partkey AS k, COUNT(*) AS nb FROM part GROUP BY 1) b
      ON a.k = b.k
    ORDER BY k NULLS LAST LIMIT 300
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    a = t["lineitem"].groupBy(F.col("l_partkey").alias("k")).agg(F.count("*").alias("na"))
    b = t["part"].groupBy(F.col("p_partkey").alias("k")).agg(F.count("*").alias("nb"))
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full")
        .select(F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"), "na", "nb")
        .orderBy(F.col("k").asc_nulls_last())
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q09 left semi (EXISTS)
@query(
    "q09_semi_join",
    oracle="""
    SELECT COUNT(*) AS n FROM customer WHERE EXISTS
      (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 50000)
    return (
        t["customer"]
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q10 left anti (NOT EXISTS)
@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey FROM customer WHERE NOT EXISTS
      (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey LIMIT 200
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(200)
    )


# --------------------------------------------------------------------------
# Q11 cross join
@query("q11_cross_join", oracle="SELECT COUNT(*) AS n FROM supplier CROSS JOIN nation")
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t["supplier"].crossJoin(t["nation"]).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Q12 theta join (equi on brand + inequality on price)
@query(
    "q12_theta_join",
    oracle="""
    SELECT p1.p_brand AS p_brand, COUNT(*) AS pairs
    FROM part p1 JOIN part p2
      ON p1.p_brand = p2.p_brand AND p1.p_retailprice > p2.p_retailprice
    GROUP BY 1 ORDER BY 1
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["part"]
    p1 = p.select(F.col("p_brand").alias("b1"), F.col("p_retailprice").alias("r1"))
    p2 = p.select(F.col("p_brand").alias("b2"), F.col("p_retailprice").alias("r2"))
    return (
        p1.join(p2, (F.col("b1") == F.col("b2")) & (F.col("r1") > F.col("r2")))
        .groupBy(F.col("b1").alias("p_brand"))
        .agg(F.count("*").alias("pairs"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# Q14 global aggregate
@query(
    "q14_global_agg",
    oracle=f"""
    SELECT COUNT(*) AS n, {dsum('l_quantity', 'sq')},
           MIN(l_shipdate) AS mn_ship, MAX(l_shipdate) AS mx_ship,
           {davg('l_discount', 'avg_disc')}
    FROM lineitem
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count("*").alias("n"),
        F.expr(f"CAST(SUM({dec('l_quantity')}) AS DOUBLE)").alias("sq"),
        F.min("l_shipdate").alias("mn_ship"),
        F.max("l_shipdate").alias("mx_ship"),
        F.expr(davg("l_discount")).alias("avg_disc"),
    )


# --------------------------------------------------------------------------
# Q15 pricing summary (TPC-H Q1 form) — the M1 flagship
_Q15_BODY = f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base')},
           {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc')},
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {davg('l_quantity', 'avg_qty')},
           {davg('l_discount', 'avg_disc')},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""
@query("q15_pricing_summary", oracle=_Q15_BODY)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan→filter→partial+final hash agg→sort. Decimal-routed sums
    make the result order-independent across shuffle partitions."""
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(SUM({dec('l_quantity')}) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(SUM({dec('l_extendedprice')}) AS DOUBLE)").alias("sum_base"),
            F.expr(f"CAST(SUM({dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)").alias("sum_disc"),
            F.expr(
                f"CAST(SUM({dec('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr(davg("l_quantity")).alias("avg_qty"),
            F.expr(davg("l_discount")).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q16 HAVING
@query(
    "q16_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n, {dsum('o_totalprice', 's')}
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
    ORDER BY s DESC, o_custkey LIMIT 100
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({dec('o_totalprice')}) AS DOUBLE)").alias("s"),
        )
        .filter(F.col("n") >= 5)
        .orderBy(F.desc("s"), "o_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q17 multiple DISTINCT aggregates
@query(
    "q17_multi_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS dp,
           COUNT(DISTINCT l_suppkey) AS ds, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("dp"),
            F.countDistinct("l_suppkey").alias("ds"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q18 GROUPING SETS (SQL entry point; Catalyst Expand operator)
_Q18_SQL = f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           COUNT(*) AS n, {dsum('o_totalprice', 's')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g1, g2, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""
@query("q18_grouping_sets", oracle=_Q18_SQL)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q18_SQL)


# --------------------------------------------------------------------------
# Q19 ROLLUP (DataFrame API)
@query(
    "q19_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           COUNT(*) AS n, {dsum('o_totalprice', 's')}
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g1, g2, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g1"),
            F.grouping("o_orderpriority").cast("int").alias("g2"),
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({dec('o_totalprice')}) AS DOUBLE)").alias("s"),
        )
        .select("o_orderstatus", "o_orderpriority", "g1", "g2", "n", "s")
        .orderBy(
            "g1", "g2",
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


# --------------------------------------------------------------------------
# Q20 CUBE
@query(
    "q20_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           COUNT(*) AS n, {dsum('o_totalprice', 's')}
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g1, g2, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g1"),
            F.grouping("o_orderpriority").cast("int").alias("g2"),
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({dec('o_totalprice')}) AS DOUBLE)").alias("s"),
        )
        .select("o_orderstatus", "o_orderpriority", "g1", "g2", "n", "s")
        .orderBy(
            "g1", "g2",
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


# --------------------------------------------------------------------------
# Q21 conditional aggregation (CASE-sum + FILTER clause)
@query(
    "q21_conditional_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS big,
           CAST(COUNT(*) FILTER (WHERE value <= 100) AS BIGINT) AS small
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("big"),
            F.count(F.when(F.col("value") <= 100, F.lit(1))).alias("small"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q22 arg-extrema (max_by with an exact-decimal strictly-monotone tie-break)
# wide decimal so the ×1e9 tie-break never overflows in either engine
_Q22_KEY = "CAST(o_totalprice AS DECIMAL(28,6)) * 1000000000 + o_orderkey"
@query(
    "q22_max_by",
    oracle=f"""
    SELECT o_custkey, MAX_BY(o_orderkey, {_Q22_KEY}) AS best_order,
           CAST(MAX({dec('o_totalprice')}) AS DOUBLE) AS top_price
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.expr(f"MAX_BY(o_orderkey, {_Q22_KEY})").alias("best_order"),
            F.expr(f"CAST(MAX({dec('o_totalprice')}) AS DOUBLE)").alias("top_price"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Q23 ordered list aggregation
@query(
    "q23_list_agg",
    oracle="""
    SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lns
    FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 300
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("l_linenumber")), lambda x: x.cast("string")),
                ",",
            ).alias("lns")
        )
        .orderBy("l_orderkey")
        .limit(300)
    )


# --------------------------------------------------------------------------
# Q24 exact interpolated percentile (class V)
@query(
    "q24_percentile",
    oracle=f"""
    SELECT event_type, {r4('quantile_cont(value, 0.5)')} AS med FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy("event_type")
        .agg(F.expr(r4("percentile(value, 0.5)")).alias("med"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q25 ranking window functions
@query(
    "q25_ranking",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS dk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderkey LIMIT 500
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dk"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q26 running sum (UNBOUNDED PRECEDING frame, decimal measure)
@query(
    "q26_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({dec('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rt
    FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.expr(dec("o_totalprice"))).over(w).cast("double").alias("rt"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q27 sliding rows frame (3 PRECEDING)
@query(
    "q27_sliding_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({dec('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS s4
    FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-3, 0)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.expr(dec("o_totalprice"))).over(w).cast("double").alias("s4"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q28 lag / lead with default
@query(
    "q28_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type, 1, 'none') OVER u AS prev_type,
           LEAD(event_id) OVER u AS next_id
    FROM events
    WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id LIMIT 500
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.lag("event_type", 1, "none").over(u).alias("prev_type"),
            F.lead("event_id").over(u).alias("next_id"),
        )
        .orderBy("event_id")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q29 distribution window functions (class V)
@query(
    "q29_distribution",
    oracle=f"""
    SELECT o_orderkey, NTILE(4) OVER w AS nt,
           {r4('PERCENT_RANK() OVER w')} AS pr, {r4('CUME_DIST() OVER w')} AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderkey LIMIT 500
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            F.ntile(4).over(w).alias("nt"),
            F.round(F.percent_rank().over(w).cast("decimal(18,6)"), 4).cast("double").alias("pr"),
            F.round(F.cume_dist().over(w).cast("decimal(18,6)"), 4).cast("double").alias("cd"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q30 RANGE frame on integer cents (FP-edge-free per SURVEY §2.3 note)
@query(
    "q30_range_frame",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS near
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    cents = F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
    w = Window.orderBy(cents).rangeBetween(-10000, 0)
    return (
        o.select("o_orderkey", F.count(F.lit(1)).over(w).alias("near"))
        .orderBy("o_orderkey")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q31 top-k per group (window-group-limit optimized in Spark ≥3.5)
@query(
    "q31_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 600
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(600)
    )


# --------------------------------------------------------------------------
# Q32 total sort + LIMIT/OFFSET
@query(
    "q32_sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey LIMIT 100 OFFSET 50
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.asc("o_orderkey"))
        .offset(50)
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q33 UNION ALL vs UNION (distinct)
@query(
    "q33_union",
    oracle="""
    SELECT 'all' AS k, COUNT(*) AS n FROM
      (SELECT o_custkey AS ck FROM orders UNION ALL SELECT c_custkey FROM customer) t
    UNION ALL
    SELECT 'dist' AS k, COUNT(*) AS n FROM
      (SELECT o_custkey AS ck FROM orders UNION SELECT c_custkey FROM customer) t2
    ORDER BY k
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    ords = t["orders"].select(F.col("o_custkey").alias("ck"))
    cust = t["customer"].select(F.col("c_custkey").alias("ck"))
    all_n = ords.unionAll(cust).agg(F.count("*").alias("n")).select(F.lit("all").alias("k"), "n")
    dist_n = ords.union(cust).distinct().agg(F.count("*").alias("n")).select(F.lit("dist").alias("k"), "n")
    return all_n.unionAll(dist_n).orderBy("k")


# --------------------------------------------------------------------------
# Q34 INTERSECT (+ ALL variant as q34b)
@query(
    "q34_intersect",
    oracle="""
    SELECT COUNT(*) AS n FROM
      (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer) t
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["orders"].select("o_custkey")
        .intersect(t["customer"].select("c_custkey"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "q34b_intersect_all",
    oracle="""
    SELECT COUNT(*) AS n FROM
      (SELECT l_partkey AS k FROM lineitem INTERSECT ALL SELECT p_partkey FROM part) t
    """,
)
def q34b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"].select(F.col("l_partkey").alias("k"))
        .intersectAll(t["part"].select(F.col("p_partkey").alias("k")))
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q35 EXCEPT (+ ALL variant as q35b)
@query(
    "q35_except",
    oracle="""
    SELECT c FROM (SELECT c_custkey AS c FROM customer EXCEPT SELECT o_custkey FROM orders) t
    ORDER BY c LIMIT 200
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["customer"].select(F.col("c_custkey").alias("c"))
        .subtract(t["orders"].select(F.col("o_custkey").alias("c")))
        .orderBy("c")
        .limit(200)
    )


@query(
    "q35b_except_all",
    oracle="""
    SELECT COUNT(*) AS n FROM
      (SELECT l_partkey AS k FROM lineitem EXCEPT ALL SELECT p_partkey FROM part) t
    """,
)
def q35b(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t["lineitem"].select(F.col("l_partkey").alias("k"))
        .exceptAll(t["part"].select(F.col("p_partkey").alias("k")))
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# Q95 recursive CTE (Spark >= 4.0 WITH RECURSIVE): BFS shortest-hops over
# the event-type transition graph. The edge list is at most |types|^2 rows
# no matter how many raw events (distinct over one window pass), so the
# recursion itself operates on a constant-size relation at any data scale.
_Q95 = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT prev AS src, event_type AS dst FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev
    FROM events) x
  WHERE prev IS NOT NULL AND prev <> event_type
),
r(t, hops) AS (
  SELECT CAST('signup' AS {STR}) AS t, 0 AS hops
  UNION ALL
  SELECT e.dst AS t, r.hops + 1 AS hops
  FROM r JOIN edges e ON e.src = r.t WHERE r.hops < 3
)
SELECT t AS event_type, MIN(hops) AS min_hops FROM r GROUP BY t ORDER BY t
"""


@query(
    "q95_recursive_reachability",
    oracle=_Q95.replace("{STR}", "VARCHAR"),
    doc="WITH RECURSIVE shortest-hops from 'signup' over the derived "
        "type-transition graph; identical SQL both engines.",
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q95.replace("{STR}", "STRING"))


# --------------------------------------------------------------------------
# Q96 ordered-set aggregates: percentile_disc / percentile_cont WITHIN GROUP
# (SQL:2003 ordered-set syntax; complements q24's functional percentile()).
_Q96_SPARK = """
SELECT event_type,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50_disc,
       CAST(ROUND(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY value)
                       AS DECIMAL(18,6)), 4) AS DOUBLE) AS p90_cont
FROM events GROUP BY event_type ORDER BY event_type
"""


@query(
    "q96_percentile_within_group",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           CAST(ROUND(CAST(quantile_cont(value, 0.9) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS p90_cont
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Ordered-set aggregates (WITHIN GROUP): discrete + interpolated "
        "quantiles; DuckDB spells them quantile_disc/quantile_cont.",
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q96_SPARK)


# --------------------------------------------------------------------------
# Q102 null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys pair up
# instead of vanishing — the CDC-merge edge case (deleted rows carry NULL
# attribute columns).
@query(
    "q102_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pr
      FROM orders WHERE o_orderkey % 2 = 0),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS pr
      FROM orders WHERE o_orderkey % 3 = 0)
    SELECT a.pr AS pr, COUNT(*) AS n
    FROM a JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
    GROUP BY a.pr ORDER BY pr NULLS FIRST
    """,
    doc="<=> join: NULL keys match each other (3VL '=' would drop them).",
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    pr = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority"))
    # r13: the key has ~6 distinct values over 75k x 50k rows, so the
    # row-level <=> join exploded to ~600M rows only to be counted.
    # COUNT(*) grouped by the join key factorizes: n(pr) = |a_pr| * |b_pr|,
    # so each side pre-aggregates to its 6-row key domain and the null-safe
    # join pairs counts, not rows (the inner join's drop-if-absent
    # semantics are preserved — a key present on one side only never
    # produced an output row before either).
    a = (o.filter(F.col("o_orderkey") % 2 == 0).select(pr.alias("pr"))
         .groupBy("pr").agg(F.count("*").alias("ca")))
    b = (o.filter(F.col("o_orderkey") % 3 == 0).select(pr.alias("pr_b"))
         .groupBy("pr_b").agg(F.count("*").alias("cb")))
    return (
        a.join(b, a["pr"].eqNullSafe(b["pr_b"]))
        .select("pr", (F.col("ca") * F.col("cb")).alias("n"))
        .orderBy(F.col("pr").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Q103 GROUP BY ALL / ORDER BY ALL (DuckDB-originated shorthand, adopted by
# Spark 4): every non-aggregate select item becomes a grouping key.
_Q103 = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tot
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@query(
    "q103_group_by_all",
    oracle=_Q103,
    doc="GROUP BY ALL + ORDER BY ALL: identical shorthand in both dialects.",
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q103)


# --------------------------------------------------------------------------
# Q113 LATERAL correlated subquery with LIMIT — per-outer-row top-k without
# a window over the whole table. Identical SQL text in both dialects; Spark
# plans the correlated limit as a rank-filtered join (no nested loop over
# the probe side when the inner is broadcastable).
_Q113 = """
SELECT n_name, t.s_suppkey, t.s_name, t.bal
FROM nation, LATERAL (
  SELECT s_suppkey, s_name, s_acctbal AS bal
  FROM supplier WHERE s_nationkey = n_nationkey
  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
ORDER BY n_name, t.bal DESC, t.s_suppkey
"""


@query(
    "q113_lateral_topk",
    oracle=_Q113,
    doc="LATERAL (correlated, LIMITed) subquery: top-2 suppliers per "
        "nation — same SQL text in Spark and DuckDB.",
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q113)


# --------------------------------------------------------------------------
# Q118 contingency table (crosstab): orderstatus × orderpriority counts via
# the DataFrame stat API; the oracle spells the same pivot as conditional
# aggregation. Column set is the (bounded) priority domain.
@query(
    "q118_crosstab",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
           COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
           COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="df.stat.crosstab ≡ conditional-aggregation pivot over the bounded "
        "priority domain.",
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    return ct.orderBy("o_orderstatus_o_orderpriority")


# --------------------------------------------------------------------------
# Q119 equi-depth histogram: NTILE(8) deciles of order value (total order
# with unique tie-break → deterministic bucket assignment), then per-bucket
# bounds and mass. Complements q100's equi-width form.
_Q119 = """
WITH t AS (
  SELECT o_totalprice, NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS b
  FROM orders)
SELECT b, CAST(COUNT(*) AS INT) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS mass
FROM t GROUP BY b ORDER BY b
"""


@query(
    "q119_equidepth_histogram",
    oracle=_Q119,
    doc="Equi-depth (NTILE) histogram of order value: per-decile bounds and "
        "mass; deterministic via the unique orderkey tie-break.",
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTILE over the full orders table via the closed-form bucket-offset
    # scheme (scale.global_ntile) — the literal SQL window would drag
    # every order through ONE task; here only per-bucket counts cross the
    # single-partition exchange. Bit-identical to the oracle's NTILE.
    from inspectadb_spark.operators.scale import global_ntile

    o = tables(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    t = global_ntile(
        o, 8, F.expr("CAST(FLOOR(o_totalprice) AS BIGINT) DIV 20000"),
        [F.col("o_totalprice"), F.col("o_orderkey")], "b")
    return (
        t.groupBy("b")
        .agg(
            F.count("*").cast("int").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").alias("mass"),
        )
        .orderBy("b")
    )
