"""Time & CDC composite queries — Q13 (as-of), Q46–Q51 (SURVEY.md §2.2j, §2.3).

These exercise the composite operators in ``inspectadb_spark.operators``; the
oracle derives the identical cdc_orders fixture inside a CTE so both engines
see the same relation.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspectadb_spark.operators.cdc import apply_changelog, scd2_history
from inspectadb_spark.operators.sessionize import sessionize
from inspectadb_spark.queries.registry import dec, dsum, query, sql, tables
from inspectadb_spark.queries.relational import _Q15_BODY  # noqa: F401 (Q51 reuse)
from inspectadb_spark.sources.cdc import CDC_ORDERS_CTE, derive_cdc_orders


# --------------------------------------------------------------------------
# Q13 as-of: for each purchase, the most recent prior click by the same user
# (union-merge window formulation — identical shape in both engines).
@query(
    "q13_asof_join",
    oracle="""
    WITH u AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, event_type,
             MAX(CASE WHEN event_type = 'click' THEN event_id END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      FROM u
    )
    SELECT event_id, last_click FROM w WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    u = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        u.select(
            "event_id",
            "event_type",
            F.max(F.when(F.col("event_type") == "click", F.col("event_id"))).over(w).alias("last_click"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "last_click")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q46 CDC change-log apply → current state
@query(
    "q46_cdc_apply",
    oracle=f"""
    WITH {CDC_ORDERS_CTE},
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY lsn DESC) AS rn
      FROM cdc_orders
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM ranked WHERE rn = 1 AND op <> 'd'
    ORDER BY o_orderkey LIMIT 1000
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdc = derive_cdc_orders(tables(spark, sf_dir)["orders"])
    return (
        apply_changelog(cdc, ["o_orderkey"], order_col="lsn", op_col="op")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q47 SCD2 history (validity intervals per key version)
@query(
    "q47_scd2",
    oracle=f"""
    WITH {CDC_ORDERS_CTE}
    SELECT o_orderkey, lsn, lsn AS valid_from,
           LEAD(lsn) OVER (PARTITION BY o_orderkey ORDER BY lsn) AS valid_to
    FROM cdc_orders ORDER BY o_orderkey, lsn LIMIT 1000
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdc = derive_cdc_orders(tables(spark, sf_dir)["orders"])
    return (
        scd2_history(cdc, ["o_orderkey"], order_col="lsn")
        .select("o_orderkey", "lsn", "valid_from", "valid_to")
        .orderBy("o_orderkey", "lsn")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q48 gap-based sessionization (batch analog of streaming session windows)
@query(
    "q48_sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, COUNT(*) AS n, MIN(ts) AS start_ts, MAX(ts) AS end_ts
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    s = sessionize(e, "user_id", "ts", "event_id", "INTERVAL 30 MINUTE")
    return (
        s.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# Q49 tumbling window aggregation (batch analog of streaming S2)
@query(
    "q49_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS n, {dsum('value', 'sv')}
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").getField("start").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"),
             F.expr(f"CAST(SUM({dec('value')}) AS DOUBLE)").alias("sv"))
        .orderBy("w", "event_type")
    )


# --------------------------------------------------------------------------
# Q50 sliding window aggregation (1h windows every 15min; S2b analog)
@query(
    "q50_sliding",
    oracle=f"""
    WITH ks AS (SELECT UNNEST([0, 1, 2, 3]) AS k),
    w AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart,
             event_type, value
      FROM events CROSS JOIN ks
    )
    SELECT wstart, event_type, COUNT(*) AS n, {dsum('value', 'sv')}
    FROM w GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").getField("start").alias("wstart"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"),
             F.expr(f"CAST(SUM({dec('value')}) AS DOUBLE)").alias("sv"))
        .orderBy("wstart", "event_type")
    )


# --------------------------------------------------------------------------
# Q51 sink round-trip: write Q15's result to parquet, read it back.
@query("q51_sink_roundtrip", oracle=_Q15_BODY)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.queries.relational import q15

    out = os.path.join(tempfile.gettempdir(), f"inspectadb_q51_{os.path.basename(sf_dir.rstrip('/'))}")
    q15(spark, sf_dir).write.mode("overwrite").parquet(out)
    # Re-sort on read: parquet preserves values, not order (driver compare is
    # order-insensitive, but keep the declared total order anyway).
    return spark.read.parquet(out).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# Q70 gap-filled resampling with forward fill (hypertable regularization).
@query(
    "q70_resample_ffill",
    oracle=f"""
    WITH actual AS (
      SELECT user_id AS k, date_trunc('day', ts) AS bucket,
             CAST(ROUND(CAST(CAST(SUM({dec('value')}) AS DOUBLE) / COUNT(*)
                             AS DECIMAL(18,6)), 4) AS DOUBLE) AS v
      FROM events GROUP BY user_id, date_trunc('day', ts)),
    grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM (SELECT k, MIN(bucket) AS lo, MAX(bucket) AS hi FROM actual GROUP BY k))
    SELECT grid.k AS user_id, grid.bucket AS bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY grid.k ORDER BY grid.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid LEFT JOIN actual ON grid.k = actual.k AND grid.bucket = actual.bucket
    """,
    doc="Per-user daily grid over each user's span, forward-filled mean value.",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import resample_ffill

    return resample_ffill(tables(spark, sf_dir)["events"], step="1 day")


# --------------------------------------------------------------------------
# Q71 two-step conversion funnel (signup -> purchase within 24h of FIRST
# signup), reported per signup day.
@query(
    "q71_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id AS k, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
      SELECT DISTINCT k FROM firsts JOIN events e
        ON e.user_id = k AND e.event_type = 'purchase'
       AND e.ts > t0 AND e.ts <= t0 + INTERVAL 24 HOURS)
    SELECT CAST(date_trunc('day', t0) AS TIMESTAMP) AS day, COUNT(*) AS n_first,
           COUNT(conv.k) AS n_converted
    FROM firsts LEFT JOIN conv USING (k)
    GROUP BY date_trunc('day', t0) ORDER BY day
    """,
    doc="Conversion funnel: semi-join within time window, per-day rates.",
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import funnel

    return funnel(tables(spark, sf_dir)["events"])


# --------------------------------------------------------------------------
# Q73 z-score anomaly detection: events whose value deviates > 2 sigma from
# their user's mean. Moments via exact-decimal sums (sum, sum of squares) so
# mean/std are partial-agg-order independent; both engines compute
# std = sqrt(E[x^2] - E[x]^2) from the same exact moments.
@query(
    "q73_zscore_anomalies",
    oracle=f"""
    WITH m AS (
      SELECT user_id AS k, COUNT(*) AS n,
             CAST(SUM({dec('value')}) AS DOUBLE) AS s1,
             CAST(SUM({dec('value * value')}) AS DOUBLE) AS s2
      FROM events GROUP BY user_id HAVING COUNT(*) >= 10),
    scored AS (
      SELECT event_id, e.user_id AS user_id, value,
             (s1 / n) AS mu, SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)) AS sig
      FROM events e JOIN m ON e.user_id = m.k)
    SELECT event_id, user_id, value,
           CAST(ROUND(CAST((value - mu) / sig AS DECIMAL(18,6)), 4) AS DOUBLE) AS z
    FROM scored WHERE ABS(value - mu) > 2 * sig
    ORDER BY event_id
    """,
    doc="Per-user 2-sigma outlier events from exact-decimal moments.",
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    m = (
        ev.groupBy(F.col("user_id").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(dec("value"))).cast("double").alias("s1"),
            F.sum(F.expr(dec("value * value"))).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= 10)
    )
    mu = F.col("s1") / F.col("n")
    sig = F.sqrt(F.greatest(F.col("s2") / F.col("n") - mu * mu, F.lit(0.0)))
    return (
        ev.join(m, ev.user_id == m.k)
        .select("event_id", "user_id", "value", mu.alias("mu"), sig.alias("sig"))
        .filter(F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sig"))
        .select(
            "event_id", "user_id", "value",
            F.round(((F.col("value") - F.col("mu")) / F.col("sig")).cast("decimal(18,6)"), 4)
            .cast("double").alias("z"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q74 cumulative distinct users per day: running COUNT(DISTINCT) expressed
# scalably as "day of first occurrence per user" + running sum — one shuffle
# on user_id, one tiny per-day cumulation, instead of a quadratic
# distinct-over-expanding-frame.
@query(
    "q74_cumulative_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0
      FROM events GROUP BY user_id),
    per_day AS (
      SELECT d0 AS day, COUNT(*) AS new_users FROM firsts GROUP BY d0)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM per_day ORDER BY day
    """,
    doc="Running distinct-user count via first-occurrence days (linear, "
        "not quadratic-frame COUNT DISTINCT).",
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    per_day = firsts.groupBy(F.col("d0").alias("day")).agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    ).orderBy("day")


# --------------------------------------------------------------------------
# Q78 weekly retention cohorts (first-seen week x week offset).
@query(
    "q78_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events),
    j AS (
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
             a.user_id
      FROM active a JOIN firsts USING (user_id)),
    po AS (SELECT cohort_week, week_offset, COUNT(*) AS n_active
           FROM j GROUP BY cohort_week, week_offset),
    sz AS (SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week)
    SELECT po.cohort_week AS cohort_week, week_offset, n_cohort, n_active,
           CAST(ROUND(CAST(CAST(n_active AS DOUBLE) / n_cohort
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS retention
    FROM po JOIN sz ON po.cohort_week = sz.cohort_week
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly retention matrix: distinct (user, week) before the cohort "
        "join so repeat events never fan out; cohort sizes broadcast.",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import retention_cohorts

    return retention_cohorts(tables(spark, sf_dir)["events"])


# --------------------------------------------------------------------------
# Q80 time-weighted average per user (TimescaleDB time_weight('LOCF') shape):
# each observation holds until its successor; weights are exact µs gaps.
@query(
    "q80_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events),
    s AS (
      SELECT user_id, COUNT(*) AS n_obs, SUM(dur_us) AS d,
             SUM(CAST(v * dur_us AS DECIMAL(38,6))) AS w
      FROM o WHERE dur_us IS NOT NULL GROUP BY user_id)
    SELECT user_id, n_obs,
           CAST(ROUND(CAST(d / 1000000 AS DECIMAL(18,6)), 4) AS DOUBLE) AS span_s,
           CAST(ROUND(CAST(CAST(w AS DOUBLE) / CAST(d AS DOUBLE)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS twa
    FROM s
    """,
    doc="LOCF time-weighted mean from exact decimal µs-weighted sums; one "
        "window shuffle, order-independent aggregation.",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import time_weighted_avg

    return time_weighted_avg(tables(spark, sf_dir)["events"])


# --------------------------------------------------------------------------
# Q81 ordered 3-step sequence funnel: signup -> click -> purchase, each step
# strictly after the previous, all within 72h of the FIRST signup
# (MATCH_RECOGNIZE shape via earliest-chain min() stages — no combinatorial
# fan-out; see operators/timeseries.py::sequence_funnel).
@query(
    "q81_sequence_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT s1.user_id, t1, MIN(e.ts) AS t2
      FROM s1 JOIN events e ON e.user_id = s1.user_id
       AND e.event_type = 'click' AND e.ts > t1
       AND e.ts <= t1 + INTERVAL 72 HOURS
      GROUP BY s1.user_id, t1),
    s3 AS (
      SELECT s2.user_id
      FROM s2 JOIN events e ON e.user_id = s2.user_id
       AND e.event_type = 'purchase' AND e.ts > t2
       AND e.ts <= t1 + INTERVAL 72 HOURS
      GROUP BY s2.user_id),
    agg AS (
      SELECT CAST(date_trunc('day', t1) AS TIMESTAMP) AS day,
             COUNT(*) AS n_start, COUNT(s3.user_id) AS n_complete
      FROM s1 LEFT JOIN s3 USING (user_id)
      GROUP BY date_trunc('day', t1))
    SELECT day, n_start, n_complete,
           CAST(ROUND(CAST(CAST(n_complete AS DOUBLE) / n_start
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS rate
    FROM agg ORDER BY day
    """,
    doc="Earliest-chain ordered sequence match; per-stage min() aggregation "
        "keeps state at one row per key.",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import sequence_funnel

    return sequence_funnel(
        tables(spark, sf_dir)["events"],
        steps=["signup", "click", "purchase"], window="72 hours")


# --------------------------------------------------------------------------
# Q82 session path analysis: within-session event-type transition counts.
# Successor lookup shares sessionization's window spec, so the whole query
# is one user_id shuffle + a |types|²-bounded rollup.
@query(
    "q82_session_transitions",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    ), t AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type,
             session_id,
             LEAD(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_sess
      FROM s
    )
    SELECT from_type, to_type, COUNT(*) AS n
    FROM t WHERE to_type IS NOT NULL AND to_sess = session_id
    GROUP BY from_type, to_type ORDER BY from_type, to_type
    """,
    doc="Markov path bigrams per session; cross-session successors excluded "
        "via lead(session_id) on the shared window spec.",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sessionize import session_transitions

    return session_transitions(tables(spark, sf_dir)["events"])


# --------------------------------------------------------------------------
# Q84 mergeable distinct sketches (rows-only: DataSketches HLL binaries have
# no DuckDB analog; estimates are order-insensitive, so the result is
# deterministic — lossless-merge + 5%-accuracy invariants in test_approx).
@query("q84_sketch_distinct_rollup", oracle=None,
       check="A: HLL++ sketches — ±5%-vs-exact and merge ≡ whole-input "
             "bounds pinned in tests/test_approx.py; partial-agg rollup "
             "plan pinned in tests/test_plans.py")
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sketches import merge_sketches, sketch_distinct_by

    ev = tables(spark, sf_dir)["events"].select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "user_id",
    )
    daily = sketch_distinct_by(ev, ["week", "day"], "user_id")
    return (
        merge_sketches(daily, ["week"])
        .select("week", F.col("estimate").cast("long").alias("approx_users"))
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# Q85 daily value bands: exact interpolated percentiles per day (monitoring
# shape). Exact `percentile` (sort-based, no summation) is deterministic and
# interpolates identically to DuckDB's quantile_cont; 4dp rounding absorbs
# last-ulp arithmetic-order differences.
@query(
    "q85_daily_value_bands",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           CAST(ROUND(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)), 4) AS DOUBLE) AS p50,
           CAST(ROUND(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,6)), 4) AS DOUBLE) AS p95,
           CAST(ROUND(CAST(quantile_cont(value, 0.99) AS DECIMAL(18,6)), 4) AS DOUBLE) AS p99
    FROM events GROUP BY date_trunc('day', ts) ORDER BY day
    """,
    doc="Per-day p50/p95/p99 bands from exact interpolated percentiles.",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.queries.registry import r4c

    ev = tables(spark, sf_dir)["events"]
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"), pct.alias("_p"))
        .select(
            "day", "n",
            r4c(F.col("_p")[0]).alias("p50"),
            r4c(F.col("_p")[1]).alias("p95"),
            r4c(F.col("_p")[2]).alias("p99"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q86 event-type affinity: Jaccard overlap of user sets between event types
# (co-occurrence / market-basket shape). Reduced to distinct (type, user)
# FIRST, so the self-join fans out |types|² per user at most — never raw
# event volume; the pair rollup is bounded by |types|².
@query(
    "q86_type_affinity",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events
             WHERE value > 150),
    sz AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type),
    pb AS (
      SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_both
      FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
    SELECT t1, t2, n_both,
           CAST(ROUND(CAST(CAST(n_both AS DOUBLE) / (s1.n + s2.n - n_both)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS jaccard
    FROM pb JOIN sz s1 ON s1.event_type = t1 JOIN sz s2 ON s2.event_type = t2
    ORDER BY t1, t2
    """,
    doc="Pairwise user-set Jaccard between event types over HIGH-VALUE "
        "interactions (value > 150); distinct-first so repeat events "
        "never fan out. The unfiltered form was degenerate on this "
        "corpus — every user touches every type, so all ten Jaccards "
        "were identically 1.0 at every SF (the q326 class, caught by "
        "the round-8 audit sweep); the high-value cut (the q321 "
        "precedent) makes the user sets genuinely differ per type.",
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE per-user aggregation (collect_set of types, bounded by |types|),
    # then pair generation INSIDE the array — no user-level self-join, which
    # at 100 TB would re-shuffle the distinct table twice. 4 exchanges vs 8.
    ev = tables(spark, sf_dir)["events"].filter(F.col("value") > 150)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts"))
    pairs = per_user.select(
        F.explode(
            F.flatten(F.transform(
                F.col("ts"),
                lambda t1, i: F.transform(
                    F.slice(F.col("ts"), i + 2,
                            F.greatest(F.lit(0), F.size("ts") - i - 1)),
                    lambda t2: F.struct(t1.alias("t1"), t2.alias("t2")),
                ),
            ))
        ).alias("p")
    ).select("p.t1", "p.t2")
    both = pairs.groupBy("t1", "t2").agg(F.count("*").alias("n_both"))
    sz = per_user.select(F.explode("ts").alias("event_type")) \
        .groupBy("event_type").agg(F.count("*").alias("n"))
    jac = (F.col("n_both").cast("double")
           / (F.col("s1.n") + F.col("s2.n") - F.col("n_both"))).cast("decimal(18,6)")
    return (
        both.join(F.broadcast(sz.alias("s1")), F.col("t1") == F.col("s1.event_type"))
        .join(F.broadcast(sz.alias("s2")), F.col("t2") == F.col("s2.event_type"))
        .select("t1", "t2", "n_both",
                F.round(jac, 4).cast("double").alias("jaccard"))
        .orderBy("t1", "t2")
    )


# --------------------------------------------------------------------------
# Q87 distribution window functions: ntile / percent_rank / cume_dist per
# user over (value, event_id) — fully deterministic via the unique tiebreak.
@query(
    "q87_window_distributions",
    oracle="""
    SELECT event_id, user_id,
           ntile(4) OVER w AS quartile,
           CAST(ROUND(CAST(percent_rank() OVER w AS DECIMAL(18,6)), 4) AS DOUBLE) AS pr,
           CAST(ROUND(CAST(cume_dist() OVER w AS DECIMAL(18,6)), 4) AS DOUBLE) AS cd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    ORDER BY user_id, event_id LIMIT 1000
    """,
    doc="ntile/percent_rank/cume_dist on a unique ordering (engine-portable).",
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        tables(spark, sf_dir)["events"]
        .select(
            "event_id", "user_id",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w).cast("decimal(18,6)"), 4)
            .cast("double").alias("pr"),
            F.round(F.cume_dist().over(w).cast("decimal(18,6)"), 4)
            .cast("double").alias("cd"),
        )
        .orderBy("user_id", "event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q88 ratio-to-report: each event type's share of its day's traffic —
# aggregate first (|days|x|types| rows), window over the TINY aggregate.
@query(
    "q88_share_of_day",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY date_trunc('day', ts), event_type)
    SELECT day, event_type, n,
           CAST(ROUND(CAST(CAST(n AS DOUBLE)
                           / SUM(n) OVER (PARTITION BY day)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS share
    FROM d ORDER BY day, event_type
    """,
    doc="Ratio-to-report window over the pre-aggregated day x type table — "
        "the window never touches raw rows.",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        tables(spark, sf_dir)["events"]
        .groupBy(F.date_trunc("day", "ts").alias("day"),
                 "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("day")
    share = (F.col("n").cast("double") / F.sum("n").over(w)).cast("decimal(18,6)")
    return d.select(
        "day", "event_type", "n",
        F.round(share, 4).cast("double").alias("share"),
    ).orderBy("day", "event_type")


# --------------------------------------------------------------------------
# Q98 replication drift classification (operators/cdc.py::table_diff):
# diff the source snapshot against the changelog-applied replica state.
# Expected drift: every %3==0 key updated (unless deleted), every %10==7
# key deleted, plus planted "replica-only" keys (negated ids) = inserts.
# o_totalprice pre-casts to DECIMAL(18,2) because raw double->string is
# engine-specific; the CDC bump rounds to 2dp so the cast is lossless.
_DIFF_COMPARE = ["o_custkey", "o_orderstatus", "price2", "o_orderdate", "o_orderpriority"]


@query(
    "q98_table_diff",
    oracle=f"""
    WITH {CDC_ORDERS_CTE},
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY lsn DESC) AS rn
      FROM cdc_orders),
    applied AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM ranked WHERE rn = 1 AND op <> 'd'),
    after_t AS (
      SELECT * FROM applied
      UNION ALL
      SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 5),
    bh AS (
      SELECT o_orderkey, md5(concat_ws('|',
        COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>'),
        COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderdate AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderpriority AS VARCHAR), '<NULL>'))) AS bh
      FROM orders),
    ah AS (
      SELECT o_orderkey, md5(concat_ws('|',
        COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>'),
        COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderdate AS VARCHAR), '<NULL>'),
        COALESCE(CAST(o_orderpriority AS VARCHAR), '<NULL>'))) AS ah
      FROM after_t)
    SELECT COALESCE(bh.o_orderkey, ah.o_orderkey) AS o_orderkey,
           CASE WHEN bh.bh IS NULL THEN 'insert'
                WHEN ah.ah IS NULL THEN 'delete'
                ELSE 'update' END AS change
    FROM bh FULL OUTER JOIN ah ON bh.o_orderkey = ah.o_orderkey
    WHERE bh.bh IS NULL OR ah.ah IS NULL OR bh.bh <> ah.ah
    ORDER BY o_orderkey LIMIT 1000
    """,
    doc="Source-vs-replica drift: per-key insert/update/delete from "
        "fingerprint full outer join; hashes shuffle, rows don't.",
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import table_diff

    o = tables(spark, sf_dir)["orders"]
    dec2 = F.col("o_totalprice").cast("decimal(18,2)").alias("price2")
    before = o.select("o_orderkey", "o_custkey", "o_orderstatus", dec2,
                      "o_orderdate", "o_orderpriority")
    applied = apply_changelog(
        derive_cdc_orders(o), ["o_orderkey"], order_col="lsn", op_col="op")
    planted = o.filter(F.col("o_orderkey") % 97 == 5).withColumn(
        "o_orderkey", -F.col("o_orderkey"))
    after = (
        applied.select("o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice", "o_orderdate", "o_orderpriority")
        .unionByName(planted.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", dec2,
                "o_orderdate", "o_orderpriority")
    )
    return (
        table_diff(before, after, ["o_orderkey"], _DIFF_COMPARE)
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q99 order-insensitive replication checksums (cdc.py::table_checksum):
# per-bucket md5-word sums any engine can recompute to locate divergence.
_Q99_FP = """md5(concat_ws('|',
      COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>'),
      COALESCE(CAST(o_orderstatus AS VARCHAR), '<NULL>'),
      COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '<NULL>'),
      COALESCE(CAST(o_orderdate AS VARCHAR), '<NULL>'),
      COALESCE(CAST(o_orderpriority AS VARCHAR), '<NULL>')))"""


def _q99_word(start: int) -> str:
    return " + ".join(
        f"{16 ** (3 - i)} * (strpos('0123456789abcdef', substr(_fp, {start + i}, 1)) - 1)"
        for i in range(4)
    )


@query(
    "q99_table_checksum",
    oracle=f"""
    WITH fp AS (
      SELECT CAST(o_orderkey % 16 AS INT) AS bucket, {_Q99_FP} AS _fp
      FROM orders)
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM({_q99_word(1)}) AS BIGINT) AS w1,
           CAST(SUM({_q99_word(5)}) AS BIGINT) AS w2,
           CAST(SUM({_q99_word(9)}) AS BIGINT) AS w3,
           CAST(SUM({_q99_word(13)}) AS BIGINT) AS w4
    FROM fp GROUP BY bucket ORDER BY bucket
    """,
    doc="Per-bucket order-insensitive table fingerprints: commutative sums "
        "of md5 16-bit words — replicas compare 16 rows, not the table.",
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import table_checksum

    o = tables(spark, sf_dir)["orders"]
    dec2 = F.col("o_totalprice").cast("decimal(18,2)").alias("price2")
    prepared = o.select("o_orderkey", "o_custkey", "o_orderstatus", dec2,
                        "o_orderdate", "o_orderpriority")
    return table_checksum(prepared, "o_orderkey", _DIFF_COMPARE).orderBy("bucket")


# --------------------------------------------------------------------------
# Q101 dynamic-gap session windows: purchases hold sessions open 45 min,
# everything else 30. The Spark side uses NATIVE F.session_window with a
# per-row gap expression (Catalyst's session merge), the oracle the
# portable running-max-extent formulation — sessionize.py::sessionize_dynamic
# implements the same batch shape for engines without native sessions.
@query(
    "q101_dynamic_sessions",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 45 MINUTE
                       ELSE INTERVAL 30 MINUTE END AS endt
      FROM events),
    y AS (
      SELECT user_id, ts,
             MAX(endt) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
      FROM x),
    z AS (
      SELECT user_id, ts,
             CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
                  THEN 1 ELSE 0 END AS brk
      FROM y),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM z)
    SELECT user_id, MIN(ts) AS start_ts, COUNT(*) AS n
    FROM s GROUP BY user_id, sid ORDER BY user_id, start_ts
    """,
    doc="Dynamic-gap sessionization: native session_window(gap expr) == "
        "running-max-extent formulation (merge rule: start < end).",
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit("45 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start_ts"), "n")
        .orderBy("user_id", "start_ts")
    )


# --------------------------------------------------------------------------
# Q104 time-interval RANGE frame: trailing 1-hour count/sum per user with
# NO self-join and NO window explode — the frame is evaluated over one
# per-user sort, peers included by value (ties share a frame, so the
# result is deterministic without a tiebreak in the frame ordering).
_Q104 = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_1h,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 2)
            AS DOUBLE) AS sv_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id LIMIT 1000
"""


@query(
    "q104_time_range_frame",
    oracle=_Q104,
    doc="Trailing-hour windowed aggregates via RANGE INTERVAL frame — "
        "identical SQL text in both dialects.",
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q104)


# --------------------------------------------------------------------------
# Q111 running distinct count per key. Spark has no COUNT(DISTINCT) OVER;
# the native form is size(collect_set() OVER w) — state is the set itself,
# bounded by event_type cardinality (5 here), NOT by rows seen, so the
# window is cheap at any scale. The oracle uses the portable first-
# occurrence-flag formulation (row_number=1 → running sum), which is also
# the right formulation when the distinct domain is unbounded.
_Q111_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS INT) AS n_types
FROM flagged ORDER BY user_id, event_id LIMIT 1000
"""


@query(
    "q111_running_distinct",
    oracle=_Q111_ORACLE,
    doc="Running per-user distinct event-type count: native collect_set "
        "window (bounded-domain state) vs the portable first-flag form.",
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "user_id", "event_id",
            F.size(F.collect_set("event_type").over(w)).alias("n_types"),
        )
        .orderBy("user_id", "event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q112 sliding exact median: Spark's percentile() is window-capable, so the
# trailing-7-rows median needs no self-join / no explode — one per-user
# sort, same as any other window agg. DuckDB spells it quantile_cont.
@query(
    "q112_sliding_median",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(CAST(quantile_cont(value, 0.5) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS med7
    FROM events ORDER BY user_id, event_id LIMIT 1000
    """,
    doc="Trailing-window interpolated median over per-user event values "
        "(percentile() OVER frame ≡ DuckDB quantile_cont OVER frame).",
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    med = F.percentile("value", F.lit(0.5)).over(w)
    return (
        e.select(
            "user_id", "event_id",
            F.round(med.cast("decimal(18,6)"), 4).cast("double").alias("med7"),
        )
        .orderBy("user_id", "event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q115 batch MERGE INTO semantics via operators/cdc.merge_apply: one full-
# outer join on the key; per-row fate (update / delete / insert / keep) is
# pure projection. Target = stale snapshot (keys % 7 <> 0), source = fresh
# high-value extract with a 5% price bump; matched 'P'-status rows deleted.
@query(
    "q115_merge_upsert",
    oracle="""
    WITH t AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
    s AS (SELECT * FROM orders WHERE o_totalprice > 50000),
    j AS (
      SELECT t.o_orderkey AS tk, s.o_orderkey AS sk,
             t.o_custkey AS tc, s.o_custkey AS sc,
             t.o_orderstatus AS tst, s.o_orderstatus AS sst,
             t.o_totalprice AS tp, s.o_totalprice AS sp,
             t.o_orderdate AS td, s.o_orderdate AS sd,
             t.o_orderpriority AS tpr, s.o_orderpriority AS spr
      FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey)
    SELECT COALESCE(tk, sk) AS o_orderkey,
           CASE WHEN tk IS NULL THEN sc ELSE tc END AS o_custkey,
           CASE WHEN tk IS NULL THEN sst ELSE tst END AS o_orderstatus,
           CASE WHEN tk IS NOT NULL AND sk IS NOT NULL
                THEN CAST(ROUND(CAST(sp * 1.05 AS DECIMAL(18,6)), 4) AS DOUBLE)
                WHEN tk IS NULL THEN sp ELSE tp END AS o_totalprice,
           CASE WHEN tk IS NULL THEN sd ELSE td END AS o_orderdate,
           CASE WHEN tk IS NULL THEN spr ELSE tpr END AS o_orderpriority
    FROM j
    WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND sst = 'P')
    ORDER BY o_orderkey LIMIT 1000
    """,
    doc="MERGE INTO as a full-outer-join apply: matched rows update (price "
        "bump), matched 'P' rows delete, source-only rows insert, "
        "target-only rows persist.",
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import merge_apply

    o = tables(spark, sf_dir)["orders"]
    target = o.filter(F.col("o_orderkey") % 7 != 0)
    source = o.filter(F.col("o_totalprice") > 50000)
    merged = merge_apply(
        target,
        source,
        ["o_orderkey"],
        update_cols={
            "o_totalprice": F.expr(
                "CAST(ROUND(CAST(s.o_totalprice * 1.05 AS DECIMAL(18,6)), 4) AS DOUBLE)"
            )
        },
        delete_condition=F.expr("s.o_orderstatus = 'P'"),
    )
    return merged.orderBy("o_orderkey").limit(1000)


# --------------------------------------------------------------------------
# Q116 interval union (coverage) per user: each event opens a 5-minute
# activity interval; overlapping intervals merge (gaps-and-islands via the
# running-max-end rule, one per-user window sort — never an interval self-
# join); output is islands count + exact covered time. All arithmetic in
# bigint microseconds, so the result is exact in both engines.
_Q116 = """
WITH iv AS (
  SELECT user_id, {US} AS s, {US} + 300000000 AS e FROM events),
x AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv),
y AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END AS brk
  FROM x),
z AS (
  SELECT user_id, s, e,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM y),
isl AS (
  SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end
  FROM z GROUP BY user_id, island)
SELECT user_id, CAST(COUNT(*) AS INT) AS n_islands,
       CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id ORDER BY user_id
"""


@query(
    "q116_interval_union",
    oracle=_Q116.format(US="epoch_us(ts)"),
    doc="Merged-interval coverage per user (interval union length): "
        "gaps-and-islands running-max-end, exact microsecond arithmetic.",
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q116.format(US="unix_micros(CAST(ts AS TIMESTAMP))"))


# --------------------------------------------------------------------------
# Q117 OHLC bars: open/high/low/close/volume per (day, event_type). The
# open/close extraction is first_value/last_value over the full-partition
# frame — identical SQL text in both dialects, one shuffle on the bar key.
_Q117 = """
WITH w AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
         FIRST_VALUE(value) OVER b AS open,
         LAST_VALUE(value)  OVER b AS close,
         value, event_id
  FROM events
  WINDOW b AS (PARTITION BY CAST(date_trunc('day', ts) AS DATE), event_type
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT d, event_type, MIN(open) AS open, MAX(value) AS high, MIN(value) AS low,
       MIN(close) AS close, CAST(COUNT(*) AS INT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vol
FROM w GROUP BY d, event_type ORDER BY d, event_type
"""


@query(
    "q117_ohlc_bars",
    oracle=_Q117,
    doc="OHLC candlestick bars per (day, event_type): first/last_value over "
        "the bar frame + min/max/volume rollup.",
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(spark, sf_dir, _Q117)


# --------------------------------------------------------------------------
# Q127 peak concurrent sessions per hour: q48's sessions -> inclusive
# [start, end] intervals -> two-level sweep line (operators/timeseries.py::
# interval_concurrency). The global boundary sort the textbook sweep needs
# is split into a per-hour partitioned window + a carry scan over the
# aggregated per-hour nets, so the raw data shuffles once on the hour key.
_Q127_ORACLE = """
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM x
), iv AS (
  SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
  FROM s GROUP BY user_id, session_id
), b AS (
  SELECT st AS ts, 1 AS d FROM iv UNION ALL SELECT en AS ts, -1 AS d FROM iv
), r AS (
  SELECT date_trunc('hour', ts) AS h, d,
         SUM(d) OVER (PARTITION BY date_trunc('hour', ts)
           ORDER BY ts, d DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM b
), p AS (
  SELECT h, MAX(run) AS peak_local, SUM(d) AS net FROM r GROUP BY h
), c AS (
  SELECT h, peak_local,
         COALESCE(SUM(net) OVER (ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
  FROM p)
SELECT h, CAST(carry + peak_local AS BIGINT) AS peak FROM c ORDER BY h
"""


@query(
    "q127_session_concurrency",
    oracle=_Q127_ORACLE,
    doc="Peak concurrent sessions per hour: sessionize -> interval sweep "
        "line, two-level (per-hour window + aggregated carry scan) so no "
        "single-partition global sort exists at any scale.",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sessionize import sessionize
    from inspectadb_spark.operators.timeseries import interval_concurrency

    e = tables(spark, sf_dir)["events"]
    iv = (
        sessionize(e, "user_id", "ts", "event_id", "INTERVAL 30 MINUTE")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    return (
        interval_concurrency(iv, "st", "en", "hour")
        .withColumnRenamed("bucket", "h")
    )


# --------------------------------------------------------------------------
# Q128 nearest-in-time enrichment: for each purchase, the click by the same
# user minimizing |Δts| (ties -> the earlier click; equal-ts clicks break on
# event_id). Same union-merge single-sort shape as the as-of join, with the
# "next" candidate carried backward by first(ignorenulls) over the same sort.
_Q128_ORACLE = """
WITH u AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w_prev AS prev_id,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w_prev AS prev_ts,
         FIRST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w_next AS next_id,
         FIRST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w_next AS next_ts
  FROM u
  WINDOW
    w_prev AS (PARTITION BY user_id
               ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        CASE WHEN event_type = 'click' THEN event_id END
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id
               ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        CASE WHEN event_type = 'click' THEN event_id END
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_id,
       CASE WHEN next_ts IS NULL
              OR (prev_ts IS NOT NULL
                  AND epoch_us(ts) - epoch_us(prev_ts)
                      <= epoch_us(next_ts) - epoch_us(ts))
            THEN prev_id ELSE next_id END AS nearest_click
FROM m WHERE event_type = 'purchase' ORDER BY event_id
"""


@query(
    "q128_nearest_click",
    oracle=_Q128_ORACLE,
    doc="Nearest-in-time join (pandas merge_asof direction='nearest' "
        "semantics): one shuffle + one sort, prev carried forward / next "
        "carried backward, pure-microsecond distance decision.",
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.asof import nearest_join

    e = tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        nearest_join(clicks, purchases, ["user_id"], "ts", "ts",
                     ["click_id"], tiebreak="click_id")
        .select("event_id", F.col("click_id").alias("nearest_click"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q140 gap-filled resampling with LINEAR interpolation (the smooth-fill
# sibling of q70): interior gaps get prev + (next-prev)*elapsed/gap from
# 4dp-pinned neighbour means; the weight is a ratio of exact epoch-second
# integers, so the single double expression evaluates identically in both
# engines before the final 4dp pin.
@query(
    "q140_resample_interpolate",
    oracle=f"""
    WITH actual AS (
      SELECT user_id AS k, date_trunc('day', ts) AS bucket,
             CAST(ROUND(CAST(CAST(SUM({dec('value')}) AS DOUBLE) / COUNT(*)
                             AS DECIMAL(18,6)), 4) AS DOUBLE) AS v
      FROM events GROUP BY user_id, date_trunc('day', ts)),
    grid AS (
      SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM (SELECT k, MIN(bucket) AS lo, MAX(bucket) AS hi FROM actual GROUP BY k)),
    j AS (
      SELECT grid.k, grid.bucket, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN grid.bucket END IGNORE NULLS)
               OVER wb AS pb,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN grid.bucket END IGNORE NULLS)
               OVER wf AS nb
      FROM grid LEFT JOIN actual ON grid.k = actual.k AND grid.bucket = actual.bucket
      WINDOW wb AS (PARTITION BY grid.k ORDER BY grid.bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY grid.k ORDER BY grid.bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT k AS user_id, bucket,
           CASE WHEN v IS NOT NULL THEN v
                ELSE CAST(ROUND(CAST(
                       pv + (nv - pv)
                          * (CAST(epoch(bucket) - epoch(pb) AS DOUBLE)
                             / CAST(epoch(nb) - epoch(pb) AS DOUBLE))
                     AS DECIMAL(18,6)), 4) AS DOUBLE) END AS v_interp,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM j
    """,
    doc="Per-user daily grid with linear interpolation of interior gaps "
        "(exact epoch-second weights, 4dp-pinned endpoints).",
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import resample_interpolate

    return resample_interpolate(tables(spark, sf_dir)["events"], step="1 day")


# --------------------------------------------------------------------------
# Q150 FORWARD as-of with tolerance (the q13 mirror): each click is
# enriched with the NEXT purchase by the same user within one hour —
# pandas merge_asof(direction='forward', tolerance=1h) semantics. Oracle
# uses DuckDB's native ASOF (direction from the inequality) + post-match
# tolerance CASE, which is exactly how the operator applies it.
@query(
    "q150_asof_forward",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, ts AS pts, value FROM events
      WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN p.pts IS NOT NULL
                 AND epoch_us(p.pts) - epoch_us(c.ts) <= 3600000000
                THEN p.value END AS p_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND c.ts <= p.pts
    ORDER BY c.event_id
    """,
    doc="Forward as-of join with 1-hour tolerance: next purchase value per "
        "click; union-merge formulation, one shuffle + one sort.",
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.asof import asof_join

    ev = tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("p_value"))
    return asof_join(
        purch, clicks, ["user_id"], "ts", "ts", ["p_value"],
        direction="forward", tolerance_us=3_600_000_000,
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Q151 last-touch revenue attribution: each purchase is attributed to the
# latest NON-purchase event by the same user within 24 h (backward as-of +
# tolerance), then revenue rolls up per attributed touch type. The classic
# marketing-ETL composite, built entirely from the as-of operator.
@query(
    "q151_attribution",
    oracle=f"""
    WITH t AS (
      SELECT user_id, ts AS tts, event_type AS touch_type FROM events
      WHERE event_type <> 'purchase'),
    p AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT CASE WHEN t.tts IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(t.tts) <= 86400000000
                  THEN t.touch_type END AS touch_type,
             p.value
      FROM p ASOF LEFT JOIN t
        ON p.user_id = t.user_id AND p.ts >= t.tts)
    SELECT touch_type, COUNT(*) AS n_purchases,
           {dsum('value', 'revenue')}
    FROM m GROUP BY touch_type ORDER BY touch_type NULLS FIRST
    """,
    doc="Last-touch attribution: backward as-of (24 h tolerance) from "
        "purchases to the latest prior non-purchase event, revenue rollup.",
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.asof import asof_join

    ev = tables(spark, sf_dir)["events"]
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("touch_type"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    attributed = asof_join(
        touches, purchases, ["user_id"], "ts", "ts", ["touch_type"],
        tolerance_us=86_400_000_000,
    )
    return (
        attributed.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.expr(dec("value"))).cast("double").alias("revenue"),
        )
        .orderBy(F.col("touch_type").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Q152 gaps-and-islands: per-user consecutive-active-day streaks via the
# anchor-date trick — one user-keyed shuffle shared by the distinct, the
# window and both rollups.
@query(
    "q152_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    g AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS grp
      FROM d),
    s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY user_id, grp)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    doc="Longest consecutive-active-day streak per user (gaps-and-islands "
        "anchor-date formulation).",
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import activity_streaks

    return activity_streaks(tables(spark, sf_dir)["events"]).orderBy("user_id")


# --------------------------------------------------------------------------
# Q160 calendar-dimension build + gap-inclusive daily activity: the
# warehouse date-dim pattern — span from ONE 1-row agg, sequence explode
# (span-sized), left join of daily counts so zero-activity days surface.
@query(
    "q160_calendar_dim",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
    days AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span),
    cnt AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY 1)
    SELECT day,
           CAST(dayofweek(day) + 1 AS INT) AS dow,
           CAST(weekofyear(day) AS INT) AS week,
           CAST(month(day) AS INT) AS month,
           CAST(quarter(day) AS INT) AS quarter,
           dayofweek(day) IN (0, 6) AS is_weekend,
           COALESCE(n, 0) AS n_events
    FROM days LEFT JOIN cnt USING (day) ORDER BY day
    """,
    doc="Calendar dimension spanning the event range (ISO weeks, Spark "
        "dow convention) with gap-inclusive daily counts.",
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import calendar_dim

    ev = tables(spark, sf_dir)["events"]
    cal = calendar_dim(ev)
    cnt = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"))
    return (
        cal.join(cnt, "day", "left")
        .select("day", "dow", "week", "month", "quarter", "is_weekend",
                F.coalesce("n", F.lit(0)).alias("n_events"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q162 run-length state compression: consecutive same-type events per user
# collapse to runs — the change-log compression step before archiving.
# Output size = number of state CHANGES; one (user, ts) sort end-to-end.
@query(
    "q162_rle_compress",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR event_type <> LAG(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, ts, event_type,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_id
      FROM x)
    SELECT user_id, run_id, event_type,
           MIN(ts) AS ts_start, MAX(ts) AS ts_end, COUNT(*) AS n
    FROM r GROUP BY user_id, run_id, event_type
    ORDER BY user_id, run_id
    """,
    doc="Run-length encoding of the per-user event-type stream "
        "(state-change-log compression).",
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import rle_compress

    return rle_compress(
        tables(spark, sf_dir)["events"], "user_id", "event_type", "ts",
        "event_id",
    ).orderBy("user_id", "run_id")


# --------------------------------------------------------------------------
# Q163 LINEAR multi-touch attribution (the q151 last-touch sibling): every
# non-purchase event within the 24 h before a purchase gets an equal
# revenue share. Shares are integer micro-cents with per-purchase floor
# division — exact and engine-portable; the window join is user-equi +
# time-band filter (the q60 range-join family), never a cartesian.
@query(
    "q163_linear_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, ts AS tts, event_type AS touch_type FROM events
      WHERE event_type <> 'purchase'),
    p AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT p.event_id, p.cents, t.touch_type
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.tts <= p.ts
       AND epoch_us(p.ts) - epoch_us(t.tts) <= 86400000000),
    n AS (SELECT event_id, COUNT(*) AS n_t FROM j GROUP BY event_id),
    s AS (SELECT touch_type, cents * 1000000 // n_t AS share
          FROM j JOIN n USING (event_id))
    SELECT touch_type, COUNT(*) AS n_touches,
           CAST(SUM(share) AS BIGINT) AS attributed_microcents
    FROM s GROUP BY touch_type ORDER BY touch_type
    """,
    doc="Linear multi-touch attribution over a 24 h window; equal integer "
        "micro-cent shares per touch, floor-division exact.",
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
    j = p.join(t, "user_id").filter(
        (F.col("tts") <= F.col("ts"))
        & (F.expr("unix_micros(CAST(ts AS TIMESTAMP))"
                  " - unix_micros(CAST(tts AS TIMESTAMP))")
           <= 86_400_000_000)
    ).select("event_id", "cents", "touch_type")
    n = j.groupBy("event_id").agg(F.count("*").alias("n_t"))
    s = j.join(n, "event_id").select(
        "touch_type", F.expr("cents * 1000000 DIV n_t").alias("share"))
    return (
        s.groupBy("touch_type")
        .agg(F.count("*").alias("n_touches"),
             F.sum("share").alias("attributed_microcents"))
        .orderBy("touch_type")
    )


# --------------------------------------------------------------------------
# Q164 session landing/exit report: per session the first and last event
# type + bounce flag (single-event sessions), rolled up per (landing,
# exit) pair — all windows share the sessionize partitioning, so the
# whole report is one user-keyed shuffle + the |types|²-bounded rollup.
@query(
    "q164_session_landing",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM x),
    t AS (
      SELECT user_id, session_id,
             FIRST_VALUE(event_type) OVER w AS landing,
             LAST_VALUE(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_type,
             COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_ev
      FROM s
      WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)),
    g AS (SELECT DISTINCT user_id, session_id, landing, exit_type, n_ev FROM t)
    SELECT landing, exit_type, COUNT(*) AS n_sessions,
           COUNT(CASE WHEN n_ev = 1 THEN 1 END) AS n_bounce
    FROM g GROUP BY landing, exit_type ORDER BY landing, exit_type
    """,
    doc="Per-session landing/exit types + bounce counts; windows share the "
        "sessionize partitioning (one user shuffle).",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(tables(spark, sf_dir)["events"])
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = s.select(
        "user_id", "session_id",
        F.first("event_type").over(w).alias("landing"),
        F.last("event_type").over(wfull).alias("exit_type"),
        F.count("*").over(Window.partitionBy("user_id", "session_id"))
        .alias("n_ev"),
    ).distinct()
    return (
        t.groupBy("landing", "exit_type")
        .agg(F.count("*").alias("n_sessions"),
             F.count(F.when(F.col("n_ev") == 1, 1)).alias("n_bounce"))
        .orderBy("landing", "exit_type")
    )


# --------------------------------------------------------------------------
# Q165 time-to-convert distribution: per signup cohort day, exact p50/p90
# of the signup→first-purchase delay. Delays are exact integer
# microseconds; percentile interpolation runs on those integers and is
# 4dp-pinned — the q24 exact-percentile machinery applied to a funnel.
@query(
    "q165_time_to_convert",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE e.event_type = 'purchase' AND e.ts > su.t0
      GROUP BY e.user_id),
    d AS (
      SELECT CAST(su.t0 AS DATE) AS cohort_day,
             epoch_us(fp.t1) - epoch_us(su.t0) AS delay_us
      FROM su JOIN fp ON su.user_id = fp.user_id)
    SELECT cohort_day, COUNT(*) AS n_converted,
           CAST(ROUND(CAST(quantile_cont(delay_us, 0.5) / 3600000000.0
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS p50_hours,
           CAST(ROUND(CAST(quantile_cont(delay_us, 0.9) / 3600000000.0
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS p90_hours
    FROM d GROUP BY cohort_day ORDER BY cohort_day
    """,
    doc="Signup→purchase conversion-delay percentiles per cohort day; "
        "exact integer-µs delays, interpolated percentiles, 4dp-pinned.",
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    su = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t0"))
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.first("t0").alias("t0"))
    )
    d = fp.select(
        F.col("t0").cast("date").alias("cohort_day"),
        F.expr("unix_micros(CAST(t1 AS TIMESTAMP))"
               " - unix_micros(CAST(t0 AS TIMESTAMP))").alias("delay_us"),
    )
    def pq(p):
        return F.round(
            (F.expr(f"percentile(delay_us, {p})") / F.lit(3600000000.0))
            .cast("decimal(18,6)"), 4
        ).cast("double")
    return (
        d.groupBy("cohort_day")
        .agg(F.count("*").alias("n_converted"),
             pq(0.5).alias("p50_hours"), pq(0.9).alias("p90_hours"))
        .orderBy("cohort_day")
    )


# --------------------------------------------------------------------------
# Q168 event-pattern detection (MATCH_RECOGNIZE-lite): each session's
# type sequence collapses to an ordered letter string (bounded by session
# length), and patterns are plain regexes over that string — subsequence,
# adjacency and repetition patterns all express directly. One user-keyed
# shuffle for sessionize+agg; the pattern scan is a projection.
_Q168_PATTERNS = [
    ("view_click_purchase", "v.*c.*p"),   # ordered subsequence
    ("immediate_bounce_error", "^e$"),    # session is a single error
    ("repeat_views", "v{3,}"),            # ≥3 consecutive views
]


@query(
    "q168_event_pattern",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM x),
    seq AS (
      SELECT user_id, session_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS sig
      FROM s GROUP BY user_id, session_id),
    pats AS (
      SELECT * FROM (VALUES
        ('view_click_purchase', 'v.*c.*p'),
        ('immediate_bounce_error', '^e$'),
        ('repeat_views', 'v{3,}')) p(pattern, re))
    SELECT pattern,
           COUNT(CASE WHEN regexp_matches(sig, re) THEN 1 END) AS n_match,
           COUNT(*) AS n_sessions
    FROM seq CROSS JOIN pats
    GROUP BY pattern ORDER BY pattern
    """,
    doc="MATCH_RECOGNIZE-lite: session type-sequences as letter strings, "
        "regex patterns for subsequence/bounce/repetition detection.",
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(tables(spark, sf_dir)["events"])
    s.createOrReplaceTempView("_q168_sessions")
    seq = spark.sql("""
        SELECT user_id, session_id,
               listagg(substr(event_type, 1, 1), '')
                 WITHIN GROUP (ORDER BY ts, event_id) AS sig
        FROM _q168_sessions GROUP BY user_id, session_id
    """)
    pats = spark.createDataFrame(_Q168_PATTERNS, ["pattern", "re"])
    return (
        seq.crossJoin(F.broadcast(pats))
        .groupBy("pattern")
        .agg(
            F.count(F.when(F.expr("regexp_like(sig, re)"), 1)).alias("n_match"),
            F.count("*").alias("n_sessions"),
        )
        .orderBy("pattern")
    )


# --------------------------------------------------------------------------
# Q171 time-travel (AS OF version) over the CDC history: reconstruct the
# orders table as of lsn = max(lsn)/2 — latest row ≤ the snapshot version
# per key, deletes filtered — then aggregate the snapshot. The temporal-
# query pattern every SCD2/changelog store needs; one key-shuffle max_by.
@query(
    "q171_time_travel",
    oracle=f"""
    WITH {CDC_ORDERS_CTE},
    l AS (SELECT MAX(lsn) // 2 AS v FROM cdc_orders),
    g AS (
      SELECT o_orderkey,
             arg_max(op, lsn) AS op,
             arg_max(o_orderstatus, lsn) AS st,
             arg_max(o_totalprice, lsn) AS pr
      FROM cdc_orders CROSS JOIN l WHERE lsn <= v
      GROUP BY o_orderkey)
    SELECT st AS o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(pr * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM g WHERE op <> 'd'
    GROUP BY st ORDER BY st
    """,
    doc="AS-OF-version snapshot reconstruction from the CDC log (latest "
        "row ≤ version per key, deletes dropped), aggregated.",
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdc = derive_cdc_orders(tables(spark, sf_dir)["orders"])
    l = cdc.agg(F.expr("MAX(lsn) DIV 2").alias("v"))
    g = (
        cdc.join(F.broadcast(l))
        .filter(F.col("lsn") <= F.col("v"))
        .groupBy("o_orderkey")
        .agg(
            F.expr("max_by(op, lsn)").alias("op"),
            F.expr("max_by(o_orderstatus, lsn)").alias("st"),
            F.expr("max_by(o_totalprice, lsn)").alias("pr"),
        )
    )
    return (
        g.filter(F.col("op") != "d")
        .groupBy(F.col("st").alias("o_orderstatus"))
        .agg(F.count("*").alias("n"),
             F.expr("CAST(SUM(CAST(ROUND(pr * 100) AS BIGINT)) AS BIGINT)")
             .alias("cents"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q172 period-over-period report: daily purchase revenue vs the same day
# one week earlier, over the GAP-COMPLETE calendar (q160's dimension) so
# lag(7) always means "7 calendar days", never "7 active days". Integer
# cents + ppm change — exact on both engines.
@query(
    "q172_period_over_period",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
    days AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span),
    rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    series AS (
      SELECT day, COALESCE(cents, 0) AS cents FROM days LEFT JOIN rev USING (day)),
    lagged AS (
      SELECT day, cents,
             LAG(cents, 7) OVER (ORDER BY day) AS prev_cents
      FROM series)
    SELECT day, CAST(cents AS BIGINT) AS cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           CAST(CASE WHEN prev_cents > 0
                     THEN (cents - prev_cents) * 1000000 // prev_cents
                END AS BIGINT) AS change_ppm
    FROM lagged ORDER BY day
    """,
    doc="Week-over-week daily revenue deltas over the gap-complete "
        "calendar; integer cents and ppm change.",
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import calendar_dim

    ev = tables(spark, sf_dir)["events"]
    days = calendar_dim(ev).select("day")
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))").alias("cents"))
    )
    series = days.join(rev, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0)).alias("cents"))
    w = Window.orderBy("day")
    lagged = series.withColumn("prev_cents", F.lag("cents", 7).over(w))
    return lagged.select(
        "day", F.col("cents").cast("bigint").alias("cents"),
        F.col("prev_cents").cast("bigint").alias("prev_cents"),
        F.expr("CAST(CASE WHEN prev_cents > 0 THEN"
               " (cents - prev_cents) * 1000000 DIV prev_cents END AS BIGINT)")
        .alias("change_ppm"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Q178 top-k per group WITH TIES (RANK semantics): k-th-place ties all
# survive — the semantic sibling of q31's ROW_NUMBER top-k, and a
# different window-group-limit specialization.
@query(
    "q178_topk_with_ties",
    oracle="""
    SELECT event_type, day, n
    FROM (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
             RANK() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC)
               AS rk
      FROM events GROUP BY event_type, day)
    WHERE rk <= 3 ORDER BY event_type, n DESC, day
    """,
    doc="Top-3 busiest days per event type WITH ties (RANK, not "
        "ROW_NUMBER): k-th-place ties all included.",
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"))
    return (
        daily.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "day", "n")
        .orderBy("event_type", F.desc("n"), "day")
    )


# --------------------------------------------------------------------------
# Q179 cap-anchored sessionization: max-gap AND max-duration-from-start —
# a sequential recurrence no window closed form expresses. Spark side is
# the sanctioned applyInPandas escape hatch (one user shuffle, per-group
# Arrow pass); the oracle expresses the SAME recurrence as a recursive
# CTE, so even this operator is hash-verified.
@query(
    "q179_capped_sessions",
    oracle="""
    WITH RECURSIVE o AS (
      SELECT user_id, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events),
    r AS (
      SELECT user_id, rn, ts, CAST(0 AS BIGINT) AS session_id,
             ts AS session_start
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.ts,
             CASE WHEN o.ts - r.ts > INTERVAL 30 MINUTE
                    OR o.ts - r.session_start > INTERVAL 4 HOUR
                  THEN r.session_id + 1 ELSE r.session_id END,
             CASE WHEN o.ts - r.ts > INTERVAL 30 MINUTE
                    OR o.ts - r.session_start > INTERVAL 4 HOUR
                  THEN o.ts ELSE r.session_start END
      FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS ts_start, MAX(ts) AS ts_end
    FROM r GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Gap + 4 h-cap sessionization (sequential recurrence): "
        "applyInPandas vs a recursive-CTE oracle.",
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sessionize import capped_sessionize

    return capped_sessionize(
        tables(spark, sf_dir)["events"], gap_s=1800, cap_s=14400
    ).orderBy("user_id", "session_id")


# --------------------------------------------------------------------------
# Q180 incremental view maintenance (join delta rule): the delta of the
# orders⋈lineitem view under inserts, computed as ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS,
# hash-verified against the INDEPENDENT spec new-join EXCEPT ALL old-join.
# Maintaining the view costs O(|Δ|·match), never a recompute.
@query(
    "q180_ivm_join_delta",
    oracle=f"""
    WITH r_old AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 3),
    s_old AS (SELECT * FROM lineitem WHERE l_linenumber <> 2),
    old AS (
      SELECT o_orderstatus, l_quantity FROM r_old
      JOIN s_old ON o_orderkey = l_orderkey),
    new AS (
      SELECT o_orderstatus, l_quantity FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey),
    delta AS (SELECT * FROM new EXCEPT ALL SELECT * FROM old)
    SELECT o_orderstatus, COUNT(*) AS n, {dsum('l_quantity', 'qty')}
    FROM delta GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="IVM delta rule for an inner-join view (inserts): ΔR⋈S ∪ R⋈ΔS ∪ "
        "ΔR⋈ΔS vs the EXCEPT-ALL recompute spec.",
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import join_view_delta

    t = tables(spark, sf_dir)
    orders, li = t["orders"], t["lineitem"]
    s_all = li.withColumnRenamed("l_orderkey", "o_orderkey")
    r_old = orders.filter(F.col("o_orderkey") % 7 != 3)
    dr = orders.filter(F.col("o_orderkey") % 7 == 3)
    s_old = s_all.filter(F.col("l_linenumber") != 2)
    ds = s_all.filter(F.col("l_linenumber") == 2)
    delta = join_view_delta(r_old, s_old, dr, ds, ["o_orderkey"])
    return (
        delta.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum(F.expr(dec("l_quantity"))).cast("double").alias("qty"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q182 replica repair plan: diff src vs a deterministically-corrupted
# replica (missing rows, drifted prices, phantom rows) into the minimal
# changelog that converges it — 'c'/'u'/'d' ops, NULL-safe payload
# comparison. Two anti joins + one key join; output is diff-sized.
_Q182_DST = """
      SELECT o_orderkey,
             o_custkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 7 = 2
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,6))
                            + CAST(1.5 AS DECIMAL(18,6)) AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 5
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 13 = 1
"""


@query(
    "q182_repair_changelog",
    oracle=f"""
    WITH dst AS ({_Q182_DST})
    SELECT 'c' AS op, o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dst)
    UNION ALL
    SELECT 'd', o_orderkey,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM dst WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'u', s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice
    FROM orders s JOIN dst d USING (o_orderkey)
    WHERE s.o_custkey IS DISTINCT FROM d.o_custkey
       OR s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
       OR s.o_totalprice IS DISTINCT FROM d.o_totalprice
    ORDER BY op, o_orderkey
    """,
    doc="Replica repair changelog (c/u/d) from a src-vs-replica diff; "
        "applying it converges the replica (round-trip-tested).",
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import diff_to_changelog

    src = tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    dst = _q182_dst(src)
    return diff_to_changelog(
        src, dst, ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    ).orderBy("op", "o_orderkey")


def _q182_dst(src: DataFrame) -> DataFrame:
    drifted = src.filter(F.col("o_orderkey") % 11 != 5).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 7 == 2,
            (F.col("o_totalprice").cast("decimal(18,6)")
             + F.lit(1.5).cast("decimal(18,6)")).cast("double"),
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    phantoms = src.filter(F.col("o_orderkey") % 13 == 1).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice",
    )
    return drifted.unionByName(phantoms)


# --------------------------------------------------------------------------
# Q183 last-writer-wins reconciliation of two divergent replicas: per key
# the highest-version row survives, version ties break by replica tag —
# the deterministic multi-master convergence rule. One union + one
# key-shuffle max_by; rolled up per (winning replica, status).
@query(
    "q183_lww_merge",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,6))
                            * CAST(1.10 AS DECIMAL(4,2)) AS DOUBLE)
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS v,
             'a' AS _replica
      FROM orders),
    b AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 4 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,6))
                            + CAST(5 AS DECIMAL(18,6)) AS DOUBLE)
                  ELSE o_totalprice END,
             CASE WHEN o_orderkey % 4 = 0 THEN 3 ELSE 1 END,
             'b'
      FROM orders),
    u AS (
      SELECT *, v * 10 + CASE _replica WHEN 'b' THEN 1 ELSE 0 END AS ord
      FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
    w AS (
      SELECT o_orderkey,
             arg_max(o_orderstatus, ord) AS o_orderstatus,
             arg_max(price, ord) AS price,
             arg_max(_replica, ord) AS _replica
      FROM u GROUP BY o_orderkey)
    SELECT _replica, o_orderstatus, COUNT(*) AS n,
           {dsum('price', 'total')}
    FROM w GROUP BY _replica, o_orderstatus ORDER BY _replica, o_orderstatus
    """,
    doc="LWW multi-master reconciliation: per-key highest version wins, "
        "ties broken by replica tag; winner mix rolled up.",
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.cdc import lww_merge

    orders = tables(spark, sf_dir)["orders"]
    a = orders.select(
        "o_orderkey", "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.col("o_totalprice").cast("decimal(18,6)")
             * F.lit(1.10).cast("decimal(4,2)")).cast("double"),
        ).otherwise(F.col("o_totalprice")).alias("price"),
        F.when(F.col("o_orderkey") % 3 == 0, 2).otherwise(1).alias("v"),
    )
    b = orders.select(
        "o_orderkey", "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 4 == 0,
            (F.col("o_totalprice").cast("decimal(18,6)")
             + F.lit(5).cast("decimal(18,6)")).cast("double"),
        ).otherwise(F.col("o_totalprice")).alias("price"),
        F.when(F.col("o_orderkey") % 4 == 0, 3).otherwise(1).alias("v"),
    )
    merged = lww_merge(a, b, ["o_orderkey"], "v")
    return (
        merged.groupBy("_replica", "o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum(F.expr(dec("price"))).cast("double").alias("total"))
        .orderBy("_replica", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q208 session-pressure at purchase time: for each sampled purchase, the
# number of sessions (any user) whose [start, end] covers the purchase
# instant. The containment join has NO shared equi key, so it runs through
# the binned-grid equi-join rewrite (operators/scale.py::
# binned_interval_join — parity-tested row-identical to the theta join);
# at 100 TB the theta form is a nested loop, the binned form one shuffle.
@query(
    "q208_session_pressure",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    ), sess AS (
      SELECT user_id, session_id, MIN(ts) AS start_ts, MAX(ts) AS end_ts
      FROM s GROUP BY user_id, session_id
    ), p AS (
      SELECT event_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id % 5 = 0
    )
    SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM p JOIN sess ON p.ts >= sess.start_ts AND p.ts <= sess.end_ts
    GROUP BY p.event_id ORDER BY p.event_id
    """,
    doc="Concurrent-session count covering each sampled purchase instant — "
        "a keyless interval-containment join executed as the binned-grid "
        "equi-join rewrite.",
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import binned_interval_join
    from inspectadb_spark.operators.sessionize import sessionize

    ev = tables(spark, sf_dir)["events"]
    sess = (
        sessionize(ev).groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
        .select("start_ts", "end_ts")
    )
    p = (ev.filter("event_type = 'purchase' AND user_id % 5 = 0")
         .select("event_id", "ts"))
    return (
        binned_interval_join(p, sess, bin_seconds=3600)
        .groupBy("event_id").agg(F.count("*").alias("n_active"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q209 day-of-week seasonality index: revenue share per ISO weekday vs the
# uniform 1/7 baseline, in exact integer cents/ppm. BIGINT headroom:
# cents*7e6 overflows past ~1.3e12 total dollars — promote the two ppm
# products to DECIMAL(38,0) beyond that (the q176 single-term upgrade).
@query(
    "q209_dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT isodow(o_orderdate) AS dow,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM d)
    SELECT CAST(dow AS INT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(cents) * 1000000 // tot AS BIGINT) AS share_ppm,
           CAST(SUM(cents) * 7000000 // tot AS BIGINT) AS index_ppm
    FROM d CROSS JOIN t GROUP BY dow, tot ORDER BY dow
    """,
    doc="Revenue seasonality by ISO weekday: share of total and the "
        "x7 seasonal index (1e6 = flat), exact integer cents end to end.",
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = o.select(
        F.expr("((dayofweek(o_orderdate) + 5) % 7) + 1").cast("int")
        .alias("dow"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    t = d.agg(F.sum("cents").alias("tot"))
    return (
        d.join(F.broadcast(t))
        .groupBy("dow", "tot")
        .agg(F.count("*").alias("n_orders"),
             F.sum("cents").alias("revenue_cents"))
        .select("dow", "n_orders", "revenue_cents",
                F.expr("revenue_cents * 1000000 DIV tot").alias("share_ppm"),
                F.expr("revenue_cents * 7000000 DIV tot").alias("index_ppm"))
        .orderBy("dow")
    )


# --------------------------------------------------------------------------
# Q210 cohort LTV curves: cumulative revenue per signup-cohort user by week
# offset — the complement of q78's retention matrix (q78 counts activity,
# this accumulates value). Exact integer cents; cumulative window runs over
# the (cohort × offset) grid (span-sized), never raw orders.
@query(
    "q210_ltv_curves",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('week', MIN(o_orderdate)) AS TIMESTAMP)
               AS cohort_week
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            date_trunc('week', o.o_orderdate)) / 7 AS INT)
               AS week_offset,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey),
    po AS (
      SELECT cohort_week, week_offset,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM rev GROUP BY cohort_week, week_offset),
    sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort
           FROM firsts GROUP BY cohort_week)
    SELECT po.cohort_week, week_offset, n_cohort, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY po.cohort_week
                 ORDER BY week_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY po.cohort_week
                 ORDER BY week_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) // n_cohort AS ltv_cents_per_user
    FROM po JOIN sz ON po.cohort_week = sz.cohort_week
    ORDER BY po.cohort_week, week_offset
    """,
    doc="Cumulative revenue per cohort user by week offset (LTV curves): "
        "first-order-week cohorts, exact integer cents, cumulative window "
        "over the cohort-offset grid.",
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = tables(spark, sf_dir)["orders"]
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("week", F.min("o_orderdate")).alias("cohort_week"))
    rev = (
        o.join(firsts, "o_custkey")
        .select(
            "cohort_week",
            (F.datediff(F.date_trunc("week", F.col("o_orderdate")),
                        F.col("cohort_week")) / 7).cast("int")
            .alias("week_offset"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            .alias("cents"))
    )
    po = rev.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("rev_cents"))
    sz = firsts.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    w = (Window.partitionBy("cohort_week").orderBy("week_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        po.join(sz, "cohort_week")
        .withColumn("cum_cents", F.sum("rev_cents").over(w))
        .select("cohort_week", "week_offset", "n_cohort", "rev_cents",
                "cum_cents",
                F.expr("cum_cents DIV n_cohort").alias("ltv_cents_per_user"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Q213 seasonal-naive forecast backtest: predict each day's revenue with
# the prior day (naive1) and the same weekday last week (naive7), score
# MAE and bias in exact integer cents. The lag is a calendar-correct self
# equi-join on date arithmetic (gap-proof, unlike a row-offset window);
# the series is day-sized, so every step after the daily rollup is
# span-bounded at any corpus scale.
@query(
    "q213_seasonal_backtest",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1),
    j AS (
      SELECT 'naive1' AS model, a.cents AS actual, b.cents AS forecast
      FROM d a JOIN d b ON b.day = a.day - INTERVAL 1 DAY
      UNION ALL
      SELECT 'naive7' AS model, a.cents AS actual, b.cents AS forecast
      FROM d a JOIN d b ON b.day = a.day - INTERVAL 7 DAY)
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) // COUNT(*)
             AS mae_cents,
           CAST(SUM(actual - forecast) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
             AS bias_cents
    FROM j GROUP BY model ORDER BY model
    """,
    doc="Backtest of naive1/naive7 revenue forecasts: calendar-correct "
        "lag join over the daily series, MAE and bias in exact integer "
        "cents (floor DIV on both engines).",
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                 " AS BIGINT)").alias("cents"))

    def lag_join(days: int, model: str) -> DataFrame:
        a = d.select(F.col("day").alias("a_day"), F.col("cents").alias("actual"))
        b = d.select(F.col("day").alias("b_day"), F.col("cents").alias("forecast"))
        return (a.join(b, F.col("b_day")
                       == F.col("a_day") - F.expr(f"INTERVAL {days} DAY"))
                .select(F.lit(model).alias("model"), "actual", "forecast"))

    j = lag_join(1, "naive1").unionByName(lag_join(7, "naive7"))
    return (
        j.groupBy("model")
        .agg(F.count("*").alias("n_days"),
             F.sum(F.abs(F.col("actual") - F.col("forecast"))).alias("sae"),
             F.sum(F.col("actual") - F.col("forecast")).alias("se"))
        .select("model", "n_days",
                F.expr("sae DIV n_days").alias("mae_cents"),
                F.expr("se DIV n_days").alias("bias_cents"))
        .orderBy("model")
    )


# --------------------------------------------------------------------------
# Q214 revenue-concentration (Lorenz) deciles: customers ranked by revenue
# into exact row-number deciles; per decile the revenue share and the
# cumulative share — the decile table behind q175's single Gini number.
# Ranking ties are broken by customer id, so decile membership is
# engine-invariant; all shares are integer ppm. The global rank runs
# through operators/scale.py::global_rank (bucket offsets + per-bucket
# windows — parity-pinned bit-identical to the single-partition global
# window the oracle uses), so no full-table single-task sort exists; the
# only unpartitioned windows left are over the bucket table and the
# 10-row decile grid, both bounded by construction.
@query(
    "q214_lorenz_deciles",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT cents,
             (ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1) * 10
               // (SELECT COUNT(*) FROM c) AS decile
      FROM c),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM c),
    d AS (
      SELECT CAST(decile AS INT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM r GROUP BY decile)
    SELECT decile, n_customers, cents,
           cents * 1000000 // tot AS share_ppm,
           CAST(SUM(cents) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) * 1000000 // tot AS cum_share_ppm
    FROM d CROSS JOIN t ORDER BY decile
    """,
    doc="Lorenz decile table of customer revenue concentration: per "
        "bottom-up decile the revenue share and cumulative share in ppm "
        "(exact row-number deciles, id-tie-broken).",
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import global_rank

    o = tables(spark, sf_dir)["orders"]
    c = o.groupBy("o_custkey").agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
               " AS BIGINT)").alias("cents"))
    n = c.agg(F.count("*").alias("n_c"), F.sum("cents").alias("tot"))
    ranked = global_rank(c, "cents", "o_custkey", bucket_width=100_000)
    r = (ranked.join(F.broadcast(n))
         .select("cents", "tot",
                 F.expr("(rank - 1) * 10 DIV n_c").cast("int")
                 .alias("decile")))
    d = r.groupBy("decile", "tot").agg(
        F.count("*").alias("n_customers"), F.sum("cents").alias("cents"))
    w = (Window.orderBy("decile")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        d.withColumn("cum", F.sum("cents").over(w))
        .select("decile", "n_customers", "cents",
                F.expr("cents * 1000000 DIV tot").alias("share_ppm"),
                F.expr("cum * 1000000 DIV tot").alias("cum_share_ppm"))
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Q217 DAU/WAU stickiness: daily actives and trailing-7-day actives per
# day, ratio in ppm. The trailing distinct cannot roll up from daily
# distincts (same reason as q84's HLL rollups), so it expands the
# (user, day) table across the 7 covering days — a deliberate bounded
# ×7 fan-out of the DEDUPLICATED user-day table (events collapse first),
# then one (day, user) distinct + count. Days without full history are
# excluded via the min-day guard.
@query(
    "q217_dau_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    fan AS (
      SELECT user_id, day + to_days(CAST(o AS INT)) AS obs_day
      FROM ud, UNNEST(generate_series(0, 6)) AS t(o)),
    wau AS (
      SELECT obs_day AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM fan GROUP BY obs_day)
    SELECT d.day, d.dau, w.wau, d.dau * 1000000 // w.wau AS stickiness_ppm
    FROM dau d JOIN wau w ON w.day = d.day CROSS JOIN bounds
    WHERE d.day >= d0 + to_days(6) AND d.day <= d1
    ORDER BY d.day
    """,
    doc="DAU, trailing-7-day WAU and DAU/WAU stickiness (ppm) per day "
        "with full history — the x7 fan-out runs on the deduplicated "
        "user-day table, never raw events.",
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    ud = ev.select("user_id",
                   F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        F.col("day"),
    ).select("user_id", F.expr("day + make_interval(0, 0, 0, o)").alias("day"))
    wau = fan.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day").join(F.broadcast(bounds))
        .filter((F.col("day") >= F.expr("d0 + make_interval(0, 0, 0, 6)"))
                & (F.col("day") <= F.col("d1")))
        .select("day", "dau", "wau",
                F.expr("dau * 1000000 DIV wau").alias("stickiness_ppm"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q218 churn-label generation: the supervised-learning label table for a
# retention model — per first-seen-week cohort, users whose last PURCHASE
# is 7+ days before the corpus horizon (or who never purchased) are
# labeled churned: transactional churn, the definition subscription /
# commerce retention models actually train on. Churning on ANY activity
# was degenerate here — the corpus is 30 DENSE days, every user fires
# some event nearly daily, so a 14-day whole-activity rule labeled nobody
# (q326 class, round-9 sweep) and the round-9 1-day patch demonstrated
# nothing (ADVICE r9: a 1-day "churn" on a 30-day corpus is consistent
# but meaningless). The monetized action is genuinely sparse per user, so
# the REAL 7-day rule yields nonzero multi-day labels at both SFs (1/15
# resp. 9/150 users). One per-user aggregation + a broadcast horizon;
# label logic is pure timestamp arithmetic, rates in integer ppm.
@query(
    "q218_churn_labels",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(ts) AS first_ts,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_p
      FROM events GROUP BY user_id),
    m AS (SELECT MAX(ts) AS horizon FROM events)
    SELECT CAST(date_trunc('week', first_ts) AS TIMESTAMP) AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN last_p IS NULL
                         OR last_p <= horizon - INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN last_p IS NULL
                         OR last_p <= horizon - INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS churn_ppm
    FROM u CROSS JOIN m
    GROUP BY 1 ORDER BY 1
    """,
    doc="Churn labels per signup cohort: users with no purchase in the "
        "horizon's trailing 7 days (transactional churn), counts and "
        "rate in ppm — the label table a retention model trains on.",
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max(F.expr("CASE WHEN event_type = 'purchase' THEN ts END"))
        .alias("last_p"))
    m = ev.agg(F.max("ts").alias("horizon"))
    churned = F.when(
        F.col("last_p").isNull()
        | (F.col("last_p") <= F.expr("horizon - INTERVAL 7 DAY")), 1
    ).otherwise(0)
    return (
        u.join(F.broadcast(m))
        .groupBy(F.date_trunc("week", F.col("first_ts")).alias("cohort_week"))
        .agg(F.count("*").alias("n_users"),
             F.sum(churned).alias("n_churned"))
        .select("cohort_week", "n_users", "n_churned",
                F.expr("n_churned * 1000000 DIV n_users").alias("churn_ppm"))
        .orderBy("cohort_week")
    )


# --------------------------------------------------------------------------
# Q226 peak detection: days that are strict local maxima of daily revenue
# over their ±1 calendar neighbors, with prominence over the smaller
# neighbor in exact cents. Neighbor lookup is a calendar-correct self
# equi-join (the q213 idiom — gap-proof); missing neighbors disqualify
# (a peak needs both sides).
@query(
    "q226_revenue_peaks",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1)
    SELECT a.day, a.cents,
           a.cents - GREATEST(b.cents, c.cents) AS prominence_cents
    FROM d a
    JOIN d b ON b.day = a.day - INTERVAL 1 DAY
    JOIN d c ON c.day = a.day + INTERVAL 1 DAY
    WHERE a.cents > b.cents AND a.cents > c.cents
    ORDER BY a.day
    """,
    doc="Strict local-maximum revenue days with prominence over the "
        "higher neighbor, exact integer cents, calendar-correct "
        "neighbor joins.",
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                 " AS BIGINT)").alias("cents"))
    a = d.select(F.col("day"), F.col("cents"))
    b = d.select(F.col("day").alias("b_day"), F.col("cents").alias("b_c"))
    c = d.select(F.col("day").alias("c_day"), F.col("cents").alias("c_c"))
    return (
        a.join(b, F.col("b_day") == F.col("day") - F.expr("INTERVAL 1 DAY"))
        .join(c, F.col("c_day") == F.col("day") + F.expr("INTERVAL 1 DAY"))
        .filter((F.col("cents") > F.col("b_c"))
                & (F.col("cents") > F.col("c_c")))
        .select("day", "cents",
                (F.col("cents") - F.greatest("b_c", "c_c"))
                .alias("prominence_cents"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q228 seasonally-adjusted outlier days: a day is anomalous if its revenue
# deviates from its WEEKDAY's median by more than 3x that weekday's MAD —
# the robust, seasonality-aware screen (plain z-scores flag every Saturday
# on a weekday-seasonal series). Median/MAD via discrete quantiles over
# integer cents, so the whole rule is integer-exact; per-dow stats are a
# 7-row broadcast.
@query(
    "q228_seasonal_outliers",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             isodow(o_orderdate) AS dow,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2),
    med AS (
      SELECT dow, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
      FROM d GROUP BY dow),
    mad AS (
      SELECT d.dow,
             CAST(quantile_disc(ABS(d.cents - m.med), 0.5) AS BIGINT) AS mad
      FROM d JOIN med m ON m.dow = d.dow GROUP BY d.dow)
    SELECT d.day, CAST(d.dow AS INT) AS dow, d.cents, m.med AS dow_median,
           ABS(d.cents - m.med) AS abs_dev
    FROM d JOIN med m ON m.dow = d.dow JOIN mad a ON a.dow = d.dow
    WHERE ABS(d.cents - m.med) > 3 * a.mad AND a.mad > 0
    ORDER BY d.day
    """,
    doc="Days whose revenue deviates from their weekday median by more "
        "than 3x the weekday MAD — robust seasonality-aware anomaly "
        "screen, integer-exact.",
)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        F.expr("((dayofweek(o_orderdate) + 5) % 7) + 1").alias("dow"),
    ).agg(F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                 " AS BIGINT)").alias("cents"))
    med = d.groupBy("dow").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
               " AS BIGINT)").alias("med"))
    dm = d.join(F.broadcast(med), "dow")
    mad = dm.groupBy("dow").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP"
               " (ORDER BY abs(cents - med)) AS BIGINT)").alias("mad"))
    return (
        dm.join(F.broadcast(mad), "dow")
        .filter((F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad"))
                & (F.col("mad") > 0))
        .select("day", F.col("dow").cast("int").alias("dow"), "cents",
                F.col("med").alias("dow_median"),
                F.abs(F.col("cents") - F.col("med")).alias("abs_dev"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Q229 new-vs-returning revenue split per week: each order is 'new' iff it
# is its customer's first (earliest (o_orderdate, o_orderkey)) — the
# growth-accounting decomposition every revenue dashboard leads with.
# First-order detection is one struct-min per customer (map-side
# combinable, no window); revenue in exact cents, shares in ppm.
@query(
    "q229_new_vs_returning",
    oracle="""
    WITH f AS (
      SELECT o_custkey, MIN(ROW(o_orderdate, o_orderkey)) AS fr
      FROM orders GROUP BY o_custkey),
    o AS (
      SELECT CAST(date_trunc('week', o.o_orderdate) AS TIMESTAMP) AS week,
             CASE WHEN ROW(o.o_orderdate, o.o_orderkey) = f.fr
                  THEN 1 ELSE 0 END AS is_new,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN f ON f.o_custkey = o.o_custkey)
    SELECT week,
           CAST(SUM(is_new) AS BIGINT) AS n_new_orders,
           CAST(COUNT(*) - SUM(is_new) AS BIGINT) AS n_ret_orders,
           CAST(SUM(is_new * cents) AS BIGINT) AS new_cents,
           CAST(SUM((1 - is_new) * cents) AS BIGINT) AS ret_cents,
           CAST(SUM(is_new * cents) * 1000000 // SUM(cents) AS BIGINT)
             AS new_share_ppm
    FROM o GROUP BY week ORDER BY week
    """,
    doc="Weekly new-vs-returning revenue decomposition: first order per "
        "customer via struct-min (no window), exact cents, share in ppm.",
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    f = o.groupBy("o_custkey").agg(
        F.min(F.struct(F.col("o_orderdate").alias("d"),
                       F.col("o_orderkey").alias("k"))).alias("fr"))
    j = (o.join(f, "o_custkey")
         .select(
             F.date_trunc("week", F.col("o_orderdate")).alias("week"),
             F.when((F.col("o_orderdate") == F.col("fr.d"))
                    & (F.col("o_orderkey") == F.col("fr.k")), 1)
             .otherwise(0).alias("is_new"),
             F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
             .alias("cents")))
    return (
        j.groupBy("week")
        .agg(F.sum("is_new").alias("n_new_orders"),
             (F.count("*") - F.sum("is_new")).alias("n_ret_orders"),
             F.sum(F.col("is_new") * F.col("cents")).alias("new_cents"),
             F.sum((1 - F.col("is_new")) * F.col("cents"))
             .alias("ret_cents"),
             F.expr("SUM(is_new * cents) * 1000000 DIV SUM(cents)")
             .alias("new_share_ppm"))
        .orderBy("week")
    )


# --------------------------------------------------------------------------
# Q230 changelog lifecycle census: per-key op sequences ('c', 'cu', 'cud',
# ...) counted across the CDC log, plus the count of MALFORMED lifecycles
# (not starting with 'c' — replication-integrity violations). The op
# string is built with an ordered listagg keyed on lsn; the census is
# |patterns|-sized however large the log.
@query(
    "q230_cdc_lifecycle_census",
    oracle=f"""
    WITH {{CDC}},
    seq AS (
      SELECT o_orderkey, string_agg(op, '' ORDER BY lsn) AS lifecycle
      FROM cdc_orders GROUP BY o_orderkey)
    SELECT lifecycle, CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(CASE WHEN lifecycle NOT LIKE 'c%' THEN COUNT(*) ELSE 0 END
                AS BIGINT) AS n_malformed
    FROM seq GROUP BY lifecycle ORDER BY lifecycle
    """.format(CDC=__import__("inspectadb_spark.sources.cdc",
                              fromlist=["CDC_ORDERS_CTE"]).CDC_ORDERS_CTE),
    doc="Census of per-key CDC op lifecycles with malformed-lifecycle "
        "counts — the replication-integrity audit over the changelog.",
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdc = derive_cdc_orders(tables(spark, sf_dir)["orders"])
    seq = cdc.groupBy("o_orderkey").agg(
        F.expr("listagg(op, '') WITHIN GROUP (ORDER BY lsn)")
        .alias("lifecycle"))
    return (
        seq.groupBy("lifecycle")
        .agg(F.count("*").alias("n_keys"))
        .select("lifecycle", "n_keys",
                F.when(~F.col("lifecycle").startswith("c"),
                       F.col("n_keys")).otherwise(0).cast("bigint")
                .alias("n_malformed"))
        .orderBy("lifecycle")
    )


# --------------------------------------------------------------------------
# Q232 week-over-week top movers: per week the 3 brands with the largest
# absolute revenue change vs the prior week — the dashboard "what moved"
# report. Calendar-correct lag join on the (week, brand) grid (q213
# idiom); ranking by (abs delta DESC, brand) row_number partitioned per
# week; exact integer cents.
@query(
    "q232_topk_movers",
    oracle="""
    WITH wb AS (
      SELECT CAST(date_trunc('week', o.o_orderdate) AS TIMESTAMP) AS week,
             p.p_brand AS brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    j AS (
      SELECT a.week, a.brand, a.cents,
             a.cents - b.cents AS delta_cents
      FROM wb a JOIN wb b
        ON b.brand = a.brand AND b.week = a.week - INTERVAL 7 DAY),
    r AS (
      SELECT week, brand, cents, delta_cents,
             ROW_NUMBER() OVER (PARTITION BY week
               ORDER BY ABS(delta_cents) DESC, brand) AS rk
      FROM j)
    SELECT week, CAST(rk AS INT) AS rk, brand, cents, delta_cents
    FROM r WHERE rk <= 3 ORDER BY week, rk
    """,
    doc="Top-3 brands by absolute week-over-week revenue change per week "
        "— calendar-correct lag join over the (week, brand) grid, exact "
        "cents.",
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    wb = (t["lineitem"]
          .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
          .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
          .groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("week"),
                   F.col("p_brand").alias("brand"))
          .agg(F.expr("CAST(SUM(CAST(ROUND(l_extendedprice * 100)"
                      " AS BIGINT)) AS BIGINT)").alias("cents")))
    prev = wb.select(F.col("week").alias("p_week"),
                     F.col("brand").alias("p_brand"),
                     F.col("cents").alias("p_cents"))
    j = wb.join(prev, (F.col("p_brand") == F.col("brand"))
                & (F.col("p_week")
                   == F.col("week") - F.expr("INTERVAL 7 DAY")))
    w = Window.partitionBy("week").orderBy(
        F.abs(F.col("delta_cents")).desc(), F.asc("brand"))
    return (
        j.select("week", "brand", "cents",
                 (F.col("cents") - F.col("p_cents")).alias("delta_cents"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("week", F.col("rk").cast("int").alias("rk"), "brand",
                "cents", "delta_cents")
        .orderBy("week", "rk")
    )


# --------------------------------------------------------------------------
# Q233 the 80/20 point: how many top customers cover 80% of revenue — the
# single-number concentration headline behind q214's decile table and
# q175's Gini. Ranked descending through global_rank (distributed, no
# single-task sort); the crossing rank is found with one partitioned-free
# MIN over the tiny qualifying set.
@query(
    "q233_pareto_point",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_cust FROM c),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk
      FROM c),
    cum AS (
      SELECT rk, CAST(SUM(cents) OVER (ORDER BY rk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_cents
      FROM r)
    SELECT CAST(MIN(rk) AS BIGINT) AS n_top_customers,
           CAST(MAX(t.n_cust) AS BIGINT) AS n_customers,
           MIN(rk) * 1000000 // MAX(t.n_cust) AS top_share_ppm
    FROM cum CROSS JOIN t
    WHERE cum_cents * 5 >= t.tot * 4
    """,
    doc="Smallest top-customer count covering 80% of revenue (with its "
        "ppm share of the customer base) — the Pareto headline number; "
        "rank via the distributed global_rank.",
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import global_rank

    o = tables(spark, sf_dir)["orders"]
    c = o.groupBy("o_custkey").agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
               " AS BIGINT)").alias("cents"))
    t = c.agg(F.sum("cents").alias("tot"), F.count("*").alias("n_cust"))
    # descending rank == ascending rank on negated cents
    ranked = global_rank(c.withColumn("neg", -F.col("cents")),
                         "neg", "o_custkey", bucket_width=100_000)
    wc = (Window.orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = ranked.select("rank", "cents").withColumn(
        "cum_cents", F.sum("cents").over(wc))
    return (
        cum.join(F.broadcast(t))
        .filter(F.col("cum_cents") * 5 >= F.col("tot") * 4)
        .agg(F.min("rank").alias("n_top_customers"),
             F.max("n_cust").alias("n_customers"))
        .select("n_top_customers", "n_customers",
                F.expr("n_top_customers * 1000000 DIV n_customers")
                .alias("top_share_ppm"))
    )


# --------------------------------------------------------------------------
# Q235 ABC inventory classification: parts ranked by revenue; class A =
# the top ranks covering 80% of cumulative revenue, B = next 15%, C = the
# tail — counted per class with revenue shares in ppm. Rank is the
# distributed global_rank (descending via negated cents); class
# boundaries are integer threshold comparisons on the cumulative sum.
@query(
    "q235_abc_classification",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM p),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS rk
      FROM p),
    c AS (
      SELECT cents, CAST(SUM(cents) OVER (ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum
      FROM r),
    k AS (
      SELECT CASE WHEN (cum - cents) * 5 < tot * 4 THEN 'A'
                  WHEN (cum - cents) * 20 < tot * 19 THEN 'B'
                  ELSE 'C' END AS cls,
             cents
      FROM c CROSS JOIN t)
    SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) * 1000000 // MAX(t.tot) AS BIGINT) AS share_ppm
    FROM k CROSS JOIN t GROUP BY cls ORDER BY cls
    """,
    doc="ABC classification of parts by revenue (A: first 80% of "
        "cumulative revenue, B: next 15%, C: tail) — class determined by "
        "the PRE-item cumulative so every class is non-empty by "
        "construction; distributed rank, integer thresholds.",
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import global_rank

    li = tables(spark, sf_dir)["lineitem"]
    p = li.groupBy("l_partkey").agg(
        F.expr("CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
               " AS BIGINT)").alias("cents"))
    t = p.agg(F.sum("cents").alias("tot"))
    ranked = global_rank(p.withColumn("neg", -F.col("cents")),
                         "neg", "l_partkey", bucket_width=100_000)
    wc = (Window.orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = ranked.select("cents", "rank").withColumn(
        "cum", F.sum("cents").over(wc))
    cls = (F.when((F.col("cum") - F.col("cents")) * 5 < F.col("tot") * 4,
                  "A")
           .when((F.col("cum") - F.col("cents")) * 20 < F.col("tot") * 19,
                 "B")
           .otherwise("C"))
    return (
        c.join(F.broadcast(t))
        .select(cls.alias("cls"), "cents", "tot")
        .groupBy("cls")
        .agg(F.count("*").alias("n_parts"), F.sum("cents").alias("cents"),
             F.expr("SUM(cents) * 1000000 DIV MAX(tot)").alias("share_ppm"))
        .orderBy("cls")
    )


# --------------------------------------------------------------------------
# Q236 repeat-purchase cadence: days between consecutive orders per
# customer, summarized per order-count cohort (2, 3-4, 5+ orders) with
# exact integer-day p50/p90 — the replenishment-cycle metric behind
# win-back timing. One customer-keyed window for the lag, then
# cohort-sized aggregation.
@query(
    "q236_repurchase_cadence",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             CAST(date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap_days
      FROM orders),
    n AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
          GROUP BY o_custkey),
    g AS (
      SELECT CASE WHEN n.n_orders = 2 THEN '2'
                  WHEN n.n_orders <= 4 THEN '3-4'
                  ELSE '5+' END AS cohort,
             o.gap_days
      FROM o JOIN n ON n.o_custkey = o.o_custkey
      WHERE o.gap_days IS NOT NULL AND n.n_orders >= 2)
    SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(gap_days, 0.9) AS BIGINT) AS p90_days
    FROM g GROUP BY cohort ORDER BY cohort
    """,
    doc="Inter-order gap percentiles per order-count cohort (exact "
        "integer days, discrete quantiles) — the repeat-purchase cadence "
        "metric.",
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("bigint").alias("gap_days")).filter(
        F.col("gap_days").isNotNull())
    n = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    cohort = (F.when(F.col("n_orders") == 2, "2")
              .when(F.col("n_orders") <= 4, "3-4").otherwise("5+"))
    g = (gaps.join(n, "o_custkey").filter(F.col("n_orders") >= 2)
         .select(cohort.alias("cohort"), "gap_days"))
    return (
        g.groupBy("cohort")
        .agg(F.count("*").alias("n_gaps"),
             F.expr("CAST(percentile_disc(0.5) WITHIN GROUP"
                    " (ORDER BY gap_days) AS BIGINT)").alias("p50_days"),
             F.expr("CAST(percentile_disc(0.9) WITHIN GROUP"
                    " (ORDER BY gap_days) AS BIGINT)").alias("p90_days"))
        .orderBy("cohort")
    )


# --------------------------------------------------------------------------
# Q243 sequential pattern mining (top event-type trigrams): q81 checks ONE
# declared funnel, q82 counts pairwise transitions; this mines the top
# contiguous length-3 patterns with per-user support — the discovery pass
# that tells you WHICH funnels to declare. Ordering key (ts, event_id) is
# total, so lead() windows are engine-deterministic; the top-20 cut is
# total-ordered by (support desc, pattern) since patterns are unique.
@query(
    "q243_sequence_patterns",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), p AS (
      SELECT user_id, event_type || '>' || e2 || '>' || e3 AS pattern
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS support
    FROM p GROUP BY pattern
    ORDER BY support DESC, pattern LIMIT 20
    """,
    doc="Top contiguous event-type trigram patterns by distinct-user "
        "support: one user-key window shuffle + one pattern aggregation + "
        "TakeOrdered top-k. Pattern-space is bounded by |event types|^3, "
        "so the aggregate is tiny at any event volume.",
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        s.select(
            "user_id",
            F.concat_ws(">", "event_type", "e2", "e3").alias("pattern"))
        .groupBy("pattern")
        .agg(F.count("*").alias("n_occurrences"),
             F.count_distinct("user_id").alias("support"))
        .orderBy(F.desc("support"), "pattern")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q246 event-time disorder profile: how late do events arrive relative to
# the running event-time high-watermark of the arrival log (event_id =
# arrival order)? THE measurement that sizes `withWatermark` — S1 asserts
# late rows are dropped at a given delay; this query tells you what delay
# the data actually needs (max + exact integer-second percentiles of
# lateness, per event type).
@query(
    "q246_disorder_profile",
    oracle="""
    WITH a AS (
      SELECT event_type, ts,
             MAX(ts) OVER (ORDER BY CAST(ts AS DATE), user_id, ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
      FROM events),
    l AS (
      SELECT event_type,
             CASE WHEN hwm IS NULL OR ts >= hwm THEN 0
                  ELSE CAST(date_diff('second', ts, hwm) AS BIGINT)
             END AS late_s
      FROM a)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN late_s > 0 THEN 1 END) AS BIGINT) AS n_late,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s,
           CAST(CAST(quantile_cont(late_s, 0.95) AS DECIMAL(18,6)) AS DOUBLE)
             AS p95_late_s
    FROM l GROUP BY event_type ORDER BY event_type
    """,
    doc="Lateness vs the running arrival-order high-watermark under a "
        "MULTIPLEXED arrival order (per day, per user, each user's "
        "events in time order — the per-key-ordered / cross-key-"
        "unordered shape of a CDC or partitioned-log source): per event "
        "type, out-of-order row count, worst lateness, and the p95 that "
        "sizes the streaming watermark delay. Integer-second lateness "
        "keeps every aggregate engine-exact. Previously measured against "
        "raw event_id order, which this corpus generates perfectly "
        "ts-sorted — every lateness column was identically zero at every "
        "SF (the q326 degeneracy class, caught by the round-8 audit "
        "sweep); the multiplexed order exercises the watermark math on "
        "genuinely disordered arrivals.",
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"]
    # Three-level bucket-offset running max over the multiplexed arrival
    # order (day, user, ts, event_id): (day, user) groups are contiguous
    # in that order, so the high-watermark is GREATEST(carry-in from all
    # earlier groups, strict-preceding max inside the group). The
    # (day, user) group table scales with the user population, so the
    # carry over it is ITSELF bucketed (user_id DIV 1000 is
    # order-preserving within a day): the only unpartitioned window
    # rides the (day, 1000-user-bucket) table, groups take
    # GREATEST(broadcast bucket carry-in, strict-preceding group max
    # inside their bucket — a partitioned window), and the row-level
    # window partitions by (day, user). Same scheme as
    # operators/scale.py global_running_max, one level deeper.
    e = ev.select("event_type", "ts", "user_id", "event_id",
                  F.to_date("ts").alias("_day"))
    ug = (e.groupBy("_day", "user_id").agg(F.max("ts").alias("_gmax"))
          .withColumn("_ubkt", F.expr("user_id DIV 1000")))
    bmax = ug.groupBy("_day", "_ubkt").agg(F.max("_gmax").alias("_bmax"))
    wbkt = (Window.orderBy("_day", "_ubkt")
            .rowsBetween(Window.unboundedPreceding, -1))
    bcarry = (bmax.withColumn("_bcarry", F.max("_bmax").over(wbkt))
              .select("_day", "_ubkt", "_bcarry"))
    wgrp = (Window.partitionBy("_day", "_ubkt").orderBy("user_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    carry = (ug.join(F.broadcast(bcarry), ["_day", "_ubkt"])
             .withColumn("_hwm_in",
                         F.greatest(F.col("_bcarry"),
                                    F.max("_gmax").over(wgrp)))
             .select("_day", "user_id", "_hwm_in"))
    win = (Window.partitionBy("_day", "user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, -1))
    a = (e.join(carry, ["_day", "user_id"])
         .withColumn("hwm", F.greatest(F.col("_hwm_in"),
                                       F.max("ts").over(win)))
         .select("event_type", "ts", "hwm"))
    late = F.when(
        F.col("hwm").isNull() | (F.col("ts") >= F.col("hwm")), F.lit(0)
    ).otherwise(
        (F.unix_timestamp("hwm") - F.unix_timestamp("ts")).cast("bigint"))
    return (
        a.select("event_type", late.alias("late_s"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum((F.col("late_s") > 0).cast("bigint")).alias("n_late"),
             F.max("late_s").alias("max_late_s"),
             F.expr("CAST(CAST(percentile(late_s, 0.95D) AS DECIMAL(18,6))"
                    " AS DOUBLE)").alias("p95_late_s"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q248 the product pipeline in ONE oracled query: CDC change-log -> ordered
# upsert/delete fold (q46 machinery) -> daily summary table -> monthly
# rollup ROUTED through the MV algebra (q239 machinery). The oracle folds
# the same changelog and aggregates directly, so the hash match certifies
# the composition end to end: ingest -> apply -> summarize -> serve.
# The routed sum rides DECIMAL (exact) and is cast back to BIGINT cents at
# the end; the intermediate double hop is exact below 2^53 — at warehouse
# scale the MV reader swaps the final cast chain for a pure-decimal
# projection (operators/mv.py stores decimals already).
@query(
    "q248_cdc_to_summary",
    oracle=f"""
    WITH {CDC_ORDERS_CTE},
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY lsn DESC) AS rn
      FROM cdc_orders),
    cur AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      FROM ranked WHERE rn = 1 AND op <> 'd')
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM cur GROUP BY 1, 2 ORDER BY month, o_orderstatus
    """,
    doc="End-to-end CDC pipeline: changelog fold to current state, daily "
        "summary materialization, monthly rollup served via MV routing — "
        "one hash match certifies ingest->apply->summarize->serve.",
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.mv import AggRequest, MVDef, route

    cdc = derive_cdc_orders(tables(spark, sf_dir)["orders"])
    cur = (
        apply_changelog(cdc, ["o_orderkey"], order_col="lsn", op_col="op")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .withColumn("order_day", F.date_trunc("day", F.col("o_orderdate")))
        .withColumn("cents",
                    F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
    )
    mv = MVDef(
        name="mv_cdc_orders_daily",
        keys=("order_day", "o_orderstatus"),
        measures={"sum_cents": ("sum", "cents"), "cnt": ("count", "*")},
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(tempfile.gettempdir(),
                    f"inspectadb_mv_cdc_{tag}_{os.getpid()}")
    mv.store(cur, path)
    req = AggRequest(
        keys={"month": "date_trunc('month', order_day)",
              "o_orderstatus": None},
        measures={"n_orders": ("count", "*"),
                  "revenue_cents": ("sum", "cents")},
    )
    out, used = route(spark, req, {mv.name: (mv, path)}, cur)
    assert used == mv.name
    return (
        out.select("month", "o_orderstatus",
                   "n_orders",
                   F.col("revenue_cents").cast("bigint")
                   .alias("revenue_cents"))
        .orderBy("month", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q255 customer segment migration: fixed spend-band segmentation per
# quarter, then the quarter-over-quarter transition matrix — the segment
# FLOW analysis on top of q156's static RFM snapshot. Bands are integer
# cents against fixed thresholds (no quantiles), so segmentation is
# engine- and scale-exact; the transition join is per-customer between
# consecutive quarters only.
@query(
    "q255_segment_migration",
    oracle="""
    WITH q AS (
      SELECT o_custkey,
             CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2),
    seg AS (
      SELECT o_custkey, qtr,
             CASE WHEN cents >= 30000000 THEN 'high'
                  WHEN cents >= 10000000 THEN 'mid'
                  ELSE 'low' END AS segment
      FROM q),
    nxt AS (
      SELECT a.segment AS seg_from, b.segment AS seg_to
      FROM seg a JOIN seg b
        ON a.o_custkey = b.o_custkey
       AND b.qtr = a.qtr + INTERVAL 3 MONTH)
    SELECT seg_from, seg_to, CAST(COUNT(*) AS BIGINT) AS n
    FROM nxt GROUP BY seg_from, seg_to ORDER BY seg_from, seg_to
    """,
    doc="Quarter-over-quarter customer segment transition matrix under "
        "fixed integer-cent spend bands — segment flow, not snapshot.",
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    q = (o.groupBy(
            F.col("o_custkey"),
            F.date_trunc("quarter", F.col("o_orderdate")).alias("qtr"))
         .agg(F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
              .alias("cents")))
    seg = q.select(
        "o_custkey", "qtr",
        F.when(F.col("cents") >= 30000000, "high")
        .when(F.col("cents") >= 10000000, "mid")
        .otherwise("low").alias("segment"))
    a = seg.select(F.col("o_custkey"), F.col("qtr"),
                   F.col("segment").alias("seg_from"))
    b = seg.select(F.col("o_custkey"), F.col("qtr").alias("qtr_b"),
                   F.col("segment").alias("seg_to"))
    nxt = a.join(b, (a["o_custkey"] == b["o_custkey"])
                 & (F.col("qtr_b") == F.col("qtr") + F.expr("INTERVAL 3 MONTH")))
    return (nxt.groupBy("seg_from", "seg_to")
            .agg(F.count("*").alias("n"))
            .orderBy("seg_from", "seg_to"))


# --------------------------------------------------------------------------
# Q256 price-dispersion audit per part: the same part sold at different
# unit prices across lineitems — count, min/max/avg unit price in exact
# cents, spread — the catalog-integrity signal that feeds both pricing
# review and entity-resolution suspicion (q142). Top 20 by spread.
@query(
    "q256_price_dispersion",
    oracle="""
    WITH u AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100 / l_quantity) AS BIGINT)
               AS unit_cents
      FROM lineitem WHERE l_quantity > 0),
    d AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_sales,
             CAST(MIN(unit_cents) AS BIGINT) AS min_cents,
             CAST(MAX(unit_cents) AS BIGINT) AS max_cents,
             CAST(MAX(unit_cents) - MIN(unit_cents) AS BIGINT) AS spread
      FROM u GROUP BY l_partkey)
    SELECT l_partkey, n_sales, min_cents, max_cents, spread
    FROM d ORDER BY spread DESC, l_partkey LIMIT 20
    """,
    doc="Per-part unit-price dispersion in exact integer cents, top 20 by "
        "spread with deterministic tie order — one part-key aggregation + "
        "TakeOrdered.",
)
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    u = (li.filter(F.col("l_quantity") > 0)
         .select("l_partkey",
                 F.expr("CAST(ROUND(l_extendedprice * 100 / l_quantity)"
                        " AS BIGINT)").alias("unit_cents")))
    d = u.groupBy("l_partkey").agg(
        F.count("*").alias("n_sales"),
        F.min("unit_cents").alias("min_cents"),
        F.max("unit_cents").alias("max_cents"),
        (F.max("unit_cents") - F.min("unit_cents")).alias("spread"))
    return d.orderBy(F.desc("spread"), "l_partkey").limit(20)


# --------------------------------------------------------------------------
# Q257 maximum drawdown of cumulative daily revenue: peak-to-trough of the
# running total — the resilience metric on the revenue curve. Both running
# aggregates (cumulative sum, then its running max) ride the DISTRIBUTED
# bucket-offset machinery over the day-level series; exact integer cents
# end to end.
@query(
    "q257_revenue_drawdown",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    dd AS (
      SELECT day, cents,
             MAX(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM d)
    SELECT CAST(MAX(peak - cents) AS BIGINT) AS max_drawdown_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(peak) AS BIGINT) AS final_peak_cents
    FROM dd
    """,
    doc="Maximum drawdown of the DAILY revenue level series in exact "
        "cents (running peak minus current day) — day-aggregated series, "
        "inclusive running max via the distributed bucket-offset "
        "operator. Previously defined on the cumulative curve, which is "
        "monotone for all-positive daily revenue and made the statistic "
        "identically zero at every SF (the q326 degeneracy class, caught "
        "by the round-8 numpy audit) — the level-series form actually "
        "exercises the running-max machinery.",
)
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = (o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
         .agg(F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
              .alias("cents")))
    # day-level series is calendar-bounded: the inclusive running max is
    # a per-bucket window + a bounded cross-bucket carry scan. Reuse the
    # epoch-day integer as the bucket key.
    dd = d.withColumn("day_i", F.expr("datediff(CAST(day AS DATE),"
                                      " DATE'1992-01-01')"))
    from pyspark.sql import Window

    b = dd.withColumn("_bkt", F.expr("day_i DIV 365"))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bmax = b.groupBy("_bkt").agg(F.max("cents").alias("_bmax"))
    carry = bmax.withColumn("_carry", F.max("_bmax").over(woff))
    wmax = (Window.partitionBy("_bkt").orderBy("day_i")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    peaked = (b.join(F.broadcast(carry.select("_bkt", "_carry")), "_bkt")
              .withColumn("peak",
                          F.greatest(F.coalesce(F.col("_carry"),
                                                F.col("cents")),
                                     F.max("cents").over(wmax))))
    return peaked.agg(
        F.max(F.col("peak") - F.col("cents")).cast("bigint")
        .alias("max_drawdown_cents"),
        F.count("*").alias("n_days"),
        F.max("peak").cast("bigint").alias("final_peak_cents"))


# --------------------------------------------------------------------------
# Q258 open-order aging (backlog report): age of every still-open order at
# the corpus horizon (max order date — a deterministic "now"), bucketed in
# integer days per priority — the operational WIP table.
@query(
    "q258_backlog_aging",
    oracle="""
    WITH h AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
    a AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', o_orderdate, horizon) AS BIGINT)
               AS age_days
      FROM orders CROSS JOIN h WHERE o_orderstatus = 'O'),
    b AS (
      SELECT o_orderpriority,
             CASE WHEN age_days < 180 THEN '0-179'
                  WHEN age_days < 720 THEN '180-719'
                  WHEN age_days < 1440 THEN '720-1439'
                  ELSE '1440+' END AS age_bucket,
             age_days
      FROM a)
    SELECT o_orderpriority, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(age_days) AS BIGINT) AS oldest_days
    FROM b GROUP BY o_orderpriority, age_bucket
    ORDER BY o_orderpriority, age_bucket
    """,
    doc="Open-order backlog aging per priority, integer-day buckets "
        "against the deterministic corpus horizon (max order date).",
)
def q258(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    h = o.agg(F.max("o_orderdate").alias("horizon"))
    a = (o.filter(F.col("o_orderstatus") == "O")
         .crossJoin(F.broadcast(h))
         .select("o_orderpriority",
                 F.expr("CAST(datediff(CAST(horizon AS DATE),"
                        " CAST(o_orderdate AS DATE)) AS BIGINT)")
                 .alias("age_days")))
    bucket = (F.when(F.col("age_days") < 180, "0-179")
              .when(F.col("age_days") < 720, "180-719")
              .when(F.col("age_days") < 1440, "720-1439")
              .otherwise("1440+"))
    return (a.select("o_orderpriority", bucket.alias("age_bucket"),
                     "age_days")
            .groupBy("o_orderpriority", "age_bucket")
            .agg(F.count("*").alias("n_orders"),
                 F.max("age_days").alias("oldest_days"))
            .orderBy("o_orderpriority", "age_bucket"))


# --------------------------------------------------------------------------
# Q259 discount-band revenue curve: what each discount band costs and
# moves — per band (integer percent), line count, quantity, gross and
# forgone revenue in exact per-line cents. The pricing-elasticity input
# table.
@query(
    "q259_discount_curve",
    oracle="""
    WITH b AS (
      SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
             l_quantity, l_extendedprice,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS gross_cents,
             CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)
               AS forgone_cents
      FROM lineitem)
    SELECT disc_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
           CAST(SUM(gross_cents) AS BIGINT) AS gross_cents,
           CAST(SUM(forgone_cents) AS BIGINT) AS forgone_cents
    FROM b GROUP BY disc_pct ORDER BY disc_pct
    """,
    doc="Revenue and forgone revenue per integer discount band in exact "
        "per-line cents — the discount-effect curve.",
)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    b = li.select(
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("disc_pct"),
        "l_quantity",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
        .alias("gross_cents"),
        F.expr("CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)")
        .alias("forgone_cents"))
    return (b.groupBy("disc_pct")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                 .cast("double").alias("qty"),
                 F.sum("gross_cents").alias("gross_cents"),
                 F.sum("forgone_cents").alias("forgone_cents"))
            .orderBy("disc_pct"))


# --------------------------------------------------------------------------
# Q260 single-source supply risk: how many parts depend on exactly one
# supplier (and the revenue riding on them) vs multi-sourced parts — the
# supply-chain concentration census over the derived part-supplier
# relation.
@query(
    "q260_single_source_risk",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey),
    b AS (
      SELECT CASE WHEN n_supp = 1 THEN '1'
                  WHEN n_supp = 2 THEN '2'
                  WHEN n_supp <= 4 THEN '3-4'
                  ELSE '5+' END AS supplier_bucket,
             cents
      FROM ps)
    SELECT supplier_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM b GROUP BY supplier_bucket ORDER BY supplier_bucket
    """,
    doc="Supply-concentration census: parts bucketed by distinct supplier "
        "count with the exact-cent revenue at risk per bucket.",
)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    ps = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .alias("cents"))
    bucket = (F.when(F.col("n_supp") == 1, "1")
              .when(F.col("n_supp") == 2, "2")
              .when(F.col("n_supp") <= 4, "3-4")
              .otherwise("5+"))
    return (ps.select(bucket.alias("supplier_bucket"), "cents")
            .groupBy("supplier_bucket")
            .agg(F.count("*").alias("n_parts"),
                 F.sum("cents").alias("revenue_cents"))
            .orderBy("supplier_bucket"))


# --------------------------------------------------------------------------
# Q272 classical seasonal decomposition of daily revenue: trend =
# centered 7-day mean (partial frames at the edges keep their partial
# mean — identical frame semantics both engines), seasonal = per-ISO-dow
# mean of the detrended series, residual = the remainder. Exact integer
# cents feed the q132 two-step (double division -> DECIMAL(18,6) cast ->
# ROUND 4) at each stage, so every emitted value is engine-exact. The
# trend window is unpartitioned over the DAY-GRAIN aggregate (bounded by
# the calendar — tests/test_window_lint.py inventory).
@query(
    "q272_seasonal_decompose",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY day),
    tr AS (
      SELECT day, cents,
             ROUND(CAST(CAST(SUM(cents) OVER w AS DOUBLE)
                        / COUNT(*) OVER w AS DECIMAL(18,6)), 4) AS trend
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    dt AS (
      SELECT day, cents, trend, isodow(day) AS dow,
             CAST(cents AS DECIMAL(18,6)) - trend AS det
      FROM tr),
    se AS (
      SELECT dow,
             ROUND(CAST(CAST(SUM(det) AS DOUBLE) / COUNT(*)
                        AS DECIMAL(18,6)), 4) AS seasonal
      FROM dt GROUP BY dow)
    SELECT day, cents, CAST(trend AS DOUBLE) AS trend,
           CAST(seasonal AS DOUBLE) AS seasonal,
           CAST(ROUND(CAST(cents AS DECIMAL(18,6)) - trend - seasonal, 4)
                AS DOUBLE) AS resid
    FROM dt JOIN se USING (dow) ORDER BY day
    """,
    doc="Trend / day-of-week seasonal / residual decomposition of daily "
        "revenue cents: centered 7-day mean, per-dow detrended mean, "
        "decimal-quantized at every stage.",
)
def q272(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
        .alias("cents"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = d.select(
        "day", "cents",
        F.round((F.sum("cents").over(w).cast("double")
                 / F.count("*").over(w)).cast("decimal(18,6)"), 4)
        .alias("trend"))
    dt = tr.select(
        "day", "cents", "trend",
        F.expr("((dayofweek(day) + 5) % 7) + 1").cast("int").alias("dow"),
        (F.col("cents").cast("decimal(18,6)") - F.col("trend"))
        .alias("det"))
    se = dt.groupBy("dow").agg(
        F.round((F.sum("det").cast("double") / F.count("*"))
                .cast("decimal(18,6)"), 4).alias("seasonal"))
    return (
        dt.join(F.broadcast(se), "dow")
        .select(
            "day", "cents",
            F.col("trend").cast("double").alias("trend"),
            F.col("seasonal").cast("double").alias("seasonal"),
            F.round(F.col("cents").cast("decimal(18,6)") - F.col("trend")
                    - F.col("seasonal"), 4).cast("double").alias("resid"))
        .orderBy("day")
    )
