"""Statistical-aggregate, frequency-sketch and window-value queries
(SURVEY.md §2.2d/e extension — round-1 late widening).

Cross-dialect notes (empirically verified at sf0.01 this round):

- ``corr``/``covar_*``/``stddev_samp``/``var_samp``/``regr_*`` agree between
  Spark and DuckDB to ~1e-15 relative (both implement the streaming
  covariance update on doubles); the standard r4 rounding absorbs that.
- ``skewness``/``kurtosis`` genuinely DIFFER: Spark returns population
  moments (g1, excess g2), DuckDB sample-adjusted (G1, G2). The oracle
  converts with the exact scalar identities
  ``g1 = G1 * (n-2) / sqrt(n*(n-1))`` and
  ``g2 = (G2*(n-2)*(n-3)/(n-1) - 6) / (n+1)`` (agrees to 1e-14).
- DuckDB has no ``posexplode``; the oracle pairs ``unnest`` with
  ``generate_subscripts(arr, 1) - 1``, which DuckDB aligns positionally.
- EWMA weights are embedded as full-precision ``repr`` literals so both
  engines parse bit-identical doubles; term order is the same left-assoc
  chain on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspectadb_spark.operators.pipeline import _md5_uniform_int_sql
from inspectadb_spark.operators.sketches import cms_estimate, cms_sketch
from inspectadb_spark.operators.timeseries import ewma
from inspectadb_spark.queries.registry import davg, query, r4, r4c, sql, tables


# --------------------------------------------------------------------------
# Q89 moment statistics per event type: correlation/covariance of value vs
# hour-of-day, dispersion, shape. One map-side-combinable aggregation.
@query(
    "q89_stat_moments",
    oracle=f"""
    SELECT event_type,
           {r4("corr(CAST(hour(ts) AS DOUBLE), value)")} AS corr_hv,
           {r4("covar_pop(CAST(hour(ts) AS DOUBLE), value)")} AS cov_pop,
           {r4("covar_samp(CAST(hour(ts) AS DOUBLE), value)")} AS cov_samp,
           {r4("stddev_samp(value)")} AS sd,
           {r4("var_samp(value)")} AS vr,
           {r4("skewness(value) * (COUNT(value)-2) / sqrt(COUNT(value)*(COUNT(value)-1.0))")} AS sk,
           {r4("(kurtosis(value) * (COUNT(value)-2.0)*(COUNT(value)-3.0)/(COUNT(value)-1.0) - 6) / (COUNT(value)+1.0)")} AS ku
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="corr/covar/stddev/var/skewness/kurtosis per group; oracle converts "
        "DuckDB's sample G1/G2 to Spark's population g1/g2 exactly.",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.hour("ts").cast("double")
    v = F.col("value")
    return (
        tables(spark, sf_dir)["events"]
        .groupBy("event_type")
        .agg(
            r4c(F.corr(h, v)).alias("corr_hv"),
            r4c(F.covar_pop(h, v)).alias("cov_pop"),
            r4c(F.covar_samp(h, v)).alias("cov_samp"),
            r4c(F.stddev_samp(v)).alias("sd"),
            r4c(F.var_samp(v)).alias("vr"),
            r4c(F.skewness(v)).alias("sk"),
            r4c(F.kurtosis(v)).alias("ku"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q89b linear-regression aggregates: value ~ hour-of-day trend per type.
_REGR_X = "CAST(hour(ts) AS DOUBLE)"


@query(
    "q89b_regression",
    oracle=f"""
    SELECT event_type,
           CAST(regr_count(value, {_REGR_X}) AS BIGINT) AS n,
           {r4(f"regr_slope(value, {_REGR_X})")} AS slope,
           {r4(f"regr_intercept(value, {_REGR_X})")} AS icept,
           {r4(f"regr_r2(value, {_REGR_X})")} AS r2,
           {r4(f"regr_avgx(value, {_REGR_X})")} AS avgx,
           {r4(f"regr_avgy(value, {_REGR_X})")} AS avgy,
           {r4(f"regr_sxx(value, {_REGR_X})")} AS sxx,
           {r4(f"regr_syy(value, {_REGR_X})")} AS syy,
           {r4(f"regr_sxy(value, {_REGR_X})")} AS sxy
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Full regr_* family (slope/intercept/r2/moment sums) — in-database "
        "linear trend fitting, one pass, no driver round-trip.",
)
def q89b(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = "double(hour(ts))"

    def rg(fn: str):
        return r4c(F.expr(f"regr_{fn}(value, {x})"))

    return (
        tables(spark, sf_dir)["events"]
        .groupBy("event_type")
        .agg(
            F.expr(f"regr_count(value, {x})").cast("bigint").alias("n"),
            rg("slope").alias("slope"),
            rg("intercept").alias("icept"),
            rg("r2").alias("r2"),
            rg("avgx").alias("avgx"),
            rg("avgy").alias("avgy"),
            rg("sxx").alias("sxx"),
            rg("syy").alias("syy"),
            rg("sxy").alias("sxy"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q90 bitwise / boolean aggregates + exact median.
@query(
    "q90_bit_bool_aggs",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_custkey) AS b_and, bit_or(o_custkey) AS b_or,
           bit_xor(o_custkey) AS b_xor,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(median(o_custkey) AS DOUBLE) AS med_cust
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="bit_and/or/xor, bool_and/bool_or, exact median per group.",
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables(spark, sf_dir)["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_custkey").alias("b_and"),
            F.bit_or("o_custkey").alias("b_or"),
            F.bit_xor("o_custkey").alias("b_xor"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.median("o_custkey").cast("double").alias("med_cust"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Q90b ordered string aggregation (LISTAGG ... WITHIN GROUP, SQL:2016).
@query(
    "q90b_listagg",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="listagg(DISTINCT ..) WITHIN GROUP (ORDER BY ..) == DuckDB "
        "string_agg with ORDER BY: deterministic ordered concatenation. "
        "(Mixing it with COUNT(DISTINCT) in one agg hits a Spark 4.1 "
        "analyzer ClassCastException — kept single-aggregate.)",
)
def q90b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sql(
        spark, sf_dir,
        """
        SELECT lang,
               listagg(DISTINCT source, ',') WITHIN GROUP (ORDER BY source)
                 AS sources
        FROM documents GROUP BY lang ORDER BY lang
        """,
    )


# --------------------------------------------------------------------------
# Q91 window value functions over an explicit sliding frame.
@query(
    "q91_window_values",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
    ORDER BY user_id, event_id LIMIT 1000
    """,
    doc="first/last/nth_value on a bounded ROWS frame with unique ordering.",
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 1)
    )
    return (
        tables(spark, sf_dir)["events"]
        .select(
            "event_id", "user_id",
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(w).alias("last_v"),
            F.nth_value("value", 2).over(w).alias("second_v"),
        )
        .orderBy("user_id", "event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q92 generator with ordinality: token positions via posexplode.
@query(
    "q92_posexplode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id < 50
    ORDER BY doc_id, pos LIMIT 2000
    """,
    doc="posexplode (position-preserving generator); DuckDB oracle aligns "
        "unnest with generate_subscripts.",
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
        .orderBy("doc_id", "pos")
        .limit(2000)
    )


# --------------------------------------------------------------------------
# Q93 truncated EWMA — see operators/timeseries.py::ewma for why the k-term
# lag form is the distributable shape of the recursive definition.
_EWMA_ALPHA, _EWMA_K = 0.3, 10


def _ewma_oracle() -> str:
    num, den = "0.0", "0.0"
    for j in range(_EWMA_K):
        wj = repr((1.0 - _EWMA_ALPHA) ** j)
        lj = f"lag(value, {j}) OVER w"
        num += f" + COALESCE({lj}, 0.0) * {wj}"
        den += f" + (CASE WHEN {lj} IS NOT NULL THEN {wj} ELSE 0.0 END)"
    return f"""
    SELECT user_id, event_id,
           {r4(f"({num}) / ({den})")} AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id LIMIT 1000
    """


@query(
    "q93_ewma",
    oracle=_ewma_oracle(),
    doc="Exponentially-weighted moving average, k-term truncation "
        "(tail weight < (1-a)^k), adjust=True renormalization.",
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ewma(tables(spark, sf_dir)["events"],
             alpha=_EWMA_ALPHA, k=_EWMA_K)
        .select("user_id", "event_id",
                r4c(F.col("ewma")).alias("ewma"))
        .orderBy("user_id", "event_id")
        .limit(1000)
    )


# --------------------------------------------------------------------------
# Q94 Count-Min sketch frequency estimates (operators/sketches.py::cms_*).
# The probe set is every user_id < 40; estimates are exact-matched because
# both engines compute the identical md5 grid.
_CMS_NIB = (
    "CAST((16 * (strpos('0123456789abcdef', substr(md5(concat("
    "CAST({v} AS VARCHAR), ':cms:', CAST({d} AS VARCHAR))), 1, 1)) - 1)"
    " + strpos('0123456789abcdef', substr(md5(concat("
    "CAST({v} AS VARCHAR), ':cms:', CAST({d} AS VARCHAR))), 2, 1)) - 1)"
    " % 256 AS INT)"
)


@query(
    "q94_cms_estimates",
    oracle=f"""
    WITH deps AS (SELECT unnest([0, 1, 2, 3]) AS d),
    sk AS (
      SELECT d, {_CMS_NIB.format(v="user_id", d="d")} AS bucket,
             COUNT(*) AS cnt
      FROM events CROSS JOIN deps GROUP BY 1, 2),
    pr AS (SELECT DISTINCT user_id FROM events WHERE user_id < 40),
    pb AS (SELECT p.user_id, deps.d,
                  {_CMS_NIB.format(v="p.user_id", d="deps.d")} AS bucket
           FROM pr p CROSS JOIN deps)
    SELECT pb.user_id, MIN(COALESCE(sk.cnt, 0)) AS est
    FROM pb LEFT JOIN sk USING (d, bucket)
    GROUP BY pb.user_id ORDER BY pb.user_id
    """,
    doc="Count-Min sketch point estimates, relational grid form — mergeable "
        "frequency counts whose storage is depth*width rows regardless of "
        "input size; never underestimates.",
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    sketch = cms_sketch(ev, "user_id")
    probes = ev.filter(F.col("user_id") < 40).select("user_id").distinct()
    return cms_estimate(sketch, probes, "user_id").orderBy("user_id")


# --------------------------------------------------------------------------
# Q100 equi-width histogram via pure arithmetic binning — the portable,
# single-aggregation shape of value-distribution profiling (no width_bucket
# dependency; LEAST caps the open top bin).
@query(
    "q100_histogram",
    oracle="""
    SELECT event_type,
           CAST(LEAST(FLOOR(value / 25.0), 19) AS INT) AS bin,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM events
    GROUP BY event_type, LEAST(FLOOR(value / 25.0), 19)
    ORDER BY event_type, bin
    """,
    doc="Equi-width histogram (20 bins of 25) per event type: one "
        "map-side-combinable aggregation, bins not rows cross the wire.",
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        tables(spark, sf_dir)["events"]
        .groupBy("event_type", b.alias("bin"))
        .agg(F.count("*").alias("n"),
             F.min("value").cast("double").alias("lo"),
             F.max("value").cast("double").alias("hi"))
        .orderBy("event_type", "bin")
    )


# --------------------------------------------------------------------------
# Q145 key-skew profile of the events.user_id shuffle key: the diagnostic a
# planner consults before picking salted_join / two_level_agg. All derived
# measures are integer floor arithmetic — byte-identical across engines.
@query(
    "q145_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS cnt
      FROM events GROUP BY user_id),
    s AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM counts),
    top AS (
      SELECT key, cnt FROM counts ORDER BY cnt DESC, key LIMIT 5)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rank,
           key, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(cnt * 100 * n_keys // total AS BIGINT) AS x_avg_x100
    FROM top CROSS JOIN s
    ORDER BY rank
    """,
    doc="Top-5 heavy keys of the user_id shuffle key with integer-exact "
        "share (ppm) and times-average (×100) factors.",
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import skew_profile

    return skew_profile(tables(spark, sf_dir)["events"], "user_id", top_k=5)


# --------------------------------------------------------------------------
# Q146 z-order layout audit: Morton-interleave (user bucket × hour bucket),
# bucket the key space, and report per-bucket coordinate envelopes — small
# envelopes are WHY a z-ordered file layout prunes scans on either column.
# The key is pure integer arithmetic (DIV/%/×): no bit-op dialect drift.
_Q146_Z = " + ".join(
    f"((ux DIV {1 << j}) % 2) * {1 << (2 * j)}"
    f" + ((hx DIV {1 << j}) % 2) * {1 << (2 * j + 1)}"
    for j in range(8)
)


@query(
    "q146_zorder_layout",
    oracle=f"""
    WITH c AS (
      SELECT user_id % 256 AS ux,
             (epoch_us(ts) // 3600000000) % 256 AS hx
      FROM events),
    z AS (
      SELECT ux, hx, ({_Q146_Z.replace("DIV", "//")}) AS zkey FROM c)
    SELECT CAST(zkey // 1024 AS BIGINT) AS bucket, COUNT(*) AS n,
           CAST(MIN(ux) AS BIGINT) AS ux_lo, CAST(MAX(ux) AS BIGINT) AS ux_hi,
           CAST(MIN(hx) AS BIGINT) AS hx_lo, CAST(MAX(hx) AS BIGINT) AS hx_hi
    FROM z GROUP BY bucket ORDER BY bucket
    """,
    doc="Z-order clustering audit: per-1024-key bucket row counts and "
        "coordinate envelopes over (user, hour) Morton keys.",
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import zorder_key

    ev = tables(spark, sf_dir)["events"]
    c = ev.select(
        (F.col("user_id") % 256).alias("ux"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 % 256")
        .alias("hx"),
    )
    z = c.withColumn("zkey", zorder_key("ux", "hx", bits=8))
    return (
        z.groupBy(F.expr("zkey DIV 1024").cast("bigint").alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.min("ux").cast("bigint").alias("ux_lo"),
             F.max("ux").cast("bigint").alias("ux_hi"),
             F.min("hx").cast("bigint").alias("hx_lo"),
             F.max("hx").cast("bigint").alias("hx_hi"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Q148 per-dimension quartile discretization of the embedding space — the
# feature-binning step of a training pipeline. Floats are integer-quantized
# first (the q125 technique), quartiles assigned by ntile(4) over the
# deterministic (q, vec_id) order, envelopes reported per (dim, quartile).
@query(
    "q148_embedding_quartiles",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS q
      FROM embeddings),
    t AS (
      SELECT pos, q,
             CAST(NTILE(4) OVER (PARTITION BY pos ORDER BY q, vec_id) AS INT)
               AS quartile
      FROM x)
    SELECT pos, quartile, COUNT(*) AS n,
           MIN(q) AS q_lo, MAX(q) AS q_hi
    FROM t WHERE pos < 8 GROUP BY pos, quartile ORDER BY pos, quartile
    """,
    doc="Quartile feature binning over the first 8 embedding dims: "
        "integer-quantized values, deterministic ntile boundaries.",
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id", "pos",
        F.round(F.col("v").cast("double") * 10000).cast("bigint").alias("q"),
    ).filter(F.col("pos") < 8)
    t = x.withColumn(
        "quartile",
        F.ntile(4).over(Window.partitionBy("pos").orderBy("q", "vec_id"))
        .cast("int"),
    )
    return (
        t.groupBy("pos", "quartile")
        .agg(F.count("*").alias("n"),
             F.min("q").alias("q_lo"), F.max("q").alias("q_hi"))
        .orderBy("pos", "quartile")
    )


# --------------------------------------------------------------------------
# Q149 upper-triangle covariance of the first 16 embedding dims — the
# sufficient-statistics input to PCA/whitening. Integer-exact: q125
# quantization, BIGINT sums, cov_num = n·Σqiqj − Σqi·Σqj; the only double
# op is the final division, identical left-assoc on both engines.
@query(
    "q149_embedding_covariance",
    oracle="""
    WITH e AS (
      SELECT list_transform(embedding[1:16],
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT))
               AS q
      FROM embeddings),
    p AS (SELECT q, unnest(generate_series(0, 14)) AS i FROM e),
    pp AS (SELECT q, i, unnest(generate_series(i + 1, 15)) AS j FROM p),
    s AS (SELECT i, j, COUNT(*) AS n,
            CAST(SUM(q[i + 1] * q[j + 1]) AS BIGINT) AS sxy,
            CAST(SUM(q[i + 1]) AS BIGINT) AS sx,
            CAST(SUM(q[j + 1]) AS BIGINT) AS sy
          FROM pp GROUP BY i, j)
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n,
           CAST(ROUND(CAST(CAST(n * sxy - sx * sy AS DOUBLE) / n / n
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS cov_q
    FROM s ORDER BY i, j
    """,
    doc="Integer-exact covariance matrix (upper triangle, dims 0–15) over "
        "quantized embeddings — PCA sufficient statistics.",
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import embedding_covariance

    return embedding_covariance(tables(spark, sf_dir)["embeddings"]).orderBy("i", "j")


# --------------------------------------------------------------------------
# Q155 CUSUM change-point detection per event type — the running-max
# recursion in its window closed form (P − min(0, running-min P)), all in
# exact decimal so the alert decision is engine-portable.
@query(
    "q155_cusum",
    oracle="""
    WITH w AS (
      SELECT event_type, ts, event_id,
             SUM(CAST(value AS DECIMAL(18,6)) - CAST(52 AS DECIMAL(18,6)))
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM events),
    s AS (
      SELECT event_type,
             p - LEAST(CAST(0 AS DECIMAL(18,6)),
                       MIN(p) OVER (PARTITION BY event_type
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS cu
      FROM w)
    SELECT event_type,
           COUNT(CASE WHEN cu > CAST(800 AS DECIMAL(18,6)) THEN 1 END)
             AS n_alerts,
           CAST(ROUND(CAST(MAX(cu) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS max_cusum,
           COUNT(*) AS n
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="One-sided CUSUM (k=52, h=800) per event type in exact decimal; "
        "two windows over one sort.",
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import cusum_alerts

    return cusum_alerts(
        tables(spark, sf_dir)["events"],
        key_col="event_type", ts_col="ts", value_col="value",
        id_col="event_id", k=52.0, h=800.0,
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q156 RFM customer scoring over purchase events: recency (days since last
# purchase vs corpus horizon), frequency, monetary (decimal-exact), each
# discretized to a 1–5 ntile score with deterministic tie-breaks.
@query(
    "q156_rfm",
    oracle="""
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    horizon AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM p),
    base AS (
      SELECT user_id,
             CAST(datediff('day', MAX(CAST(ts AS DATE)), maxd) AS INT)
               AS recency_days,
             COUNT(*) AS freq,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
      FROM p CROSS JOIN horizon GROUP BY user_id, maxd)
    SELECT user_id, recency_days, freq, monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INT)
             AS r_score,
           CAST(NTILE(5) OVER (ORDER BY freq DESC, user_id) AS INT)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS INT)
             AS m_score
    FROM base ORDER BY user_id
    """,
    doc="RFM segmentation: per-user recency/frequency/monetary with "
        "deterministic 1-5 ntile scores.",
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tables(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "value")
    horizon = p.agg(F.max(F.col("ts").cast("date")).alias("maxd"))
    base = (
        p.join(F.broadcast(horizon))
        .groupBy("user_id", "maxd")
        .agg(
            F.max(F.col("ts").cast("date")).alias("_last"),
            F.count("*").alias("freq"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("monetary"),
        )
        .select(
            "user_id",
            F.datediff("maxd", "_last").cast("int").alias("recency_days"),
            "freq", "monetary",
        )
    )
    # Each 1-5 score is NTILE(5) in closed form over a bucket-offset
    # distributed rank (operators/scale.py::global_ntile) — a plain
    # Window.orderBy ntile serializes EVERY user through one task, the
    # single-task window trap this corpus pins shut elsewhere (q214/q257/
    # q263). DESC sorts negate into the monotone bucket key; FLOOR makes
    # the double monetary bucket-able without perturbing the exact
    # within-bucket (monetary DESC, user_id) order.
    from inspectadb_spark.operators.scale import global_ntile

    scored = global_ntile(
        base, 5, F.expr("recency_days DIV 30"),
        [F.col("recency_days"), F.col("user_id")], "r_score")
    scored = global_ntile(
        scored, 5, F.expr("(-freq) DIV 4"),
        [F.desc("freq"), F.col("user_id")], "f_score")
    scored = global_ntile(
        scored, 5, F.expr("(-FLOOR(monetary)) DIV 100"),
        [F.desc("monetary"), F.col("user_id")], "m_score")
    return scored.select(
        "user_id", "recency_days", "freq", "monetary",
        "r_score", "f_score", "m_score",
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Q161 Benford first-digit audit per event type — the fraud/DQ screen.
# The first significant digit comes from the integer-cents STRING (no
# logarithms, no float thresholds), shares are integer ppm, and the
# Benford expectation is embedded as exact ppm literals (they sum to
# 1,000,000), so the whole audit is engine-portable integer math.
_BENFORD_PPM = ("CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 "
                "WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181 "
                "WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153 "
                "ELSE 45757 END")


@query(
    "q161_benford",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM events WHERE value >= 0.01),
    c AS (SELECT event_type, digit, COUNT(*) AS n
          FROM d GROUP BY event_type, digit),
    t AS (SELECT event_type, SUM(n) AS tot FROM c GROUP BY event_type)
    SELECT event_type, digit, n,
           CAST(n * 1000000 // tot AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_PPM} AS BIGINT) AS benford_ppm,
           CAST(n * 1000000 // tot - ({_BENFORD_PPM}) AS BIGINT) AS diff_ppm
    FROM c JOIN t USING (event_type)
    ORDER BY event_type, digit
    """,
    doc="Benford's-law first-digit audit per event type: integer-cents "
        "digit extraction, ppm shares, exact expectation literals.",
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"].filter(F.col("value") >= 0.01)
    d = ev.select(
        "event_type",
        F.expr("CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS STRING),"
               " 1, 1) AS INT)").alias("digit"),
    )
    c = d.groupBy("event_type", "digit").agg(F.count("*").alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "event_type")
        .select(
            "event_type", "digit", "n",
            F.expr("n * 1000000 DIV tot").alias("obs_ppm"),
            F.expr(f"CAST({_BENFORD_PPM} AS BIGINT)").alias("benford_ppm"),
            F.expr(f"n * 1000000 DIV tot - ({_BENFORD_PPM})").alias("diff_ppm"),
        )
        .orderBy("event_type", "digit")
    )


# --------------------------------------------------------------------------
# Q166 chi-square independence screen (event_type × day-of-week): per-cell
# contributions quantized to decimal BEFORE summation so the statistic is
# aggregation-order-exact; expected counts are the identical double
# expression on both engines.
@query(
    "q166_chi_square",
    oracle="""
    WITH o AS (
      SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
             COUNT(*) AS obs
      FROM events GROUP BY event_type, dow),
    rt AS (SELECT event_type, SUM(obs) AS r FROM o GROUP BY event_type),
    ct AS (SELECT dow, SUM(obs) AS c FROM o GROUP BY dow),
    n AS (SELECT SUM(obs) AS n FROM o),
    cells AS (
      SELECT o.event_type,
             ROUND(CAST((CAST(obs AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                        * (CAST(obs AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                        / (CAST(r * c AS DOUBLE) / n)
                        AS DECIMAL(18,6)), 4) AS term
      FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n)
    SELECT event_type, COUNT(*) AS n_cells,
           CAST(ROUND(CAST(SUM(term) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS chi2_contrib
    FROM cells GROUP BY event_type ORDER BY event_type
    """,
    doc="Chi-square independence contributions (type × dow) with per-cell "
        "decimal quantization — order-exact across engines.",
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    o = ev.groupBy(
        "event_type",
        F.expr("CAST(dayofweek(CAST(ts AS DATE)) AS INT)").alias("dow"),
    ).agg(F.count("*").alias("obs"))
    # r13 single-scan shape (see q281): marginals via partitioned window
    # sums over the domain-bounded cell frame instead of equi-join-backs,
    # whose implied isnotnull filters split the rt/ct/n branches into four
    # events scans. The when() guard reproduces the joins' null semantics
    # per cell; a NULL event_type (or all-null-dow) group then folds to
    # n_cells = 0 and is dropped AFTER aggregation — exactly the rows the
    # joins used to drop — without a pushable key filter.
    n = o.agg(F.sum("obs").alias("n"))
    e = "CAST(r * c AS DOUBLE) / n"
    both = F.col("event_type").isNotNull() & F.col("dow").isNotNull()
    cells = (
        o.select(
            "event_type", "dow", "obs",
            F.sum("obs").over(Window.partitionBy("event_type")).alias("r"),
            F.sum("obs").over(Window.partitionBy("dow")).alias("c"))
        .join(F.broadcast(n))
        .select(
            "event_type",
            F.when(both, F.round(
                F.expr(f"(CAST(obs AS DOUBLE) - {e})"
                       f" * (CAST(obs AS DOUBLE) - {e})"
                       f" / ({e})").cast("decimal(18,6)"), 4)).alias("term"),
            F.when(both, F.lit(1)).alias("_cell"))
    )
    return (
        cells.groupBy("event_type")
        .agg(F.count("_cell").alias("n_cells"),
             F.round(F.sum("term").cast("decimal(18,6)"), 4).cast("double")
             .alias("chi2_contrib"))
        .filter(F.col("n_cells") > 0)
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q167 market concentration (HHI) per nation: customer revenue shares in
# integer ppm, HHI = Σ share², all integer arithmetic end to end.
@query(
    "q167_hhi",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nk, o.o_custkey AS cust,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nk, cust),
    tot AS (SELECT nk, SUM(cents) AS t FROM rev GROUP BY nk),
    sh AS (SELECT nk, CAST(cents * 1000000 // t AS BIGINT) AS ppm
           FROM rev JOIN tot USING (nk))
    SELECT n.n_name, COUNT(*) AS n_firms,
           CAST(SUM(ppm * ppm) AS BIGINT) AS hhi_ppm2
    FROM sh JOIN nation n ON sh.nk = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    doc="Herfindahl–Hirschman concentration per nation: integer-ppm "
        "revenue shares, HHI = Σ share² exactly.",
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    rev = (
        t["orders"].join(
            t["customer"],
            t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("cust"))
        .agg(F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                    " AS BIGINT)").alias("cents"))
    )
    tot = rev.groupBy("nk").agg(F.sum("cents").alias("t"))
    sh = rev.join(F.broadcast(tot), "nk").select(
        "nk", F.expr("cents * 1000000 DIV t").alias("ppm"))
    return (
        sh.join(F.broadcast(t["nation"]),
                sh["nk"] == t["nation"]["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count("*").alias("n_firms"),
             F.sum(F.expr("ppm * ppm")).alias("hhi_ppm2"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Shared PSI readout (q173 / the S47 live drift monitor): the closed-form
# arithmetic from the (event_type, bin, half) COUNT frame down to the
# per-type PSI — grid completion (absent cells are real zeros, not
# missing rows), Laplace-smoothed integer-ppm shares, per-bin terms
# quantized to decimal BEFORE summing. Factored out exactly like
# srm_readout (S45) and ece_readout (S46), so the live monitor and the
# batch query cannot drift.


def psi_readout(c: DataFrame, n_bins: int = 10) -> DataFrame:
    """PSI per event_type from exact bin counts ``c`` with columns
    (event_type, bin, half, n): half 0 is the reference distribution,
    half 1 the current one. Shared with the S47 live monitor, whose
    IncrementalAggregate state carries the SAME exact counts for the
    current side."""
    # r13 single-consumer shape: the r12 form materialized a (type, bin,
    # half) grid and consumed ``c`` four times (distinct types, grid join,
    # totals, shares), so c's whole upstream lineage — the events scan in
    # q173 — was re-planned four to six times. Bins are a FIXED small
    # domain (n_bins), so each (type, half) collapses to ONE row carrying
    # its total and a bin -> count map; the grid is then re-expanded from
    # a broadcast range with try_element_at(map) standing in for the
    # grid's COALESCE(n, 0). Identical integer arithmetic (Laplace ppm
    # DIV, per-bin decimal-quantized terms), one pass over ``c``; a half
    # with no rows at all folds to tot 0 / empty map, exactly the all-zero
    # grid rows the left join used to synthesize.
    spark = c.sparkSession
    per = (c.groupBy("event_type", "half")
           .agg(F.sum("n").alias("tot"),
                F.map_from_entries(
                    F.collect_list(F.struct("bin", "n"))).alias("m")))
    halves = (per.groupBy("event_type")
              .agg(F.coalesce(
                       F.first(F.when(F.col("half") == 0, F.col("tot")),
                               ignorenulls=True), F.lit(0)).alias("tot0"),
                   F.coalesce(
                       F.first(F.when(F.col("half") == 1, F.col("tot")),
                               ignorenulls=True), F.lit(0)).alias("tot1"),
                   F.first(F.when(F.col("half") == 0, F.col("m")),
                           ignorenulls=True).alias("m0"),
                   F.first(F.when(F.col("half") == 1, F.col("m")),
                           ignorenulls=True).alias("m1")))
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    w = (halves.join(F.broadcast(bins))
         .select(
             "event_type",
             F.expr(f"(coalesce(try_element_at(m0, bin), 0) + 1) * 1000000"
                    f" DIV (tot0 + {n_bins})").alias("ppm0"),
             F.expr(f"(coalesce(try_element_at(m1, bin), 0) + 1) * 1000000"
                    f" DIV (tot1 + {n_bins})").alias("ppm1"))
         .select(
             "event_type",
             F.round(
                 F.expr("(CAST(ppm0 AS DOUBLE) - ppm1) / 1000000"
                        " * ln(CAST(ppm0 AS DOUBLE) / ppm1)")
                 .cast("decimal(18,6)"),
                 6,
             ).alias("term")))
    return (
        w.groupBy("event_type")
        .agg(F.round(F.sum("term").cast("decimal(18,6)"), 4).cast("double")
             .alias("psi"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q173 population-stability-index drift monitor: value-bin distributions of
# the first half of the event stream vs the second (split at max id / 2),
# Laplace-smoothed integer-ppm shares, per-bin PSI terms quantized to
# decimal BEFORE summing — the ML-monitoring drift score, order-exact.
@query(
    "q173_psi_drift",
    oracle="""
    WITH half AS (SELECT MAX(event_id) // 2 AS mid FROM events),
    b AS (
      SELECT event_type,
             CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bin,
             CASE WHEN event_id <= mid THEN 0 ELSE 1 END AS half
      FROM events CROSS JOIN half),
    c AS (SELECT event_type, bin, half, COUNT(*) AS n
          FROM b GROUP BY event_type, bin, half),
    grid AS (
      SELECT DISTINCT e.event_type, g.bin, h.half
      FROM (SELECT DISTINCT event_type FROM c) e
      CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) g
      CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS half) h),
    f AS (
      SELECT grid.event_type, grid.bin, grid.half, COALESCE(c.n, 0) AS n
      FROM grid LEFT JOIN c USING (event_type, bin, half)),
    t AS (SELECT event_type, half, SUM(n) AS tot
          FROM f GROUP BY event_type, half),
    p AS (
      SELECT f.event_type, f.bin, f.half,
             CAST((n + 1) * 1000000 // (tot + 10) AS BIGINT) AS ppm
      FROM f JOIN t USING (event_type, half)),
    w AS (
      SELECT p0.event_type, p0.bin,
             ROUND(CAST((CAST(p0.ppm AS DOUBLE) - p1.ppm) / 1000000
                        * ln(CAST(p0.ppm AS DOUBLE) / p1.ppm)
                        AS DECIMAL(18,6)), 6) AS term
      FROM (SELECT * FROM p WHERE half = 0) p0
      JOIN (SELECT * FROM p WHERE half = 1) p1
        USING (event_type, bin))
    SELECT event_type,
           CAST(ROUND(CAST(SUM(term) AS DECIMAL(18,6)), 4) AS DOUBLE) AS psi
    FROM w GROUP BY event_type ORDER BY event_type
    """,
    doc="PSI drift between stream halves: Laplace-smoothed integer-ppm "
        "bin shares, per-bin decimal-quantized terms, order-exact sum.",
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    half = ev.agg(F.expr("MAX(event_id) DIV 2").alias("mid"))
    b = ev.join(F.broadcast(half)).select(
        "event_type",
        F.expr("CAST(LEAST(FLOOR(value / 50.0), 9) AS INT)").alias("bin"),
        F.expr("CASE WHEN event_id <= mid THEN 0 ELSE 1 END").alias("half"),
    )
    c = b.groupBy("event_type", "bin", "half").agg(F.count("*").alias("n"))
    return psi_readout(c)


# --------------------------------------------------------------------------
# Q174 deterministic group mode: the modal hour-of-day per event type with
# an explicit (count DESC, bin ASC) tie rule — built-in mode() is
# tie-arbitrary in both engines, so the rank formulation is the portable
# one. One counts agg + a |types·bins|-sized window. Previously binned
# `value / 50`, whose modal bin was identically 0 for every type at sf0.01
# (value mass concentrates under 50 — the q326 degeneracy class, caught by
# the round-9 oracle-constant sweep: an always-returns-bin-0 mode would
# hash-match); the hour-of-day mode varies across types and SFs.
@query(
    "q174_group_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS bin,
             COUNT(*) AS n
      FROM events GROUP BY event_type, bin),
    r AS (
      SELECT event_type, bin, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, bin) AS rk
      FROM c)
    SELECT event_type, bin AS mode_bin, n AS mode_n
    FROM r WHERE rk = 1 ORDER BY event_type
    """,
    doc="Deterministic mode (modal activity hour) per type with explicit "
        "(count DESC, bin ASC) tie rule.",
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy(
        "event_type",
        F.hour("ts").cast("int").alias("bin"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "bin")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("bin").alias("mode_bin"),
                F.col("n").alias("mode_n"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q175 Gini inequality coefficient per nation over customer revenue — the
# sorted-rank closed form G = Σ(2i − n − 1)·x(i) / (n·Σx): one sort
# window + integer sums, never the O(n²) pairwise-difference definition.
# Output in ppm, exact BIGINT arithmetic end to end.
@query(
    "q175_gini",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nk, o.o_custkey AS cust,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY nk, cust),
    rk AS (
      SELECT nk, cents,
             ROW_NUMBER() OVER (PARTITION BY nk ORDER BY cents, cust) AS i,
             COUNT(*) OVER (PARTITION BY nk) AS n
      FROM rev),
    g AS (
      SELECT nk, n,
             CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS num,
             CAST(SUM(cents) AS BIGINT) AS tot
      FROM rk GROUP BY nk, n)
    SELECT na.n_name, CAST(n AS BIGINT) AS n_firms,
           -- HUGEINT intermediate: num*1e6 exceeds int64 once a nation's
           -- rank-weighted cents sum passes ~9e12 (seen at sf0.1)
           CAST((CAST(num AS HUGEINT) * 1000000) // (CAST(n AS HUGEINT) * tot)
                AS BIGINT) AS gini_ppm
    FROM g JOIN nation na ON g.nk = na.n_nationkey
    ORDER BY na.n_name
    """,
    doc="Gini coefficient per nation via the sorted-rank closed form — "
        "one window sort, integer-ppm exact, no pairwise join.",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    rev = (
        t["orders"].join(
            t["customer"],
            t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("cust"))
        .agg(F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                    " AS BIGINT)").alias("cents"))
    )
    w = Window.partitionBy("nk").orderBy("cents", "cust")
    wn = Window.partitionBy("nk")
    rk = rev.select(
        "nk", "cents",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wn).alias("n"),
    )
    g = rk.groupBy("nk", "n").agg(
        F.expr("CAST(SUM((2 * i - n - 1) * cents) AS BIGINT)").alias("num"),
        F.expr("CAST(SUM(cents) AS BIGINT)").alias("tot"),
    )
    return (
        g.join(F.broadcast(t["nation"]), g["nk"] == t["nation"]["n_nationkey"])
        .select(
            "n_name", F.col("n").cast("bigint").alias("n_firms"),
            # decimal(38) intermediate for the same reason as the oracle's
            # HUGEINT: the ppm numerator overflows int64 at ~10x test SF
            F.expr("CAST(num AS DECIMAL(38,0)) * 1000000"
                   " DIV (CAST(n AS DECIMAL(38,0)) * tot)").alias("gini_ppm"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Q176 autocorrelation of daily revenue at lags 1 and 7 over the
# gap-complete calendar: Pearson on (x_t, x_{t−k}) pairs from exact
# integer-cent sums; the only doubles are the final quotient and sqrt,
# identical expressions on both engines, 4dp-pinned.
@query(
    "q176_autocorrelation",
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
      SELECT day, COALESCE(cents, 0) AS cents
      FROM days LEFT JOIN rev USING (day)),
    lagged AS (
      SELECT cents AS x,
             LAG(cents, 1) OVER (ORDER BY day) AS y1,
             LAG(cents, 7) OVER (ORDER BY day) AS y7
      FROM series),
    pairs AS (
      SELECT 1 AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
      UNION ALL
      SELECT 7, x, y7 FROM lagged WHERE y7 IS NOT NULL),
    s AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag)
    SELECT lag, n,
           CAST(ROUND(CAST(
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS DECIMAL(18,6)), 4) AS DOUBLE) AS acf
    FROM s ORDER BY lag
    """,
    doc="Lag-1/lag-7 autocorrelation of daily revenue from exact integer "
        "sums; gap-complete calendar so lags are calendar-true.",
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lagged = series.select(
        F.col("cents").alias("x"),
        F.lag("cents", 1).over(w).alias("y1"),
        F.lag("cents", 7).over(w).alias("y7"),
    )
    pairs = lagged.filter(F.col("y1").isNotNull()).select(
        F.lit(1).alias("lag"), "x", F.col("y1").alias("y")
    ).unionByName(
        lagged.filter(F.col("y7").isNotNull()).select(
            F.lit(7).alias("lag"), "x", F.col("y7").alias("y"))
    )
    s = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(x) AS BIGINT)").alias("sx"),
        F.expr("CAST(SUM(y) AS BIGINT)").alias("sy"),
        F.expr("CAST(SUM(x * y) AS BIGINT)").alias("sxy"),
        F.expr("CAST(SUM(x * x) AS BIGINT)").alias("sxx"),
        F.expr("CAST(SUM(y * y) AS BIGINT)").alias("syy"),
    )
    acf = F.round(
        F.expr(
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
        ).cast("decimal(18,6)"), 4
    ).cast("double")
    return s.select("lag", "n", acf.alias("acf")).orderBy("lag")


# --------------------------------------------------------------------------
# Q181 Bloom membership sketch in relational form — the third mergeable
# sketch (HLL distincts, CMS frequencies, Bloom membership): bits are
# DISTINCT (bit,) rows from the portable md5 arithmetic, probe = all k
# bits present. Zero false negatives by construction; flagged counts per
# segment bound the true membership from above.
_Q181_BIT = (
    "((instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 1, 1)) - 1) * 1048576"
    " + (instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 2, 1)) - 1) * 65536"
    " + (instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 3, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 4, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 5, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(CAST(c_custkey AS STRING)"
    " || ':bl{i}'), 6, 1)) - 1)) % 4096"
)


def _q181_bits_sql(engine_unnest: str) -> str:
    exprs = ", ".join(_Q181_BIT.format(i=i) for i in range(4))
    return f"{engine_unnest}([{exprs}])"


@query(
    "q181_bloom_membership",
    oracle=f"""
    WITH member AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
    bits AS (
      SELECT DISTINCT {_q181_bits_sql('unnest')} AS bit FROM member),
    e AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             {_q181_bits_sql('unnest')} AS bit
      FROM customer),
    p AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             COUNT(*) = COUNT(bits.bit) AS maybe_member
      FROM e LEFT JOIN bits USING (bit)
      GROUP BY c_custkey, c_mktsegment, c_acctbal)
    SELECT c_mktsegment, COUNT(*) AS n_probed,
           COUNT(CASE WHEN maybe_member THEN 1 END) AS n_flagged,
           COUNT(CASE WHEN c_acctbal > 9000 THEN 1 END) AS n_true
    FROM p GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Relational Bloom filter (k=4, m=4096): distinct bit rows, "
        "broadcast probe, per-segment flagged-vs-true counts.",
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sketches import bloom_build, bloom_probe

    cust = tables(spark, sf_dir)["customer"]
    member = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    sketch = bloom_build(member, "c_custkey", k=4, m=4096, salt="bl")
    probed = bloom_probe(sketch, cust.select("c_custkey"), "c_custkey",
                         k=4, m=4096, salt="bl")
    return (
        cust.join(probed, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_probed"),
            F.count(F.when(F.col("maybe_member"), 1)).alias("n_flagged"),
            F.count(F.when(F.col("c_acctbal") > 9000, 1)).alias("n_true"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q184 mergeable quantile sketch: per-day value histograms merged into the
# global grid, p50/p95 estimated from cumulative integer counts (error ≤
# one bin width), side by side with the exact interpolated percentile —
# the rollup-friendly percentile a 100 TB tiered store actually serves.
@query(
    "q184_quantile_sketch",
    oracle="""
    WITH s AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(LEAST(FLOOR(value / 25.0), 19) AS INT) AS bin,
             COUNT(*) AS cnt
      FROM events GROUP BY day, bin),
    m AS (SELECT bin, SUM(cnt) AS cnt FROM s GROUP BY bin),
    c AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS total
      FROM m),
    est AS (
      SELECT 50 AS p, CAST((MIN(bin) + 1) * 25 AS DOUBLE) AS est
      FROM c WHERE cum * 100 >= 50 * total
      UNION ALL
      SELECT 95, CAST((MIN(bin) + 1) * 25 AS DOUBLE)
      FROM c WHERE cum * 100 >= 95 * total),
    exact AS (
      SELECT 50 AS p,
             CAST(ROUND(CAST(quantile_cont(value, 0.50) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS exact_v
      FROM events
      UNION ALL
      SELECT 95,
             CAST(ROUND(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,6)), 4)
                  AS DOUBLE)
      FROM events)
    SELECT p, est, exact_v FROM est JOIN exact USING (p) ORDER BY p
    """,
    doc="Mergeable histogram-quantile sketch (per-day grids → global "
        "merge → p50/p95 within one bin width) vs the exact percentile.",
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sketches import (
        vhist_merge, vhist_quantile, vhist_sketch,
    )

    ev = tables(spark, sf_dir)["events"]
    daily = vhist_sketch(ev, "value", width=25, n_bins=20,
                         bucket_cols=[F.to_date("ts").alias("day")])
    merged = vhist_merge(daily.drop("day"))
    est = vhist_quantile(merged, [50, 95], width=25)
    exact = ev.agg(
        F.round(F.expr("percentile(value, 0.50)").cast("decimal(18,6)"), 4)
        .cast("double").alias("e50"),
        F.round(F.expr("percentile(value, 0.95)").cast("decimal(18,6)"), 4)
        .cast("double").alias("e95"),
    ).select(
        F.explode(F.array(
            F.struct(F.lit(50).alias("p"), F.col("e50").alias("exact_v")),
            F.struct(F.lit(95).alias("p"), F.col("e95").alias("exact_v")),
        )).alias("x")
    ).select("x.p", "x.exact_v")
    return est.join(exact, "p").orderBy("p")


# --------------------------------------------------------------------------
# Q185 ROC AUC per event type (one-vs-rest, score = value) via the rank-sum
# (Mann–Whitney U) identity with exact tie handling: group rows by distinct
# score, then U2 = Σ_v pos_v·(2·neg_below(v) + neg_at(v)) — twice the U
# statistic, PURE INTEGER (DECIMAL(38,0) sum so it cannot overflow at any
# corpus size); AUC = U2 / (2·n_pos·n_neg) is the only division, applied
# once at the end. The quality-classifier calibration primitive for
# curation score audits.
@query(
    "q185_auc",
    oracle="""
    WITH c AS (SELECT event_type, value AS v, COUNT(*) AS n
               FROM events GROUP BY event_type, v),
    cv AS (SELECT v, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY v),
    cw AS (SELECT v, tot,
                  CAST(SUM(tot) OVER (ORDER BY v) - tot AS BIGINT)
                    AS cum_tot_less
           FROM cv),
    ct AS (SELECT event_type, v, n,
                  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY v) - n
                       AS BIGINT) AS cum_pos_less
           FROM c),
    na AS (SELECT COUNT(*) AS n_all FROM events),
    terms AS (
      SELECT event_type, n_all, n AS pos_v, tot - n AS neg_v,
             cum_tot_less - cum_pos_less AS cum_neg_less
      FROM ct JOIN cw USING (v) CROSS JOIN na)
    SELECT event_type,
           CAST(SUM(pos_v) AS BIGINT) AS n_pos,
           CAST(MAX(n_all) - SUM(pos_v) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(
             CAST(SUM(CAST(pos_v AS DECIMAL(38,0))
                      * (2 * cum_neg_less + neg_v)) AS DOUBLE)
             / (2.0 * SUM(pos_v) * (MAX(n_all) - SUM(pos_v)))
             AS DECIMAL(18,6)), 4) AS DOUBLE) AS auc
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    doc="One-vs-rest ROC AUC per event type via the tie-exact rank-sum "
        "identity — integer U2 in DECIMAL(38,0), one division at the end.",
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count("*").alias("n"))
    cv = c.groupBy("v").agg(F.sum("n").alias("tot"))
    # the all-types cumulative is TWO-LEVEL (the q127 sweep-line shape):
    # a bucket-partitioned running sum over distinct values + a carry scan
    # over per-bucket nets — the textbook single-partition global window
    # over all distinct scores never exists at any scale. (The oracle
    # keeps the plain global window: same values, and DuckDB's single
    # process doesn't care.)
    bkt = cv.withColumn("bkt", F.expr("CAST(FLOOR(v) AS BIGINT)"))
    w_in = Window.partitionBy("bkt").orderBy("v")
    local = bkt.withColumn("cum_in", F.sum("tot").over(w_in))
    nets = bkt.groupBy("bkt").agg(F.sum("tot").alias("net"))
    w_carry = Window.orderBy("bkt")  # |buckets| rows — bounded
    carry = nets.withColumn(
        "carry", F.sum("net").over(w_carry) - F.col("net")).select(
        "bkt", "carry")
    cw = local.join(F.broadcast(carry), "bkt").select(
        "v", "tot",
        (F.col("carry") + F.col("cum_in") - F.col("tot"))
        .alias("cum_tot_less"),
    )
    ct = c.select(
        "event_type", "v", "n",
        (F.sum("n").over(Window.partitionBy("event_type").orderBy("v"))
         - F.col("n")).alias("cum_pos_less"),
    )
    na = ev.agg(F.count("*").alias("n_all"))
    terms = ct.join(cw, "v").join(F.broadcast(na)).select(
        "event_type", "n_all",
        F.col("n").alias("pos_v"),
        (F.col("tot") - F.col("n")).alias("neg_v"),
        (F.col("cum_tot_less") - F.col("cum_pos_less")).alias("cum_neg_less"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum("pos_v").alias("n_pos"),
            (F.max("n_all") - F.sum("pos_v")).alias("n_neg"),
            F.sum(F.expr("CAST(pos_v AS DECIMAL(38,0))"
                         " * (2 * cum_neg_less + neg_v)")).alias("u2"),
        )
        .select(
            "event_type", "n_pos", "n_neg",
            F.round(
                F.expr("CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg)")
                .cast("decimal(18,6)"), 4
            ).cast("double").alias("auc"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q186 two-sample Kolmogorov–Smirnov drift statistic per event type (first
# half of the stream vs second, the q173 split): D = sup |ECDF0 − ECDF1|
# evaluated as MAX over distinct values of |cum0·t1 − cum1·t0| in
# DECIMAL(38,0) — the sup-distance companion to PSI, exact (no binning)
# and pure integer until the single final division.
@query(
    "q186_ks_drift",
    oracle="""
    WITH half AS (SELECT MAX(event_id) // 2 AS mid FROM events),
    c AS (SELECT event_type, value AS v,
                 CAST(SUM(CASE WHEN event_id <= mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN event_id > mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1
          FROM events CROSS JOIN half GROUP BY event_type, v),
    w AS (SELECT event_type, v,
                 CAST(SUM(n0) OVER (PARTITION BY event_type ORDER BY v)
                      AS BIGINT) AS cum0,
                 CAST(SUM(n1) OVER (PARTITION BY event_type ORDER BY v)
                      AS BIGINT) AS cum1
          FROM c),
    t AS (SELECT event_type, CAST(SUM(n0) AS BIGINT) AS t0,
                 CAST(SUM(n1) AS BIGINT) AS t1
          FROM c GROUP BY event_type)
    SELECT event_type, MAX(t0) AS n_first, MAX(t1) AS n_second,
           CASE WHEN MAX(t0) = 0 OR MAX(t1) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(ROUND(CAST(
             CAST(MAX(ABS(CAST(cum0 AS DECIMAL(38,0)) * t1
                          - CAST(cum1 AS DECIMAL(38,0)) * t0)) AS DOUBLE)
             / (CAST(MAX(t0) AS DOUBLE) * MAX(t1))
             AS DECIMAL(18,6)), 4) AS DOUBLE) END AS ks
    FROM w JOIN t USING (event_type)
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact two-sample KS sup-distance between stream halves per type: "
        "integer cross-scaled ECDF gap in DECIMAL(38,0), one end division.",
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    half = ev.agg(F.expr("MAX(event_id) DIV 2").alias("mid"))
    c = (
        ev.join(F.broadcast(half))
        .groupBy("event_type", F.col("value").alias("v"))
        .agg(
            F.sum(F.expr("CASE WHEN event_id <= mid THEN 1 ELSE 0 END"))
            .alias("n0"),
            F.sum(F.expr("CASE WHEN event_id > mid THEN 1 ELSE 0 END"))
            .alias("n1"),
        )
    )
    wt = Window.partitionBy("event_type").orderBy("v")
    w = c.select(
        "event_type", "v",
        F.sum("n0").over(wt).alias("cum0"),
        F.sum("n1").over(wt).alias("cum1"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    return (
        w.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("t0").alias("n_first"),
            F.max("t1").alias("n_second"),
            F.max(F.expr("ABS(CAST(cum0 AS DECIMAL(38,0)) * t1"
                         " - CAST(cum1 AS DECIMAL(38,0)) * t0)")).alias("d"),
        )
        .select(
            "event_type", "n_first", "n_second",
            # one-sided types (all events in a single half — exactly the
            # drift this monitor flags) get ks = NULL instead of aborting
            # the whole report under ANSI DIVIDE_BY_ZERO
            F.expr("CASE WHEN n_first = 0 OR n_second = 0"
                   " THEN CAST(NULL AS DOUBLE)"
                   " ELSE CAST(ROUND(CAST(CAST(d AS DOUBLE)"
                   " / (CAST(n_first AS DOUBLE) * n_second)"
                   " AS DECIMAL(18,6)), 4) AS DOUBLE) END").alias("ks"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q187 Poisson bootstrap confidence intervals (the cluster bootstrap: resample
# weights are independent per row, so replicas need no global resampling
# pass). Each of B=64 replicas assigns every event a deterministic
# Poisson(1) weight via inverse-CDF on the md5 uniform of (event_id, r) —
# no RNG, engine/run/partition invariant, the q126 acceptance-rule
# machinery reused for statistics. Per-replica weighted means use exact
# decimal sums; the CI is the exact 2.5/97.5 percentile over the 64
# replica means.
_BS_THRESH = [6171992, 12343985, 15429982, 16458647, 16715813,
              16767247, 16775819, 16777044, 16777197]  # floor(CDF_Pois(1)*16^6)
_BS_U = _md5_uniform_int_sql(
    "CAST(event_id AS STRING) || ':' || CAST(r AS STRING)", "bs")
_BS_W = "(" + " + ".join(
    f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _BS_THRESH) + ")"


@query(
    "q187_poisson_bootstrap",
    oracle=f"""
    WITH rep AS (
      SELECT event_type, event_id, value,
             unnest(generate_series(0, 63)) AS r
      FROM events),
    h AS (SELECT event_type, r, value, {_BS_U} AS u FROM rep),
    wts AS (SELECT event_type, r, value, {_BS_W} AS w FROM h),
    m AS (
      SELECT event_type, r,
             CAST(ROUND(CAST(
               CAST(SUM(w * CAST(value AS DECIMAL(18,6))) AS DOUBLE) / SUM(w)
               AS DECIMAL(18,6)), 4) AS DOUBLE) AS mean_r
      FROM wts GROUP BY event_type, r HAVING SUM(w) > 0),
    ci AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_replicas,
             CAST(ROUND(CAST(quantile_cont(mean_r, 0.025)
                  AS DECIMAL(18,6)), 4) AS DOUBLE) AS ci_lo,
             CAST(ROUND(CAST(quantile_cont(mean_r, 0.975)
                  AS DECIMAL(18,6)), 4) AS DOUBLE) AS ci_hi
      FROM m GROUP BY event_type),
    pt AS (
      SELECT event_type, COUNT(*) AS n, {davg("value", "point_mean")}
      FROM events GROUP BY event_type)
    SELECT event_type, n, point_mean, ci_lo, ci_hi, n_replicas
    FROM pt JOIN ci USING (event_type) ORDER BY event_type
    """,
    doc="Poisson-bootstrap CI for the per-type mean: 64 deterministic "
        "md5 inverse-CDF weight replicas, exact-decimal weighted means, "
        "exact percentile CI — no RNG, no global resampling pass.",
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    # r13: the events file is one input split, so the 64x replica
    # explode ran its |events|*64 md5 evaluations in a single task
    # (~12 s at sf0.1 on one core). spread_small_scan round-robins the
    # narrow 3-column input across the session's cores (a no-op when
    # the scan already has enough splits); the weights are
    # (event_id, r)-keyed md5s — partitioning-invariant by the
    # operator's own design — so results are identical.
    from inspectadb_spark.operators.scale import spread_small_scan

    rep = (
        spread_small_scan(ev.select("event_type", "event_id", "value"))
        .withColumn("r", F.expr("explode(sequence(0, 63))"))
        .withColumn("u", F.expr(_BS_U))
        .withColumn("w", F.expr(_BS_W))
    )
    m = (
        rep.groupBy("event_type", "r")
        .agg(F.sum("w").alias("sw"),
             F.sum(F.expr("w * CAST(value AS DECIMAL(18,6))")).alias("swv"))
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            F.round(F.expr("CAST(swv AS DOUBLE) / sw").cast("decimal(18,6)"),
                    4).cast("double").alias("mean_r"),
        )
    )
    ci = m.groupBy("event_type").agg(
        F.count("*").alias("n_replicas"),
        F.round(F.expr("percentile(mean_r, 0.025)").cast("decimal(18,6)"), 4)
        .cast("double").alias("ci_lo"),
        F.round(F.expr("percentile(mean_r, 0.975)").cast("decimal(18,6)"), 4)
        .cast("double").alias("ci_hi"),
    )
    pt = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
                   " / COUNT(value)").cast("decimal(18,6)"), 4
        ).cast("double").alias("point_mean"),
    )
    return (
        pt.join(ci, "event_type")
        .select("event_type", "n", "point_mean", "ci_lo", "ci_hi",
                "n_replicas")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q190 Kaplan–Meier survival curve: time from a user's first event to first
# 'purchase' (censored at the user's last event otherwise). The estimator
# S(d) = Π_{d'≤d} (1 − d_i/n_i) is computed as EXP of a running sum of
# PER-STEP ln factors quantized to DECIMAL(18,6) — the q132 trick applied
# to a product — so the cumulative is aggregation-order-exact; a d_i = n_i
# step (everyone at risk dies) would be ln(0), which Spark NULLs and DuckDB
# -infs, so it is handled as an explicit zero-flag carried by the window.
@query(
    "q190_kaplan_meier",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             MAX(ts) AS tmax
      FROM events WHERE ts < TIMESTAMP '2024-01-04' GROUP BY user_id),
    d AS (
      SELECT user_id,
             CAST(datediff('day', CAST(t0 AS DATE),
                           CAST(COALESCE(tp, tmax) AS DATE)) AS INT) AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM u),
    g AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(ev) AS BIGINT) AS d_i
      FROM d GROUP BY dur),
    r AS (
      SELECT dur, cnt, d_i,
             CAST(SUM(cnt) OVER () - (SUM(cnt) OVER (ORDER BY dur) - cnt)
                  AS BIGINT) AS n_risk
      FROM g),
    f AS (
      SELECT dur, n_risk, d_i, cnt - d_i AS n_censored,
             CASE WHEN d_i >= n_risk THEN CAST(0 AS DECIMAL(18,6))
                  ELSE ROUND(CAST(ln(1.0 - CAST(d_i AS DOUBLE) / n_risk)
                                  AS DECIMAL(18,6)), 6) END AS lnf,
             CASE WHEN d_i >= n_risk THEN 1 ELSE 0 END AS zf
      FROM r),
    w AS (
      SELECT dur, n_risk, d_i, n_censored,
             SUM(lnf) OVER (ORDER BY dur) AS cum_ln,
             SUM(zf) OVER (ORDER BY dur) AS cum_zero
      FROM f)
    SELECT dur AS dur_days, n_risk, d_i AS n_events, n_censored,
           CASE WHEN cum_zero > 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(ROUND(CAST(EXP(CAST(cum_ln AS DOUBLE))
                                     AS DECIMAL(18,6)), 4) AS DOUBLE)
           END AS survival
    FROM w ORDER BY dur_days
    """,
    doc="Kaplan–Meier survival of time-to-first-purchase inside the "
        "3-day observation window, right-censored at last in-window "
        "activity (the full horizon censors nobody — every user "
        "eventually purchases): per-step quantized ln factors, exact "
        "running product via EXP(SUM), explicit S=0 flag instead of "
        "ln(0).",
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Observation window = the corpus' first 3 days: over the full 30-day
    # horizon EVERY user purchases (n_censored ≡ 0 at both SFs — the
    # censoring arm of the estimator was dead code, q326 degeneracy class,
    # caught by the round-9 oracle-constant sweep); inside 3 days 3 / 29
    # users are right-censored so the COALESCE(tp, tmax) path is real.
    ev = tables(spark, sf_dir)["events"].filter(
        F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.expr("CASE WHEN event_type = 'purchase' THEN ts END"))
        .alias("tp"),
        F.max("ts").alias("tmax"),
    )
    d = u.select(
        F.expr("CAST(datediff(CAST(COALESCE(tp, tmax) AS DATE),"
               " CAST(t0 AS DATE)) AS INT)").alias("dur"),
        F.expr("CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    g = d.groupBy("dur").agg(
        F.count("*").alias("cnt"), F.sum("ev").alias("d_i"))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    wcum = Window.orderBy("dur")
    r = g.select(
        "dur", "cnt", "d_i",
        (F.sum("cnt").over(wall)
         - (F.sum("cnt").over(wcum) - F.col("cnt"))).alias("n_risk"),
    )
    f = r.select(
        "dur", "n_risk", "d_i",
        (F.col("cnt") - F.col("d_i")).alias("n_censored"),
        F.expr("CASE WHEN d_i >= n_risk THEN CAST(0 AS DECIMAL(18,6))"
               " ELSE ROUND(CAST(ln(1.0 - CAST(d_i AS DOUBLE) / n_risk)"
               " AS DECIMAL(18,6)), 6) END").alias("lnf"),
        F.expr("CASE WHEN d_i >= n_risk THEN 1 ELSE 0 END").alias("zf"),
    )
    w = f.select(
        "dur", "n_risk", "d_i", "n_censored",
        F.sum("lnf").over(wcum).alias("cum_ln"),
        F.sum("zf").over(wcum).alias("cum_zero"),
    )
    return w.select(
        F.col("dur").alias("dur_days"), "n_risk",
        F.col("d_i").alias("n_events"), "n_censored",
        F.expr("CASE WHEN cum_zero > 0 THEN CAST(0.0 AS DOUBLE)"
               " ELSE CAST(ROUND(CAST(EXP(CAST(cum_ln AS DOUBLE))"
               " AS DECIMAL(18,6)), 4) AS DOUBLE) END").alias("survival"),
    ).orderBy("dur_days")


# --------------------------------------------------------------------------
# Q191 Wilson-score confidence intervals for per-type high-value rates:
# the small-n-safe binomial CI (never leaves [0,1], no normality-on-p̂
# assumption). One map-side-combinable aggregate; the interval is a pure
# closed-form double expression with identical text on both engines.
_WILSON = """
    CAST(ROUND(CAST(
      (phat + CAST(1.9208 AS DOUBLE) / n {sign} CAST(1.96 AS DOUBLE)
       * SQRT(phat * (1.0 - phat) / n
              + CAST(0.9604 AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
      / (1.0 + CAST(3.8416 AS DOUBLE) / n)
      AS DECIMAL(18,6)), 4) AS DOUBLE)
"""


@query(
    "q191_wilson_ci",
    oracle=f"""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events GROUP BY event_type),
    p AS (SELECT event_type, n, k, CAST(k AS DOUBLE) / n AS phat FROM c)
    SELECT event_type, n, k,
           CAST(ROUND(CAST(phat AS DECIMAL(18,6)), 4) AS DOUBLE) AS rate,
           {_WILSON.format(sign='-')} AS ci_lo,
           {_WILSON.format(sign='+')} AS ci_hi
    FROM p ORDER BY event_type
    """,
    doc="Wilson-score 95% CI for the per-type P(value > 100): closed-form, "
        "z=1.96 literals cast to DOUBLE, identical expression both engines.",
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CASE WHEN value > 100 THEN 1 ELSE 0 END")).alias("k"),
    )
    p = c.withColumn("phat", F.expr("CAST(k AS DOUBLE) / n"))
    return p.select(
        "event_type", "n", "k",
        F.round(F.col("phat").cast("decimal(18,6)"), 4).cast("double")
        .alias("rate"),
        F.expr(_WILSON.format(sign="-")).alias("ci_lo"),
        F.expr(_WILSON.format(sign="+")).alias("ci_hi"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q196 calibration (reliability) bins for the q185 score: does P(purchase)
# grow with the score proxy the way a calibrated model's would? Ten
# fixed-width score bins; per bin the mean score (exact decimal) and the
# observed purchase rate (integer ppm) — the reliability-diagram input,
# and the natural companion to AUC (discrimination) from q185.
@query(
    "q196_calibration_bins",
    oracle="""
    WITH b AS (
      SELECT CAST(LEAST(FLOOR(value / 35.0), 9) AS INT) AS bin,
             value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events)
    SELECT bin, COUNT(*) AS n,
           CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*) AS DECIMAL(18,6)), 4) AS DOUBLE) AS mean_score,
           CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS obs_rate_ppm
    FROM b GROUP BY bin ORDER BY bin
    """,
    doc="Reliability-diagram bins: fixed-width score bins, exact-decimal "
        "mean score, integer-ppm observed rate.",
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    b = ev.select(
        F.expr("CAST(LEAST(FLOOR(value / 35.0), 9) AS INT)").alias("bin"),
        "value",
        F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        .alias("y"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
                       " / COUNT(*)").cast("decimal(18,6)"), 4
            ).cast("double").alias("mean_score"),
            F.expr("SUM(y) * 1000000 DIV COUNT(*)").alias("obs_rate_ppm"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Q197 isotonic (PAVA) monotone-trend fit: per event type, the best
# non-decreasing fit of the high-value rate over hour-of-day — monotone
# trend extraction, the calibration-curve machinery (q185 AUC / q196
# reliability bins) applied to a genuinely non-monotone input so the
# pooling actually fires. Sequential recurrence → applyInPandas over the
# HISTOGRAM-sized (type, hour) table (rows-only; pinned against the
# O(n^3) max-min closed form in tests/test_stats.py).
@query(
    "q197_isotonic_calibration",
    oracle=None,
    check="P: sequential PAVA recurrence (not SQL-expressible); pinned "
          "against the O(n^3) max-min closed form + weighted-mean "
          "preservation in tests/test_stats.py",
    doc="PAVA monotone fit of P(value > 100) over hour-of-day per type: "
        "one group shuffle over 24-row bin tables, O(bins) Python per "
        "group.",
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.quality import isotonic_calibrate

    ev = tables(spark, sf_dir)["events"]
    lab = (
        ev.groupBy("event_type",
                   F.expr("CAST(hour(ts) AS INT)").alias("bin"))
        .agg(F.count("*").alias("n"),
             F.expr("SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) * 1000000"
                    " DIV COUNT(*)").alias("obs_rate_ppm"))
    )
    return isotonic_calibrate(lab).orderBy("event_type", "bin")


# --------------------------------------------------------------------------
# Q206 inter-event gap profile (bot/automation screening features): per
# user the count/min/max/mean of consecutive-event gaps plus the exact
# population-variance numerator n·Σx²−(Σx)² in DECIMAL(38,0) — machine
# traffic shows up as large n with near-zero spread. Gaps are integer
# seconds from exact µs timestamps; one window shuffle on user_id.
# DECIMAL(38,0) headroom: gap_s ≤ ~3e7 (a year), gap² ≤ 9e14, so n·Σx²
# stays inside 38 digits up to ~1e22 events per user.
@query(
    "q206_gap_profile",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events),
    x AS (SELECT user_id, gap_us // 1000000 AS gap_s
          FROM g WHERE gap_us IS NOT NULL),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
             CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
             CAST(SUM(gap_s) AS BIGINT) AS sum_s,
             CAST(SUM(CAST(gap_s AS DECIMAL(38,0)) * gap_s)
                  AS DECIMAL(38,0)) AS sum_sq
      FROM x GROUP BY user_id)
    SELECT user_id, n_gaps, min_gap_s, max_gap_s,
           CAST(sum_s // n_gaps AS BIGINT) AS mean_gap_s,
           CAST(CAST(n_gaps * sum_sq - CAST(sum_s AS DECIMAL(38,0)) * sum_s
                     AS DECIMAL(38,0)) AS VARCHAR) AS var_num
    FROM a WHERE n_gaps >= 5 ORDER BY user_id
    """,
    doc="Per-user inter-event gap statistics (n/min/max/mean seconds + "
        "exact variance numerator) — the regularity features behind "
        "bot-traffic screening; integer-exact end to end.",
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events ts is TIMESTAMP_NTZ after the parquet shim; unix_micros wants
    # TIMESTAMP (the q116 idiom) — the cast is a type relabel, not a zone op
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    g = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    x = g.select("user_id", F.expr("gap_us DIV 1000000").alias("gap_s"))
    a = x.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.sum("gap_s").alias("sum_s"),
        F.sum(F.col("gap_s").cast("decimal(38,0)") * F.col("gap_s"))
        .cast("decimal(38,0)").alias("sum_sq"))
    return (
        a.filter(F.col("n_gaps") >= 5)
        .select(
            "user_id", "n_gaps", "min_gap_s", "max_gap_s",
            F.expr("sum_s DIV n_gaps").alias("mean_gap_s"),
            # DECIMAL(38,0) rendered as a string: exact at any scale AND
            # driver-safe (pandas turns DuckDB DECIMAL into float64 but
            # Spark Decimal into objects — strings compare identically).
            (F.col("n_gaps") * F.col("sum_sq")
             - F.col("sum_s").cast("decimal(38,0)") * F.col("sum_s"))
            .cast("decimal(38,0)").cast("string").alias("var_num"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q215 weighted median per group: the smallest price whose cumulative
# quantity-weight reaches half the group total. Weights are pre-aggregated
# per distinct price, so the cumulative window runs over the (group, price)
# domain and the crossing PRICE is tie-order-invariant by construction
# (equal prices collapse to one row before the cumsum) — no row-level tie
# rule needed, exact integer cents/weights end to end.
@query(
    "q215_weighted_median",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_quantity) AS BIGINT) AS w
      FROM lineitem),
    g AS (SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
          FROM x GROUP BY flag, cents),
    c AS (
      SELECT flag, cents,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
      FROM g)
    SELECT flag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
           CAST(MIN(tw) AS BIGINT) AS total_weight
    FROM c WHERE cw * 2 >= tw GROUP BY flag ORDER BY flag
    """,
    doc="Quantity-weighted median extended price per return flag: "
        "per-price weight pre-aggregation, one partitioned cumulative "
        "window, exact integer crossing rule (2·cum >= total).",
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("w"))
    g = x.groupBy("flag", "cents").agg(F.sum("w").alias("w"))
    wc = (Window.partitionBy("flag").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("flag")
    c = g.select(
        "flag", "cents",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"))
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("cents").alias("wmedian_cents"),
             F.min("tw").alias("total_weight"))
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# Q244 Theil–Sen robust trend of daily revenue: median of pairwise slopes
# (and the matching median intercept) — the outlier-immune complement to
# q89b's OLS. O(n^2) pairs BY DEFINITION, applied where it belongs: to the
# day-aggregated series (n = |days|, bounded by the calendar, not by data
# volume), broadcast self-joined; the raw scan contributes one day-keyed
# aggregation. For series too long even for that, the repeated-median /
# sampled-pairs estimators swap in at the pair-generation step.
@query(
    "q244_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS r
      FROM orders GROUP BY 1),
    p AS (
      SELECT CAST(b.r - a.r AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
      FROM daily a JOIN daily b ON a.d < b.d),
    sl AS (SELECT quantile_cont(s, 0.5) AS slope, COUNT(*) AS n_pairs
           FROM p),
    ic AS (
      SELECT sl.slope, sl.n_pairs,
             quantile_cont(daily.r - sl.slope * daily.d, 0.5) AS intercept,
             COUNT(*) AS n_days
      FROM daily CROSS JOIN sl GROUP BY sl.slope, sl.n_pairs)
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(ROUND(CAST(slope AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS sen_slope,
           CAST(ROUND(CAST(intercept AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS sen_intercept
    FROM ic
    """,
    doc="Theil–Sen robust slope/intercept of daily revenue cents vs day "
        "index: exact median over all pairwise slopes of the day-level "
        "aggregate, then the median intercept under that slope.",
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tables(spark, sf_dir)["orders"]
    daily = (
        o.select(
            F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01')")
            .alias("d"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"))
        .groupBy("d").agg(F.sum("c").alias("r"))
    )
    # r13: the day frame is calendar-bounded (~2.4k rows), but the old
    # d1<d2 BNL join materialized ~2.9M slope rows and fed them through
    # Spark's exact `percentile` (a value-counts map merge) — 40 s at
    # sf0.1 for what is one vectorized pass over a tiny series. The day
    # frame now packs into ONE executor-side row and numpy computes the
    # identical pair slopes ((r2-r1)/(d2-d1) over d-sorted upper-triangle
    # indices — same operands, same float64 division), the median via
    # Spark Percentile's own weighted interpolation formula
    # (v[lo]*(hi-pos) + v[hi]*(pos-lo), probed bit-equal to
    # percentile(s, 0.5) on this data), and the residual median the same
    # way. The 4dp DECIMAL rounding stays in Spark SQL. Oracle MATCH
    # re-proved at sf0.001/0.01/0.1.
    packed = daily.agg(F.collect_list(F.struct("d", "r")).alias("rows"))

    def theil(batches):
        import numpy as np
        import pandas as pd

        def med(v):
            v = np.sort(v)
            pos = 0.5 * (len(v) - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            if lo == hi:
                return float(v[lo])
            return float(v[lo] * (hi - pos) + v[hi] * (pos - lo))

        for pdf in batches:
            for rows in pdf["rows"]:
                d = np.asarray([x["d"] for x in rows], dtype=np.float64)
                r = np.asarray([x["r"] for x in rows], dtype=np.float64)
                order = np.argsort(d)
                d, r = d[order], r[order]
                ii, jj = np.triu_indices(len(d), k=1)
                s = (r[jj] - r[ii]) / (d[jj] - d[ii])
                slope = med(s)
                intercept = med(r - slope * d)
                yield pd.DataFrame({
                    "n_days": [len(d)], "n_pairs": [len(s)],
                    "slope": [slope], "intercept": [intercept],
                })

    out = packed.mapInPandas(
        theil, "n_days bigint, n_pairs bigint, slope double, "
               "intercept double")
    return out.select("n_days", "n_pairs",
                      r4c(F.col("slope")).alias("sen_slope"),
                      r4c(F.col("intercept")).alias("sen_intercept"))


# --------------------------------------------------------------------------
# Q245 join-cardinality estimator audit: the System-R textbook estimate
# |A JOIN B| = |A|*|B| / max(ndv_A(k), ndv_B(k)) next to the ACTUAL join
# cardinality for every FK edge of the schema — the measurement that tells
# you where a cost-based planner's first-order assumption (uniform key
# frequencies, containment) breaks on this data. All inputs are single
# aggregates; the actual count is the only join executed.
_Q245_EDGES = [
    ("lineitem x orders ON l_orderkey=o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem x part ON l_partkey=p_partkey",
     "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders x customer ON o_custkey=c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("customer x nation ON c_nationkey=n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events x customer ON user_id=c_custkey",
     "events", "user_id", "customer", "c_custkey"),
]


def _q245_oracle() -> str:
    parts = []
    for label, lt, lk, rt, rk in _Q245_EDGES:
        parts.append(f"""
    SELECT '{label}' AS edge,
           CAST(s.n_l AS BIGINT) AS n_left,
           CAST(s.n_r AS BIGINT) AS n_right,
           CAST(s.ndv_l AS BIGINT) AS ndv_left,
           CAST(s.ndv_r AS BIGINT) AS ndv_right,
           CAST(ROUND(CAST(CAST(s.n_l AS DOUBLE) * CAST(s.n_r AS DOUBLE)
                           / CAST(GREATEST(s.ndv_l, s.ndv_r) AS DOUBLE)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS est_rows,
           CAST(j.actual AS BIGINT) AS actual_rows,
           CAST(ROUND(CAST(ABS(CAST(s.n_l AS DOUBLE) * CAST(s.n_r AS DOUBLE)
                               / CAST(GREATEST(s.ndv_l, s.ndv_r) AS DOUBLE)
                               - CAST(j.actual AS DOUBLE))
                           / CAST(j.actual AS DOUBLE)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS err_ratio
    FROM (SELECT (SELECT COUNT(*) FROM {lt}) AS n_l,
                 (SELECT COUNT(*) FROM {rt}) AS n_r,
                 (SELECT COUNT(DISTINCT {lk}) FROM {lt}) AS ndv_l,
                 (SELECT COUNT(DISTINCT {rk}) FROM {rt}) AS ndv_r) s
    CROSS JOIN (SELECT COUNT(*) AS actual
                FROM {lt} JOIN {rt} ON {lk} = {rk}) j""")
    return " UNION ALL ".join(parts) + " ORDER BY edge"


@query(
    "q245_join_cardinality_audit",
    oracle=_q245_oracle(),
    doc="System-R join-cardinality estimate vs actual per FK edge, with "
        "the relative error — the planner-assumption audit.",
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    t = tables(spark, sf_dir)
    outs = []
    for label, lt, lk, rt, rk in _Q245_EDGES:
        # One scan per side: groupBy(key).count() collapses each table to
        # its key domain (map-side combinable), the two per-key frames
        # FULL-OUTER join on the key (both sides arrive hash-partitioned
        # by k from their groupBys, so the join adds no exchange), and a
        # single fold over the joined frame yields every statistic at
        # once: n = SUM(cnt of that side), ndv = non-null-key groups of
        # that side, actual join cardinality = SUM(cl * cr) (NULL on
        # either side — unmatched or NULL-key groups — drops out of the
        # product sum exactly like the row-level inner join drops those
        # rows). One consumer per frame means the optimizer cannot prune
        # or filter the branches apart, so each table is scanned once and
        # the join shuffles distinct keys instead of every fact row. Row
        # counts at 100 TB can make cl*cr overflow BIGINT, so the
        # products accumulate in DECIMAL(38,0) (exact) before the final
        # BIGINT cast.
        left, right = t[lt], t[rt]
        lc = (left.select(F.col(lk).alias("k"))
              .groupBy("k").agg(F.count(F.lit(1)).alias("cl")))
        rc = (right.select(F.col(rk).alias("k"))
              .groupBy("k").agg(F.count(F.lit(1)).alias("cr")))
        stats = (
            lc.join(rc, "k", "full_outer")
            .agg(
                F.coalesce(F.sum("cl"), F.lit(0).cast("bigint"))
                .alias("n_l"),
                F.count(F.when(F.col("k").isNotNull()
                               & F.col("cl").isNotNull(), 1)).alias("ndv_l"),
                F.coalesce(F.sum("cr"), F.lit(0).cast("bigint"))
                .alias("n_r"),
                F.count(F.when(F.col("k").isNotNull()
                               & F.col("cr").isNotNull(), 1)).alias("ndv_r"),
                F.coalesce(
                    F.sum(F.col("cl").cast("decimal(38,0)") * F.col("cr")),
                    F.lit(0)).cast("bigint").alias("actual"))
        )
        est = (F.col("n_l").cast("double") * F.col("n_r").cast("double")
               / F.greatest("ndv_l", "ndv_r").cast("double"))
        outs.append(
            stats.select(
                F.lit(label).alias("edge"),
                F.col("n_l").alias("n_left"),
                F.col("n_r").alias("n_right"),
                F.col("ndv_l").alias("ndv_left"),
                F.col("ndv_r").alias("ndv_right"),
                r4c(est).alias("est_rows"),
                F.col("actual").alias("actual_rows"),
                r4c(F.abs(est - F.col("actual").cast("double"))
                    / F.col("actual").cast("double")).alias("err_ratio"),
            )
        )
    return reduce(lambda x, y: x.unionAll(y), outs).orderBy("edge")


# --------------------------------------------------------------------------
# Q263 equi-depth histogram of order value (operators/sketches.py::
# equi_depth_histogram): 10 equal-count buckets with exact integer-cent
# bounds — the selectivity-estimation statistic equi-width q100 can't
# give on skewed columns. The global rank is the distributed bucket-
# offset scheme (scale.global_rank), not a single-task ORDER BY; the
# oracle states the textbook single-window form.
@query(
    "q263_equi_depth_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM v),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rk
      FROM v)
    SELECT CAST((rk - 1) * 10 // total AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo,
           CAST(MAX(cents) AS BIGINT) AS hi
    FROM r CROSS JOIN t GROUP BY 1 ORDER BY bucket
    """,
    doc="Equi-depth (10-bucket) histogram of order value in exact cents: "
        "bucket = (rank-1)*k DIV n over the (cents, orderkey) total "
        "order; Spark side uses the distributed global_rank.",
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sketches import equi_depth_histogram

    o = tables(spark, sf_dir)["orders"]
    v = o.select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey")
    return equi_depth_histogram(v, "cents", "o_orderkey", k=10).orderBy("bucket")


# --------------------------------------------------------------------------
# Q273 Spearman rank correlation between line quantity and price: the
# tie-averaged ranks come from operators/scale.py::global_avg_rank2
# (distinct-value bucket-offset scheme, parity-pinned bit-identical to
# the global RANK window the oracle uses — no single-task full sort),
# then Pearson on 2x-ranks (scale-invariant, so the x2 convention keeps
# every moment sum an exact integer; DECIMAL(38,0)/HUGEINT until the
# final sqrt). Pearson on the raw values rides along for contrast.
@query(
    "q273_spearman",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem),
    r AS (
      SELECT x, y,
             2 * RANK() OVER (ORDER BY x)
               + COUNT(*) OVER (PARTITION BY x) - 1 AS rx,
             2 * RANK() OVER (ORDER BY y)
               + COUNT(*) OVER (PARTITION BY y) - 1 AS ry
      FROM b),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(rx AS HUGEINT)) AS sx,
             SUM(CAST(ry AS HUGEINT)) AS sy,
             SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
             SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
             SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy,
             corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS pr
      FROM r)
    SELECT CAST(n AS BIGINT) AS n,
           {r4("pr")} AS pearson_r,
           {r4("CAST(n * sxy - sx * sy AS DOUBLE)"
               " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
               " * CAST(n * syy - sy * sy AS DOUBLE))")} AS spearman_rho
    FROM s
    """,
    doc="Spearman's rho (tie-averaged ranks, exact integer moment sums) "
        "and Pearson's r between quantity and extended price.",
)
def q273(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import avg_rank2_map

    li = tables(spark, sf_dir)["lineitem"].select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("y"))
    # Build both (value -> rank2) maps straight from the base frame and
    # join them onto ONE row-grain pass — chaining global_avg_rank2 calls
    # re-planned the whole lineage inside the second call's count branch
    # (7 lineitem scans); maps-then-join plans 3 column-pruned scans.
    d = (li.join(avg_rank2_map(li, "x", out_col="rx", bucket_width=10), "x")
         .join(avg_rank2_map(li, "y", out_col="ry", bucket_width=100_000),
               "y"))

    def h(c: str):
        return F.col(c).cast("decimal(38,0)")

    s = d.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(h("rx")).alias("sx"),
        F.sum(h("ry")).alias("sy"),
        F.sum(h("rx") * h("ry")).alias("sxy"),
        F.sum(h("rx") * h("rx")).alias("sxx"),
        F.sum(h("ry") * h("ry")).alias("syy"),
        F.corr(F.col("x").cast("double"), F.col("y").cast("double"))
        .alias("pr"))
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        r4c(F.col("pr")).alias("pearson_r"),
        r4c(F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * CAST(n * syy - sy * sy AS DOUBLE))")).alias("spearman_rho"))


# --------------------------------------------------------------------------
# Q274 Mann-Whitney U: do urgent orders (priority 1-2) carry different
# totals than the rest? Rank-sum over the combined cents series via the
# same distributed tie-averaged rank2; U, the common-language effect
# size (= the q185 AUC of "urgent ranks above non-urgent"), and the
# tie-corrected normal z — every input to the double tail is an exact
# integer, and both engines evaluate the identical expression text.
@query(
    "q274_mann_whitney",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp
      FROM orders),
    r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS rank2
      FROM b),
    t AS (
      SELECT SUM(CAST(tc AS HUGEINT) * tc * tc - tc) AS t3t
      FROM (SELECT COUNT(*) AS tc FROM b GROUP BY cents)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(grp) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(grp) AS BIGINT) AS n2,
             CAST(SUM(rank2 * grp) AS BIGINT) AS r1x2
      FROM r)
    SELECT n1, n2,
           CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1,
           {r4("CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)"
               " / (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))")} AS auc,
           {r4("CAST(r1x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)"
               " / (2 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
               " * (CAST(n + 1 AS DOUBLE) - CAST(t3t AS DOUBLE)"
               " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 12))")}
             AS z
    FROM s CROSS JOIN t
    """,
    doc="Mann-Whitney U rank-sum test of urgent vs non-urgent order "
        "totals: U, rank-AUC effect size, tie-corrected z.",
)
def q274(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import global_avg_rank2

    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
               " THEN 1 ELSE 0 END").alias("grp"))
    r = global_avg_rank2(b, "cents", out_col="rank2",
                         bucket_width=1_000_000)
    t = (b.groupBy("cents").agg(F.count("*").alias("tc"))
         .agg(F.sum(F.expr("CAST(tc AS DECIMAL(38,0)) * tc * tc - tc"))
              .alias("t3t")))
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("grp").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("n2"),
        F.sum(F.col("rank2") * F.col("grp")).cast("bigint").alias("r1x2"))
    return s.join(F.broadcast(t)).select(
        "n1", "n2",
        F.expr("CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2").alias("u1"),
        r4c(F.expr(
            "CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)"
            " / (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"))
        .alias("auc"),
        r4c(F.expr(
            "CAST(r1x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)"
            " / (2 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
            " * (CAST(n + 1 AS DOUBLE) - CAST(t3t AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 12))"))
        .alias("z"))


# --------------------------------------------------------------------------
# Q275 Kruskal-Wallis H: do order totals differ across the five order
# priorities? k-group generalization of q274's rank-sum — the same
# distributed tie-averaged rank2 (operators/scale.py::global_avg_rank2)
# feeds per-group rank sums; with rank2 = 2*avg_rank,
# H = 3*SUM(S2_g^2/n_g)/(N(N+1)) - 3(N+1). Rank sums stay exact
# integers (HUGEINT/DECIMAL(38,0)); squaring happens in IEEE double
# with identical expression text on both engines (scale-safe: no
# decimal overflow at any N), and the 5-term double sum's order noise
# (~1e-16 rel) is absorbed by r4. Tie correction and the
# epsilon-squared effect size ride the same exact tie-count table.
@query(
    "q275_kruskal_wallis",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority AS grp
      FROM orders),
    r AS (
      SELECT grp,
             2 * RANK() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS rank2
      FROM b),
    g AS (
      SELECT grp, SUM(CAST(rank2 AS HUGEINT)) AS s2g, COUNT(*) AS ng
      FROM r GROUP BY grp),
    t AS (
      SELECT SUM(CAST(tc AS HUGEINT) * tc * tc - tc) AS t3t
      FROM (SELECT COUNT(*) AS tc FROM b GROUP BY cents)),
    s AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s2g AS DOUBLE) * CAST(s2g AS DOUBLE) / ng) AS q
      FROM g),
    h AS (
      SELECT n, k, t3t,
             3 * q / (CAST(n AS DOUBLE) * (n + 1)) - 3 * (n + 1) AS h_raw
      FROM s CROSS JOIN t)
    SELECT n, k, {r4("h_raw")} AS h,
           {r4("h_raw / (1 - CAST(t3t AS DOUBLE)"
               " / (CAST(n AS DOUBLE) * n * n - n))")} AS h_tie,
           {r4("h_raw / (1 - CAST(t3t AS DOUBLE)"
               " / (CAST(n AS DOUBLE) * n * n - n)) / (n - 1)")} AS eps2
    FROM h
    """,
    doc="Kruskal-Wallis H across order priorities: raw H, tie-corrected "
        "H, epsilon-squared effect size (= H_tie / (n-1)).",
)
def q275(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import global_avg_rank2

    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.col("o_orderpriority").alias("grp"))
    r = global_avg_rank2(b, "cents", out_col="rank2",
                         bucket_width=1_000_000)
    g = r.groupBy("grp").agg(
        F.sum(F.col("rank2").cast("decimal(38,0)")).alias("s2g"),
        F.count("*").alias("ng"))
    t = (b.groupBy("cents").agg(F.count("*").alias("tc"))
         .agg(F.sum(F.expr("CAST(tc AS DECIMAL(38,0)) * tc * tc - tc"))
              .alias("t3t")))
    s = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.expr("CAST(s2g AS DOUBLE) * CAST(s2g AS DOUBLE) / ng"))
        .alias("q"))
    h = s.join(F.broadcast(t)).withColumn(
        "h_raw",
        F.expr("3 * q / (CAST(n AS DOUBLE) * (n + 1)) - 3 * (n + 1)"))
    return h.select(
        "n", "k", r4c(F.col("h_raw")).alias("h"),
        r4c(F.expr("h_raw / (1 - CAST(t3t AS DOUBLE)"
                   " / (CAST(n AS DOUBLE) * n * n - n))")).alias("h_tie"),
        r4c(F.expr("h_raw / (1 - CAST(t3t AS DOUBLE)"
                   " / (CAST(n AS DOUBLE) * n * n - n)) / (n - 1)"))
        .alias("eps2"))


# --------------------------------------------------------------------------
# Q276 Kendall's tau-b between line quantity and discount. The naive
# definition is O(n^2) row pairs; both columns are value-range-bounded
# (quantity 1..50, discount in whole cents-of-percent 0..10), so the
# data reduces in ONE map-side-combinable shuffle to a <=|X|*|Y|
# contingency table, and EVERY term of tau-b comes out of a single
# conditional aggregation over CELL pairs (broadcast nested-loop on the
# value-bounded table, never row x row):
#
#   nn  = sum[b2 == b1]        n2        (each cell pairs with itself once)
#   sxx = sum[x2 == x1]        n1*n2   = sum_x T_x^2
#   syy = sum[y2 == y1]        n1*n2   = sum_y T_y^2
#   C   = sum[x2 > x1, y2 > y1] n1*n2,  D likewise with y2 < y1
#
# so n0 - tie_x = (nn^2 - sxx) / 2 without separate marginal passes —
# the base table is evaluated once per self-join side (2 scans) instead
# of once per statistic (5). All pair products stay exact integers
# (HUGEINT/DECIMAL(38,0)); tau-b and the Goodman-Kruskal gamma are
# evaluated with identical expression text on both engines. (At 100 TB
# with a continuous measure the same shape applies after quantization —
# exactly how q185's AUC bins and q263's equi-depth buckets handle it.)
@query(
    "q276_kendall_tau",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS y
      FROM lineitem),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS HUGEINT) AS n FROM b GROUP BY x, y),
    s AS (
      SELECT SUM(CASE WHEN b2.x = b1.x AND b2.y = b1.y
                      THEN b2.n ELSE 0 END) AS nn,
             SUM(CASE WHEN b2.x = b1.x THEN b1.n * b2.n ELSE 0 END) AS sxx,
             SUM(CASE WHEN b2.y = b1.y THEN b1.n * b2.n ELSE 0 END) AS syy,
             SUM(CASE WHEN b2.x > b1.x AND b2.y > b1.y
                      THEN b1.n * b2.n ELSE 0 END) AS c,
             SUM(CASE WHEN b2.x > b1.x AND b2.y < b1.y
                      THEN b1.n * b2.n ELSE 0 END) AS d
      FROM cells b1 CROSS JOIN cells b2)
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           {r4("CAST(c - d AS DOUBLE)"
               " / sqrt(CAST(nn * nn - sxx AS DOUBLE) / 2"
               " * (CAST(nn * nn - syy AS DOUBLE) / 2))")} AS tau_b,
           {r4("CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE)")} AS gamma
    FROM s
    """,
    doc="Kendall's tau-b and Goodman-Kruskal gamma between quantity and "
        "discount via one conditional aggregation over contingency-cell "
        "pairs (tie terms from the pair sums themselves).",
)
def q276(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["lineitem"].select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("y"))
    cells = (b.groupBy("x", "y")
             .agg(F.count("*").cast("decimal(38,0)").alias("n")))
    c1 = cells.select(F.col("x").alias("x1"), F.col("y").alias("y1"),
                      F.col("n").alias("n1"))
    c2 = cells.select(F.col("x").alias("x2"), F.col("y").alias("y2"),
                      F.col("n").alias("n2"))
    zero = "CAST(0 AS DECIMAL(38,0))"
    s = c1.crossJoin(F.broadcast(c2)).agg(
        F.sum(F.expr(f"CASE WHEN x2 = x1 AND y2 = y1 THEN n2 ELSE {zero} END")).alias("nn"),
        F.sum(F.expr(f"CASE WHEN x2 = x1 THEN n1 * n2 ELSE {zero} END")).alias("sxx"),
        F.sum(F.expr(f"CASE WHEN y2 = y1 THEN n1 * n2 ELSE {zero} END")).alias("syy"),
        F.sum(F.expr(f"CASE WHEN x2 > x1 AND y2 > y1 THEN n1 * n2 ELSE {zero} END")).alias("c"),
        F.sum(F.expr(f"CASE WHEN x2 > x1 AND y2 < y1 THEN n1 * n2 ELSE {zero} END")).alias("d"))
    return s.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        r4c(F.expr(
            "CAST(c - d AS DOUBLE)"
            " / sqrt(CAST(nn * nn - sxx AS DOUBLE) / 2"
            " * (CAST(nn * nn - syy AS DOUBLE) / 2))")).alias("tau_b"),
        r4c(F.expr("CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE)"))
        .alias("gamma"))


# --------------------------------------------------------------------------
# Q277 Friedman test: does order-priority ranking of monthly revenue
# stay consistent across months? Blocks = order months, treatments =
# the 5 priorities, cell value = exact integer revenue cents. Ranks are
# WITHIN-block (partitioned windows — no global-order scaling trap) and
# tie-averaged via the same 2x-integer convention as q273-q275, so the
# rank sums are exact; only complete blocks (all k treatments present)
# enter, per the test's definition. Q = 3*SUM(R2_j^2)/(n*k*(k+1)) -
# 3*n*(k+1) with R2_j the 2x rank sum of treatment j, and Kendall's
# W = Q/(n*(k-1)) measures the concordance strength.
@query(
    "q277_friedman",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS blk,
             o_orderpriority AS trt,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS v
      FROM orders GROUP BY 1, 2),
    k AS (SELECT COUNT(DISTINCT trt) AS k FROM cell),
    full_blk AS (
      SELECT blk FROM cell CROSS JOIN k
      GROUP BY blk, k.k HAVING COUNT(*) = ANY_VALUE(k.k)),
    r AS (
      SELECT c.trt,
             2 * RANK() OVER (PARTITION BY c.blk ORDER BY c.v)
               + COUNT(*) OVER (PARTITION BY c.blk, c.v) - 1 AS rank2
      FROM cell c JOIN full_blk USING (blk)),
    g AS (
      SELECT trt, SUM(CAST(rank2 AS HUGEINT)) AS r2j, COUNT(*) AS n
      FROM r GROUP BY trt),
    s AS (
      SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)) AS q2
      FROM g)
    SELECT n, k,
           {r4("3 * q2 / (CAST(n AS DOUBLE) * k * (k + 1))"
               " - 3 * CAST(n AS DOUBLE) * (k + 1)")} AS q_stat,
           {r4("(3 * q2 / (CAST(n AS DOUBLE) * k * (k + 1))"
               " - 3 * CAST(n AS DOUBLE) * (k + 1))"
               " / (CAST(n AS DOUBLE) * (k - 1))")} AS kendall_w
    FROM s
    """,
    doc="Friedman rank test of priority revenue consistency across "
        "month blocks, with Kendall's W concordance.",
)
def q277(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = (tables(spark, sf_dir)["orders"]
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("blk"),
                     F.col("o_orderpriority").alias("trt"))
            .agg(F.sum(F.expr(
                "CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0))"))
                .alias("v")))
    k = cell.agg(F.countDistinct("trt").alias("k"))
    full_blk = (cell.join(F.broadcast(k))
                .groupBy("blk", "k").agg(F.count("*").alias("ct"))
                .filter("ct = k").select("blk"))
    w_rank = Window.partitionBy("blk").orderBy("v")
    w_tie = Window.partitionBy("blk", "v")
    r = (cell.join(full_blk, "blk")
         .withColumn("rank2",
                     F.lit(2) * F.rank().over(w_rank)
                     + F.count("*").over(w_tie) - 1))
    g = r.groupBy("trt").agg(
        F.sum(F.col("rank2").cast("decimal(38,0)")).alias("r2j"),
        F.count("*").alias("n"))
    s = g.agg(
        F.first("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.expr("CAST(r2j AS DOUBLE) * CAST(r2j AS DOUBLE)"))
        .alias("q2"))
    return s.select(
        "n", "k",
        r4c(F.expr("3 * q2 / (CAST(n AS DOUBLE) * k * (k + 1))"
                   " - 3 * CAST(n AS DOUBLE) * (k + 1)")).alias("q_stat"),
        r4c(F.expr("(3 * q2 / (CAST(n AS DOUBLE) * k * (k + 1))"
                   " - 3 * CAST(n AS DOUBLE) * (k + 1))"
                   " / (CAST(n AS DOUBLE) * (k - 1))")).alias("kendall_w"))


# --------------------------------------------------------------------------
# Q278 Brown-Forsythe robust variance-homogeneity test: are order-total
# spreads equal across priorities? The classic Levene variant on
# |x - group median|. The doubled-median trick keeps everything exact:
# 2*median of integers is itself an integer (sum of the two middle
# values), so z2 = |2*cents - 2*med_g| is an exact integer and the
# one-way ANOVA F on z2 (scale-invariant, so the x2 rides through)
# reduces to per-group integer sufficient statistics (n, sum z2,
# sum z2^2) — one group-by pass after a broadcast median join; the
# F numerator/denominator combine 5 exact group rows in shared
# expression text.
@query(
    "q278_brown_forsythe",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    med AS (
      SELECT grp, CAST(2 * MEDIAN(cents) AS BIGINT) AS m2
      FROM b GROUP BY grp),
    z AS (
      SELECT b.grp, ABS(2 * b.cents - m.m2) AS z2
      FROM b JOIN med m ON b.grp = m.grp),
    g AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(z2 AS HUGEINT)) AS s,
             SUM(CAST(z2 AS HUGEINT) * z2) AS q
      FROM z GROUP BY grp),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s AS DOUBLE)) AS st,
             SUM(CAST(q AS DOUBLE)) AS qt,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
      FROM g)
    SELECT n, k,
           {r4("((sb - st * st / n) / (k - 1))"
               " / ((qt - sb) / (n - k))")} AS f_stat,
           {r4("(sb - st * st / n) / (qt - st * st / n)")} AS eta_sq
    FROM t
    """,
    doc="Brown-Forsythe (median-centered Levene) F test of variance "
        "homogeneity across priorities, with eta-squared effect size.",
)
def q278(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    med = b.groupBy("grp").agg(
        F.expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)").alias("m2"))
    z = (b.join(F.broadcast(med), "grp")
         .select("grp", F.expr("ABS(2 * cents - m2)").alias("z2")))
    g = z.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("z2").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(z2 AS DECIMAL(38,0)) * z2")).alias("q"))
    t = g.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("s").cast("double")).alias("st"),
        F.sum(F.col("q").cast("double")).alias("qt"),
        F.sum(F.expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n"))
        .alias("sb"))
    return t.select(
        "n", "k",
        r4c(F.expr("((sb - st * st / n) / (k - 1))"
                   " / ((qt - sb) / (n - k))")).alias("f_stat"),
        r4c(F.expr("(sb - st * st / n) / (qt - st * st / n)"))
        .alias("eta_sq"))


# --------------------------------------------------------------------------
# Q279 Welch's unequal-variance t-test: do urgent-priority orders carry a
# different mean total than the rest? Per-group sufficient statistics
# (n, sum, sum-of-squares of exact integer cents) in DECIMAL(38,0)/
# HUGEINT — one conditional global aggregation, no per-row float math —
# then t, the Welch–Satterthwaite df, and Cohen's d (pooled-sd) fold the
# six exact numbers in IEEE double with identical expression text on
# both engines. The curation A/B primitive: "did the new filter change
# mean document quality?" at any corpus size in one map-side-combinable
# pass.
@query(
    "q279_welch_ttest",
    oracle=f"""
    WITH b AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    s AS (
      SELECT CAST(SUM(grp) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(grp) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents AS HUGEINT)
                           ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents AS HUGEINT)
                           ELSE 0 END) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents AS HUGEINT) * cents
                           ELSE 0 END) AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents AS HUGEINT) * cents
                           ELSE 0 END) AS DOUBLE) AS q2
      FROM b),
    v AS (
      SELECT n1, n2,
             (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (q2 - s2 * s2 / n2) / (n2 - 1) AS v2,
             s1 / n1 - s2 / n2 AS md
      FROM s)
    SELECT n1, n2,
           {r4("md / 100")} AS mean_diff,
           {r4("md / sqrt(v1 / n1 + v2 / n2)")} AS t_stat,
           {r4("(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)"
               " / ((v1 / n1) * (v1 / n1) / (n1 - 1)"
               "    + (v2 / n2) * (v2 / n2) / (n2 - 1))")} AS df_welch,
           {r4("md / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))")}
             AS cohens_d
    FROM v
    """,
    doc="Welch's unequal-variance t of urgent vs non-urgent order totals "
        "with Welch-Satterthwaite df and pooled-sd Cohen's d — exact "
        "integer sufficient statistics, one aggregation pass.",
)
def q279(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
               " THEN 1 ELSE 0 END").alias("grp"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    s = b.agg(
        F.sum("grp").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("n2"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN CAST(cents AS DECIMAL(38,0))"
                     " ELSE 0 END")).cast("double").alias("s1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN CAST(cents AS DECIMAL(38,0))"
                     " ELSE 0 END")).cast("double").alias("s2"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN CAST(cents AS DECIMAL(38,0))"
                     " * cents ELSE 0 END")).cast("double").alias("q1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN CAST(cents AS DECIMAL(38,0))"
                     " * cents ELSE 0 END")).cast("double").alias("q2"))
    v = s.select(
        "n1", "n2",
        F.expr("(q1 - s1 * s1 / n1) / (n1 - 1)").alias("v1"),
        F.expr("(q2 - s2 * s2 / n2) / (n2 - 1)").alias("v2"),
        F.expr("s1 / n1 - s2 / n2").alias("md"))
    return v.select(
        "n1", "n2",
        r4c(F.expr("md / 100")).alias("mean_diff"),
        r4c(F.expr("md / sqrt(v1 / n1 + v2 / n2)")).alias("t_stat"),
        r4c(F.expr(
            "(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)"
            " / ((v1 / n1) * (v1 / n1) / (n1 - 1)"
            "    + (v2 / n2) * (v2 / n2) / (n2 - 1))")).alias("df_welch"),
        r4c(F.expr(
            "md / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))"))
        .alias("cohens_d"))


# --------------------------------------------------------------------------
# Q280 average precision (area under the precision-recall step curve) per
# event type, one-vs-rest with score = value: AP = Σ_v (pos_v/n_pos) ·
# precision(v) over distinct thresholds v descending, ties grouped —
# the retrieval/calibration complement to q185's ROC AUC (PR is the
# one that moves under class imbalance, the common case for curation
# classifiers). Same distributed shape as q185: per-value counts, the
# all-types cumulative via the bucket-offset two-level scan (never a
# single-task global window), per-type cumulative partitioned by type.
# Per-threshold precision terms are quantized to DECIMAL(18,6) BEFORE
# summation (q166 convention) so the sum is aggregation-order-exact on
# both engines; the one division by n_pos happens once at the end.
@query(
    "q280_avg_precision",
    oracle="""
    WITH c AS (SELECT event_type, value AS v, COUNT(*) AS n
               FROM events GROUP BY event_type, v),
    cv AS (SELECT v, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY v),
    cw AS (SELECT v, tot,
                  CAST(SUM(tot) OVER (ORDER BY v) - tot AS BIGINT)
                    AS cum_tot_less
           FROM cv),
    ct AS (SELECT event_type, v, n,
                  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY v) - n
                       AS BIGINT) AS cum_pos_less
           FROM c),
    na AS (SELECT COUNT(*) AS n_all FROM events),
    np AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_pos
           FROM c GROUP BY event_type),
    terms AS (
      SELECT ct.event_type, n,
             ROUND(CAST(CAST(n AS DOUBLE)
                        * (n_pos - cum_pos_less)
                        / (n_all - cum_tot_less)
                        AS DECIMAL(18,6)), 6) AS term
      FROM ct JOIN cw USING (v) CROSS JOIN na
      JOIN np ON np.event_type = ct.event_type)
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE) / SUM(n)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS ap
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    doc="One-vs-rest average precision (PR-curve area) per event type: "
        "tie-grouped thresholds, order-exact decimal term sums, one "
        "division at the end.",
)
def q280(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count("*").alias("n"))
    # r14 (guide §2.3/§2.4): the all-types cumulative used to live on a
    # separate per-v aggregate (cv) whose bucket running-sum and bucket-net
    # branches each re-derived c from the scan and joined back on v — four
    # events scans in all. Both cumulative columns are now WINDOWS on the
    # one (event_type, v) frame: the oracle's per-v tot is a
    # partitionBy(v) sum, and the within-bucket running total is the
    # default RANGE frame over partitionBy(bkt) orderBy(v) (ties across
    # event types share v, so the range frame reproduces cv's per-v
    # cumulative exactly). Only the bounded |buckets| carry pass remains a
    # separate branch (q185's two-level shape — the cross-bucket prefix is
    # the one thing a partitioned window cannot see). The old ct-cw v-join
    # disappears; its null-unsafe drop of NULL-v rows is reproduced by the
    # carry join's null bkt (windows are computed BEFORE that join, so
    # n_pos still counts NULL-v rows, matching the oracle's np).
    bkt_col = F.expr("CAST(FLOOR(v) AS BIGINT)")
    cb = c.withColumn("bkt", bkt_col)
    w_t = Window.partitionBy("event_type").orderBy("v")
    w_tp = Window.partitionBy("event_type")
    w_b = Window.partitionBy("bkt").orderBy("v")  # RANGE: includes v-ties
    w_v = Window.partitionBy("v")
    main = cb.select(
        "event_type", "v", "n", "bkt",
        (F.sum("n").over(w_t) - F.col("n")).alias("cum_pos_less"),
        F.sum("n").over(w_tp).alias("n_pos"),
        F.sum("n").over(w_b).alias("cum_in_le"),
        F.sum("n").over(w_v).alias("tot"),
    )
    nets = (ev.groupBy(F.expr("CAST(FLOOR(value) AS BIGINT)").alias("bkt"))
            .agg(F.count("*").alias("net")))
    w_carry = Window.orderBy("bkt")  # |buckets| rows — bounded
    carry = nets.withColumn(
        "carry", F.sum("net").over(w_carry) - F.col("net")).select(
        "bkt", "carry")
    na = ev.agg(F.count("*").alias("n_all"))
    terms = (main.join(F.broadcast(carry), "bkt").join(F.broadcast(na))
             .select(
                 "event_type", "n",
                 (F.col("carry") + F.col("cum_in_le") - F.col("tot"))
                 .alias("cum_tot_less"),
                 F.col("n_pos"), F.col("cum_pos_less"), F.col("n_all"))
             .select(
                 "event_type", "n",
                 F.round(F.expr(
                     "CAST(n AS DOUBLE) * (n_pos - cum_pos_less)"
                     " / (n_all - cum_tot_less)").cast("decimal(18,6)"), 6)
                 .alias("term")))
    return (
        terms.groupBy("event_type")
        .agg(F.sum("n").cast("bigint").alias("n_pos"),
             F.round(F.expr("CAST(SUM(term) AS DOUBLE) / SUM(n)")
                     .cast("decimal(18,6)"), 4).cast("double").alias("ap"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q281 Cramér's V association between order priority and order status:
# the [0,1]-normalized effect size on top of the q166 chi-square
# machinery — "are these two categoricals related, and how much" as one
# number, the first screen before using a column as a stratification
# key. Contingency cells from one map-side-combinable aggregation
# (bounded by the category domains, never row count); per-cell chi2
# terms quantized to DECIMAL BEFORE summation (order-exact); V and the
# Bergsma bias-corrected V~ fold the exact totals in shared expression
# text.
@query(
    "q281_cramers_v",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS obs
      FROM orders GROUP BY a, b),
    rt AS (SELECT a, SUM(obs) AS r FROM o GROUP BY a),
    ct AS (SELECT b, SUM(obs) AS c FROM o GROUP BY b),
    nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT a) AS BIGINT) AS ra,
                  CAST(COUNT(DISTINCT b) AS BIGINT) AS cb
           FROM o),
    cells AS (
      SELECT ROUND(CAST((CAST(obs AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                        * (CAST(obs AS DOUBLE) - CAST(r * c AS DOUBLE) / n)
                        / (CAST(r * c AS DOUBLE) / n)
                        AS DECIMAL(18,6)), 6) AS term
      FROM o JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN nn),
    s AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM cells)
    SELECT n, ra, cb,
           {r4("chi2")} AS chi2,
           CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof,
           {r4("sqrt(chi2 / (n * (least(ra, cb) - 1)))")} AS cramers_v,
           {r4("sqrt(greatest(chi2 / n - CAST((ra-1)*(cb-1) AS DOUBLE)"
               " / (n - 1), 0)"
               " / (least(ra - CAST((ra-1)*(ra-1) AS DOUBLE) / (n - 1),"
               "          cb - CAST((cb-1)*(cb-1) AS DOUBLE) / (n - 1))"
               "    - 1))")} AS cramers_v_corrected
    FROM s CROSS JOIN nn
    """,
    doc="Cramér's V (and Bergsma bias-corrected V) between order "
        "priority and status: contingency cells bounded by the category "
        "domains, order-exact decimal chi-square.",
)
def q281(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 single-scan shape: the row/column marginals attach to the cell
    # frame as partitioned WINDOW sums instead of equi-join-backs. The
    # equi-joins implied isnotnull(a)/isnotnull(b) filters that pushed
    # through the contingency aggregate into the scan, splitting the rt /
    # ct / nn branches into four separate orders scans; windows imply no
    # filter, so every branch shares ONE scan + ONE (a,b) exchange (the
    # marginal windows then shuffle only the domain-bounded cell frame).
    # The joins' null semantics (a- or b-NULL cells drop out of `cells`
    # but still feed the marginals and nn) are reproduced by the when()
    # guard on the term.
    o = (tables(spark, sf_dir)["orders"]
         .groupBy(F.col("o_orderpriority").alias("a"),
                  F.col("o_orderstatus").alias("b"))
         .agg(F.count("*").alias("obs")))
    nn = o.agg(F.sum("obs").cast("bigint").alias("n"),
               F.countDistinct("a").cast("bigint").alias("ra"),
               F.countDistinct("b").cast("bigint").alias("cb"))
    e = "CAST(r * c AS DOUBLE) / n"
    cells = (o.select(
                 "a", "b", "obs",
                 F.sum("obs").over(Window.partitionBy("a")).alias("r"),
                 F.sum("obs").over(Window.partitionBy("b")).alias("c"))
             .join(F.broadcast(nn))
             .select(F.when(
                 F.col("a").isNotNull() & F.col("b").isNotNull(),
                 F.round(F.expr(
                     f"(CAST(obs AS DOUBLE) - {e}) * (CAST(obs AS DOUBLE) - {e})"
                     f" / ({e})").cast("decimal(18,6)"), 6)).alias("term")))
    s = cells.agg(F.sum("term").cast("double").alias("chi2"))
    return s.join(F.broadcast(nn)).select(
        "n", "ra", "cb",
        r4c(F.col("chi2")).alias("chi2"),
        F.expr("CAST((ra - 1) * (cb - 1) AS BIGINT)").alias("dof"),
        r4c(F.expr("sqrt(chi2 / (n * (least(ra, cb) - 1)))"))
        .alias("cramers_v"),
        r4c(F.expr(
            "sqrt(greatest(chi2 / n - CAST((ra-1)*(cb-1) AS DOUBLE)"
            " / (n - 1), 0)"
            " / (least(ra - CAST((ra-1)*(ra-1) AS DOUBLE) / (n - 1),"
            "          cb - CAST((cb-1)*(cb-1) AS DOUBLE) / (n - 1))"
            "    - 1))")).alias("cramers_v_corrected"))


# --------------------------------------------------------------------------
# Q282 McNemar's paired test: did customer purchase behavior change
# between 1996 and 1997? Each customer is its own control (paired binary
# outcome bought-in-y1 / bought-in-y2 over the full customer universe),
# so the test reads ONLY the discordant cells: chi2 = (b-c)^2/(b+c),
# plus the Edwards continuity-corrected form and the odds ratio b/c.
# Scale shape: two year-filtered semi-aggregations to customer grain,
# one outer-join-free conditional fold via max() flags — a single
# groupBy(custkey) pass over the orders scan, then a 4-cell fold.
@query(
    "q282_mcnemar",
    oracle=f"""
    WITH f AS (
      SELECT o_custkey AS cust,
             MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS y1,
             MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS y2
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY cust),
    u AS (
      SELECT c.c_custkey, COALESCE(f.y1, 0) AS y1, COALESCE(f.y2, 0) AS y2
      FROM customer c LEFT JOIN f ON f.cust = c.c_custkey),
    s AS (
      SELECT CAST(SUM(y1 * y2) AS BIGINT) AS n11,
             CAST(SUM(y1 * (1 - y2)) AS BIGINT) AS n10,
             CAST(SUM((1 - y1) * y2) AS BIGINT) AS n01,
             CAST(SUM((1 - y1) * (1 - y2)) AS BIGINT) AS n00
      FROM u)
    SELECT n11, n10, n01, n00,
           {r4("CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)")}
             AS chi2,
           {r4("(abs(CAST(n10 - n01 AS DOUBLE)) - 1)"
               " * (abs(CAST(n10 - n01 AS DOUBLE)) - 1) / (n10 + n01)")}
             AS chi2_cc,
           {r4("CAST(n10 AS DOUBLE) / n01")} AS odds_ratio
    FROM s
    """,
    doc="McNemar's paired test of 1996-vs-1997 customer purchase flags "
        "over the full customer universe: discordant-cell chi2, "
        "continuity-corrected form, odds ratio.",
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    f = (t["orders"]
         .filter(F.expr("year(o_orderdate) IN (1996, 1997)"))
         .groupBy(F.col("o_custkey").alias("cust"))
         .agg(F.max(F.expr("CASE WHEN year(o_orderdate) = 1996"
                           " THEN 1 ELSE 0 END")).alias("y1"),
              F.max(F.expr("CASE WHEN year(o_orderdate) = 1997"
                           " THEN 1 ELSE 0 END")).alias("y2")))
    u = (t["customer"].join(f, t["customer"]["c_custkey"] == f["cust"],
                            "left")
         .select(F.expr("COALESCE(y1, 0)").alias("y1"),
                 F.expr("COALESCE(y2, 0)").alias("y2")))
    s = u.agg(
        F.sum(F.expr("y1 * y2")).cast("bigint").alias("n11"),
        F.sum(F.expr("y1 * (1 - y2)")).cast("bigint").alias("n10"),
        F.sum(F.expr("(1 - y1) * y2")).cast("bigint").alias("n01"),
        F.sum(F.expr("(1 - y1) * (1 - y2)")).cast("bigint").alias("n00"))
    return s.select(
        "n11", "n10", "n01", "n00",
        r4c(F.expr("CAST((n10 - n01) * (n10 - n01) AS DOUBLE)"
                   " / (n10 + n01)")).alias("chi2"),
        r4c(F.expr("(abs(CAST(n10 - n01 AS DOUBLE)) - 1)"
                   " * (abs(CAST(n10 - n01 AS DOUBLE)) - 1)"
                   " / (n10 + n01)")).alias("chi2_cc"),
        r4c(F.expr("CAST(n10 AS DOUBLE) / n01")).alias("odds_ratio"))


# --------------------------------------------------------------------------
# Q285 classical one-way ANOVA F on raw order totals by priority — the
# location test completing the variance-decomposition family: q278
# applies this same F to median-centered spreads (Brown-Forsythe), q279
# is its two-sample unequal-variance special case (Welch). Exact
# DECIMAL(38,0) sufficient statistics (n, Σx, Σx²) of integer cents per
# group in ONE map-side-combinable pass; the F ratio plus eta²/omega²
# effect sizes combine 5 exact group rows in shared expression text.
@query(
    "q285_anova_f",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS q
      FROM b GROUP BY grp),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s AS DOUBLE)) AS st,
             SUM(CAST(q AS DOUBLE)) AS qt,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
      FROM g)
    SELECT n, k,
           {r4("((sb - st * st / n) / (k - 1))"
               " / ((qt - sb) / (n - k))")} AS f_stat,
           {r4("(sb - st * st / n) / (qt - st * st / n)")} AS eta_sq,
           {r4("((sb - st * st / n) - (k - 1) * (qt - sb) / (n - k))"
               " / ((qt - st * st / n) + (qt - sb) / (n - k))")}
             AS omega_sq
    FROM t
    """,
    doc="One-way ANOVA F of order totals across priorities from exact "
        "integer sufficient statistics, with eta-squared and "
        "omega-squared effect sizes.",
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    g = b.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("q"))
    t = g.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("s").cast("double")).alias("st"),
        F.sum(F.col("q").cast("double")).alias("qt"),
        F.sum(F.expr("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n"))
        .alias("sb"))
    return t.select(
        "n", "k",
        r4c(F.expr("((sb - st * st / n) / (k - 1))"
                   " / ((qt - sb) / (n - k))")).alias("f_stat"),
        r4c(F.expr("(sb - st * st / n) / (qt - st * st / n)"))
        .alias("eta_sq"),
        r4c(F.expr("((sb - st * st / n) - (k - 1) * (qt - sb) / (n - k))"
                   " / ((qt - st * st / n) + (qt - sb) / (n - k))"))
        .alias("omega_sq"))


# --------------------------------------------------------------------------
# Q286 Jarque-Bera normality test per event type: JB = n/6·(g1² + g2²/4)
# on the population skewness/excess-kurtosis Spark's built-ins return
# natively; the oracle converts DuckDB's sample G1/G2 with the exact
# scalar identities documented at the top of this module (q89
# convention). One map-side-combinable aggregation — the moment sums are
# Catalyst's streaming central-moment update, no second pass.
@query(
    "q286_jarque_bera",
    oracle=f"""
    WITH m AS (
      SELECT event_type, COUNT(value) AS n,
             skewness(value) * (COUNT(value) - 2)
               / sqrt(COUNT(value) * (COUNT(value) - 1.0)) AS g1,
             (kurtosis(value) * (COUNT(value) - 2.0)
                * (COUNT(value) - 3.0) / (COUNT(value) - 1.0) - 6)
               / (COUNT(value) + 1.0) AS g2
      FROM events GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           {r4("g1")} AS skew,
           {r4("g2")} AS kurt,
           {r4("n / 6.0 * (g1 * g1 + g2 * g2 / 4)")} AS jb
    FROM m ORDER BY event_type
    """,
    doc="Jarque-Bera normality statistic per event type from one-pass "
        "population moments; oracle converts DuckDB sample G1/G2 "
        "exactly.",
)
def q286(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (tables(spark, sf_dir)["events"]
         .groupBy("event_type")
         .agg(F.count("value").alias("n"),
              F.skewness("value").alias("g1"),
              F.kurtosis("value").alias("g2")))
    return (m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        r4c(F.col("g1")).alias("skew"),
        r4c(F.col("g2")).alias("kurt"),
        r4c(F.expr("n / 6.0 * (g1 * g1 + g2 * g2 / 4)")).alias("jb"))
        .orderBy("event_type"))


# --------------------------------------------------------------------------
# Q287 mean-centered Levene variance-homogeneity test — the classical
# companion to q278's median-centered Brown-Forsythe. Exactness trick:
# z_ij = |x_ij − mean_j| = |n_j·x_ij − S_j| / n_j, and the scaled
# residual L = n_j·x − S_j is an exact integer, so the per-group z
# sufficient statistics are exact integer sums divided ONCE by n_j
# (Σz = Σ|L|/n_j, Σz² = ΣL²/n_j²) — no floating-point subtraction ever
# touches row data. Broadcast mean join, one group-by pass, 5-row fold.
@query(
    "q287_levene_mean",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    m AS (
      SELECT grp, COUNT(*) AS n, SUM(CAST(cents AS HUGEINT)) AS s
      FROM b GROUP BY grp),
    z AS (
      SELECT b.grp, ABS(m.n * CAST(b.cents AS HUGEINT) - m.s) AS l
      FROM b JOIN m USING (grp)),
    g AS (
      SELECT grp, COUNT(*) AS n,
             SUM(l) AS a, SUM(l * l) AS b2
      FROM z GROUP BY grp),
    r AS (
      SELECT n, CAST(a AS DOUBLE) / n AS sz,
             CAST(b2 AS DOUBLE) / n / n AS qz
      FROM g),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(sz) AS st, SUM(qz) AS qt,
             SUM(sz * sz / n) AS sb
      FROM r)
    SELECT n, k,
           {r4("((sb - st * st / n) / (k - 1))"
               " / ((qt - sb) / (n - k))")} AS w_stat,
           {r4("(sb - st * st / n) / (qt - st * st / n)")} AS eta_sq
    FROM t
    """,
    doc="Mean-centered Levene W test of variance homogeneity across "
        "priorities; scaled integer residuals keep every row-level sum "
        "exact.",
)
def q287(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    m = b.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"))
    z = (b.join(F.broadcast(m), "grp")
         .select("grp",
                 F.expr("ABS(n * CAST(cents AS DECIMAL(38,0)) - s)")
                 .alias("l")))
    g = z.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("l").alias("a"),
        F.sum(F.expr("l * l")).alias("b2"))
    r = g.select(
        "n",
        F.expr("CAST(a AS DOUBLE) / n").alias("sz"),
        F.expr("CAST(b2 AS DOUBLE) / n / n").alias("qz"))
    t = r.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("sz").alias("st"),
        F.sum("qz").alias("qt"),
        F.sum(F.expr("sz * sz / n")).alias("sb"))
    return t.select(
        "n", "k",
        r4c(F.expr("((sb - st * st / n) / (k - 1))"
                   " / ((qt - sb) / (n - k))")).alias("w_stat"),
        r4c(F.expr("(sb - st * st / n) / (qt - st * st / n)"))
        .alias("eta_sq"))


# --------------------------------------------------------------------------
# Q288 Wilcoxon signed-rank test of paired per-customer yearly spend
# (1996 vs 1997, customers active in both): the nonparametric companion
# to q282's McNemar (which sees only the binary flags) and q274's
# unpaired Mann-Whitney. Zero differences drop per the classical
# convention; |d| is ranked tie-averaged with the distributed rank2
# scheme (operators/scale.py::global_avg_rank2 — only per-bucket counts
# cross the single-partition exchange, never rows), W+ folds as an exact
# integer Σrank2, and the tie-corrected normal approximation divides
# once at the end.
@query(
    "q288_wilcoxon_signed_rank",
    oracle=f"""
    WITH f AS (
      SELECT o_custkey AS cust,
             SUM(CASE WHEN year(o_orderdate) = 1996
                 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS c96,
             SUM(CASE WHEN year(o_orderdate) = 1997
                 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS c97,
             MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END)
               AS h96,
             MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END)
               AS h97
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY cust),
    d AS (
      SELECT CAST(c96 - c97 AS BIGINT) AS d,
             CAST(ABS(c96 - c97) AS BIGINT) AS ad
      FROM f WHERE h96 = 1 AND h97 = 1 AND c96 <> c97),
    r AS (
      SELECT d,
             2 * RANK() OVER (ORDER BY ad)
               + COUNT(*) OVER (PARTITION BY ad) - 1 AS rank2
      FROM d),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
      FROM (SELECT COUNT(*) AS t FROM d GROUP BY ad)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT)
               AS w2p
      FROM r)
    SELECT n, w2p,
           {r4("w2p / 2.0")} AS w_plus,
           {r4("(w2p / 2.0 - n * (n + 1) / 4.0)"
               " / sqrt(n * (n + 1.0) * (2 * n + 1) / 24 - tie3 / 48.0)")}
             AS z
    FROM s CROSS JOIN ties
    """,
    doc="Wilcoxon signed-rank test of paired 1996-vs-1997 customer spend "
        "with tie-averaged distributed ranks, exact integer W+, and the "
        "tie-corrected normal approximation.",
)
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import global_avg_rank2

    f = (tables(spark, sf_dir)["orders"]
         .filter(F.expr("year(o_orderdate) IN (1996, 1997)"))
         .groupBy(F.col("o_custkey").alias("cust"))
         .agg(F.sum(F.expr(
                  "CASE WHEN year(o_orderdate) = 1996"
                  " THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                  " ELSE 0 END")).alias("c96"),
              F.sum(F.expr(
                  "CASE WHEN year(o_orderdate) = 1997"
                  " THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                  " ELSE 0 END")).alias("c97"),
              F.max(F.expr("CASE WHEN year(o_orderdate) = 1996"
                           " THEN 1 ELSE 0 END")).alias("h96"),
              F.max(F.expr("CASE WHEN year(o_orderdate) = 1997"
                           " THEN 1 ELSE 0 END")).alias("h97")))
    d = (f.filter("h96 = 1 AND h97 = 1 AND c96 <> c97")
         .select(F.expr("CAST(c96 - c97 AS BIGINT)").alias("d"),
                 F.expr("CAST(ABS(c96 - c97) AS BIGINT)").alias("ad")))
    r = global_avg_rank2(d, "ad", out_col="rank2",
                         bucket_width=1_000_000)
    ties = (d.groupBy("ad").agg(F.count("*").alias("t"))
            .agg(F.sum(F.expr("t * t * t - t")).cast("bigint")
                 .alias("tie3")))
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN d > 0 THEN rank2 ELSE 0 END"))
        .cast("bigint").alias("w2p"))
    return (s.join(F.broadcast(ties))
            .select("n", "w2p",
                    r4c(F.expr("w2p / 2.0")).alias("w_plus"),
                    r4c(F.expr(
                        "(w2p / 2.0 - n * (n + 1) / 4.0)"
                        " / sqrt(n * (n + 1.0) * (2 * n + 1) / 24"
                        "        - tie3 / 48.0)")).alias("z")))


# --------------------------------------------------------------------------
# Q289 Cochran's Q test of k correlated binary treatments: did purchase
# incidence differ across the four quarters of 1996? The k-sample
# generalization of q282's McNemar (k=2) and the binary analogue of
# q277's Friedman. All-zero subjects contribute nothing to any term of
# Q, so the customer universe reduces to customers active in 1996 —
# no dimension join needed. Sufficient statistics are column sums G_j,
# N, and ΣL_i² over the distinct (customer, quarter) incidence pairs:
# two cheap aggregations of one distinct-pair frame, all integers.
@query(
    "q289_cochran_q",
    oracle=f"""
    WITH p AS (
      SELECT DISTINCT o_custkey AS cust, quarter(o_orderdate) AS trt
      FROM orders WHERE year(o_orderdate) = 1996),
    l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_subj,
             CAST(SUM(li * li) AS BIGINT) AS sl2,
             CAST(SUM(li) AS BIGINT) AS nn
      FROM (SELECT COUNT(*) AS li FROM p GROUP BY cust)),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(gj * gj) AS BIGINT) AS sg2
      FROM (SELECT COUNT(*) AS gj FROM p GROUP BY trt))
    SELECT n_subj, k,
           {r4("(k - 1.0) * (k * sg2 - CAST(nn AS DOUBLE) * nn)"
               " / (k * CAST(nn AS DOUBLE) - sl2)")} AS q_stat
    FROM l CROSS JOIN g
    """,
    doc="Cochran's Q test of quarterly purchase incidence over 1996: "
        "exact integer sufficient statistics from one distinct-pair "
        "frame; all-zero subjects provably drop out.",
)
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (tables(spark, sf_dir)["orders"]
         .filter("year(o_orderdate) = 1996")
         .select(F.col("o_custkey").alias("cust"),
                 F.expr("quarter(o_orderdate)").alias("trt"))
         .distinct())
    l = (p.groupBy("cust").agg(F.count("*").alias("li"))
         .agg(F.count("*").cast("bigint").alias("n_subj"),
              F.sum(F.expr("li * li")).cast("bigint").alias("sl2"),
              F.sum("li").cast("bigint").alias("nn")))
    g = (p.groupBy("trt").agg(F.count("*").alias("gj"))
         .agg(F.count("*").cast("bigint").alias("k"),
              F.sum(F.expr("gj * gj")).cast("bigint").alias("sg2")))
    return (l.join(F.broadcast(g))
            .select("n_subj", "k",
                    r4c(F.expr(
                        "(k - 1.0) * (k * sg2 - CAST(nn AS DOUBLE) * nn)"
                        " / (k * CAST(nn AS DOUBLE) - sl2)"))
                    .alias("q_stat")))


# --------------------------------------------------------------------------
# Q290 Bartlett's test of variance homogeneity across priorities — the
# parametric (normality-assuming) companion to q278/q287's Levene
# family, sharper when the normal assumption holds. Per-group sample
# variances come from the same exact DECIMAL(38,0) sufficient statistics
# as q285; ln() touches only 5 group-level doubles (both engines take
# ~1-ulp libm logs of bit-identical inputs; r4 absorbs that, the q270
# precedent). Pooled variance is reported on the ln scale because its
# cents² magnitude would overflow the r4 decimal.
@query(
    "q290_bartlett",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS q
      FROM b GROUP BY grp),
    r AS (
      SELECT n,
             CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
               AS ss
      FROM g),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(ss) AS ssw,
             SUM((n - 1) * ln(ss / (n - 1))) AS sum_ln,
             SUM(1.0 / (n - 1)) AS sum_inv
      FROM r)
    SELECT n, k,
           {r4("ln(ssw / (n - k))")} AS ln_pooled_var,
           {r4("((n - k) * ln(ssw / (n - k)) - sum_ln)"
               " / (1 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1)))")}
             AS bartlett_x2
    FROM t
    """,
    doc="Bartlett's chi-squared test of variance homogeneity across "
        "priorities from exact integer group sums; logs touch only "
        "5 group-level doubles.",
)
def q290(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
    g = b.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("q"))
    r = g.select(
        "n",
        F.expr("CAST(q AS DOUBLE)"
               " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n").alias("ss"))
    t = r.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("ss").alias("ssw"),
        F.sum(F.expr("(n - 1) * ln(ss / (n - 1))")).alias("sum_ln"),
        F.sum(F.expr("1.0 / (n - 1)")).alias("sum_inv"))
    return t.select(
        "n", "k",
        r4c(F.expr("ln(ssw / (n - k))")).alias("ln_pooled_var"),
        r4c(F.expr(
            "((n - k) * ln(ssw / (n - k)) - sum_ln)"
            " / (1 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1)))"))
        .alias("bartlett_x2"))


# --------------------------------------------------------------------------
# Q293 Cohen's kappa + Matthews correlation between two binary "raters"
# on orders: rater A flags totals above the global median (2x-median
# trick keeps the threshold an exact integer), rater B flags urgent/high
# priority — the chance-corrected agreement panel q281's Cramér's V
# (association strength) doesn't give. One broadcast threshold join,
# one conditional-aggregation pass to the 2x2 table, closed-form folds.
@query(
    "q293_cohens_kappa",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS rb
      FROM orders),
    m AS (SELECT CAST(2 * MEDIAN(cents) AS BIGINT) AS m2 FROM b),
    f AS (
      SELECT CASE WHEN 2 * cents > m2 THEN 1 ELSE 0 END AS ra, rb
      FROM b CROSS JOIN m),
    s AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS n11,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
      FROM f),
    t AS (
      SELECT n11, n10, n01, n00,
             n11 + n10 + n01 + n00 AS n,
             CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00) AS po,
             (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
               / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                  * (n11 + n10 + n01 + n00)) AS pe
      FROM s)
    SELECT CAST(n AS BIGINT) AS n, n11, n10, n01, n00,
           {r4("po")} AS po, {r4("pe")} AS pe,
           {r4("(po - pe) / (1 - pe)")} AS kappa,
           {r4("(CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)"
               " / sqrt(CAST(n11 + n10 AS DOUBLE) * (n01 + n00)"
               "        * (n11 + n01) * (n10 + n00))")} AS mcc
    FROM t
    """,
    doc="Cohen's kappa and Matthews correlation between above-median-total "
        "and urgent/high-priority binary raters from one exact 2x2 "
        "contingency pass.",
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
               " THEN 1 ELSE 0 END").alias("rb"))
    m = b.agg(F.expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)")
              .alias("m2"))
    f = (b.join(F.broadcast(m))
         .select(F.expr("CASE WHEN 2 * cents > m2 THEN 1 ELSE 0 END")
                 .alias("ra"), "rb"))
    s = f.agg(
        F.sum(F.expr("ra * rb")).cast("bigint").alias("n11"),
        F.sum(F.expr("ra * (1 - rb)")).cast("bigint").alias("n10"),
        F.sum(F.expr("(1 - ra) * rb")).cast("bigint").alias("n01"),
        F.sum(F.expr("(1 - ra) * (1 - rb)")).cast("bigint").alias("n00"))
    t = s.select(
        "n11", "n10", "n01", "n00",
        F.expr("n11 + n10 + n01 + n00").alias("n"),
        F.expr("CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00)")
        .alias("po"),
        F.expr("(CAST(n11 + n10 AS DOUBLE) * (n11 + n01)"
               " + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))"
               " / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)"
               "    * (n11 + n10 + n01 + n00))").alias("pe"))
    return t.select(
        F.col("n").cast("bigint").alias("n"),
        "n11", "n10", "n01", "n00",
        r4c(F.col("po")).alias("po"),
        r4c(F.col("pe")).alias("pe"),
        r4c(F.expr("(po - pe) / (1 - pe)")).alias("kappa"),
        r4c(F.expr(
            "(CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)"
            " / sqrt(CAST(n11 + n10 AS DOUBLE) * (n01 + n00)"
            "        * (n11 + n01) * (n10 + n00))")).alias("mcc"))


# --------------------------------------------------------------------------
# Q294 Brier score with the Murphy decomposition of a probabilistic
# purchase predictor: P(purchase | hour) is fit on days 1-15 and scored
# on days 16-30, decomposed over (dow, hour) evaluation cells into
# reliability − resolution + uncertainty. The predictor is constant
# within each cell (hour ⊂ cell key), which is exactly when the Murphy
# identity holds. Predictions are quantized to DECIMAL(18,6) at the
# broadcast join, per-cell terms quantized before the 168-row fold
# (q280 convention), one division by N at the end.
@query(
    "q294_brier_murphy",
    oracle="""
    WITH tr AS (
      SELECT CAST(hour(ts) AS INT) AS hr,
             ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1.0 ELSE 0 END) / COUNT(*)
                        AS DECIMAL(18,6)), 6) AS p
      FROM events WHERE day(ts) <= 15 GROUP BY hr),
    te AS (
      SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hr,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM events WHERE day(ts) > 15 GROUP BY dow, hr),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(pos) AS BIGINT) AS post
            FROM te),
    cells AS (
      SELECT n, pos, CAST(p AS DOUBLE) AS p,
             CAST(post AS DOUBLE) / nn AS ybar, nn
      FROM te JOIN tr USING (hr) CROSS JOIN tot),
    terms AS (
      SELECT nn,
             ROUND(CAST(n * p * p - 2 * p * pos + pos
                        AS DECIMAL(18,6)), 6) AS t_brier,
             ROUND(CAST(n * (p - CAST(pos AS DOUBLE) / n)
                          * (p - CAST(pos AS DOUBLE) / n)
                        AS DECIMAL(18,6)), 6) AS t_rel,
             ROUND(CAST(n * (CAST(pos AS DOUBLE) / n - ybar)
                          * (CAST(pos AS DOUBLE) / n - ybar)
                        AS DECIMAL(18,6)), 6) AS t_res,
             ybar
      FROM cells)
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(ROUND(CAST(CAST(SUM(t_brier) AS DOUBLE) / nn
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS brier,
           CAST(ROUND(CAST(CAST(SUM(t_rel) AS DOUBLE) / nn
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS reliability,
           CAST(ROUND(CAST(CAST(SUM(t_res) AS DOUBLE) / nn
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS resolution,
           CAST(ROUND(CAST(MAX(ybar) * (1 - MAX(ybar))
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS uncertainty
    FROM terms GROUP BY nn
    """,
    doc="Brier score of an hour-of-day purchase-probability predictor "
        "(fit days 1-15, scored days 16-30) with the Murphy "
        "reliability/resolution/uncertainty decomposition over "
        "(dow, hour) cells.",
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    tr = (ev.filter("day(ts) <= 15")
          .groupBy(F.expr("CAST(hour(ts) AS INT)").alias("hr"))
          .agg(F.expr(
              "ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'"
              " THEN 1.0 ELSE 0 END) / COUNT(*) AS DECIMAL(18,6)), 6)")
              .alias("p")))
    te = (ev.filter("day(ts) > 15")
          .groupBy(F.expr("CAST(dayofweek(CAST(ts AS DATE)) AS INT)")
                   .alias("dow"),
                   F.expr("CAST(hour(ts) AS INT)").alias("hr"))
          .agg(F.count("*").alias("n"),
               F.sum(F.expr("CASE WHEN event_type = 'purchase'"
                            " THEN 1 ELSE 0 END")).cast("bigint")
               .alias("pos")))
    tot = te.agg(F.sum("n").cast("bigint").alias("nn"),
                 F.sum("pos").cast("bigint").alias("post"))
    cells = (te.join(F.broadcast(tr), "hr")
             .join(F.broadcast(tot))
             .select("n", "pos", F.col("p").cast("double").alias("p"),
                     F.expr("CAST(post AS DOUBLE) / nn").alias("ybar"),
                     "nn"))
    terms = cells.select(
        "nn",
        F.expr("ROUND(CAST(n * p * p - 2 * p * pos + pos"
               " AS DECIMAL(18,6)), 6)").alias("t_brier"),
        F.expr("ROUND(CAST(n * (p - CAST(pos AS DOUBLE) / n)"
               " * (p - CAST(pos AS DOUBLE) / n)"
               " AS DECIMAL(18,6)), 6)").alias("t_rel"),
        F.expr("ROUND(CAST(n * (CAST(pos AS DOUBLE) / n - ybar)"
               " * (CAST(pos AS DOUBLE) / n - ybar)"
               " AS DECIMAL(18,6)), 6)").alias("t_res"),
        "ybar")
    return (terms.groupBy("nn").agg(
        F.expr("CAST(ROUND(CAST(CAST(SUM(t_brier) AS DOUBLE) / nn"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("brier"),
        F.expr("CAST(ROUND(CAST(CAST(SUM(t_rel) AS DOUBLE) / nn"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("reliability"),
        F.expr("CAST(ROUND(CAST(CAST(SUM(t_res) AS DOUBLE) / nn"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("resolution"),
        F.expr("CAST(ROUND(CAST(MAX(ybar) * (1 - MAX(ybar))"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("uncertainty"))
        .select(F.col("nn").cast("bigint").alias("n"),
                "brier", "reliability", "resolution", "uncertainty"))


# --------------------------------------------------------------------------
# Shared calibration readouts (q295 / q324 / the S46 live monitor): the
# closed-form arithmetic applied to a bin-grain sufficient-statistics
# frame resp. a one-row moment frame. Factored out exactly like
# training.py's srm_readout/two_prop_readout (S45), so the live monitor
# and the batch queries cannot drift.


def ece_readout(b: DataFrame) -> DataFrame:
    """q295's ECE/MCE closed form over the bin-grain frame
    (bin, n, sp, pos): n_b·|conf_b − acc_b| = |Σp_b − pos_b| with Σp_b
    an exact decimal sum of 6dp-quantized predictions, so per-bin terms
    are exact before the bounded 10-row fold. Shared with the S46 live
    calibration monitor, whose IncrementalAggregate state carries the
    SAME exact sufficient statistics per bin."""
    tot = b.agg(F.sum("n").cast("bigint").alias("nn"))
    return (b.select("n", F.col("sp"),
                     F.col("pos").cast("bigint").alias("pos"))
            .join(F.broadcast(tot))
            .groupBy("nn").agg(
                F.count("*").cast("bigint").alias("n_bins"),
                F.expr("CAST(ROUND(CAST(CAST(SUM(ABS(sp - pos)) AS DOUBLE)"
                       " / nn AS DECIMAL(18,6)), 4) AS DOUBLE)")
                .alias("ece"),
                F.expr("CAST(ROUND(CAST(MAX(ABS(CAST(sp AS DOUBLE) - pos)"
                       " / n) AS DECIMAL(18,6)), 4) AS DOUBLE)")
                .alias("mce"))
            .select(F.col("nn").alias("n"), "n_bins", "ece", "mce"))


def calibration_fit_readout(s: DataFrame) -> DataFrame:
    """q324's closed-form OLS calibration fit over the one-row exact
    moment frame (n, sp, spp, sy, spy) — sp/spp/spy already folded from
    exact decimal sums and cast to double, sy an exact integer. Shared
    with the S46 live monitor for the same reason as ``ece_readout``."""
    return s.select(
        "n", F.col("sy").alias("n_pos"),
        r4c(F.expr("(n * spy - sp * sy) / (n * spp - sp * sp)"))
        .alias("slope"),
        r4c(F.expr("(sy - (n * spy - sp * sy) / (n * spp - sp * sp)"
                   " * sp) / n")).alias("intercept"))


# --------------------------------------------------------------------------
# Q295 expected calibration error of the q294 predictor: ten fixed-width
# confidence bins over the held-out days, ECE = Σ_b (n_b/N)·|conf_b −
# acc_b| and MCE = max_b — the scalar summary of q196's reliability
# diagram, on a genuine train/test split. Bin identity: n_b·|conf_b −
# acc_b| = |Σp_b − pos_b| with Σp_b an exact decimal sum of 6dp-quantized
# predictions, so per-bin terms are exact before the bounded 10-row fold.
@query(
    "q295_ece",
    oracle="""
    WITH tr AS (
      SELECT CAST(hour(ts) AS INT) AS hr,
             ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1.0 ELSE 0 END) / COUNT(*)
                        AS DECIMAL(18,6)), 6) AS p
      FROM events WHERE day(ts) <= 15 GROUP BY hr),
    te AS (
      SELECT CAST(LEAST(FLOOR(CAST(p AS DOUBLE) * 10), 9) AS INT) AS bin,
             p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events e JOIN tr ON tr.hr = CAST(hour(e.ts) AS INT)
      WHERE day(e.ts) > 15),
    b AS (
      SELECT bin, COUNT(*) AS n, SUM(p) AS sp,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM te GROUP BY bin),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM b)
    SELECT nn AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(ROUND(CAST(CAST(SUM(ABS(sp - pos)) AS DOUBLE) / nn
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS ece,
           CAST(ROUND(CAST(MAX(ABS(CAST(sp AS DOUBLE) - pos) / n)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS mce
    FROM b CROSS JOIN tot GROUP BY nn
    """,
    doc="Expected and maximum calibration error of the hour-of-day "
        "purchase predictor on held-out days: exact per-bin "
        "|sum(p) - pos| terms, bounded 10-row fold.",
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    tr = (ev.filter("day(ts) <= 15")
          .groupBy(F.expr("CAST(hour(ts) AS INT)").alias("hr"))
          .agg(F.expr(
              "ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'"
              " THEN 1.0 ELSE 0 END) / COUNT(*) AS DECIMAL(18,6)), 6)")
              .alias("p")))
    te = (ev.filter("day(ts) > 15")
          .select(F.expr("CAST(hour(ts) AS INT)").alias("hr"),
                  F.expr("CASE WHEN event_type = 'purchase'"
                         " THEN 1 ELSE 0 END").alias("y"))
          .join(F.broadcast(tr), "hr")
          .select(F.expr("CAST(LEAST(FLOOR(CAST(p AS DOUBLE) * 10), 9)"
                         " AS INT)").alias("bin"),
                  "p", "y"))
    b = te.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("p").alias("sp"),
        F.sum("y").cast("bigint").alias("pos"))
    return ece_readout(b)


# --------------------------------------------------------------------------
# Q297 Ljung-Box portmanteau test on daily revenue: classical ACF r_k
# (global-mean-centered, lags 1..7) and the cumulative Q(k) statistic —
# the "is there ANY autocorrelation" test completing q176's per-lag
# Pearson ACF. Exactness: the scaled residual u_t = n·y_t − S is an
# exact integer and the n² factors cancel in r_k = Σu_t·u_{t+k} / Σu²,
# so numerator and denominator are exact integer sums. Q(k) terms carry
# the n(n+2) factor INSIDE the 6dp quantization so the bounded 7-row
# cumulative stays within r4. Everything beyond the one day-grain
# aggregation is calendar-bounded.
@query(
    "q297_ljung_box",
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
      SELECT day, COALESCE(cents, 0) AS cents
      FROM days LEFT JOIN rev USING (day)),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM series),
    u AS (
      SELECT day, n * cents - s AS u, n FROM series CROSS JOIN tot),
    den AS (
      SELECT SUM(CAST(u AS HUGEINT) * u) AS den, MAX(n) AS n FROM u),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
    pairs AS (
      SELECT l.lag, a.u AS ua, b.u AS ub
      FROM u a CROSS JOIN lags l
      JOIN u b ON b.day = a.day + CAST(l.lag AS INT)),
    num AS (
      SELECT lag, SUM(CAST(ua AS HUGEINT) * ub) AS num
      FROM pairs GROUP BY lag),
    acf AS (
      SELECT lag, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r, n
      FROM num CROSS JOIN den),
    terms AS (
      SELECT lag, n, r,
             ROUND(CAST(n * (n + 2.0) * r * r / (n - lag)
                        AS DECIMAL(18,6)), 6) AS term
      FROM acf)
    SELECT CAST(lag AS INT) AS lag, n,
           CAST(ROUND(CAST(r AS DECIMAL(18,6)), 4) AS DOUBLE) AS acf,
           CAST(ROUND(CAST(CAST(SUM(term) OVER (ORDER BY lag) AS DOUBLE)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS q_lb
    FROM terms ORDER BY lag
    """,
    doc="Classical mean-centered ACF (lags 1-7) of daily revenue and the "
        "cumulative Ljung-Box Q via exact scaled-residual integer sums; "
        "all post-aggregation frames are calendar- or lag-bounded.",
)
def q297(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.timeseries import calendar_dim

    ev = tables(spark, sf_dir)["events"]
    days = calendar_dim(ev).select("day")
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    series = days.join(rev, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0)).alias("cents"))
    tot = series.agg(F.count("*").cast("bigint").alias("n"),
                     F.sum("cents").cast("bigint").alias("s"))
    u = (series.join(F.broadcast(tot))
         .select("day", F.expr("n * cents - s").alias("u"), "n"))
    den = u.agg(F.expr("CAST(SUM(CAST(u AS DECIMAL(38,0)) * u)"
                       " AS DECIMAL(38,0))").alias("den"),
                F.max("n").alias("n"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    pairs = (u.crossJoin(F.broadcast(lags))
             .alias("a")
             .join(u.select(F.col("day").alias("bday"),
                            F.col("u").alias("ub")),
                   F.expr("bday = date_add(day, CAST(lag AS INT))"))
             .select("lag", F.col("u").alias("ua"), "ub"))
    num = pairs.groupBy("lag").agg(
        F.expr("CAST(SUM(CAST(ua AS DECIMAL(38,0)) * ub)"
               " AS DECIMAL(38,0))").alias("num"))
    acf = (num.join(F.broadcast(den))
           .select("lag", "n",
                   F.expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)")
                   .alias("r")))
    terms = acf.select(
        "lag", "n", "r",
        F.expr("ROUND(CAST(n * (n + 2.0) * r * r / (n - lag)"
               " AS DECIMAL(18,6)), 6)").alias("term"))
    wq = Window.orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)  # 7-row lag table
    return (terms.select(
        F.col("lag").cast("int").alias("lag"), "n",
        r4c(F.col("r")).alias("acf"),
        F.round(F.sum("term").over(wq).cast("double")
                .cast("decimal(18,6)"), 4).cast("double").alias("q_lb"))
        .orderBy("lag"))


# --------------------------------------------------------------------------
# Q298 Durbin-Watson autocorrelation test of the daily-revenue linear
# trend residuals: DW = Σ(e_t − e_{t−1})² / Σe_t² on the OLS fit of
# cents against the day index. Exactness: multiplying the residual by
# n·D (D = nΣt² − (Σt)², the OLS denominator) gives
# Ẽ_t = nD·y_t − DΣy + BΣt − nB·t, an exact integer in the four
# regression sums — and the scale cancels in DW, so both engines fold
# exact DECIMAL(38,0) squares. Everything after the day-grain
# aggregation is calendar-bounded.
@query(
    "q298_durbin_watson",
    oracle="""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             day, cents
      FROM rev),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(t * cents) AS BIGINT) AS sty
      FROM idx),
    e AS (
      SELECT day, t,
             n * (n * stt - st * st) * cents
               - (n * stt - st * st) * sy
               + (n * sty - st * sy) * st
               - n * (n * sty - st * sy) * t AS et
      FROM idx CROSS JOIN s),
    l AS (
      SELECT et, LAG(et) OVER (ORDER BY t) AS ep FROM e),
    f AS (
      SELECT CAST(SUM(CAST(et AS HUGEINT) * et) AS HUGEINT) AS see,
             CAST(SUM(CASE WHEN ep IS NULL THEN 0
                  ELSE CAST(et - ep AS HUGEINT) * (et - ep) END)
                  AS HUGEINT) AS sdd
      FROM l)
    SELECT (SELECT n FROM s) AS n,
           CAST(ROUND(CAST(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS dw,
           CAST(ROUND(CAST(1 - CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                / 2 AS DECIMAL(18,6)), 4) AS DOUBLE) AS rho_approx
    FROM f
    """,
    doc="Durbin-Watson test of daily-revenue trend residuals via exact "
        "integer scaled residuals (the OLS denominator cancels in DW); "
        "day-grain series, calendar-bounded frames.",
)
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    wd = Window.orderBy("day")  # day-grain aggregate, calendar-bounded
    idx = rev.select(F.row_number().over(wd).cast("bigint").alias("t"),
                     "day", "cents")
    s = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.expr("t * t")).cast("bigint").alias("stt"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.expr("t * cents")).cast("bigint").alias("sty"))
    e = (idx.join(F.broadcast(s))
         .select("day", "t", "n",
                 F.expr("n * (n * stt - st * st) * cents"
                        " - (n * stt - st * st) * sy"
                        " + (n * sty - st * sy) * st"
                        " - n * (n * sty - st * sy) * t").alias("et")))
    wt = Window.orderBy("t")  # same day-grain frame
    lagd = e.select("n", "et", F.lag("et").over(wt).alias("ep"))
    f = lagd.agg(
        F.max("n").alias("n"),
        F.expr("CAST(SUM(CAST(et AS DECIMAL(38,0)) * et) AS DECIMAL(38,0))")
        .alias("see"),
        F.expr("CAST(SUM(CASE WHEN ep IS NULL THEN 0"
               " ELSE CAST(et - ep AS DECIMAL(38,0)) * (et - ep) END)"
               " AS DECIMAL(38,0))").alias("sdd"))
    return f.select(
        "n",
        r4c(F.expr("CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)"))
        .alias("dw"),
        r4c(F.expr("1 - CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) / 2"))
        .alias("rho_approx"))


# --------------------------------------------------------------------------
# Q299 Wald-Wolfowitz runs test on daily revenue: are above/below-median
# days randomly ordered, or do they cluster (regimes/trends)? The
# 2x-median trick keeps the threshold integral (sign of 2·cents − m2,
# exact-median days drop), the run count is one lag comparison over the
# day-grain series, and the normal approximation folds three integers.
@query(
    "q299_runs_test",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    m AS (SELECT CAST(2 * MEDIAN(cents) AS BIGINT) AS m2 FROM rev),
    sgn AS (
      SELECT day, CASE WHEN 2 * cents > m2 THEN 1 ELSE -1 END AS s
      FROM rev CROSS JOIN m WHERE 2 * cents <> m2),
    l AS (
      SELECT s, LAG(s) OVER (ORDER BY day) AS sp FROM sgn),
    f AS (
      SELECT CAST(SUM(CASE WHEN sp IS NULL OR s <> sp THEN 1 ELSE 0 END)
                  AS BIGINT) AS runs,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM l)
    SELECT runs, n1, n2,
           {r4("2.0 * n1 * n2 / (n1 + n2) + 1")} AS mu,
           {r4("(runs - (2.0 * n1 * n2 / (n1 + n2) + 1))"
               " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
               "        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))")}
             AS z
    FROM f
    """,
    doc="Wald-Wolfowitz runs test of above/below-median daily revenue "
        "ordering: exact 2x-median signs, one lag pass over the "
        "day-grain series, closed-form normal approximation.",
)
def q299(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    m = rev.agg(F.expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)")
                .alias("m2"))
    sgn = (rev.join(F.broadcast(m))
           .filter("2 * cents <> m2")
           .select("day",
                   F.expr("CASE WHEN 2 * cents > m2 THEN 1 ELSE -1 END")
                   .alias("s")))
    wd = Window.orderBy("day")  # day-grain aggregate, calendar-bounded
    lagd = sgn.select("s", F.lag("s").over(wd).alias("sp"))
    f = lagd.agg(
        F.sum(F.expr("CASE WHEN sp IS NULL OR s <> sp THEN 1 ELSE 0 END"))
        .cast("bigint").alias("runs"),
        F.sum(F.expr("CASE WHEN s = 1 THEN 1 ELSE 0 END")).cast("bigint")
        .alias("n1"),
        F.sum(F.expr("CASE WHEN s = -1 THEN 1 ELSE 0 END")).cast("bigint")
        .alias("n2"))
    return f.select(
        "runs", "n1", "n2",
        r4c(F.expr("2.0 * n1 * n2 / (n1 + n2) + 1")).alias("mu"),
        r4c(F.expr(
            "(runs - (2.0 * n1 * n2 / (n1 + n2) + 1))"
            " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
            "        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))"))
        .alias("z"))


# --------------------------------------------------------------------------
# Q300 Grubbs' single-outlier test on daily revenue: G = max|y − ȳ|/s
# with the flagged day. The scaled deviation u = |n·y − S| is an exact
# integer, and G = max(u)/sqrt(n·(nΣy² − S²)/(n − 1)) folds exact
# integer sums in one double expression; the argmax day rides a
# deterministic (u DESC, day) LIMIT 1 — the TakeOrderedAndProject path,
# never a global window.
@query(
    "q300_grubbs",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS syy
      FROM rev),
    u AS (
      SELECT day, ABS(n * CAST(cents AS HUGEINT) - sy) AS u, n, sy, syy
      FROM rev CROSS JOIN s),
    top AS (
      SELECT day, CAST(u AS DOUBLE) AS umax, n, sy, syy
      FROM u ORDER BY u DESC, day LIMIT 1)
    SELECT day AS outlier_day, n,
           {r4("umax / sqrt(n * (n * CAST(syy AS DOUBLE)"
               " - CAST(sy AS DOUBLE) * sy) / (n - 1))")} AS g_stat
    FROM top
    """,
    doc="Grubbs' max-studentized-deviation outlier test on daily revenue "
        "from exact integer sums; deterministic argmax via ordered "
        "LIMIT 1.",
)
def q300(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    s = rev.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.expr("CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)"
               " AS DECIMAL(38,0))").alias("syy"))
    u = (rev.join(F.broadcast(s))
         .select("day",
                 F.expr("ABS(n * CAST(cents AS DECIMAL(38,0)) - sy)")
                 .alias("u"),
                 "n", "sy", "syy"))
    top = (u.orderBy(F.desc("u"), "day").limit(1)
           .select("day", F.col("u").cast("double").alias("umax"),
                   "n", "sy", "syy"))
    return top.select(
        F.col("day").alias("outlier_day"), "n",
        r4c(F.expr("umax / sqrt(n * (n * CAST(syy AS DOUBLE)"
                   " - CAST(sy AS DOUBLE) * sy) / (n - 1))"))
        .alias("g_stat"))


# --------------------------------------------------------------------------
# Q306 mutual information between order priority and status — the
# information-theoretic association measure on q281's contingency
# (Cramér's V answers "how strong", MI answers "how many nats are
# shared"), with both normalized variants (NMI by arithmetic-mean
# entropy, Theil's uncertainty coefficients U(row|col)/U(col|row) —
# the asymmetric "which attribute predicts which"). Cells are bounded
# by the category domains; per-cell MI terms fold from exact integer
# counts with 6dp quantization; marginal entropies fold domain-sized
# frames the same way.
@query(
    "q306_mutual_information",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS n
      FROM orders GROUP BY a, b),
    ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM c GROUP BY a),
    rb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS nb FROM c GROUP BY b),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
    mi AS (
      SELECT CAST(SUM(ROUND(CAST(
               (CAST(n AS DOUBLE) / nn)
               * ln(CAST(n AS DOUBLE) * nn
                    / (CAST(na AS DOUBLE) * nb))
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS mi
      FROM c JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN tot),
    ha AS (
      SELECT CAST(SUM(ROUND(CAST(
               -(CAST(na AS DOUBLE) / nn)
               * ln(CAST(na AS DOUBLE) / nn)
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS ha
      FROM ra CROSS JOIN tot),
    hb AS (
      SELECT CAST(SUM(ROUND(CAST(
               -(CAST(nb AS DOUBLE) / nn)
               * ln(CAST(nb AS DOUBLE) / nn)
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS hb
      FROM rb CROSS JOIN tot)
    SELECT (SELECT nn FROM tot) AS n,
           CAST(ROUND(CAST(mi AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS mi_nats,
           CAST(ROUND(CAST(2 * mi / (ha + hb) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS nmi,
           CAST(ROUND(CAST(mi / ha AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS u_a_given_b,
           CAST(ROUND(CAST(mi / hb AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS u_b_given_a
    FROM mi CROSS JOIN ha CROSS JOIN hb
    """,
    doc="Mutual information (nats) between priority and status with NMI "
        "and Theil's asymmetric uncertainty coefficients, from "
        "domain-bounded contingency cells and 6dp-quantized term sums.",
)
def q306(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (tables(spark, sf_dir)["orders"]
         .groupBy(F.col("o_orderpriority").alias("a"),
                  F.col("o_orderstatus").alias("b"))
         .agg(F.count("*").alias("n")))
    # r13 single-scan shape (see q281): the a-/b-marginals (na, nb) attach
    # to the cell frame as partitioned window sums instead of
    # equi-join-backs (whose implied isnotnull filters split ra/rb/mi/tot
    # into four orders scans), and the three entropy folds collapse into
    # ONE aggregate over the windowed frame: the mi term is guarded to
    # non-null (a, b) cells exactly as the joins guarded it, while the
    # ha/hb terms fold once per marginal group via row_number markers
    # (including a NULL-keyed group, exactly as the oracle's ra/rb
    # GROUP BYs include it).
    tot = c.agg(F.sum("n").cast("bigint").alias("nn"))
    cw = (c.select(
              "a", "b", "n",
              F.sum("n").over(Window.partitionBy("a"))
              .cast("bigint").alias("na"),
              F.sum("n").over(Window.partitionBy("b"))
              .cast("bigint").alias("nb"),
              F.row_number().over(
                  Window.partitionBy("a").orderBy("b")).alias("_ia"),
              F.row_number().over(
                  Window.partitionBy("b").orderBy("a")).alias("_ib"))
          .join(F.broadcast(tot)))
    folded = cw.agg(
        F.expr(
            "CAST(SUM(CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN "
            "ROUND(CAST("
            "(CAST(n AS DOUBLE) / nn)"
            " * ln(CAST(n AS DOUBLE) * nn"
            "      / (CAST(na AS DOUBLE) * nb))"
            " AS DECIMAL(18,6)), 6) END) AS DOUBLE)").alias("mi"),
        F.expr(
            "CAST(SUM(CASE WHEN _ia = 1 THEN ROUND(CAST("
            "-(CAST(na AS DOUBLE) / nn) * ln(CAST(na AS DOUBLE) / nn)"
            " AS DECIMAL(18,6)), 6) END) AS DOUBLE)").alias("ha"),
        F.expr(
            "CAST(SUM(CASE WHEN _ib = 1 THEN ROUND(CAST("
            "-(CAST(nb AS DOUBLE) / nn) * ln(CAST(nb AS DOUBLE) / nn)"
            " AS DECIMAL(18,6)), 6) END) AS DOUBLE)").alias("hb"),
        F.max("nn").alias("nn"))
    return (folded
            .select(F.col("nn").alias("n"),
                    r4c(F.col("mi")).alias("mi_nats"),
                    r4c(F.expr("2 * mi / (ha + hb)")).alias("nmi"),
                    r4c(F.expr("mi / ha")).alias("u_a_given_b"),
                    r4c(F.expr("mi / hb")).alias("u_b_given_a")))


# --------------------------------------------------------------------------
# Q307 bigram conditional entropy (entropy rate) per source: H(w2|w1) =
# −Σ p(w1,w2)·ln p(w2|w1) over each source's own bigram distribution —
# the intrinsic sequence-predictability number next to q302's held-out
# KN cross-entropy (their gap IS the model's estimation loss) and
# q262's unigram token entropy. One bigram aggregation per source, one
# history-marginal join, exact integer count ratios, 6dp-quantized
# terms.
@query(
    "q307_entropy_rate",
    oracle="""
    WITH d AS (
      SELECT source,
             list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM documents),
    bg AS (
      SELECT source, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT source, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM d WHERE len(w) >= 2)),
    c AS (SELECT source, w1, w2, COUNT(*) AS c12
          FROM bg GROUP BY source, w1, w2),
    h AS (SELECT source, w1, CAST(SUM(c12) AS BIGINT) AS c1
          FROM c GROUP BY source, w1),
    tot AS (SELECT source, CAST(SUM(c12) AS BIGINT) AS nb
            FROM c GROUP BY source),
    terms AS (
      SELECT c.source,
             ROUND(CAST(
               -(CAST(c12 AS DOUBLE) / nb)
               * ln(CAST(c12 AS DOUBLE) / c1)
               AS DECIMAL(18,6)), 6) AS term
      FROM c JOIN h ON h.source = c.source AND h.w1 = c.w1
      JOIN tot ON tot.source = c.source)
    SELECT source,
           CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS h_rate_nats
    FROM terms GROUP BY source ORDER BY source
    """,
    doc="Per-source bigram conditional entropy H(w2|w1) in nats — the "
        "intrinsic sequence predictability whose gap to q302's held-out "
        "cross-entropy is the LM estimation loss.",
)
def q307(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    d = docs.select(
        "source",
        F.expr("filter(split(text, ' '), w -> w <> '')").alias("w"))
    bg = (d.filter("size(w) >= 2")
          .select("source",
                  F.explode(F.expr(
                      "transform(sequence(1, size(w) - 1),"
                      " i -> struct(element_at(w, i) AS w1,"
                      "             element_at(w, i + 1) AS w2))"))
                  .alias("p"))
          .select("source", "p.w1", "p.w2"))
    c = bg.groupBy("source", "w1", "w2").agg(F.count("*").alias("c12"))
    h = c.groupBy("source", "w1").agg(
        F.sum("c12").cast("bigint").alias("c1"))
    tot = c.groupBy("source").agg(F.sum("c12").cast("bigint").alias("nb"))
    terms = (c.join(h, ["source", "w1"])
             .join(F.broadcast(tot), "source")
             .select("source", F.expr(
                 "ROUND(CAST("
                 "-(CAST(c12 AS DOUBLE) / nb)"
                 " * ln(CAST(c12 AS DOUBLE) / c1)"
                 " AS DECIMAL(18,6)), 6)").alias("term")))
    return (terms.groupBy("source")
            .agg(F.expr("CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE)"
                        " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                 .alias("h_rate_nats"))
            .orderBy("source"))


# --------------------------------------------------------------------------
# Q308 pairwise Hellinger distance between source unigram distributions
# — the bounded, metric (triangle-inequality) companion to q283's JSD
# and q134's KL. The Bhattacharyya coefficient BC = Σ√(p·q) needs ONLY
# shared tokens (single-side terms are exactly 0), so the pair frame is
# one token-key equi-join between per-source count tables — never a
# vocab outer join; √(p·q) terms fold from exact integer count ratios
# with 6dp quantization, and H = √(1 − BC) clamps at 0 in shared
# expression text.
@query(
    "q308_hellinger",
    oracle="""
    WITH toks AS (
      SELECT source AS g, unnest(list_filter(string_split(text, ' '),
                                             w -> w <> '')) AS tok
      FROM documents),
    gt AS (SELECT g, tok, COUNT(*) AS c FROM toks GROUP BY g, tok),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM gt GROUP BY g),
    terms AS (
      SELECT a.g AS ga, b.g AS gb,
             ROUND(CAST(sqrt((CAST(a.c AS DOUBLE) / na.n)
                             * (CAST(b.c AS DOUBLE) / nb.n))
                        AS DECIMAL(18,6)), 6) AS term
      FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
      JOIN tot na ON na.g = a.g JOIN tot nb ON nb.g = b.g),
    agg AS (
      SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n_shared,
             CAST(SUM(term) AS DOUBLE) AS bc
      FROM terms GROUP BY ga, gb)
    SELECT ga AS source_a, gb AS source_b, n_shared,
           CAST(ROUND(CAST(bc AS DECIMAL(18,6)), 4) AS DOUBLE) AS bc,
           CAST(ROUND(CAST(sqrt(GREATEST(1 - bc, 0))
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS hellinger
    FROM agg ORDER BY source_a, source_b
    """,
    doc="Pairwise Hellinger distance between source unigram "
        "distributions via the shared-token Bhattacharyya coefficient "
        "(single-side terms are exactly zero; never a vocab outer "
        "join).",
)
def q308(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    toks = docs.select(
        F.col("source").alias("g"),
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .alias("tok"))
    gt = toks.groupBy("g", "tok").agg(F.count("*").alias("c"))
    tot = gt.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    b = gt.select(F.col("g").alias("gb"), F.col("tok").alias("tok"),
                  F.col("c").alias("cb"))
    terms = (gt.join(b, (gt["tok"] == b["tok"]) & (gt["g"] < b["gb"]))
             .drop(b["tok"])
             .join(F.broadcast(tot.select(F.col("g").alias("ga2"),
                                          F.col("n").alias("na"))),
                   F.col("g") == F.col("ga2"))
             .join(F.broadcast(tot.select(F.col("g").alias("gb2"),
                                          F.col("n").alias("nb"))),
                   F.col("gb") == F.col("gb2"))
             .select(F.col("g").alias("ga"), "gb", F.expr(
                 "ROUND(CAST(sqrt((CAST(c AS DOUBLE) / na)"
                 " * (CAST(cb AS DOUBLE) / nb)) AS DECIMAL(18,6)), 6)")
                 .alias("term")))
    agg = terms.groupBy("ga", "gb").agg(
        F.count("*").cast("bigint").alias("n_shared"),
        F.sum("term").cast("double").alias("bc"))
    return agg.select(
        F.col("ga").alias("source_a"), F.col("gb").alias("source_b"),
        "n_shared",
        r4c(F.col("bc")).alias("bc"),
        r4c(F.expr("sqrt(GREATEST(1 - bc, 0))")).alias("hellinger"),
    ).orderBy("source_a", "source_b")


# --------------------------------------------------------------------------
# Q309 vocabulary-overlap (Jaccard) matrix between sources: |Va ∩ Vb| /
# |Va ∪ Vb| in exact integer ppm over distinct-token sets — the
# set-level companion to q308/q283's distribution distances (two
# sources can share every token yet differ in distribution, and vice
# versa) and the same diagnostic q189 estimates with KMV sketches. One
# distinct pass, one token equi-join of distinct-token tables, marginal
# vocab sizes broadcast; union folds by inclusion-exclusion.
@query(
    "q309_vocab_jaccard",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source AS g, unnest(list_filter(
        string_split(text, ' '), w -> w <> '')) AS tok
      FROM documents),
    vs AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nv FROM v GROUP BY g),
    inter AS (
      SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS ni
      FROM v a JOIN v b ON a.tok = b.tok AND a.g < b.g
      GROUP BY ga, gb)
    SELECT ga AS source_a, gb AS source_b, ni AS n_inter,
           va.nv + vb.nv - ni AS n_union,
           CAST(ni * 1000000 // (va.nv + vb.nv - ni) AS BIGINT)
             AS jaccard_ppm,
           CAST(ni * 1000000 // LEAST(va.nv, vb.nv) AS BIGINT)
             AS overlap_coef_ppm
    FROM inter
    JOIN vs va ON va.g = ga JOIN vs vb ON vb.g = gb
    ORDER BY source_a, source_b
    """,
    doc="Pairwise vocabulary Jaccard and overlap coefficient between "
        "sources in exact integer ppm (the exact form of q189's KMV "
        "estimate).",
)
def q309(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    v = (docs.select(
        F.col("source").alias("g"),
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .alias("tok")).distinct())
    vs = v.groupBy("g").agg(F.count("*").cast("bigint").alias("nv"))
    b = v.select(F.col("g").alias("gb"), F.col("tok").alias("tok2"))
    inter = (v.join(b, (v["tok"] == b["tok2"]) & (v["g"] < b["gb"]))
             .groupBy(F.col("g").alias("ga"), "gb")
             .agg(F.count("*").cast("bigint").alias("ni")))
    return (inter
            .join(F.broadcast(vs.select(F.col("g").alias("ga"),
                                        F.col("nv").alias("nva"))), "ga")
            .join(F.broadcast(vs.select(F.col("g").alias("gb"),
                                        F.col("nv").alias("nvb"))), "gb")
            .select(F.col("ga").alias("source_a"),
                    F.col("gb").alias("source_b"),
                    F.col("ni").alias("n_inter"),
                    F.expr("nva + nvb - ni").alias("n_union"),
                    F.expr("ni * 1000000 DIV (nva + nvb - ni)")
                    .alias("jaccard_ppm"),
                    F.expr("ni * 1000000 DIV LEAST(nva, nvb)")
                    .alias("overlap_coef_ppm"))
            .orderBy("source_a", "source_b"))


# --------------------------------------------------------------------------
# Q310 permutation entropy of daily revenue (order 3): the complexity
# of the series' ordinal dynamics — Bandt-Pompe patterns over
# (y_t, y_{t+1}, y_{t+2}) triples, classified by the three pairwise
# strict comparisons (deterministic under ties in both engines),
# entropy over the bounded pattern alphabet normalized by ln(6). The
# pattern table is one lag pass over the day-grain series; everything
# downstream is alphabet-sized.
@query(
    "q310_permutation_entropy",
    oracle="""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    l AS (
      SELECT cents AS a,
             LEAD(cents, 1) OVER (ORDER BY day) AS b,
             LEAD(cents, 2) OVER (ORDER BY day) AS c
      FROM rev),
    pat AS (
      SELECT (CASE WHEN a < b THEN 4 ELSE 0 END
              + CASE WHEN b < c THEN 2 ELSE 0 END
              + CASE WHEN a < c THEN 1 ELSE 0 END) AS p
      FROM l WHERE b IS NOT NULL AND c IS NOT NULL),
    pc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS np
           FROM pat GROUP BY p),
    tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n FROM pc),
    h AS (
      SELECT CAST(SUM(ROUND(CAST(
               -(CAST(np AS DOUBLE) / n) * ln(CAST(np AS DOUBLE) / n)
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_patterns,
             MAX(n) AS n
      FROM pc CROSS JOIN tot)
    SELECT n, n_patterns,
           CAST(ROUND(CAST(h AS DECIMAL(18,6)), 4) AS DOUBLE) AS pe_nats,
           CAST(ROUND(CAST(h / ln(6.0) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS pe_norm
    FROM h
    """,
    doc="Bandt-Pompe permutation entropy (order 3) of daily revenue: "
        "ordinal-pattern counts from one lag pass over the day-grain "
        "series, entropy over the bounded pattern alphabet, normalized "
        "by ln(6).",
)
def q310(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    wd = Window.orderBy("day")  # day-grain aggregate, calendar-bounded
    l = rev.select(F.col("cents").alias("a"),
                   F.lead("cents", 1).over(wd).alias("b"),
                   F.lead("cents", 2).over(wd).alias("c"))
    pat = (l.filter("b IS NOT NULL AND c IS NOT NULL")
           .select(F.expr(
               "(CASE WHEN a < b THEN 4 ELSE 0 END"
               " + CASE WHEN b < c THEN 2 ELSE 0 END"
               " + CASE WHEN a < c THEN 1 ELSE 0 END)").alias("p")))
    pc = pat.groupBy("p").agg(F.count("*").cast("bigint").alias("np"))
    tot = pc.agg(F.sum("np").cast("bigint").alias("n"))
    h = (pc.join(F.broadcast(tot))
         .agg(F.expr(
             "CAST(SUM(ROUND(CAST("
             "-(CAST(np AS DOUBLE) / n) * ln(CAST(np AS DOUBLE) / n)"
             " AS DECIMAL(18,6)), 6)) AS DOUBLE)").alias("h"),
             F.count("*").cast("bigint").alias("n_patterns"),
             F.max("n").alias("n")))
    return h.select(
        "n", "n_patterns",
        r4c(F.col("h")).alias("pe_nats"),
        r4c(F.expr("h / ln(6.0)")).alias("pe_norm"))


# --------------------------------------------------------------------------
# Q311 Mann-Kendall trend test on daily revenue — the nonparametric
# trend detector whose slope companion is q244's Theil-Sen: S counts
# concordant-minus-discordant day pairs, the variance carries the
# tie correction, and the z uses the standard continuity correction.
# The pair frame is the same calendar-bounded day-grain self-join as
# q244 (|days|² pairs — bounded by the calendar, never by row count;
# pinned in the crossjoin-lint inventory).
@query(
    "q311_mann_kendall",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM rev a JOIN rev b ON b.day > a.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rev),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tt
      FROM (SELECT COUNT(*) AS t FROM rev GROUP BY cents)
      WHERE t > 1),
    v AS (
      SELECT s_stat, n,
             (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tt) / 18
               AS var_s
      FROM s CROSS JOIN n CROSS JOIN ties)
    SELECT n, s_stat,
           {r4("CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)"
               "     WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)"
               "     ELSE CAST(0 AS DOUBLE) END")} AS z
    FROM v
    """,
    doc="Mann-Kendall trend test of daily revenue: pair-sign S over the "
        "calendar-bounded day self-join, tie-corrected variance, "
        "continuity-corrected z.",
)
def q311(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    b = rev.select(F.col("day").alias("bday"), F.col("cents").alias("bc"))
    s = (rev.join(b, F.expr("bday > day"))
         .agg(F.sum(F.expr("CASE WHEN bc > cents THEN 1"
                           " WHEN bc < cents THEN -1 ELSE 0 END"))
              .cast("bigint").alias("s_stat")))
    n = rev.agg(F.count("*").cast("bigint").alias("n"))
    ties = (rev.groupBy("cents").agg(F.count("*").alias("t"))
            .filter("t > 1")
            .agg(F.expr("CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)),"
                        " 0) AS BIGINT)").alias("tt")))
    v = (s.join(F.broadcast(n)).join(F.broadcast(ties))
         .select("s_stat", "n",
                 F.expr("(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
                        " - tt) / 18").alias("var_s")))
    return v.select(
        "n", "s_stat",
        r4c(F.expr("CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)"
                   " WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)"
                   " ELSE CAST(0 AS DOUBLE) END")).alias("z"))


# --------------------------------------------------------------------------
# Q312 Cochran-Armitage trend test: does the fulfilled-rate trend
# monotonically across the ORDERED priority codes (1-URGENT .. 5-LOW)?
# The ordered-alternative sharpening of q166's chi-square (which is
# blind to order): scores are the integer priority codes, T = Σx(r −
# n·p̄) folds from exact per-group integers in one conditional
# aggregation pass.
@query(
    "q312_cochran_armitage",
    oracle=f"""
    WITH b AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    g AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS r
      FROM b GROUP BY x),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(r) AS BIGINT) AS rr,
             CAST(SUM(x * n) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS BIGINT) * x * n) AS BIGINT) AS sxx,
             CAST(SUM(x * r) AS BIGINT) AS sxr
      FROM g)
    SELECT nn AS n, rr AS n_pos,
           {r4("(sxr - CAST(rr AS DOUBLE) / nn * sx)"
               " / sqrt((CAST(rr AS DOUBLE) / nn)"
               "        * (1 - CAST(rr AS DOUBLE) / nn)"
               "        * (sxx - CAST(sx AS DOUBLE) * sx / nn))")} AS z
    FROM t
    """,
    doc="Cochran-Armitage trend test of fulfilled rate across ordered "
        "priority codes from exact integer per-group sufficient "
        "statistics.",
)
def q312(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CAST(substr(o_orderpriority, 1, 1) AS INT)").alias("x"),
        F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")
        .alias("y"))
    g = b.groupBy("x").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("r"))
    t = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("r").cast("bigint").alias("rr"),
        F.sum(F.expr("x * n")).cast("bigint").alias("sx"),
        F.sum(F.expr("CAST(x AS BIGINT) * x * n")).cast("bigint")
        .alias("sxx"),
        F.sum(F.expr("x * r")).cast("bigint").alias("sxr"))
    return t.select(
        F.col("nn").alias("n"), F.col("rr").alias("n_pos"),
        r4c(F.expr("(sxr - CAST(rr AS DOUBLE) / nn * sx)"
                   " / sqrt((CAST(rr AS DOUBLE) / nn)"
                   "        * (1 - CAST(rr AS DOUBLE) / nn)"
                   "        * (sxx - CAST(sx AS DOUBLE) * sx / nn))"))
        .alias("z"))


# --------------------------------------------------------------------------
# Q313 Page's trend test for ordered alternatives: does revenue rank
# INCREASE monotonically from 1-URGENT to 5-LOW within month blocks?
# The ordered sharpening of q277's Friedman (same complete-block
# within-block rank2 machinery — k-row partitioned windows, never
# row-scale): L = Σ_j score_j·R_j with scores = the priority codes,
# z from the exact closed-form moments. The 2x-rank convention keeps
# L2 = 2L an exact integer through the fold.
@query(
    "q313_page_trend",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS blk,
             CAST(substr(o_orderpriority, 1, 1) AS INT) AS trt,
             SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS v
      FROM orders GROUP BY 1, 2),
    k AS (SELECT COUNT(DISTINCT trt) AS k FROM cell),
    full_blk AS (
      SELECT blk FROM cell CROSS JOIN k
      GROUP BY blk, k.k HAVING COUNT(*) = ANY_VALUE(k.k)),
    r AS (
      SELECT c.trt,
             2 * RANK() OVER (PARTITION BY c.blk ORDER BY c.v)
               + COUNT(*) OVER (PARTITION BY c.blk, c.v) - 1 AS rank2
      FROM cell c JOIN full_blk USING (blk)),
    g AS (
      SELECT trt, SUM(CAST(rank2 AS HUGEINT)) AS r2j, COUNT(*) AS n
      FROM r GROUP BY trt),
    s AS (
      SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(trt * r2j) AS BIGINT) AS l2
      FROM g)
    SELECT n, k,
           {r4("l2 / 2.0")} AS l_stat,
           {r4("(l2 / 2.0 - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1)"
               " / 4) / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1)"
               " * (k * k - 1) / 144)")} AS z
    FROM s
    """,
    doc="Page's L trend test of revenue rank across ordered priority "
        "codes within month blocks — q277's rank machinery with ordered "
        "scores and closed-form moments.",
)
def q313(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = (tables(spark, sf_dir)["orders"]
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("blk"),
                     F.expr("CAST(substr(o_orderpriority, 1, 1) AS INT)")
                     .alias("trt"))
            .agg(F.sum(F.expr(
                "CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0))"))
                .alias("v")))
    k = cell.agg(F.countDistinct("trt").alias("k"))
    full_blk = (cell.join(F.broadcast(k))
                .groupBy("blk", "k").agg(F.count("*").alias("ct"))
                .filter("ct = k").select("blk"))
    w_rank = Window.partitionBy("blk").orderBy("v")
    w_tie = Window.partitionBy("blk", "v")
    r = (cell.join(full_blk, "blk")
         .withColumn("rank2",
                     F.lit(2) * F.rank().over(w_rank)
                     + F.count("*").over(w_tie) - 1))
    g = r.groupBy("trt").agg(
        F.sum(F.col("rank2").cast("decimal(38,0)")).alias("r2j"),
        F.count("*").alias("n"))
    s = g.agg(
        F.first("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.expr("trt * r2j")).cast("bigint").alias("l2"))
    return s.select(
        "n", "k",
        r4c(F.expr("l2 / 2.0")).alias("l_stat"),
        r4c(F.expr("(l2 / 2.0 - CAST(n AS DOUBLE) * k * (k + 1)"
                   " * (k + 1) / 4)"
                   " / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1)"
                   " * (k * k - 1) / 144)")).alias("z"))


# --------------------------------------------------------------------------
# Q314 rank-biased overlap between the first-half and second-half
# event-type popularity rankings: how stable is the leaderboard across
# the two halves of the month, weighted toward the top (p = 0.9)? The
# truncated RBO = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d over the
# event-type domain (k = |domain|, so the last agreement term is 1 by
# construction). Both rankings ride ROW_NUMBER over the DOMAIN-sized
# count table (ties broken by type name); depths come from a generated
# grid; p^{d−1} terms fold with 6dp quantization.
@query(
    "q314_rbo",
    oracle="""
    WITH c AS (
      SELECT event_type,
             SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS s1,
             SUM(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS s2
      FROM events GROUP BY event_type),
    r AS (
      SELECT event_type,
             ROW_NUMBER() OVER (ORDER BY s1 DESC, event_type) AS ra,
             ROW_NUMBER() OVER (ORDER BY s2 DESC, event_type) AS rb
      FROM c),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM r),
    depths AS (SELECT unnest(generate_series(1, (SELECT k FROM k)))
                 AS d),
    x AS (
      SELECT d, CAST(SUM(CASE WHEN ra <= d AND rb <= d THEN 1 ELSE 0
                        END) AS BIGINT) AS xd
      FROM r CROSS JOIN depths GROUP BY d),
    terms AS (
      SELECT ROUND(CAST(POWER(0.9, d - 1) * xd / d
                        AS DECIMAL(18,6)), 6) AS term
      FROM x)
    SELECT (SELECT k FROM k) AS k,
           CAST(ROUND(CAST(0.1 * CAST(SUM(term) AS DOUBLE)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS rbo_trunc
    FROM terms
    """,
    doc="Truncated rank-biased overlap (p=0.9) between first-half and "
        "second-half event-type popularity rankings over the bounded "
        "type domain.",
)
def q314(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("event_type").agg(
        F.sum(F.expr("CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END"))
        .alias("s1"),
        F.sum(F.expr("CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END"))
        .alias("s2"))
    wa = Window.orderBy(F.desc("s1"), "event_type")  # |type domain| rows
    wb = Window.orderBy(F.desc("s2"), "event_type")  # |type domain| rows
    r = c.select("event_type",
                 F.row_number().over(wa).alias("ra"),
                 F.row_number().over(wb).alias("rb"))
    k = r.agg(F.count("*").cast("bigint").alias("k"))
    depths = (k.select(F.explode(F.expr("sequence(1, k)")).alias("d")))
    x = (r.crossJoin(F.broadcast(depths))
         .groupBy("d")
         .agg(F.sum(F.expr("CASE WHEN ra <= d AND rb <= d THEN 1"
                           " ELSE 0 END")).cast("bigint").alias("xd")))
    terms = x.select(F.expr(
        "ROUND(CAST(POWER(0.9, d - 1) * xd / d AS DECIMAL(18,6)), 6)")
        .alias("term"))
    return (terms.join(F.broadcast(k))
            .groupBy("k")
            .agg(F.expr("CAST(ROUND(CAST(0.1 * CAST(SUM(term) AS DOUBLE)"
                        " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                 .alias("rbo_trunc")))


# --------------------------------------------------------------------------
# Q315 Markov transition entropy of per-user event streams: the
# transition matrix a→b over consecutive events (ordered by ts with
# event_id tiebreak, windows partitioned by user) and its entropy rate
# H(next|cur) = −Σ p(a,b)·ln p(b|a) — the event-sequence analogue of
# q307's token entropy rate: how predictable is user behavior one step
# ahead? Transition cells are domain-bounded (|types|²); terms fold
# with 6dp quantization; the per-type marginal joins the cell table on
# its grouping key.
@query(
    "q315_markov_entropy",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    c AS (
      SELECT event_type AS a, nxt AS b, COUNT(*) AS n
      FROM e WHERE nxt IS NOT NULL GROUP BY a, b),
    m AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM c GROUP BY a),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
    terms AS (
      SELECT ROUND(CAST(
               -(CAST(n AS DOUBLE) / nn) * ln(CAST(n AS DOUBLE) / na)
               AS DECIMAL(18,6)), 6) AS term
      FROM c JOIN m USING (a) CROSS JOIN tot)
    SELECT (SELECT nn FROM tot) AS n_transitions,
           CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS h_rate_nats,
           CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE) / ln(5.0)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS h_rate_norm
    FROM terms
    """,
    doc="Markov transition entropy rate of per-user event sequences "
        "(domain-bounded transition matrix, per-user ordered windows, "
        "6dp-quantized terms), normalized by ln(|types|).",
)
def q315(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select("event_type",
                  F.lead("event_type").over(wu).alias("nxt"))
    c = (e.filter("nxt IS NOT NULL")
         .groupBy(F.col("event_type").alias("a"),
                  F.col("nxt").alias("b"))
         .agg(F.count("*").alias("n")))
    m = c.groupBy("a").agg(F.sum("n").cast("bigint").alias("na"))
    tot = c.agg(F.sum("n").cast("bigint").alias("nn"))
    terms = (c.join(F.broadcast(m), "a")
             .join(F.broadcast(tot))
             .select(F.expr(
                 "ROUND(CAST("
                 "-(CAST(n AS DOUBLE) / nn) * ln(CAST(n AS DOUBLE) / na)"
                 " AS DECIMAL(18,6)), 6)").alias("term")))
    return (terms.join(F.broadcast(tot))
            .groupBy("nn")
            .agg(F.expr("CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE)"
                        " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                 .alias("h_rate_nats"),
                 F.expr("CAST(ROUND(CAST(CAST(SUM(term) AS DOUBLE)"
                        " / ln(5.0) AS DECIMAL(18,6)), 4) AS DOUBLE)")
                 .alias("h_rate_norm"))
            .select(F.col("nn").alias("n_transitions"),
                    "h_rate_nats", "h_rate_norm"))


# --------------------------------------------------------------------------
# Q322 Cochran-Mantel-Haenszel test: does the urgent/high-priority →
# fulfilled association hold AFTER controlling for day-of-week strata?
# The stratified 2×2 companion to q312's ordered trend and q317's
# stratified Mann-Kendall — Simpson's-paradox insurance for the q293
# rater pair. Per-stratum cells fold from ONE conditional aggregation;
# the continuity-corrected CMH chi-square and the Mantel-Haenszel
# pooled odds ratio combine 7 exact stratum rows.
@query(
    "q322_cmh_test",
    oracle=f"""
    WITH b AS (
      SELECT isodow(o_orderdate) AS k,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS t,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    s AS (
      SELECT k,
             CAST(SUM(t * y) AS BIGINT) AS a,
             CAST(SUM(t * (1 - y)) AS BIGINT) AS b,
             CAST(SUM((1 - t) * y) AS BIGINT) AS c,
             CAST(SUM((1 - t) * (1 - y)) AS BIGINT) AS d
      FROM b GROUP BY k),
    f AS (
      SELECT CAST(SUM(a) AS BIGINT) AS sa,
             SUM(CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d))
               AS se,
             SUM(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                 / ((CAST(a + b + c + d AS DOUBLE))
                    * (a + b + c + d) * (a + b + c + d - 1))) AS sv,
             SUM(CAST(a AS DOUBLE) * d / (a + b + c + d)) AS snum,
             SUM(CAST(b AS DOUBLE) * c / (a + b + c + d)) AS sden,
             CAST(COUNT(*) AS BIGINT) AS n_strata
      FROM s)
    SELECT n_strata, sa AS sum_a,
           {r4("(abs(sa - se) - CAST(0.5 AS DOUBLE))"
               " * (abs(sa - se) - CAST(0.5 AS DOUBLE)) / sv")}
             AS cmh_chi2,
           {r4("snum / sden")} AS mh_odds_ratio
    FROM f
    """,
    doc="Cochran-Mantel-Haenszel test of the priority→fulfilled "
        "association controlling for day-of-week strata, with the "
        "Mantel-Haenszel pooled odds ratio.",
)
def q322(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.expr("((dayofweek(o_orderdate) + 5) % 7) + 1").alias("k"),
        F.expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
               " THEN 1 ELSE 0 END").alias("t"),
        F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")
        .alias("y"))
    s = b.groupBy("k").agg(
        F.sum(F.expr("t * y")).cast("bigint").alias("a"),
        F.sum(F.expr("t * (1 - y)")).cast("bigint").alias("b"),
        F.sum(F.expr("(1 - t) * y")).cast("bigint").alias("c"),
        F.sum(F.expr("(1 - t) * (1 - y)")).cast("bigint").alias("d"))
    f = s.agg(
        F.sum("a").cast("bigint").alias("sa"),
        F.sum(F.expr("CAST(a + b AS DOUBLE) * (a + c) / (a + b + c + d)"))
        .alias("se"),
        F.sum(F.expr(
            "CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)"
            " / ((CAST(a + b + c + d AS DOUBLE))"
            "    * (a + b + c + d) * (a + b + c + d - 1))")).alias("sv"),
        F.sum(F.expr("CAST(a AS DOUBLE) * d / (a + b + c + d)"))
        .alias("snum"),
        F.sum(F.expr("CAST(b AS DOUBLE) * c / (a + b + c + d)"))
        .alias("sden"),
        F.count("*").cast("bigint").alias("n_strata"))
    return f.select(
        "n_strata", F.col("sa").alias("sum_a"),
        r4c(F.expr("(abs(sa - se) - CAST(0.5 AS DOUBLE))"
                   " * (abs(sa - se) - CAST(0.5 AS DOUBLE)) / sv"))
        .alias("cmh_chi2"),
        r4c(F.expr("snum / sden")).alias("mh_odds_ratio"))


# --------------------------------------------------------------------------
# Q323 decision-stump split finder: the best hour-of-day threshold for
# predicting "purchase", by weighted Gini impurity — the one-node
# decision tree that seeds feature-importance screens (and the
# threshold q196's fixed-width bins can't pick). The hour table is one
# conditional aggregation (24 rows); candidate splits are cumulative
# sums over that bounded frame; the argmin is a deterministic ordered
# LIMIT 1. Per-split Gini folds exact integer counts in one shared
# double expression.
@query(
    "q323_decision_stump",
    oracle=f"""
    WITH h AS (
      SELECT CAST(hour(ts) AS INT) AS hr, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS pos
      FROM events GROUP BY hr),
    c AS (
      SELECT hr,
             CAST(SUM(n) OVER (ORDER BY hr) AS BIGINT) AS nl,
             CAST(SUM(pos) OVER (ORDER BY hr) AS BIGINT) AS pl,
             CAST(SUM(n) OVER () AS BIGINT) AS nt,
             CAST(SUM(pos) OVER () AS BIGINT) AS pt
      FROM h),
    g AS (
      SELECT hr, nl, pl, nt, pt,
             (CAST(nl AS DOUBLE) / nt)
               * (CAST(2 AS DOUBLE) * pl / nl
                  * (1 - CAST(pl AS DOUBLE) / nl))
             + (CAST(nt - nl AS DOUBLE) / nt)
               * (CAST(2 AS DOUBLE) * (pt - pl) / (nt - nl)
                  * (1 - CAST(pt - pl AS DOUBLE) / (nt - nl)))
               AS gini_after,
             CAST(2 AS DOUBLE) * pt / nt
               * (1 - CAST(pt AS DOUBLE) / nt) AS gini_before
      FROM c WHERE nl < nt),
    best AS (
      SELECT * FROM g ORDER BY gini_after, hr LIMIT 1)
    SELECT hr AS split_hour_le, nl AS n_left,
           {r4("gini_before")} AS gini_before,
           {r4("gini_after")} AS gini_after,
           {r4("gini_before - gini_after")} AS gain
    FROM best
    """,
    doc="Best hour-of-day decision-stump split for predicting purchase "
        "events by weighted Gini impurity over the bounded hour table; "
        "deterministic argmin via ordered LIMIT 1.",
)
def q323(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    h = (ev.groupBy(F.expr("CAST(hour(ts) AS INT)").alias("hr"))
         .agg(F.count("*").alias("n"),
              F.sum(F.expr("CASE WHEN event_type = 'purchase'"
                           " THEN 1 ELSE 0 END")).cast("bigint")
              .alias("pos")))
    wcum = (Window.orderBy("hr")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    c = h.select(
        "hr",
        F.sum("n").over(wcum).cast("bigint").alias("nl"),
        F.sum("pos").over(wcum).cast("bigint").alias("pl"),
        F.sum("n").over(wall).cast("bigint").alias("nt"),
        F.sum("pos").over(wall).cast("bigint").alias("pt"))
    g = (c.filter("nl < nt")
         .select("hr", "nl", "nt", "pl", "pt",
                 F.expr(
                     "(CAST(nl AS DOUBLE) / nt)"
                     " * (CAST(2 AS DOUBLE) * pl / nl"
                     "    * (1 - CAST(pl AS DOUBLE) / nl))"
                     " + (CAST(nt - nl AS DOUBLE) / nt)"
                     " * (CAST(2 AS DOUBLE) * (pt - pl) / (nt - nl)"
                     "    * (1 - CAST(pt - pl AS DOUBLE) / (nt - nl)))")
                 .alias("gini_after"),
                 F.expr("CAST(2 AS DOUBLE) * pt / nt"
                        " * (1 - CAST(pt AS DOUBLE) / nt)")
                 .alias("gini_before")))
    return (g.orderBy("gini_after", "hr").limit(1)
            .select(F.col("hr").alias("split_hour_le"),
                    F.col("nl").alias("n_left"),
                    r4c(F.col("gini_before")).alias("gini_before"),
                    r4c(F.col("gini_after")).alias("gini_after"),
                    r4c(F.expr("gini_before - gini_after")).alias("gain")))


# --------------------------------------------------------------------------
# Q324 linear calibration fit of the q294 predictor: regress the
# held-out binary outcome on the predicted probability — slope 1 /
# intercept 0 is perfect calibration, slope < 1 is overconfidence —
# the scalar-fit companion to q196's reliability bins and q295's ECE.
# Exactness: predictions are 6dp DECIMALS, so Σp, Σp² and Σp·y are
# EXACT decimal sums (y is 0/1) and the closed-form OLS touches
# doubles only in the final fold.
@query(
    "q324_calibration_fit",
    oracle=f"""
    WITH tr AS (
      SELECT CAST(hour(ts) AS INT) AS hr,
             ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1.0 ELSE 0 END) / COUNT(*)
                        AS DECIMAL(18,6)), 6) AS p
      FROM events WHERE day(ts) <= 15 GROUP BY hr),
    te AS (
      SELECT p, CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END
               AS y
      FROM events e JOIN tr ON tr.hr = CAST(hour(e.ts) AS INT)
      WHERE day(e.ts) > 15),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p) AS DOUBLE) AS sp,
             CAST(SUM(p * p) AS DOUBLE) AS spp,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(p * y) AS DOUBLE) AS spy
      FROM te)
    SELECT n, sy AS n_pos,
           {r4("(n * spy - sp * sy) / (n * spp - sp * sp)")} AS slope,
           {r4("(sy - (n * spy - sp * sy) / (n * spp - sp * sp) * sp)"
               " / n")} AS intercept
    FROM s
    """,
    doc="Linear calibration fit (slope/intercept) of the hour-of-day "
        "purchase predictor on the held-out half: exact decimal moment "
        "sums, closed-form OLS, slope 1 / intercept 0 = calibrated.",
)
def q324(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    tr = (ev.filter("day(ts) <= 15")
          .groupBy(F.expr("CAST(hour(ts) AS INT)").alias("hr"))
          .agg(F.expr(
              "ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'"
              " THEN 1.0 ELSE 0 END) / COUNT(*) AS DECIMAL(18,6)), 6)")
              .alias("p")))
    te = (ev.filter("day(ts) > 15")
          .select(F.expr("CAST(hour(ts) AS INT)").alias("hr"),
                  F.expr("CASE WHEN event_type = 'purchase'"
                         " THEN 1 ELSE 0 END").alias("y"))
          .join(F.broadcast(tr), "hr"))
    s = te.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("p").cast("double").alias("sp"),
        F.sum(F.expr("p * p")).cast("double").alias("spp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("p * y")).cast("double").alias("spy"))
    return calibration_fit_readout(s)


# --------------------------------------------------------------------------
# Q325 Fleiss' kappa across THREE deterministic binary raters on orders
# (above-median total, urgent/high priority, fulfilled status): the
# m-rater generalization of q293's Cohen pair — do independent quality
# flags agree beyond chance? With m = 3 and 2 categories, per-subject
# agreement P_i = (x² − 3x + 3)/3 for x = #positive votes, so the whole
# statistic folds from exactly (n, Σx, Σx²) — one conditional pass
# after the broadcast 2x-median threshold, three exact integers.
@query(
    "q325_fleiss_kappa",
    oracle=f"""
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END
             + CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x2
      FROM orders),
    m AS (SELECT CAST(2 * MEDIAN(cents) AS BIGINT) AS m2 FROM b),
    r AS (
      SELECT CASE WHEN 2 * cents > m2 THEN 1 ELSE 0 END + x2 AS x
      FROM b CROSS JOIN m),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM r),
    d AS (
      SELECT n, sx,
             (CAST(sxx AS DOUBLE) - CAST(3 AS DOUBLE) * sx
              + CAST(3 AS DOUBLE) * n) / (CAST(3 AS DOUBLE) * n)
               AS pbar_obs,
             CAST(sx AS DOUBLE) / (CAST(3 AS DOUBLE) * n) AS p
      FROM s)
    SELECT n, sx AS n_positive_flags,
           {r4("pbar_obs")} AS p_obs,
           {r4("p * p + (1 - p) * (1 - p)")} AS p_exp,
           {r4("(pbar_obs - (p * p + (1 - p) * (1 - p)))"
               " / (1 - (p * p + (1 - p) * (1 - p)))")} AS fleiss_kappa
    FROM d
    """,
    doc="Fleiss' kappa across three deterministic binary raters "
        "(above-median total, urgent/high priority, fulfilled) from "
        "three exact integers (n, Σx, Σx²).",
)
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = tables(spark, sf_dir)["orders"].select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CASE WHEN o_orderpriority IN (\'1-URGENT\', \'2-HIGH\')"
               " THEN 1 ELSE 0 END"
               " + CASE WHEN o_orderstatus = \'F\' THEN 1 ELSE 0 END")
        .alias("x2"))
    m = b.agg(F.expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)")
              .alias("m2"))
    r = (b.join(F.broadcast(m))
         .select(F.expr("CASE WHEN 2 * cents > m2 THEN 1 ELSE 0 END + x2")
                 .alias("x")))
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"))
    d = s.select(
        "n", "sx",
        F.expr("(CAST(sxx AS DOUBLE) - CAST(3 AS DOUBLE) * sx"
               " + CAST(3 AS DOUBLE) * n) / (CAST(3 AS DOUBLE) * n)")
        .alias("pbar_obs"),
        F.expr("CAST(sx AS DOUBLE) / (CAST(3 AS DOUBLE) * n)").alias("p"))
    return d.select(
        "n", F.col("sx").alias("n_positive_flags"),
        r4c(F.col("pbar_obs")).alias("p_obs"),
        r4c(F.expr("p * p + (1 - p) * (1 - p)")).alias("p_exp"),
        r4c(F.expr("(pbar_obs - (p * p + (1 - p) * (1 - p)))"
                   " / (1 - (p * p + (1 - p) * (1 - p)))"))
        .alias("fleiss_kappa"))


# --------------------------------------------------------------------------
# Q326 Lincoln-Petersen / Chapman capture-recapture estimate of the
# active-user population: users "captured" on a two-day purchase survey
# at the start of the month, "recaptured" on a matching survey at the
# end — the estimator ecology and data-quality teams use when totals
# can't be enumerated directly (how many users exist that we NEVER
# saw?). Chapman's bias-corrected form with its closed-form variance;
# one user-grain conditional pass to three exact integers. The capture
# occasions are deliberately NARROW (purchase events on days 1-2 /
# 29-30, not mere presence in a month half): on the dense fixture the
# half-month predicate saturates (n1 = n2 = m = observed, estimate ≡
# census, se ≡ 0 — VERDICT r7 item 3), so the short purchase surveys
# are what actually exercise the estimator's arithmetic (m < n1, n2 at
# both sf0.001 and sf0.01; asserted by tests/test_stats_numpy.py).
@query(
    "q326_capture_recapture",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND day(ts) BETWEEN 1 AND 2 THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN event_type = 'purchase'
                       AND day(ts) BETWEEN 29 AND 30 THEN 1 ELSE 0 END) AS c2
      FROM events GROUP BY user_id),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * c2) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM u)
    SELECT n1, n2, m, observed,
           {r4("(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1")}
             AS n_chapman,
           {r4("sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)"
               " * (n1 - m) * (n2 - m))"
               " / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2)))")}
             AS se
    FROM s
    """,
    doc="Chapman capture-recapture estimate of the active-user "
        "population from two narrow purchase-survey capture occasions "
        "(days 1-2 and 29-30), with its closed-form standard error.",
)
def q326(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.max(F.expr("CASE WHEN event_type = 'purchase'"
                           " AND day(ts) BETWEEN 1 AND 2"
                           " THEN 1 ELSE 0 END")).alias("c1"),
              F.max(F.expr("CASE WHEN event_type = 'purchase'"
                           " AND day(ts) BETWEEN 29 AND 30"
                           " THEN 1 ELSE 0 END")).alias("c2")))
    s = u.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.expr("c1 * c2")).cast("bigint").alias("m"),
        F.count("*").cast("bigint").alias("observed"))
    return s.select(
        "n1", "n2", "m", "observed",
        r4c(F.expr("(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1"))
        .alias("n_chapman"),
        r4c(F.expr("sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)"
                   " * (n1 - m) * (n2 - m))"
                   " / ((CAST(m + 1 AS DOUBLE)) * (m + 1) * (m + 2)))"))
        .alias("se"))


# --------------------------------------------------------------------------
# Q327 diversity-index panel of the corpus source mix per language:
# Shannon entropy (nats), its exponential (Hill number q=1, the
# "effective number of sources"), Simpson's 1 − Σp², and the inverse-
# Simpson Hill number q=2 — the mixture-health summary behind q126's
# rebalancing and q134's drift (a language whose effective source
# count collapses toward 1 is de-facto single-sourced, the q260 risk).
# One (lang, source) aggregation; per-cell entropy terms fold with 6dp
# quantization; Σp² folds exactly as integer n(n−1)-style ratios.
@query(
    "q327_diversity_index",
    oracle="""
    WITH c AS (
      SELECT lang, source, COUNT(*) AS n
      FROM documents GROUP BY lang, source),
    t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY lang),
    terms AS (
      SELECT c.lang,
             ROUND(CAST(-(CAST(n AS DOUBLE) / nt)
                        * ln(CAST(n AS DOUBLE) / nt)
                        AS DECIMAL(18,6)), 6) AS h_term,
             CAST(n AS HUGEINT) * n AS nn
      FROM c JOIN t ON t.lang = c.lang),
    agg AS (
      SELECT l.lang, l.nt,
             CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(SUM(h_term) AS DOUBLE) AS h,
             CAST(SUM(nn) AS DOUBLE) AS snn
      FROM terms JOIN t l ON l.lang = terms.lang
      GROUP BY l.lang, l.nt)
    SELECT lang, n_sources,
           CAST(ROUND(CAST(h AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS shannon_nats,
           CAST(ROUND(CAST(exp(h) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS eff_sources_q1,
           CAST(ROUND(CAST(1 - snn / (CAST(nt AS DOUBLE) * nt)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS simpson,
           CAST(ROUND(CAST(CAST(nt AS DOUBLE) * nt / snn
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS eff_sources_q2
    FROM agg ORDER BY lang
    """,
    doc="Per-language source-mix diversity: Shannon entropy, effective "
        "source counts (Hill q=1/q=2), and Simpson's index from one "
        "(lang, source) aggregation.",
)
def q327(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (tables(spark, sf_dir)["documents"]
         .groupBy("lang", "source").agg(F.count("*").alias("n")))
    t = c.groupBy("lang").agg(F.sum("n").cast("bigint").alias("nt"))
    terms = (c.join(F.broadcast(t), "lang")
             .select("lang",
                     F.expr("ROUND(CAST(-(CAST(n AS DOUBLE) / nt)"
                            " * ln(CAST(n AS DOUBLE) / nt)"
                            " AS DECIMAL(18,6)), 6)").alias("h_term"),
                     F.expr("CAST(n AS DECIMAL(38,0)) * n").alias("nn")))
    agg = (terms.join(F.broadcast(t), "lang")
           .groupBy("lang", "nt")
           .agg(F.count("*").cast("bigint").alias("n_sources"),
                F.sum("h_term").cast("double").alias("h"),
                F.sum("nn").cast("double").alias("snn")))
    return agg.select(
        "lang", "n_sources",
        r4c(F.col("h")).alias("shannon_nats"),
        r4c(F.expr("exp(h)")).alias("eff_sources_q1"),
        r4c(F.expr("1 - snn / (CAST(nt AS DOUBLE) * nt)")).alias("simpson"),
        r4c(F.expr("CAST(nt AS DOUBLE) * nt / snn")).alias("eff_sources_q2"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# Q328 leave-one-stratum-out jackknife SE of the revenue-per-event
# ratio: the resampling-flavored check on q318's delta-method SE
# (agreement says the linearization is trustworthy at this sample
# size). With day-of-week strata, every leave-one-out replicate is a
# CLOSED FORM over the 7 stratum (Σy, Σm) rows — the jackknife needs
# no resampling pass at all, so the whole estimator is two exact
# aggregations and a 7-row fold.
@query(
    "q328_jackknife_ratio_se",
    oracle=f"""
    WITH s AS (
      SELECT isodow(CAST(ts AS DATE)) AS k,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM events GROUP BY k),
    tot AS (SELECT CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(m) AS BIGINT) AS sm,
                   CAST(COUNT(*) AS BIGINT) AS kk
            FROM s),
    reps AS (
      SELECT ROUND(CAST(CAST(sy - y AS DOUBLE) / (sm - m)
                   AS DECIMAL(18,6)), 6) AS r, kk, sy, sm
      FROM s CROSS JOIN tot),
    f AS (
      SELECT kk, sy, sm,
             CAST(AVG(CAST(r AS DOUBLE)) AS DOUBLE) AS rbar,
             CAST(SUM(CAST(r AS DOUBLE) * r) AS DOUBLE) AS srr
      FROM reps GROUP BY kk, sy, sm)
    SELECT kk AS n_strata,
           {r4("CAST(sy AS DOUBLE) / sm")} AS ratio,
           {r4("sqrt((kk - CAST(1 AS DOUBLE)) / kk"
               " * (srr - kk * rbar * rbar))")} AS se_jack
    FROM f
    """,
    doc="Leave-one-dow-stratum-out jackknife SE of revenue-per-event — "
        "closed form over 7 stratum rows, the resampling cross-check on "
        "q318's delta-method SE.",
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (tables(spark, sf_dir)["events"]
         .groupBy(F.expr("((dayofweek(CAST(ts AS DATE)) + 5) % 7) + 1")
                  .alias("k"))
         .agg(F.sum(F.expr(
                  "CASE WHEN event_type = 'purchase'"
                  " THEN CAST(ROUND(value * 100) AS BIGINT)"
                  " ELSE 0 END")).cast("bigint").alias("y"),
              F.count("*").cast("bigint").alias("m")))
    tot = s.agg(F.sum("y").cast("bigint").alias("sy"),
                F.sum("m").cast("bigint").alias("sm"),
                F.count("*").cast("bigint").alias("kk"))
    reps = (s.join(F.broadcast(tot))
            .select(F.expr("ROUND(CAST(CAST(sy - y AS DOUBLE) / (sm - m)"
                           " AS DECIMAL(18,6)), 6)").alias("r"),
                    "kk", "sy", "sm"))
    f = reps.groupBy("kk", "sy", "sm").agg(
        F.avg(F.expr("CAST(r AS DOUBLE)")).cast("double").alias("rbar"),
        F.sum(F.expr("CAST(r AS DOUBLE) * r")).cast("double").alias("srr"))
    return f.select(
        F.col("kk").alias("n_strata"),
        r4c(F.expr("CAST(sy AS DOUBLE) / sm")).alias("ratio"),
        r4c(F.expr("sqrt((kk - CAST(1 AS DOUBLE)) / kk"
                   " * (srr - kk * rbar * rbar))")).alias("se_jack"))


# --------------------------------------------------------------------------
# Q329 Gumbel block-maxima fit of daily peak purchase values: classical
# extreme-value analysis by the method of moments (β = s·√6/π,
# μ = m − γ·β), with the fitted exceedance probability and return
# period of the observed all-time peak — the "how unusual was our worst
# day" readout (q226's peak detector asks where; this asks how rare).
# Daily maxima are one day-grain aggregation; moments fold exact
# integer sums; γ and π enter as DOUBLE-cast literals.
@query(
    "q329_gumbel_maxima",
    oracle=f"""
    WITH dm AS (
      SELECT CAST(ts AS DATE) AS day,
             MAX(CAST(ROUND(value * 100) AS BIGINT)) AS mx
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mx) AS BIGINT) AS sm,
             CAST(SUM(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS smm,
             CAST(MAX(mx) AS BIGINT) AS peak
      FROM dm),
    f AS (
      SELECT n, peak,
             CAST(sm AS DOUBLE) / n AS mean,
             sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n)
                  / (n - 1)) * sqrt(CAST(6 AS DOUBLE))
               / CAST(3.141592653589793 AS DOUBLE) AS beta
      FROM s),
    g AS (
      SELECT n, peak, beta,
             mean - CAST(0.5772156649015329 AS DOUBLE) * beta AS mu
      FROM f)
    SELECT n, peak,
           {r4("mu / 100")} AS mu_dollars,
           {r4("beta / 100")} AS beta_dollars,
           {r4("1 - exp(-exp(-(peak - mu) / beta))")} AS p_exceed_peak,
           {r4("1 / (1 - exp(-exp(-(peak - mu) / beta)))")}
             AS return_period_days
    FROM g
    """,
    doc="Gumbel block-maxima fit (method of moments) of daily peak "
        "purchase values, with the fitted exceedance probability and "
        "return period of the observed all-time peak.",
)
def q329(spark: SparkSession, sf_dir: str) -> DataFrame:
    dm = (tables(spark, sf_dir)["events"]
          .filter(F.col("event_type") == "purchase")
          .groupBy(F.to_date("ts").alias("day"))
          .agg(F.expr("MAX(CAST(ROUND(value * 100) AS BIGINT))")
               .alias("mx")))
    s = dm.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("mx").cast("bigint").alias("sm"),
        F.expr("CAST(SUM(CAST(mx AS DECIMAL(38,0)) * mx)"
               " AS DECIMAL(38,0))").alias("smm"),
        F.max("mx").cast("bigint").alias("peak"))
    f = s.select(
        "n", "peak",
        F.expr("CAST(sm AS DOUBLE) / n").alias("mean"),
        F.expr("sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n)"
               " / (n - 1)) * sqrt(CAST(6 AS DOUBLE))"
               " / CAST(3.141592653589793 AS DOUBLE)").alias("beta"))
    g = f.select(
        "n", "peak", "beta",
        F.expr("mean - CAST(0.5772156649015329 AS DOUBLE) * beta")
        .alias("mu"))
    return g.select(
        "n", "peak",
        r4c(F.expr("mu / 100")).alias("mu_dollars"),
        r4c(F.expr("beta / 100")).alias("beta_dollars"),
        r4c(F.expr("1 - exp(-exp(-(peak - mu) / beta))"))
        .alias("p_exceed_peak"),
        r4c(F.expr("1 / (1 - exp(-exp(-(peak - mu) / beta)))"))
        .alias("return_period_days"))


# --------------------------------------------------------------------------
# Q330 Theil T inequality index of customer spend with the
# between/within-nation decomposition — the additively decomposable
# inequality measure q175's Gini can't give (Gini doesn't split into
# between + within). Per-customer terms use the exact rational
# y·N/Y (no precomputed mean float), 6dp-quantized pre-sum; the
# between term folds nation-domain-sized rows the same way; within =
# total − between by construction and is reported for the readout.
@query(
    "q330_theil_decomposition",
    oracle="""
    WITH cust AS (
      SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY ck, nk),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS yt
            FROM cust),
    t_all AS (
      SELECT CAST(SUM(ROUND(CAST(
               (CAST(y AS DOUBLE) / yt)
               * ln(CAST(y AS DOUBLE) * n / yt)
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS t
      FROM cust CROSS JOIN tot),
    grp AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(y) AS BIGINT) AS yg
      FROM cust GROUP BY nk),
    t_btw AS (
      SELECT CAST(SUM(ROUND(CAST(
               (CAST(yg AS DOUBLE) / yt)
               * ln((CAST(yg AS DOUBLE) / yt)
                    / (CAST(ng AS DOUBLE) / n))
               AS DECIMAL(18,6)), 6)) AS DOUBLE) AS tb,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM grp CROSS JOIN tot)
    SELECT (SELECT n FROM tot) AS n_customers, n_groups,
           CAST(ROUND(CAST(t AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS theil_t,
           CAST(ROUND(CAST(tb AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS theil_between,
           CAST(ROUND(CAST(t - tb AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS theil_within
    FROM t_all CROSS JOIN t_btw
    """,
    doc="Theil T inequality of customer spend with the exact "
        "between/within-nation decomposition — the additively "
        "decomposable complement to q175's Gini.",
)
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    cust = (t["orders"]
            .join(t["customer"],
                  t["customer"]["c_custkey"] == t["orders"]["o_custkey"])
            .groupBy(F.col("o_custkey").alias("ck"),
                     F.col("c_nationkey").alias("nk"))
            .agg(F.sum(F.expr(
                "CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
                .cast("bigint").alias("y")))
    tot = cust.agg(F.count("*").cast("bigint").alias("n"),
                   F.sum("y").cast("bigint").alias("yt"))
    t_all = (cust.join(F.broadcast(tot))
             .agg(F.expr(
                 "CAST(SUM(ROUND(CAST("
                 "(CAST(y AS DOUBLE) / yt)"
                 " * ln(CAST(y AS DOUBLE) * n / yt)"
                 " AS DECIMAL(18,6)), 6)) AS DOUBLE)").alias("t")))
    grp = cust.groupBy("nk").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("y").cast("bigint").alias("yg"))
    t_btw = (grp.join(F.broadcast(tot))
             .agg(F.expr(
                 "CAST(SUM(ROUND(CAST("
                 "(CAST(yg AS DOUBLE) / yt)"
                 " * ln((CAST(yg AS DOUBLE) / yt)"
                 "      / (CAST(ng AS DOUBLE) / n))"
                 " AS DECIMAL(18,6)), 6)) AS DOUBLE)").alias("tb"),
                 F.count("*").cast("bigint").alias("n_groups")))
    return (tot.join(F.broadcast(t_all)).join(F.broadcast(t_btw))
            .select(F.col("n").alias("n_customers"), "n_groups",
                    r4c(F.col("t")).alias("theil_t"),
                    r4c(F.col("tb")).alias("theil_between"),
                    r4c(F.expr("t - tb")).alias("theil_within")))


# --------------------------------------------------------------------------
# Q331 Atkinson inequality index (ε = 1) of customer spend: 1 minus the
# ratio of geometric to arithmetic mean — the welfare-theoretic
# inequality number whose "equally distributed equivalent" reading
# (what fraction of total spend could be discarded under perfect
# equality for the same welfare) q175/q330 don't give. The geometric
# mean folds from 6dp-quantized ln terms; everything else is two exact
# integers.
@query(
    "q331_atkinson",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY o_custkey),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS yt,
             CAST(SUM(ROUND(CAST(ln(y) AS DECIMAL(18,6)), 6)) AS DOUBLE)
               AS sln
      FROM cust)
    SELECT n,
           {r4("exp(sln / n) / 100")} AS geo_mean_dollars,
           {r4("CAST(yt AS DOUBLE) / n / 100")} AS mean_dollars,
           {r4("1 - exp(sln / n) / (CAST(yt AS DOUBLE) / n)")}
             AS atkinson_e1
    FROM s
    """,
    doc="Atkinson inequality index (epsilon=1) of customer spend: one "
        "pass to (n, total, sum-of-quantized-logs), geometric over "
        "arithmetic mean.",
)
def q331(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (tables(spark, sf_dir)["orders"]
            .groupBy("o_custkey")
            .agg(F.sum(F.expr(
                "CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
                .cast("bigint").alias("y")))
    s = cust.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("yt"),
        F.expr("CAST(SUM(ROUND(CAST(ln(y) AS DECIMAL(18,6)), 6))"
               " AS DOUBLE)").alias("sln"))
    return s.select(
        "n",
        r4c(F.expr("exp(sln / n) / 100")).alias("geo_mean_dollars"),
        r4c(F.expr("CAST(yt AS DOUBLE) / n / 100")).alias("mean_dollars"),
        r4c(F.expr("1 - exp(sln / n) / (CAST(yt AS DOUBLE) / n)"))
        .alias("atkinson_e1"))


# --------------------------------------------------------------------------
# Q332 exponentially-decayed customer LTV (90-day half-life, anchored
# at the corpus's last order date — no wall clock anywhere): the
# recency-weighted value score behind churn-risk ranking, next to
# q156's discrete RFM bands and q210's cohort curves. Per-row decay
# terms quantize to 6dp DECIMAL before the per-customer sum, so every
# customer's score is an exact decimal — identical across engines and
# safely ORDER-BY-able for the top-customer readout (raw-order
# subquery, the q323 lesson).
@query(
    "q332_decayed_ltv",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS raw_cents,
             SUM(ROUND(CAST(
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
               * exp(-CAST(0.007701635339554948 AS DOUBLE)
                     * date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(mx AS DATE)))
               AS DECIMAL(18,6)), 6)) AS ltv
      FROM orders CROSS JOIN anchor GROUP BY o_custkey),
    top AS (
      SELECT o_custkey AS top_cust,
             CAST(ltv AS DOUBLE) AS top_ltv_cents
      FROM c ORDER BY ltv DESC, o_custkey LIMIT 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(raw_cents) AS BIGINT) AS raw_total,
             CAST(SUM(ltv) AS DOUBLE) AS decayed_total
      FROM c)
    SELECT n_customers,
           {r4("raw_total / 100.0")} AS raw_total_dollars,
           {r4("decayed_total / 100")} AS decayed_total_dollars,
           CAST(FLOOR(decayed_total * 1000000 / raw_total) AS BIGINT)
             AS retention_ppm,
           top_cust,
           {r4("top_ltv_cents / 100")} AS top_ltv_dollars
    FROM s CROSS JOIN top
    """,
    doc="Exponentially-decayed customer LTV (90-day half-life anchored "
        "at the last order date): exact 6dp-quantized decay sums, "
        "deterministic top customer, decayed-over-raw retention ppm.",
)
def q332(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables(spark, sf_dir)["orders"]
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    c = (orders.join(F.broadcast(anchor))
         .groupBy("o_custkey")
         .agg(F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
              .cast("bigint").alias("raw_cents"),
              F.sum(F.expr(
                  "ROUND(CAST("
                  "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                  " * exp(-CAST(0.007701635339554948 AS DOUBLE)"
                  "       * datediff(CAST(mx AS DATE),"
                  "                  CAST(o_orderdate AS DATE)))"
                  " AS DECIMAL(18,6)), 6)")).alias("ltv")))
    top = (c.orderBy(F.desc("ltv"), "o_custkey").limit(1)
           .select(F.col("o_custkey").alias("top_cust"),
                   F.col("ltv").cast("double").alias("top_ltv_cents")))
    s = c.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("raw_cents").cast("bigint").alias("raw_total"),
        F.sum("ltv").cast("double").alias("decayed_total"))
    return (s.join(F.broadcast(top))
            .select("n_customers",
                    r4c(F.expr("raw_total / 100.0"))
                    .alias("raw_total_dollars"),
                    r4c(F.expr("decayed_total / 100"))
                    .alias("decayed_total_dollars"),
                    F.expr("CAST(FLOOR(decayed_total * 1000000"
                           " / raw_total) AS BIGINT)")
                    .alias("retention_ppm"),
                    "top_cust",
                    r4c(F.expr("top_ltv_cents / 100"))
                    .alias("top_ltv_dollars")))


# --------------------------------------------------------------------------
# Q333 cold-start rate per day: the share of each day's events produced
# by users on their FIRST active day — the "how much of today's traffic
# is brand new" pipeline-health series (new-entity influx stresses every
# cache, model and dedup registry; q229's new-vs-returning is the
# revenue view at customer grain). One min-per-user pass joined back on
# the user key; exact integer ppm per calendar day.
@query(
    "q333_cold_start_rate",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id),
    e AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN CAST(ts AS DATE) = first_day THEN 1 ELSE 0 END
               AS is_first
      FROM events JOIN f USING (user_id)),
    d AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(is_first) AS BIGINT) AS n_first_day
      FROM e GROUP BY day)
    SELECT day, n_events, n_first_day,
           CAST(n_first_day * 1000000 // n_events AS BIGINT)
             AS cold_start_ppm
    FROM d ORDER BY day
    """,
    doc="Per-day share of events from users on their first active day "
        "(exact integer ppm): the new-entity influx series.",
)
def q333(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    f = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"))
    e = (ev.join(f, "user_id")
         .select(F.to_date("ts").alias("day"),
                 F.expr("CASE WHEN CAST(ts AS DATE) = first_day"
                        " THEN 1 ELSE 0 END").alias("is_first")))
    d = e.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("is_first").cast("bigint").alias("n_first_day"))
    return d.select(
        "day", "n_events", "n_first_day",
        F.expr("n_first_day * 1000000 DIV n_events")
        .alias("cold_start_ppm")).orderBy("day")


# --------------------------------------------------------------------------
# Q334 intracluster correlation + design effect of event values under
# user clustering: when randomization is BY USER but analysis is BY
# EVENT, the effective sample size shrinks by deff = 1 + (m̄−1)·ICC —
# the number that says whether q318/q321's per-event readouts are
# honest. One-way random-effects ICC from exact integer sufficient
# statistics (ANOVA MSB/MSW with the unequal-cluster m0 correction) —
# one user-grain pass plus a one-row fold.
@query(
    "q334_icc_design_effect",
    oracle=f"""
    WITH u AS (
      SELECT user_id, COUNT(*) AS m,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS s,
             CAST(SUM(CAST(ROUND(value * 100) AS HUGEINT)
                      * CAST(ROUND(value * 100) AS BIGINT)) AS HUGEINT)
               AS q
      FROM events GROUP BY user_id),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS uu,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS st,
             SUM(CAST(q AS DOUBLE)) AS qt,
             SUM(CAST(s AS DOUBLE) * s / m) AS sb,
             SUM(CAST(m AS DOUBLE) * m) AS smm
      FROM u),
    d AS (
      SELECT uu, n,
             (sb - CAST(st AS DOUBLE) * st / n) / (uu - 1) AS msb,
             (qt - sb) / (n - uu) AS msw,
             (n - smm / n) / (uu - 1) AS m0
      FROM t)
    SELECT n AS n_events, uu AS n_users,
           {r4("(msb - msw) / (msb + (m0 - 1) * msw)")} AS icc,
           {r4("1 + (CAST(n AS DOUBLE) / uu - 1)"
               " * ((msb - msw) / (msb + (m0 - 1) * msw))")} AS deff,
           {r4("n / (1 + (CAST(n AS DOUBLE) / uu - 1)"
               " * ((msb - msw) / (msb + (m0 - 1) * msw)))")}
             AS eff_sample_size
    FROM d
    """,
    doc="Intracluster correlation, design effect and effective sample "
        "size of event values under user clustering, from exact integer "
        "ANOVA sufficient statistics with the unequal-cluster m0 "
        "correction.",
)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.count("*").alias("m"),
              F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
              .cast("bigint").alias("s"),
              F.expr("CAST(SUM(CAST(ROUND(value * 100) AS DECIMAL(38,0))"
                     " * CAST(ROUND(value * 100) AS BIGINT))"
                     " AS DECIMAL(38,0))").alias("q")))
    t = u.agg(
        F.count("*").cast("bigint").alias("uu"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("st"),
        F.sum(F.expr("CAST(q AS DOUBLE)")).alias("qt"),
        F.sum(F.expr("CAST(s AS DOUBLE) * s / m")).alias("sb"),
        F.sum(F.expr("CAST(m AS DOUBLE) * m")).alias("smm"))
    d = t.select(
        "uu", "n",
        F.expr("(sb - CAST(st AS DOUBLE) * st / n) / (uu - 1)")
        .alias("msb"),
        F.expr("(qt - sb) / (n - uu)").alias("msw"),
        F.expr("(n - smm / n) / (uu - 1)").alias("m0"))
    return d.select(
        F.col("n").alias("n_events"), F.col("uu").alias("n_users"),
        r4c(F.expr("(msb - msw) / (msb + (m0 - 1) * msw)")).alias("icc"),
        r4c(F.expr("1 + (CAST(n AS DOUBLE) / uu - 1)"
                   " * ((msb - msw) / (msb + (m0 - 1) * msw))"))
        .alias("deff"),
        r4c(F.expr("n / (1 + (CAST(n AS DOUBLE) / uu - 1)"
                   " * ((msb - msw) / (msb + (m0 - 1) * msw)))"))
        .alias("eff_sample_size"))


# --------------------------------------------------------------------------
# Q353 sequential probability ratio test (Wald 1945): per event_type, the
# conversion indicator (value > 100) is tested H0: p = 0.1 vs H1: p = 0.2
# in arrival order — the streaming-native alternative to fixed-horizon
# tests (decide as early as the evidence allows, with guaranteed
# alpha/beta). Per-term log-likelihood ratios are quantized
# DECIMAL(18,6)->R4 BEFORE the cumulative sum (the q132 two-step), so the
# LLR path is engine-exact; the Wald bounds ln((1-b)/a) = ±2.9444 at
# alpha = beta = 0.05 are integer-decimal literals. Readout per type: the
# first crossing step (0 = no decision yet), the decision, and the LLR at
# decision (or the final LLR while continuing). Fixture: conversion rates
# 11-16% straddle the hypotheses, so low-rate types accept H0 while
# high-rate types drift toward H1 — decisions genuinely vary.
# 100 TB story: one scan, one per-type window cumsum (partitioned — the
# per-key state is one running decimal), then a per-type aggregate. The
# LIVE form is StreamingSprt (streaming/incremental.py): S62 pins the
# drained monitor readout ≡ this batch query byte-for-byte.
@query(
    "q353_sprt",
    oracle="""
    WITH x AS (
      SELECT event_type, ts, event_id,
             CASE WHEN value > 100
                  THEN ROUND(CAST(ln(2.0) AS DECIMAL(18,6)), 4)
                  ELSE ROUND(CAST(ln(0.8 / 0.9) AS DECIMAL(18,6)), 4)
             END AS step
      FROM events),
    c AS (
      SELECT event_type,
             SUM(step) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS llr,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM x)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(MIN(rn) FILTER (WHERE ABS(llr) >= 2.9444), 0)
                AS BIGINT) AS n_at_decision,
           CASE WHEN MIN(rn) FILTER (WHERE ABS(llr) >= 2.9444) IS NULL
                  THEN 'continue'
                WHEN ARG_MIN(llr, rn) FILTER (WHERE ABS(llr) >= 2.9444) > 0
                  THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CAST(COALESCE(ARG_MIN(llr, rn) FILTER (WHERE ABS(llr) >= 2.9444),
                         ARG_MAX(llr, rn)) AS DOUBLE) AS llr_readout
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    doc="Wald SPRT per event type (H0 p=0.1 vs H1 p=0.2, alpha=beta=0.05) "
        "over the value>100 indicator in arrival order: first-crossing "
        "step, decision, and the LLR at decision (exact decimal path).",
)
def q353(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    step = ("CASE WHEN value > 100"
            " THEN ROUND(CAST(ln(2.0) AS DECIMAL(18,6)), 4)"
            " ELSE ROUND(CAST(ln(0.8 / 0.9) AS DECIMAL(18,6)), 4) END")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    x = (ev.select("event_type", "ts", "event_id",
                   F.expr(step).alias("step"))
         .withColumn("llr", F.sum("step").over(
             w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
         .withColumn("rn", F.row_number().over(w)))
    crossed = F.abs(F.col("llr")) >= 2.9444
    dec = F.when(crossed, F.struct(F.col("rn").alias("rn"),
                                   F.col("llr").alias("llr")))
    fin = F.struct(F.col("rn").alias("rn"), F.col("llr").alias("llr"))
    agg = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(dec).alias("_dec"),
        F.max(fin).alias("_fin"))
    return (agg.select(
        "event_type", "n_events",
        F.coalesce(F.col("_dec.rn").cast("bigint"), F.lit(0).cast("bigint"))
        .alias("n_at_decision"),
        F.when(F.col("_dec").isNull(), F.lit("continue"))
        .when(F.col("_dec.llr") > 0, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0")).alias("decision"),
        F.coalesce(F.col("_dec.llr"), F.col("_fin.llr")).cast("double")
        .alias("llr_readout"))
        .orderBy("event_type"))


# --------------------------------------------------------------------------
# Q358 split-conformal prediction interval (Vovk et al. 2005; the
# distribution-free serving-side guarantee modern eval stacks attach to
# point predictions): event_id % 3 splits train/calibration/test; the
# per-type model is the train mean, the conformal radius is the
# ceil((n_cal+1)(1-alpha))-th smallest calibration residual (alpha = 0.1),
# and the TEST split reports empirical coverage. Exactness: values are
# quantized DECIMAL->R4 once, and every residual comparison runs in
# "times n_train" space (|n*v - S| vs the selected |n*v - S| order
# statistic) so no division touches a comparison — mu and qhat are
# readout-only R4 doubles. Fixture: coverage lands ~90% (818k-969k ppm,
# varying by type and SF) — the guarantee made visible.
# 100 TB story: two scans (train agg, then cal/test against the broadcast
# 5-row model), one per-type window for the order statistic; the k-th
# residual selection is the model-sized table.
@query(
    "q358_conformal_interval",
    oracle="""
    WITH q AS (
      SELECT event_type, event_id,
             ROUND(CAST(value AS DECIMAL(18,6)), 4) AS v,
             event_id % 3 AS sp
      FROM events),
    tr AS (SELECT event_type, COUNT(*) AS nt, SUM(v) AS s
           FROM q WHERE sp = 0 GROUP BY 1),
    cal AS (SELECT q.event_type, ABS(tr.nt * q.v - tr.s) AS ar, q.event_id
            FROM q JOIN tr USING (event_type) WHERE sp = 1),
    ksel AS (SELECT event_type, COUNT(*) AS nc FROM cal GROUP BY 1),
    qs AS (
      SELECT c.event_type, c.ar AS qhat_s, k.nc FROM
        (SELECT event_type, ar,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ar, event_id) AS r
         FROM cal) c
        JOIN ksel k USING (event_type)
        WHERE c.r = (9 * (k.nc + 1) + 9) // 10),
    tst AS (
      SELECT q.event_type, COUNT(*) AS ntest,
             SUM(CASE WHEN ABS(tr.nt * q.v - tr.s) <= qs.qhat_s
                      THEN 1 ELSE 0 END) AS cov
      FROM q JOIN tr USING (event_type) JOIN qs USING (event_type)
      WHERE sp = 2 GROUP BY 1)
    SELECT t.event_type,
           CAST(tr.nt AS BIGINT) AS n_train,
           CAST(qs.nc AS BIGINT) AS n_cal,
           CAST(t.ntest AS BIGINT) AS n_test,
           CAST(ROUND(CAST(CAST(tr.s AS DOUBLE) / tr.nt AS DECIMAL(18,6)),
                      4) AS DOUBLE) AS mu,
           CAST(ROUND(CAST(CAST(qs.qhat_s AS DOUBLE) / tr.nt
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS qhat,
           CAST(t.cov * 1000000 // t.ntest AS BIGINT) AS coverage_ppm
    FROM tst t JOIN tr USING (event_type) JOIN qs USING (event_type)
    ORDER BY event_type
    """,
    doc="Split-conformal 90% interval per event type (train mean model, "
        "order-statistic calibration radius, test-split empirical "
        "coverage in ppm) — all comparisons division-free exact.",
)
def q358(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    q_ = ev.select(
        "event_type", "event_id",
        F.expr("ROUND(CAST(value AS DECIMAL(18,6)), 4)").alias("v"),
        F.expr("event_id % 3").alias("sp"))
    tr = (q_.filter("sp = 0").groupBy("event_type")
          .agg(F.count(F.lit(1)).alias("nt"), F.sum("v").alias("s")))
    cal = (q_.filter("sp = 1").join(F.broadcast(tr), "event_type")
           .select("event_type", "event_id",
                   F.abs(F.col("nt") * F.col("v") - F.col("s")).alias("ar")))
    # nc rides a count window over the SAME per-type partition as the
    # rank instead of a separate groupBy branch — the r12 ksel branch
    # re-planned cal's lineage (an events scan) a second time (r13)
    wcal = Window.partitionBy("event_type").orderBy("ar", "event_id")
    wnc = Window.partitionBy("event_type")
    qs = (cal.withColumn("r", F.row_number().over(wcal))
          .withColumn("nc", F.count(F.lit(1)).over(wnc))
          .filter(F.expr("r = (9 * (nc + 1) + 9) DIV 10"))
          .select("event_type", F.col("ar").alias("qhat_s"), "nc"))
    tst = (q_.filter("sp = 2")
           .join(F.broadcast(tr), "event_type")
           .join(F.broadcast(qs), "event_type")
           .groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("ntest"),
                F.sum(F.when(F.abs(F.col("nt") * F.col("v") - F.col("s"))
                             <= F.col("qhat_s"), 1).otherwise(0))
                .alias("cov")))
    return (tst.join(F.broadcast(tr), "event_type")
            .join(F.broadcast(qs), "event_type")
            .select(
                "event_type",
                F.col("nt").cast("bigint").alias("n_train"),
                F.col("nc").cast("bigint").alias("n_cal"),
                F.col("ntest").cast("bigint").alias("n_test"),
                F.expr("CAST(ROUND(CAST(CAST(s AS DOUBLE) / nt"
                       " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("mu"),
                F.expr("CAST(ROUND(CAST(CAST(qhat_s AS DOUBLE) / nt"
                       " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("qhat"),
                F.expr("CAST(cov * 1000000 DIV ntest AS BIGINT)")
                .alias("coverage_ppm"))
            .orderBy("event_type"))


# --------------------------------------------------------------------------
# Q359 XmR individuals control chart (Shewhart; Wheeler's SPC workhorse):
# per event_type, the measurement sequence in arrival order gets natural
# process limits xbar ± 2.66·MRbar from the mean moving range — the
# constant 2.66 = 3/d2(2) converts consecutive-pair dispersion into a
# 3-sigma-equivalent band without assuming normality of level shifts.
# Exactness: measurements quantized DECIMAL->R4 once; xbar/MRbar are R4
# decimals BEFORE the limit arithmetic, so every out-of-control comparison
# is decimal-exact (no double boundary anywhere); limits release as R4
# doubles. Fixture: heavy-tailed values put 3-6 points outside the limits
# per type at sf0.001 (~2.5% at sf0.01), at varying first positions.
# 100 TB story: one per-type ordered window (lag + row_number) and two
# aggregates; state per type is one (sum, sum-MR, count) triple — the
# live-monitor shape.
@query(
    "q359_xmr_control_chart",
    oracle="""
    WITH x AS (
      SELECT event_type, ts, event_id,
             ROUND(CAST(value AS DECIMAL(18,6)), 4) AS v
      FROM events),
    mr AS (
      SELECT event_type, v,
             ABS(v - LAG(v) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)) AS m,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM x),
    base AS (
      SELECT event_type, COUNT(*) AS n,
             ROUND(CAST(CAST(SUM(v) AS DOUBLE) / COUNT(*)
                        AS DECIMAL(18,6)), 4) AS xq,
             ROUND(CAST(CAST(SUM(m) AS DOUBLE) / COUNT(m)
                        AS DECIMAL(18,6)), 4) AS mrq
      FROM mr GROUP BY 1)
    SELECT mr.event_type,
           CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(xq) AS DOUBLE) AS xbar,
           CAST(MIN(mrq) AS DOUBLE) AS mr_bar,
           CAST(MIN(xq + 2.66 * mrq) AS DOUBLE) AS ucl,
           CAST(MIN(xq - 2.66 * mrq) AS DOUBLE) AS lcl,
           CAST(SUM(CASE WHEN v > xq + 2.66 * mrq OR v < xq - 2.66 * mrq
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ooc,
           CAST(COALESCE(MIN(CASE WHEN v > xq + 2.66 * mrq
                                    OR v < xq - 2.66 * mrq
                                  THEN rn END), 0) AS BIGINT)
             AS first_ooc_rn
    FROM mr JOIN base USING (event_type)
    GROUP BY mr.event_type ORDER BY event_type
    """,
    doc="XmR individuals chart per event type: natural process limits "
        "xbar +/- 2.66*MRbar from the mean moving range, out-of-control "
        "count and the first flagged chart position (decimal-exact).",
)
def q359(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    x = ev.select(
        "event_type", "ts", "event_id",
        F.expr("ROUND(CAST(value AS DECIMAL(18,6)), 4)").alias("v"))
    mr = (x.withColumn("m", F.abs(F.col("v") - F.lag("v").over(w)))
          .withColumn("rn", F.row_number().over(w)))
    base = mr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("ROUND(CAST(CAST(SUM(v) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4)").alias("xq"),
        F.expr("ROUND(CAST(CAST(SUM(m) AS DOUBLE) / COUNT(m)"
               " AS DECIMAL(18,6)), 4)").alias("mrq"))
    ooc = "v > xq + 2.66 * mrq OR v < xq - 2.66 * mrq"
    return (mr.join(F.broadcast(base), "event_type")
            .groupBy("event_type")
            .agg(F.min("n").cast("bigint").alias("n"),
                 F.min("xq").cast("double").alias("xbar"),
                 F.min("mrq").cast("double").alias("mr_bar"),
                 F.expr("CAST(MIN(xq + 2.66 * mrq) AS DOUBLE)").alias("ucl"),
                 F.expr("CAST(MIN(xq - 2.66 * mrq) AS DOUBLE)").alias("lcl"),
                 F.expr(f"CAST(SUM(CASE WHEN {ooc} THEN 1 ELSE 0 END)"
                        " AS BIGINT)").alias("n_ooc"),
                 F.expr(f"CAST(COALESCE(MIN(CASE WHEN {ooc} THEN rn END), 0)"
                        " AS BIGINT)").alias("first_ooc_rn"))
            .orderBy("event_type"))


# --------------------------------------------------------------------------
# Q360 Neyman optimal allocation (Neyman 1934; Cochran's survey-sampling
# workhorse): when a fixed labeling/audit budget must be spread over
# strata, allocate n_h ∝ N_h·S_h — more samples where there are more
# rows AND more variance — the exact design question a 100 TB curation
# pipeline answers before paying annotators. Variance is computed on
# integer CENTS (N·Σx² − (Σx)² in DECIMAL(38,0) — bigint would overflow
# at sf0.1), the per-stratum sd is quantized R4 BEFORE weighting, weights
# become exact integers (×10⁴), and shares/allocations are integer DIV —
# no float comparison anywhere. Budget n = 1000 (floor allocation; the
# remainder ≤ |strata| is the documented slack).
# 100 TB story: one map-side-combinable group-by for the sufficient
# statistics; the weighting/allocation runs on the 25-row stratum table
# against a broadcast one-row total.
@query(
    "q360_neyman_allocation",
    oracle="""
    WITH x AS (
      SELECT c_nationkey AS nation,
             CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,6)) * 100)
                  AS BIGINT) AS xq
      FROM customer),
    s AS (
      SELECT nation, COUNT(*) AS n_h,
             SUM(CAST(xq AS DECIMAL(38,0))) AS sx,
             SUM(CAST(xq AS DECIMAL(38,0)) * xq) AS sxx
      FROM x GROUP BY 1),
    sd AS (
      SELECT nation, n_h,
             ROUND(CAST(SQRT(CAST(n_h * sxx - sx * sx AS DOUBLE)
                             / (CAST(n_h AS DOUBLE) * (n_h - 1))) / 100.0
                        AS DECIMAL(18,6)), 4) AS sd_q
      FROM s WHERE n_h > 1),
    w AS (
      SELECT nation, n_h, sd_q,
             CAST(n_h * sd_q * 10000 AS BIGINT) AS w4
      FROM sd),
    tot AS (SELECT SUM(w4) AS tw FROM w)
    SELECT w.nation,
           CAST(w.n_h AS BIGINT) AS n_h,
           CAST(w.sd_q AS DOUBLE) AS sd,
           CAST(w.w4 * 1000000 // tot.tw AS BIGINT) AS share_ppm,
           CAST(w.w4 * 1000 // tot.tw AS BIGINT) AS alloc_n
    FROM w CROSS JOIN tot ORDER BY w.nation
    """,
    doc="Neyman allocation of a 1000-sample audit budget over nation "
        "strata by N_h*S_h (acctbal sd, integer-cents exact): per-stratum "
        "sd, ppm share, floor allocation.",
)
def q360(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tables(spark, sf_dir)["customer"]
    x = c.select(
        F.col("c_nationkey").alias("nation"),
        F.expr("CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,6)) * 100)"
               " AS BIGINT)").alias("xq"))
    s = x.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("xq").cast("decimal(38,0)") * F.col("xq")).alias("sxx"))
    sd = (s.filter("n_h > 1")
          .withColumn("sd_q", F.expr(
              "ROUND(CAST(SQRT(CAST(n_h * sxx - sx * sx AS DOUBLE)"
              " / (CAST(n_h AS DOUBLE) * (n_h - 1))) / 100.0"
              " AS DECIMAL(18,6)), 4)")))
    w = sd.withColumn("w4", F.expr("CAST(n_h * sd_q * 10000 AS BIGINT)"))
    tot = w.agg(F.sum("w4").alias("tw"))
    return (w.crossJoin(F.broadcast(tot))
            .select("nation",
                    F.col("n_h").cast("bigint").alias("n_h"),
                    F.col("sd_q").cast("double").alias("sd"),
                    F.expr("CAST(w4 * 1000000 DIV tw AS BIGINT)")
                    .alias("share_ppm"),
                    F.expr("CAST(w4 * 1000 DIV tw AS BIGINT)")
                    .alias("alloc_n"))
            .orderBy("nation"))


# --------------------------------------------------------------------------
# Q361 near-zero-variance feature screen (the caret-style preprocessing
# gate): a feature whose top value dwarfs the runner-up (freqRatio) while
# carrying almost no distinct values (percentUnique) is noise to most
# models and poison to cross-validation splits. Four lineitem measures
# are melted to (metric, integer-cents value) rows — value-quantized so
# no float string rendering is ever compared — and each gets exact
# integer diagnostics: top-2 value counts, freq ratio and distinct share
# in ppm. One scan; the per-metric tables are value-domain-sized.
@query(
    "q361_nzv_screen",
    oracle="""
    WITH m AS (
      SELECT 'l_quantity' AS metric,
             CAST(ROUND(CAST(l_quantity AS DECIMAL(18,6)) * 100) AS BIGINT)
               AS v FROM lineitem
      UNION ALL
      SELECT 'l_discount',
             CAST(ROUND(CAST(l_discount AS DECIMAL(18,6)) * 100) AS BIGINT)
        FROM lineitem
      UNION ALL
      SELECT 'l_tax',
             CAST(ROUND(CAST(l_tax AS DECIMAL(18,6)) * 100) AS BIGINT)
        FROM lineitem
      UNION ALL
      SELECT 'l_linenumber',
             CAST(l_linenumber AS BIGINT) * 100 FROM lineitem),
    c AS (SELECT metric, v, COUNT(*) AS c FROM m GROUP BY 1, 2),
    r AS (
      SELECT metric, v, c,
             ROW_NUMBER() OVER (PARTITION BY metric
                                ORDER BY c DESC, v) AS rn
      FROM c),
    agg AS (
      SELECT metric, SUM(c) AS n, COUNT(*) AS n_distinct FROM c GROUP BY 1)
    SELECT a.metric,
           CAST(a.n AS BIGINT) AS n,
           CAST(a.n_distinct AS BIGINT) AS n_distinct,
           CAST(t1.v AS DOUBLE) / 100 AS top_value,
           CAST(t1.c AS BIGINT) AS top1_cnt,
           CAST(t2.c AS BIGINT) AS top2_cnt,
           CAST(t1.c * 1000000 // t2.c AS BIGINT) AS freq_ratio_ppm,
           CAST(a.n_distinct * 1000000 // a.n AS BIGINT) AS distinct_ppm
    FROM agg a
    JOIN r t1 ON t1.metric = a.metric AND t1.rn = 1
    JOIN r t2 ON t2.metric = a.metric AND t2.rn = 2
    ORDER BY a.metric
    """,
    doc="Near-zero-variance screen over four lineitem measures: top-2 "
        "value counts, freq ratio and distinct share (integer ppm, "
        "cents-quantized values).",
)
def q361(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables(spark, sf_dir)["lineitem"]
    m = li.selectExpr(
        "stack(4,"
        " 'l_quantity',"
        " CAST(ROUND(CAST(l_quantity AS DECIMAL(18,6)) * 100) AS BIGINT),"
        " 'l_discount',"
        " CAST(ROUND(CAST(l_discount AS DECIMAL(18,6)) * 100) AS BIGINT),"
        " 'l_tax',"
        " CAST(ROUND(CAST(l_tax AS DECIMAL(18,6)) * 100) AS BIGINT),"
        " 'l_linenumber', CAST(l_linenumber AS BIGINT) * 100"
        ") AS (metric, v)")
    c = m.groupBy("metric", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("metric").orderBy(F.desc("c"), F.asc("v"))
    r = c.withColumn("rn", F.row_number().over(w))
    agg = c.groupBy("metric").agg(F.sum("c").alias("n"),
                                  F.count(F.lit(1)).alias("n_distinct"))
    t1 = r.filter("rn = 1").select("metric", F.col("v").alias("v1"),
                                   F.col("c").alias("c1"))
    t2 = r.filter("rn = 2").select("metric", F.col("c").alias("c2"))
    return (agg.join(t1, "metric").join(t2, "metric")
            .select("metric",
                    F.col("n").cast("bigint").alias("n"),
                    F.col("n_distinct").cast("bigint").alias("n_distinct"),
                    (F.col("v1").cast("double") / 100).alias("top_value"),
                    F.col("c1").cast("bigint").alias("top1_cnt"),
                    F.col("c2").cast("bigint").alias("top2_cnt"),
                    F.expr("CAST(c1 * 1000000 DIV c2 AS BIGINT)")
                    .alias("freq_ratio_ppm"),
                    F.expr("CAST(n_distinct * 1000000 DIV n AS BIGINT)")
                    .alias("distinct_ppm"))
            .orderBy("metric"))


# --------------------------------------------------------------------------
# Q362 Hill tail-index estimator (Hill 1975): is this distribution's tail
# heavy enough that means/quotas are unstable? — the question behind
# doc-length caps, token-budget outliers, and whale-customer clipping.
# 1/alpha = mean over the top k=50 order statistics of ln(x_(i)/x_(k+1));
# each ln term is quantized R4 BEFORE the sum (q132 two-step), order
# statistics are tie-broken by event_id, alpha <= 1 means infinite mean.
# One per-type ordered window for the ranks, then a 50-row-per-type sum.
@query(
    "q362_hill_tail_index",
    oracle="""
    WITH x AS (
      SELECT event_type, event_id,
             ROUND(CAST(value AS DECIMAL(18,6)), 4) AS xq,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events WHERE value > 0),
    kth AS (SELECT event_type, xq AS xk1 FROM x WHERE rn = 51),
    terms AS (
      SELECT x.event_type,
             ROUND(CAST(ln(CAST(x.xq AS DOUBLE) / CAST(k.xk1 AS DOUBLE))
                        AS DECIMAL(18,6)), 4) AS t
      FROM x JOIN kth k USING (event_type) WHERE x.rn <= 50),
    n_pos AS (SELECT event_type, COUNT(*) AS n FROM x GROUP BY 1)
    SELECT t.event_type,
           CAST(n.n AS BIGINT) AS n_pos,
           CAST(k.xk1 AS DOUBLE) AS tail_cutoff,
           CAST(ROUND(CAST(CAST(SUM(t.t) AS DOUBLE) / 50
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS hill_inv,
           CAST(ROUND(CAST(50 / CAST(SUM(t.t) AS DOUBLE)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS alpha
    FROM terms t JOIN kth k USING (event_type) JOIN n_pos n USING (event_type)
    GROUP BY t.event_type, n.n, k.xk1 ORDER BY t.event_type
    """,
    doc="Hill tail-index over the top 50 order statistics of event value "
        "per type: 1/alpha as the mean of R4-quantized ln ratios to the "
        "51st value; alpha <= 1 flags an infinite-mean tail.",
)
def q362(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    # rank on the RAW value (like the oracle's ORDER BY value DESC), with
    # the event_id tie-break identical in both engines
    x = (ev.filter("value > 0")
         .select("event_type", "event_id", "value",
                 F.expr("ROUND(CAST(value AS DECIMAL(18,6)), 4)")
                 .alias("xq"))
         .withColumn("rn", F.row_number().over(
             Window.partitionBy("event_type")
             .orderBy(F.desc("value"), F.asc("event_id"))))
         .drop("value"))
    kth = x.filter("rn = 51").select("event_type",
                                     F.col("xq").alias("xk1"))
    terms = (x.filter("rn <= 50").join(F.broadcast(kth), "event_type")
             .select("event_type", F.expr(
                 "ROUND(CAST(ln(CAST(xq AS DOUBLE) / CAST(xk1 AS DOUBLE))"
                 " AS DECIMAL(18,6)), 4)").alias("t")))
    n_pos = x.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (terms.groupBy("event_type")
            .agg(F.sum("t").alias("s"))
            .join(F.broadcast(kth), "event_type")
            .join(F.broadcast(n_pos), "event_type")
            .select("event_type",
                    F.col("n").cast("bigint").alias("n_pos"),
                    F.col("xk1").cast("double").alias("tail_cutoff"),
                    F.expr("CAST(ROUND(CAST(CAST(s AS DOUBLE) / 50"
                           " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                    .alias("hill_inv"),
                    F.expr("CAST(ROUND(CAST(50 / CAST(s AS DOUBLE)"
                           " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                    .alias("alpha"))
            .orderBy("event_type"))


# --------------------------------------------------------------------------
# Q363 difference-in-differences (the two-period two-group workhorse of
# policy/feature evaluation): for each market segment as the "treated"
# group vs all others as control, pre/post split at 1998-01-01, the DiD
# estimate on mean order value nets out both the group level difference
# and the common time trend. Means are R4-quantized decimals from exact
# decimal sums (double division of identical inputs), so the DiD
# arithmetic itself is decimal-exact. Control cells are derived by
# subtracting the segment cell from the broadcast global cell — the
# leave-one-out trick that avoids a segment x segment self-join.
# One scan, one (segment, post) group-by; everything after is 10 rows.
@query(
    "q363_diff_in_differences",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment AS seg,
             CASE WHEN o_orderdate >= DATE '1998-01-01'
                  THEN 1 ELSE 0 END AS post,
             CAST(o_totalprice AS DECIMAL(18,6)) AS p
      FROM orders JOIN customer ON o_custkey = c_custkey),
    cell AS (
      SELECT seg, post, COUNT(*) AS n, SUM(p) AS s FROM b GROUP BY 1, 2),
    g AS (SELECT post, SUM(n) AS gn, SUM(s) AS gs FROM cell GROUP BY 1),
    m AS (
      SELECT cell.seg, cell.post, cell.n,
             ROUND(CAST(CAST(cell.s AS DOUBLE) / cell.n
                        AS DECIMAL(18,6)), 4) AS mt,
             ROUND(CAST(CAST(g.gs - cell.s AS DOUBLE) / (g.gn - cell.n)
                        AS DECIMAL(18,6)), 4) AS mc
      FROM cell JOIN g USING (post))
    SELECT pre.seg AS segment,
           CAST(pre.n AS BIGINT) AS n_t_pre,
           CAST(post.n AS BIGINT) AS n_t_post,
           CAST(pre.mt AS DOUBLE) AS m_t_pre,
           CAST(post.mt AS DOUBLE) AS m_t_post,
           CAST(pre.mc AS DOUBLE) AS m_c_pre,
           CAST(post.mc AS DOUBLE) AS m_c_post,
           CAST((post.mt - pre.mt) - (post.mc - pre.mc) AS DOUBLE) AS did
    FROM m pre JOIN m post ON pre.seg = post.seg
    WHERE pre.post = 0 AND post.post = 1
    ORDER BY segment
    """,
    doc="Difference-in-differences on mean order value per market segment "
        "(each segment treated vs rest, pre/post 1998-01-01): R4-exact "
        "cell means and the DiD estimate.",
)
def q363(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    b = (t["orders"].join(t["customer"],
                          F.col("o_custkey") == F.col("c_custkey"))
         .select(F.col("c_mktsegment").alias("seg"),
                 F.expr("CASE WHEN o_orderdate >= DATE '1998-01-01'"
                        " THEN 1 ELSE 0 END").alias("post"),
                 F.col("o_totalprice").cast("decimal(18,6)").alias("p")))
    cell = b.groupBy("seg", "post").agg(F.count(F.lit(1)).alias("n"),
                                        F.sum("p").alias("s"))
    g = cell.groupBy("post").agg(F.sum("n").alias("gn"),
                                 F.sum("s").alias("gs"))
    m = (cell.join(F.broadcast(g), "post")
         .select("seg", "post", "n",
                 F.expr("ROUND(CAST(CAST(s AS DOUBLE) / n"
                        " AS DECIMAL(18,6)), 4)").alias("mt"),
                 F.expr("ROUND(CAST(CAST(gs - s AS DOUBLE) / (gn - n)"
                        " AS DECIMAL(18,6)), 4)").alias("mc")))
    pre = m.filter("post = 0").select(
        "seg", F.col("n").alias("n0"), F.col("mt").alias("mt0"),
        F.col("mc").alias("mc0"))
    post = m.filter("post = 1").select(
        "seg", F.col("n").alias("n1"), F.col("mt").alias("mt1"),
        F.col("mc").alias("mc1"))
    return (pre.join(post, "seg")
            .select(F.col("seg").alias("segment"),
                    F.col("n0").cast("bigint").alias("n_t_pre"),
                    F.col("n1").cast("bigint").alias("n_t_post"),
                    F.col("mt0").cast("double").alias("m_t_pre"),
                    F.col("mt1").cast("double").alias("m_t_post"),
                    F.col("mc0").cast("double").alias("m_c_pre"),
                    F.col("mc1").cast("double").alias("m_c_post"),
                    F.expr("CAST((mt1 - mt0) - (mc1 - mc0) AS DOUBLE)")
                    .alias("did"))
            .orderBy("segment"))
