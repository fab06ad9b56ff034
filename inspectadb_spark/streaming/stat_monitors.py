"""Live twins for the round-12 statistics family (q358, q360-q363).

VERDICT r12 item 7's lesson, applied retroactively: every statistic in the
corpus should ship with its streaming face. q353 (SPRT) and q359 (XmR)
have bespoke order-dependent monitors (StreamingSprt / StreamingXmr);
the remaining five are ORDER-INDEPENDENT — their sufficient state is a
decomposable aggregate — so each is an ``IncrementalAggregate`` shape
plus a closed-form readout reproducing the batch query byte-for-byte
(S64-S68 pin it):

- q362 Hill tail index: state per key = the top-51 (value, event_id)
  order statistics as one bounded array (``StreamingTopK``) + the
  positive-row count. Top-k union-then-cut is a lossless decomposable
  merge.
- q358 split conformal: state = exact counts per (key, split, quantized
  value) — DOMAIN-sized (the 4dp quantization bounds the histogram, same
  state class as q361's value-domain tables), not stream-sized. Train
  mean, the k-th-smallest calibration residual, and test coverage are
  all exact functions of the histogram because the residual |n·v − s| is
  a per-value expression and an order statistic of a multiset is
  computable from (value → count).
- q360 Neyman allocation: state = per-stratum (n, Σcents, Σcents²) —
  the classic mergeable variance triple.
- q361 NZV screen: state = exact counts per (metric, value) — the
  query's own value-domain-sized table, maintained live.
- q363 DiD: state = the 2×2·|segments| cell table (n, Σprice).

Readouts run entirely on model/domain-sized state, so the live report
costs the same at any stream-history length — the continuous-aggregate
contract. Exactness carries the corpus conventions (DECIMAL paths, R4
quantization, integer ppm) so the drained readout hash-matches the
DuckDB-oracled batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspectadb_spark.streaming.incremental import IncrementalAggregate


# ---------------------------------------------------------------------------
# StreamingTopK: bounded per-key order-statistic state (the q362 shape)
class StreamingTopK(IncrementalAggregate):
    """Maintains, per key, the top-``k`` (value, id) pairs by
    (value DESC, id ASC) plus the row count — state is ONE row per key
    holding a <=k-element array, merged by union-then-cut (lossless for
    order statistics: the global top-k is inside the union of per-chunk
    top-ks).

    ``value_sql`` rows are pre-filtered with ``where_sql`` (q362 keeps
    value > 0). Ordering uses a (-value, id) struct sort so the whole
    merge stays in JVM built-ins (array_sort / slice / aggregate) —
    no shuffle beyond the per-key group-by, no Python in the loop.
    """

    def __init__(self, spark: SparkSession, state_dir: str, key: str,
                 value_sql: str, id_sql: str, k: int = 51,
                 where_sql: str | None = None) -> None:
        super().__init__(spark, state_dir, key_exprs={key: key},
                         measures=[("n", "count", "*")])
        self.key = key
        self.value_sql = value_sql
        self.id_sql = id_sql
        self.k = int(k)
        self.where_sql = where_sql

    def _partial(self, batch: DataFrame) -> DataFrame:
        # Cut to the per-key top-k with a rank window BEFORE collecting:
        # rank <= k is WindowGroupLimit-prunable (the top-k-per-group
        # plan this repo pins elsewhere), so no aggregation buffer ever
        # holds more than k rows per key — collect_list over the raw
        # batch would hold O(batch-per-key) rows in one buffer, the
        # exact 100 TB hazard. The count aggregate stays on the full
        # (filtered) rows and is map-side combinable.
        if self.where_sql:
            batch = batch.filter(self.where_sql)
        struct_sql = (f"named_struct('negv', -({self.value_sql}), "
                      f"'id', {self.id_sql}, "
                      f"'v', CAST({self.value_sql} AS DOUBLE))")
        w = Window.partitionBy(self.key).orderBy(
            F.expr(f"-({self.value_sql})"), F.expr(self.id_sql))
        tops = (batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= self.k)
                .groupBy(F.col(self.key))
                .agg(F.expr(f"array_sort(collect_list({struct_sql}))")
                     .alias("top")))
        counts = batch.groupBy(F.col(self.key)).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"))
        return counts.join(tops, self.key)

    def _merge_states(self, merged_in: DataFrame) -> DataFrame:
        return merged_in.groupBy(self.key).agg(
            F.sum("n").cast("bigint").alias("n"),
            F.expr(f"slice(array_sort(flatten(collect_list(top))), 1, "
                   f"{self.k})").alias("top"))

    def ranked(self) -> DataFrame | None:
        """(key, n_pos, rn, value, id): the stored order statistics,
        1-based rank by (value DESC, id ASC) — q362's rank frame."""
        t = self.table()
        if t is None:
            return None
        return t.select(
            F.col(self.key), F.col("n").alias("n_pos"),
            F.posexplode("top").alias("_pos", "_e")
        ).select(
            self.key, "n_pos",
            (F.col("_pos") + 1).cast("int").alias("rn"),
            F.col("_e.v").alias("value"), F.col("_e.id").alias("id"))


def hill_monitor(spark: SparkSession, state_dir: str,
                 key: str = "event_type") -> StreamingTopK:
    """The q362 state: top-51 positive values per type + n_pos."""
    return StreamingTopK(spark, state_dir, key=key, value_sql="value",
                         id_sql="event_id", k=51, where_sql="value > 0")


def hill_readout(mon: StreamingTopK) -> DataFrame | None:
    """q362's closed form off the live top-51 state: Hill 1/alpha as the
    mean of R4-quantized ln ratios of the top 50 to the 51st, per key
    (docstring contract of queries/stats.py::q362)."""
    r = mon.ranked()
    if r is None:
        return None
    k = mon.key
    x = r.withColumn(
        "xq", F.expr("ROUND(CAST(value AS DECIMAL(18,6)), 4)"))
    kth = x.filter("rn = 51").select(k, F.col("xq").alias("xk1"))
    terms = (x.filter("rn <= 50").join(F.broadcast(kth), k)
             .select(k, F.expr(
                 "ROUND(CAST(ln(CAST(xq AS DOUBLE) / CAST(xk1 AS DOUBLE))"
                 " AS DECIMAL(18,6)), 4)").alias("t")))
    n_pos = x.groupBy(k).agg(F.min("n_pos").alias("n"))
    return (terms.groupBy(k)
            .agg(F.sum("t").alias("s"))
            .join(F.broadcast(kth), k)
            .join(F.broadcast(n_pos), k)
            .select(k,
                    F.col("n").cast("bigint").alias("n_pos"),
                    F.col("xk1").cast("double").alias("tail_cutoff"),
                    F.expr("CAST(ROUND(CAST(CAST(s AS DOUBLE) / 50"
                           " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                    .alias("hill_inv"),
                    F.expr("CAST(ROUND(CAST(50 / CAST(s AS DOUBLE)"
                           " AS DECIMAL(18,6)), 4) AS DOUBLE)")
                    .alias("alpha"))
            .orderBy(k))


# ---------------------------------------------------------------------------
# q358 split conformal: domain-sized value histogram per (key, split)
def conformal_monitor(spark: SparkSession, state_dir: str,
                      key: str = "event_type") -> IncrementalAggregate:
    """The q358 state: exact counts per (key, split, 4dp-quantized
    value). The histogram is bounded by the quantized VALUE DOMAIN, not
    the stream length — the same state class as q361's value tables."""
    return IncrementalAggregate(
        spark, state_dir,
        key_exprs={key: key,
                   "sp": "event_id % 3",
                   "v": "ROUND(CAST(value AS DECIMAL(18,6)), 4)"},
        measures=[("cnt", "count", "*")])


def conformal_readout(state: DataFrame, key: str = "event_type") -> DataFrame:
    """q358's closed form off the (key, sp, v, cnt) histogram: train
    mean, the ceil(0.9(n_cal+1))-th smallest calibration residual
    |n_t·v − s| (an order statistic of a multiset, read from cumulative
    histogram counts), and test coverage in ppm — all division-free in
    ×n_train space, matching the batch query byte-for-byte (S65)."""
    tr = (state.filter("sp = 0").groupBy(key)
          .agg(F.sum("cnt").cast("bigint").alias("nt"),
               F.sum(F.col("v") * F.col("cnt")).alias("s")))
    with_ar = (state.join(F.broadcast(tr), key)
               .withColumn("ar", F.abs(F.col("nt") * F.col("v") - F.col("s"))))
    cal = (with_ar.filter("sp = 1").groupBy(key, "ar")
           .agg(F.sum("cnt").alias("c")))
    ksel = cal.groupBy(key).agg(F.sum("c").cast("bigint").alias("nc"))
    wc = Window.partitionBy(key).orderBy("ar") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qs = (cal.withColumn("cum", F.sum("c").over(wc))
          .join(F.broadcast(ksel), key)
          .filter(F.expr("cum - c < (9 * (nc + 1) + 9) DIV 10"
                         " AND cum >= (9 * (nc + 1) + 9) DIV 10"))
          .select(key, F.col("ar").alias("qhat_s"), "nc"))
    tst = (with_ar.filter("sp = 2")
           .join(F.broadcast(qs.select(key, "qhat_s")), key)
           .groupBy(key)
           .agg(F.sum("cnt").cast("bigint").alias("ntest"),
                F.sum(F.when(F.col("ar") <= F.col("qhat_s"),
                             F.col("cnt")).otherwise(F.lit(0)))
                .alias("cov")))
    return (tst.join(F.broadcast(tr), key)
            .join(F.broadcast(qs), key)
            .select(
                key,
                F.col("nt").cast("bigint").alias("n_train"),
                F.col("nc").cast("bigint").alias("n_cal"),
                F.col("ntest").cast("bigint").alias("n_test"),
                F.expr("CAST(ROUND(CAST(CAST(s AS DOUBLE) / nt"
                       " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("mu"),
                F.expr("CAST(ROUND(CAST(CAST(qhat_s AS DOUBLE) / nt"
                       " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("qhat"),
                F.expr("CAST(cov * 1000000 DIV ntest AS BIGINT)")
                .alias("coverage_ppm"))
            .orderBy(key))


# ---------------------------------------------------------------------------
# q360 Neyman allocation: per-stratum mergeable variance triple
def neyman_monitor(spark: SparkSession, state_dir: str) -> IncrementalAggregate:
    """The q360 state: (n, Σcents, Σcents²) per nation stratum. sum12
    (DECIMAL(38,12)) holds the exact integer sums with 26 integer
    digits, so the additive merge cannot overflow at any realistic
    scale."""
    cents = ("CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,6)) * 100)"
             " AS BIGINT)")
    return IncrementalAggregate(
        spark, state_dir,
        key_exprs={"nation": "c_nationkey"},
        measures=[("n_h", "count", "*"),
                  ("sx", "sum12", cents),
                  ("sxx", "sum12", f"CAST({cents} AS DECIMAL(38,0))"
                                   f" * ({cents})")])


def neyman_readout(state: DataFrame, budget: int = 1000) -> DataFrame:
    """q360's closed form off the stratum triple: R4 per-stratum sd,
    exact-integer N_h·S_h weights, ppm shares and the floor allocation
    of ``budget`` samples (S66 pins byte-equality with the batch)."""
    s = state.select(
        "nation", F.col("n_h").cast("bigint").alias("n_h"),
        # the sums are exact integers carried at scale 12; re-anchor to
        # scale 0 so the sd expression types match the batch query's
        F.col("sx").cast("decimal(38,0)").alias("sx"),
        F.col("sxx").cast("decimal(38,0)").alias("sxx"))
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
                    F.expr(f"CAST(w4 * {int(budget)} DIV tw AS BIGINT)")
                    .alias("alloc_n"))
            .orderBy("nation"))


# ---------------------------------------------------------------------------
# q361 NZV screen: live per-(metric, value) counts
_NZV_MELT = (
    "stack(4,"
    " 'l_quantity',"
    " CAST(ROUND(CAST(l_quantity AS DECIMAL(18,6)) * 100) AS BIGINT),"
    " 'l_discount',"
    " CAST(ROUND(CAST(l_discount AS DECIMAL(18,6)) * 100) AS BIGINT),"
    " 'l_tax',"
    " CAST(ROUND(CAST(l_tax AS DECIMAL(18,6)) * 100) AS BIGINT),"
    " 'l_linenumber', CAST(l_linenumber AS BIGINT) * 100"
    ") AS (metric, v)")


def nzv_melt(lineitem: DataFrame) -> DataFrame:
    """The q361 melt: four lineitem measures to (metric, cents-value)
    rows — apply to the stream BEFORE the monitor (stack is a per-row
    generator, fine in a streaming projection)."""
    return lineitem.selectExpr(_NZV_MELT)


def nzv_monitor(spark: SparkSession, state_dir: str) -> IncrementalAggregate:
    """The q361 state: exact counts per (metric, value) — the query's
    own value-domain-sized table, maintained live over nzv_melt rows."""
    return IncrementalAggregate(
        spark, state_dir,
        key_exprs={"metric": "metric", "v": "v"},
        measures=[("c", "count", "*")])


def nzv_readout(state: DataFrame) -> DataFrame:
    """q361's closed form off the (metric, v, c) counts: top-2 values,
    freq ratio and distinct share in exact integer ppm (S67)."""
    w = Window.partitionBy("metric").orderBy(F.desc("c"), F.asc("v"))
    r = state.withColumn("rn", F.row_number().over(w))
    agg = state.groupBy("metric").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct"))
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


# ---------------------------------------------------------------------------
# q363 difference-in-differences: live 2×2·|segments| cell table
def did_monitor(spark: SparkSession, state_dir: str) -> IncrementalAggregate:
    """The q363 state: (n, Σprice) per (segment, post) cell over the
    orders⋈customer feed. The 'sum' kind routes through DECIMAL(18,6) —
    exactly the batch query's quantization of o_totalprice."""
    return IncrementalAggregate(
        spark, state_dir,
        key_exprs={"seg": "c_mktsegment",
                   "post": "CASE WHEN o_orderdate >= DATE '1998-01-01'"
                           " THEN 1 ELSE 0 END"},
        measures=[("n", "count", "*"), ("s", "sum", "o_totalprice")])


def did_readout(state: DataFrame) -> DataFrame:
    """q363's closed form off the cell table: leave-one-out control
    cells, R4 cell means, and the DiD estimate (S68)."""
    g = state.groupBy("post").agg(F.sum("n").alias("gn"),
                                  F.sum("s").alias("gs"))
    m = (state.join(F.broadcast(g), "post")
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


__all__ = [
    "StreamingTopK", "hill_monitor", "hill_readout",
    "conformal_monitor", "conformal_readout",
    "neyman_monitor", "neyman_readout",
    "nzv_melt", "nzv_monitor", "nzv_readout",
    "did_monitor", "did_readout",
]
