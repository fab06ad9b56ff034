"""Plan audits (SURVEY.md §4): assert the physical strategies we rely on at
scale actually fire — broadcasts for dims, pushdown into parquet, top-k
specializations, zero-exchange bucketed joins, skew helpers' correctness.

These tests pin plan SHAPES, not timings, so they are stable in CI while
still failing loudly if a code change silently adds a shuffle or drops a
pushdown.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectadb_spark.operators.scale import (
    bucketed_write,
    count_exchanges,
    explain_str,
    salted_join,
    two_level_agg,
)
from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def _plan(spark, qname, mode="formatted"):
    return explain_str(REGISTRY[qname].builder(spark, SF_DIR), mode)


def test_star_join_broadcasts_dims(spark):
    # q06: customer/orders/lineitem chain with supplier+nation dims — the
    # dims must come in as broadcast joins, not shuffles.
    plan = _plan(spark, "q06_star_join")
    assert "BroadcastHashJoin" in plan


def test_q15_scan_prunes_and_pushes(spark):
    plan = _plan(spark, "q15_pricing_summary")
    # filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns are absent from the read schema
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_partkey" not in read_schema and "l_comment" not in read_schema


def test_topk_specializations(spark):
    # global ORDER BY + LIMIT -> TakeOrderedAndProject (no total sort)
    assert "TakeOrderedAndProject" in _plan(spark, "q04_regex_topk")
    # rank-filter pattern -> WindowGroupLimit pushdown (Spark >= 3.5)
    assert "WindowGroupLimit" in _plan(spark, "q31_topk_per_group")


def test_semi_anti_join_rewrites(spark):
    assert "LeftSemi" in _plan(spark, "q09_semi_join")
    assert "LeftAnti" in _plan(spark, "q10_anti_join")


def test_exchange_budget_of_headline_queries(spark):
    # pin the shuffle counts of the bench queries: a regression that adds an
    # exchange to these is a 100 TB performance bug, not a style issue.
    budgets = {
        "q15_pricing_summary": 2,   # partial/final agg + sort
        "q48_sessionize": 2,        # window shuffle + final sort
        "q17_multi_distinct": 3,    # distinct expand + merge + sort
    }
    for q, budget in budgets.items():
        n = count_exchanges(REGISTRY[q].builder(spark, SF_DIR))
        assert n <= budget, f"{q}: {n} exchanges (budget {budget})"


# -- skew helpers: correctness ------------------------------------------------

def test_salted_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(orders, customer, "o_custkey", salt=4).groupBy(
        "c_mktsegment"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_level_agg_equals_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    two = two_level_agg(
        li, ["l_returnflag"],
        {"n": "count(l_orderkey)", "mn": "min(l_quantity)", "mx": "max(l_quantity)"},
        salt=4,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))


# -- bucketing: co-located join needs no exchange -----------------------------

def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/bktdb'"
    )
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        bucketed_write(orders, "bktdb.o_b", "o_orderkey", 4, sort_col="o_orderkey")
        bucketed_write(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bktdb.l_b", "o_orderkey", 4, sort_col="o_orderkey",
        )
        # force SMJ: at test scale the planner would broadcast instead (also
        # fine, but it's the bucketed zero-shuffle path we're pinning here)
        joined = (
            spark.table("bktdb.o_b")
            .hint("merge")
            .join(spark.table("bktdb.l_b"), "o_orderkey")
        )
        assert count_exchanges(joined) == 0, explain_str(joined, "simple")
        # and it still returns the right number of rows
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


# -- adapted TPC-H: the multi-join composites keep their shuffle budgets ------

def test_tpch_shuffle_budgets(spark):
    # Budgets measured on the intended plan (dims broadcast, single shuffle
    # per fact agg/join chain). A regression adding an exchange here is a
    # 100 TB bug: at 1000 executors each extra shuffle is a full re-spray of
    # the lineitem fact.
    budgets = {
        "tpch_q03": 1,   # agg only; top-10 via TakeOrderedAndProject
        "tpch_q05": 2,   # fact join + agg
        "tpch_q08": 2,   # fact join + per-year agg
        "tpch_q09": 2,
        "tpch_q10": 1,
        "tpch_q18": 1,   # HAVING-agg reused; no re-shuffle after join
        # r13: per-order distinct counts are windows on ONE lok exchange
        # (was 4: ord_lines re-joined across two distinct-count passes)
        "tpch_q21": 2,
        # r13: availqty + 1997 qty fused into one pair-grain aggregate over
        # the part-prefix-semi-filtered lineitem scan (was: 2 lineitem
        # scans + a pair-grain SMJ between the two aggregates)
        "tpch_q20": 3,
    }
    # r13: q20/q21 each read the lineitem fact exactly ONCE (q20's two
    # same-grain aggregates are fused; q21's per-order counts are windows,
    # not a groupBy branch joined back)
    for q in ("tpch_q20", "tpch_q21"):
        plan = _plan(spark, q, "simple")
        n = plan.count("lineitem")
        # r14 (ADVICE r13): == 1, not <= 1 — if a plan-format drift makes
        # 'lineitem' stop appearing in scan nodes the pin must fail
        # loudly, not pass vacuously at n=0 and stop guarding anything
        assert n == 1, f"{q}: lineitem scanned {n} times (expected exactly 1)"
    for q, budget in budgets.items():
        n = count_exchanges(REGISTRY[q].builder(spark, SF_DIR))
        assert n <= budget, f"{q}: {n} exchanges (budget {budget})"


def test_tpch_topk_and_broadcasts(spark):
    for q in ("tpch_q03", "tpch_q10", "tpch_q18"):
        assert "TakeOrderedAndProject" in _plan(spark, q), q
    for q in ("tpch_q05", "tpch_q07", "tpch_q08", "tpch_q09"):
        assert "BroadcastHashJoin" in _plan(spark, q), q


# -- training-pipeline / time-series queries: shuffle budgets ----------------

def test_extension_family_shuffle_budgets(spark):
    budgets = {
        "q64_chunking": 0,        # pure partition-local explode
        "q66_repetition": 0,      # per-doc expressions only
        "q67_bigrams": 1,         # one count agg (+TakeOrdered, no sort shuffle)
        "q69_label_centroids": 1, # one (label,dim) agg
        "q69b_centroid_outliers": 2,
        "q70_resample_ffill": 2,  # bucket agg + grid/window co-partition
        "q73_zscore_anomalies": 2,
        "q65b_stratified_quota": 1,
        "q63_tfidf_topk": 4,
        "q71_funnel": 4,
        "q76_redact": 0,          # pure regexp scan
        "q80_time_weighted_avg": 1,  # window; agg reuses its partitioning
        "q77_corpus_freq_score": 2,  # vocab agg + doc agg (freq broadcast)
        "q75_decontam_ngrams": 3,    # gram distinct + doc agg + bench bcast
        "q78_retention_cohorts": 5,  # per-user agg + 2 week rollups + bcast + sort
        "q81_sequence_funnel": 4,    # stage aggs co-partition on the key
        "q82_session_transitions": 3,  # one user shuffle + pair rollup + sort
        "q83_training_shards": 2,     # one agg + sort, hash is scan-side
        "q84_sketch_distinct_rollup": 3,  # daily sketch + union + sort
        "q85_daily_value_bands": 2,   # percentile agg + sort
        "q79_token_budget_selection": 5,  # q77 base + tiny boundary window
        "q86_type_affinity": 7,       # no user-level join; branches reuse at runtime
        "q89_stat_moments": 2,        # one moment agg + sort
        "q89b_regression": 2,         # one regr_* agg + sort
        "q90_bit_bool_aggs": 2,       # median forces full agg, still one
        "q90b_listagg": 3,            # distinct + ordered concat + sort
        "q91_window_values": 1,       # one user-window sort
        "q92_posexplode": 0,          # generator is pipeline-local
        "q93_ewma": 1,                # all k lags share ONE window sort
        "q94_cms_estimates": 3,       # grid agg + probe distinct + final min
        "q95_recursive_reachability": 2,  # tiny edge relation + recursion-local joins
        "q96_percentile_within_group": 2,  # ordered-set agg + sort
        "q97_chunk_dedup": 2,         # hash-keeper agg + per-doc agg (h co-partition)
        "q98_table_diff": 3,          # latest-wins window + hash-only outer join
        "q99_table_checksum": 2,      # one bucket agg + sort; words are scan-side
        "q100_histogram": 2,          # one bin agg + sort
        "q101_dynamic_sessions": 2,   # session merge + final sort
        # r13: was 2 (one row-level <=> join + agg reuse) shuffling ~600M
        # joined rows; now 3 exchanges but each moves a ~6-row key-domain
        # aggregate (per-side count + tiny join), never fact rows
        "q102_null_safe_join": 3,
        "q103_group_by_all": 2,       # one agg + sort
    }
    for q, budget in budgets.items():
        n = count_exchanges(REGISTRY[q].builder(spark, SF_DIR))
        assert n <= budget, f"{q}: {n} exchanges (budget {budget})"


# -- AQE: runtime re-plan of SMJ -> broadcast from true sizes ----------------

def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """With static broadcast disabled, AQE must still broadcast the join
    side it discovers to be small at runtime — the mechanism we rely on at
    100 TB where pre-computed stats for filtered dims don't exist."""
    conf = spark.conf
    old = {
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
    }
    had_adaptive_thresh = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # static: no BHJ
        # runtime threshold must be set independently — it FALLS BACK to the
        # static one (here -1) when unset, which would disable AQE broadcast too
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        # static plan: no broadcast anywhere
        assert "BroadcastHashJoin" not in explain_str(j, "simple")
        j.collect()  # run -> AQE observes the tiny filtered side
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final, final
    finally:
        for k, v in old.items():
            conf.set(k, v)
        if had_adaptive_thresh is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", had_adaptive_thresh)


# -- Runtime Bloom-filter join pruning (row-level runtime filtering) ---------

def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """A selective dim filter must inject a Bloom filter into the fact scan
    (`might_contain` over a `bloom_filter_agg` subquery) so a shuffle join
    ships only candidate rows. Spark's size thresholds (creation side
    <=10MB, application scan >=10GB) are sized for clusters and never fire
    at test SF, so we lower them to reproduce the 100 TB size *ratio*; the
    engine leaves the defaults alone at runtime."""
    conf = spark.conf
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join: worst case
    }
    old = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderstatus = 'P'"
        )
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
               .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("qty")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # the filter must sit on the fact (lineitem) scan side, pre-shuffle
        probe_side = plan.split("might_contain")[1]
        assert "l_orderkey" in plan.split("might_contain")[1].split("\n")[0]
        # and results are unchanged by the injected filter
        rows = {r["o_orderstatus"]: float(r["qty"]) for r in j.collect()}
        # restore before the baseline run; unset confs that had no prior value
        # (set(k, "") would be rejected for bytes-typed thresholds)
        for k in keys:
            if old[k] is None:
                conf.unset(k)
            else:
                conf.set(k, old[k])
        base = (li.join(o, li.l_orderkey == o.o_orderkey)
                  .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("qty")))
        assert {r["o_orderstatus"]: float(r["qty"]) for r in base.collect()} == rows
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_round3_retrieval_plan_shapes(spark):
    """Plan pins for the round-3 retrieval ops: broadcasts where designed,
    bounded exchange counts, top-k specialization."""
    # q120 BM25: (term, df) and corpus stats must broadcast; top-k must be
    # TakeOrderedAndProject, never a global sort.
    plan = _plan(spark, "q120_bm25_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # q121 CDC chunking: both windows and the chunk agg must share ONE
    # pre-aggregation shuffle on doc_id (+1 for the final order by).
    n = count_exchanges(REGISTRY["q121_cdc_chunking"].builder(spark, SF_DIR))
    assert n <= 3, f"q121: {n} exchanges"
    # q122 RRF: fusion adds at most the union-agg shuffle + final top-k on
    # top of the two upstream rankers.
    plan = _plan(spark, "q122_hybrid_rrf")
    assert "TakeOrderedAndProject" in plan


def test_tpch_derived_partsupp_plan_shapes(spark):
    # Q2: dims (supplier x nation x region, then part) broadcast; the only
    # large shuffles are the partsupp derivation agg + window min.
    plan = _plan(spark, "tpch_q02")
    assert "BroadcastHashJoin" in plan
    # Q20: the supplier filter must be a semi join (decorrelated IN).
    assert "LeftSemi" in _plan(spark, "tpch_q20")


def test_round4_plan_shapes(spark):
    """Plan pins for the round-4 operators."""
    # q126/q126b rebalance: the docs-side join against the S-row threshold
    # frame must be a broadcast (no shuffle of the data itself).
    for q in ("q126_mixture_rebalance", "q126b_weighted_rebalance"):
        assert "BroadcastHashJoin" in _plan(spark, q), q
    # q127 concurrency: the raw boundary stream shuffles once on the bucket
    # key; the only single-partition window runs over AGGREGATED per-bucket
    # rows. Exchange budget: bucket window + agg reuse + carry scan + final
    # sort, all on tiny frames beyond the first.
    n = count_exchanges(
        REGISTRY["q127_session_concurrency"].builder(spark, SF_DIR)
    )
    assert n <= 5, f"q127: {n} exchanges"
    # q128 nearest: ONE shuffle on the key feeds both window frames (same
    # sort), plus the final order-by.
    n = count_exchanges(REGISTRY["q128_nearest_click"].builder(spark, SF_DIR))
    assert n <= 3, f"q128: {n} exchanges"
    # q43g: candidates come from an equi-join on the block key — never a
    # cartesian/broadcast-nested-loop.
    plan = _plan(spark, "q43g_blocked_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # q129 boilerplate: per-source doc counts broadcast back.
    assert "BroadcastHashJoin" in _plan(spark, "q129_boilerplate")


def test_round4b_text_op_plan_shapes(spark):
    """Plan pins for q131–q133 (span dup / unigram LM / novelty)."""
    # q131 dup spans: the span stream joins the duplicate-set agg on the
    # SAME md5 key it was aggregated on — co-partitioned, so the whole
    # query is span shuffle + (reused) join + per-doc agg + order by.
    n = count_exchanges(REGISTRY["q131_dup_spans"].builder(spark, SF_DIR))
    assert n <= 4, f"q131: {n} exchanges"
    # q132 unigram LM: vocabulary and corpus-total joins must broadcast —
    # the token stream itself is never shuffled for the join.
    plan = _plan(spark, "q132_unigram_logprob")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # q133 novelty: gram stream + first-seen agg join on the gram key;
    # same co-partition shape as q131.
    n = count_exchanges(REGISTRY["q133_ngram_novelty"].builder(spark, SF_DIR))
    assert n <= 4, f"q133: {n} exchanges"


def test_q134_divergence_plan_shape(spark):
    # q134: vocabulary + corpus-total joins broadcast onto the (group, token)
    # aggregate; the corpus-sized explode+shuffle must run ONCE. The static
    # plan shows 4 copies of that subtree (the branches are only equal after
    # canonicalization), so pin the RUNTIME plan: AQE's stage reuse collapses
    # them to one live exchange + ReusedExchange markers.
    plan = _plan(spark, "q134_source_divergence")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    df = REGISTRY["q134_source_divergence"].builder(spark, SF_DIR)
    df.collect()
    final = explain_str(df, "simple").split("Initial Plan")[0]
    assert "ReusedExchange" in final, "AQE did not reuse the (group,tok) stage"
    live = [ln for ln in final.splitlines()
            if "Exchange" in ln and "BroadcastExchange" not in ln
            and "Reused" not in ln]
    corpus_sized = [ln for ln in live if "source#" in ln and "tok#" in ln]
    assert len(corpus_sized) == 1, f"corpus shuffle not reused: {corpus_sized}"


def test_round4c_linkage_and_layout_plan_shapes(spark):
    """Plan pins for q142–q149 (linkage, layout, LM, covariance)."""
    # q142 fuzzy join: candidates come from an equi-join on the block key —
    # never a cartesian; levenshtein runs post-join (JVM, no Python).
    plan = _plan(spark, "q142_fuzzy_join")
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
    # q144 pagerank: every per-iteration join is against a node-table-sized
    # frame — broadcasts, not fact shuffles.
    assert "BroadcastHashJoin" in _plan(spark, "q144_pagerank")
    # q146 z-order layout: Morton key is pure projection — the whole audit
    # is ONE aggregation shuffle + the final sort.
    from inspectadb_spark.queries.registry import REGISTRY as _R

    n = count_exchanges(_R["q146_zorder_layout"].builder(spark, SF_DIR))
    assert n <= 2, f"q146: {n} exchanges"
    # q147 bigram LM: all three count-table joins broadcast; the token/pair
    # streams are never shuffled for the joins.
    assert "BroadcastHashJoin" in _plan(spark, "q147_bigram_logprob")
    # q149 covariance: chained explodes are pipelined — the only exchanges
    # are the (i, j) agg and the final order-by.
    n = count_exchanges(_R["q149_embedding_covariance"].builder(spark, SF_DIR))
    assert n <= 2, f"q149: {n} exchanges"


def test_cluster_by_zorder_single_range_exchange(spark):
    from inspectadb_spark.operators.scale import cluster_by_zorder

    df = spark.range(1000).selectExpr("id % 256 AS x", "(id * 7) % 256 AS y")
    out = cluster_by_zorder(df, "x", "y", bits=8, num_partitions=8)
    assert count_exchanges(out) == 1  # exactly the one range shuffle
    plan = explain_str(out, "simple")
    assert "rangepartitioning" in plan.lower()


def test_round4d_plan_shapes(spark):
    """Plan pins for q154–q168 additions."""
    # top-k queries must specialize to TakeOrderedAndProject, never a
    # global sort.
    for q in ("q154_copurchase_pairs", "q157_weighted_sample",
              "q159_inverted_index"):
        assert "TakeOrderedAndProject" in _plan(spark, q), q
    # q163 multi-touch: user-equi join first — no cartesian anywhere.
    assert "CartesianProduct" not in _plan(spark, "q163_linear_attribution")
    # q167 HHI: per-nation totals and the nation dim broadcast back.
    assert "BroadcastHashJoin" in _plan(spark, "q167_hhi")
    # q162 RLE: both windows + rollup share ONE user-keyed exchange
    # (+ the final order-by).
    from inspectadb_spark.queries.registry import REGISTRY as _R

    n = count_exchanges(_R["q162_rle_compress"].builder(spark, SF_DIR))
    assert n <= 2, f"q162: {n} exchanges"


def test_round4e_eval_stats_plan_shapes(spark):
    """Plan pins for q185–q189 (evaluation stats + sketch overlap)."""
    # q185/q186: the per-type window runs over DISTINCT-value aggregates —
    # the raw event stream shuffles into counts first, and totals come back
    # as broadcasts, never a second data-sized shuffle.
    assert "BroadcastHashJoin" in _plan(spark, "q185_auc")
    assert "BroadcastHashJoin" in _plan(spark, "q186_ks_drift")
    # q187: the 64-replica expansion is an explode (map-side, pre-shuffle) —
    # no cartesian; replica means aggregate with map-side combine.
    p187 = _plan(spark, "q187_poisson_bootstrap")
    assert "CartesianProduct" not in p187
    assert "Generate explode" in p187 or "Generate" in p187
    # q188: Heaps'-law vocab joins broadcast; top-k specializes.
    p188 = _plan(spark, "q188_pmi_collocations")
    assert "BroadcastHashJoin" in p188
    assert "TakeOrderedAndProject" in p188
    # q188: min_count filters the bigram stream BEFORE the vocab joins.
    assert "CartesianProduct" not in p188


def test_round4f_survival_training_plan_shapes(spark):
    """Plan pins for q190–q196 (survival/CI/splits/tokenizer/PCA)."""
    # q190: durations aggregate per user before the KM window — the window
    # input is the grouped stream, and totals come from window frames, not
    # an extra data shuffle.
    assert "CartesianProduct" not in _plan(spark, "q190_kaplan_meier")
    # q191/q196: one map-side-combinable aggregate, no joins at all.
    for q in ("q191_wilson_ci", "q196_calibration_bins"):
        p = _plan(spark, q)
        assert "Join" not in p, q
    # q192: fold assignment is scan-side (no shuffle before the per-user
    # agg); the 1-row totals frame comes back as a broadcast (conditionless
    # join → BroadcastNestedLoopJoin against the literal-small side).
    p192 = _plan(spark, "q192_group_kfold")
    assert "BroadcastNestedLoopJoin" in p192 or "BroadcastHashJoin" in p192
    # q193: the query batch is the broadcast side; the corpus never
    # shuffles before the winner aggregate.
    p193 = _plan(spark, "q193_hard_negatives")
    assert "BroadcastNestedLoopJoin" in p193 or "BroadcastHashJoin" in p193
    assert "CartesianProduct" not in p193
    # q195: projection is scan-side — the output plan has no exchange at
    # all beyond the final orderBy sort.
    from inspectadb_spark.operators.scale import count_exchanges
    from inspectadb_spark.queries.registry import REGISTRY as _R

    n = count_exchanges(
        _R["q195_pca_project"].builder(spark, SF_DIR).drop("pc1"))
    assert n <= 1, f"q195: {n} exchanges"


def test_round4d_frequency_family_plan_shapes(spark):
    """q198/q201/q202/q203/q204: broadcast-only joins on the small sides,
    no cartesian products except the deliberate broadcast pattern/batch
    sides, and bounded exchange budgets."""
    # q198: candidates + total are broadcast; the verify join must be a
    # broadcast semi-join (never a shuffled join on the token domain)
    plan = _plan(spark, "q198_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan

    # q201: pattern list broadcast; corpus never shuffles (the only
    # exchange is the final presentation sort)
    plan = _plan(spark, "q201_blocklist")
    assert "BroadcastNestedLoopJoin" in plan
    n = count_exchanges(REGISTRY["q201_blocklist"].builder(spark, SF_DIR))
    assert n <= 1, f"q201: {n} exchanges"

    # q202/q203: the mining/query side is broadcast against the corpus
    # scan; neighborhood ranking is windows over candidate pairs only
    for q in ("q202_margin_bitext", "q203_matryoshka_recall"):
        plan = _plan(spark, q)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q

    # q204: every join keys on doc ids / shingles — no nested loop, no
    # cartesian; candidate-restricted throughout
    plan = _plan(spark, "q204_minhash_calibration")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_round4e_analytics_plan_shapes(spark):
    """q208-q217: no cartesian products; the binned interval join is an
    equi-join on the cell key; q214 contains a PARTITIONED window for the
    within-bucket rank (the global-window single-task sort must not come
    back); q216 broadcasts the item-count sides."""
    for q in ("q208_session_pressure", "q209_dow_seasonality",
              "q210_ltv_curves", "q211_reconciliation",
              "q213_seasonal_backtest", "q214_lorenz_deciles",
              "q215_weighted_median", "q216_association_rules",
              "q217_dau_wau"):
        plan = _plan(spark, q)
        assert "CartesianProduct" not in plan, q

    # q208: containment is a post-filter on an equi-join, never the join
    # condition of a nested loop over the fact side
    plan = _plan(spark, "q208_session_pressure")
    assert "BroadcastNestedLoopJoin" not in plan

    # q214: the rank window is partitioned by the rank bucket
    plan = _plan(spark, "q214_lorenz_deciles")
    assert "_bkt" in plan

    assert "BroadcastHashJoin" in _plan(spark, "q216_association_rules")


def test_audit_queries_scan_each_table_once(spark):
    """r13 optimization pin: the q240/q245 audits collapse each base table
    to its key domain with ONE groupBy(key).count() scan per (case, side)
    and fold every statistic from a single joined frame — the plan must
    never regress to the 2-3 scans per case the branched form planned
    (count pass + distinct pass + join pass). Bound = one scan per
    (case, side); exchange reuse may dedup repeated (table, key) pairs
    below it at some SFs."""
    plan240 = _plan(spark, "q240_inclusion_audit", "simple")
    # 9 cases x (child + parent): was 3 child scans/case before r13
    assert plan240.count("Scan parquet") <= 18, plan240
    plan245 = _plan(spark, "q245_join_cardinality_audit", "simple")
    # 5 edges x 2 sides: was 2 scans per side before r13
    assert plan245.count("Scan parquet") <= 10, plan245
    # the q245 key-domain full-outer join must reuse the groupBys' hash
    # partitioning — SortMergeJoin with no exchange of its own
    assert "SortMergeJoin" in plan245


def test_round4g_inspection_and_serving_plan_shapes(spark):
    """q237-q250: the round-4-final families keep their scale shapes —
    no cartesian products anywhere (one-row stat crossJoins are
    BroadcastNestedLoop over single-row sides, never CartesianProduct);
    q243's top-k is TakeOrdered; q246's running high-watermark windows are
    partitioned by the bucket key (no global single-task sort); q250's
    threshold sweep joins broadcast."""
    for q in ("q237_keep_best_dedup", "q238_zipf_fit",
              "q240_inclusion_audit", "q241_fd_audit",
              "q242_candidate_keys", "q243_sequence_patterns",
              "q245_join_cardinality_audit", "q246_disorder_profile",
              "q247_golden_record", "q248_cdc_to_summary",
              "q249_mixture_temperature", "q250_dedup_threshold_sweep"):
        assert "CartesianProduct" not in _plan(spark, q), q

    assert "TakeOrderedAndProject" in _plan(spark, "q243_sequence_patterns")
    plan246 = _plan(spark, "q246_disorder_profile")
    # r8 multiplexed-arrival form: the row-level window partitions by the
    # (day, user) group keys; only the (day, user)-grain carry table sees
    # an unpartitioned window (window-lint inventory)
    assert "_day" in plan246 and "_hwm_in" in plan246
    assert "BroadcastHashJoin" in _plan(spark, "q250_dedup_threshold_sweep")
    # q239/q248: the served plan scans the summary parquet, not the fact
    # table (also pinned in test_mv; repeated here with the other shapes)
    assert "inspectadb_mv_" in _plan(spark, "q239_mv_rewrite")


def test_q336_join_is_exchange_free_smj(spark):
    """The q336 oracled row rides the bucketed layout: the SortMergeJoin
    itself must need no Exchange (both sides pre-bucketed on o_orderkey);
    the only exchanges in the full plan are the group-by and the final
    presentation sort."""
    plan = _plan(spark, "q336_bucketed_join")
    assert "SortMergeJoin" in plan
    df = REGISTRY["q336_bucketed_join"].builder(spark, SF_DIR)
    # agg shuffle + orderBy range shuffle only — zero for the join
    assert count_exchanges(df) <= 2, explain_str(df, "simple")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: one shuffle partition carrying ~98% of the
    probe side must be SPLIT at runtime (`SortMergeJoin(skew=true)` +
    an `AQEShuffleRead` with skewed partitions) instead of serializing the
    whole key on one task — the mechanism that, with salting (q141) as the
    static fallback, keeps hot-key joins from stalling a 1000-executor
    stage. Spark's 256 MB skew threshold never fires at test scale, so the
    thresholds are lowered to reproduce the 100 TB size *ratio*; the engine
    leaves the defaults alone at runtime."""
    conf = spark.conf
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # the hot partition's SHUFFLE bytes (compressed; k is constant and
        # payload sequential, so lz4 shrinks it well under the raw ~3 MB)
        # must exceed the threshold or the split never triggers
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        # force a shuffle join: the skewed side is the big one and the other
        # side must NOT be broadcast or there is nothing to split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        # deterministic hot key: 98% of 200k rows land on k=0
        big = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(0))
            .otherwise((F.col("id") % 7) + 1).alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        j = big.join(dim, "k").groupBy("w").count()
        out = {r["w"]: r["count"] for r in j.collect()}
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in final, final
        assert "skewed" in final, final  # the AQEShuffleRead split reader
        # exact join cardinality: the split must not duplicate or drop rows
        assert out[0] == 196_000
        assert sum(out.values()) == 200_000
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_aqe_rebalance_splits_skewed_write(spark, tmp_path):
    """Output-file skew — the WRITER-side twin of the skew join: a
    repartition(key) write funnels a 98%-hot key into one giant file (one
    task at 100 TB writes almost the whole dataset), while the REBALANCE
    hint lets AQE split the oversized shuffle partition
    (`REBALANCE_PARTITIONS_BY_COL` + `AQEShuffleRead ... skewed`) into
    advisory-sized even files. Thresholds lowered to reproduce the size
    ratio at test SF, as in the skew-join pin."""
    import glob
    import os

    conf = spark.conf
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled":
            "true",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        big = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 98, F.lit(0))
            .otherwise((F.col("id") % 7) + 1).alias("k"),
            F.col("id").alias("payload"))

        base_dir = str(tmp_path / "plain")
        big.repartition("k").write.mode("overwrite").parquet(base_dir)
        base = sorted(os.path.getsize(p)
                      for p in glob.glob(f"{base_dir}/*.parquet"))

        rb = big.hint("rebalance", "k")
        opt_dir = str(tmp_path / "rebalanced")
        rb.write.mode("overwrite").parquet(opt_dir)
        opt = sorted(os.path.getsize(p)
                     for p in glob.glob(f"{opt_dir}/*.parquet"))

        # the hot partition was split: more, smaller, even files
        assert len(opt) > len(base)
        assert opt[-1] < base[-1] / 2
        # same rows either way
        assert (spark.read.parquet(opt_dir).count()
                == spark.read.parquet(base_dir).count() == 200_000)

        rb.collect()
        final = rb._jdf.queryExecution().executedPlan().toString()
        assert "REBALANCE_PARTITIONS_BY_COL" in final, final
        assert "skewed" in final, final  # the AQE split reader fired
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


# -- Dynamic partition pruning: dim filter prunes fact PARTITIONS at runtime --

def test_dynamic_partition_pruning_prunes_fact_scan(spark, tmp_path):
    """A star join keyed on the fact table's PARTITION column must push the
    dim-side predicate into the fact scan as a runtime partition filter
    (`dynamicpruning` subquery reusing the join's broadcast) — the
    partition-level complement of the runtime Bloom pin above, and at
    100 TB the single biggest scan-reduction lever a date-partitioned
    fact layout buys: scanning the quarter the dim filter names instead
    of the whole table. Proven twice: the plan string carries the
    dynamicpruning partition filter, and the executed scan's own
    numPartitions metric (post-pruning) counts exactly the months the dim
    filter selects, not the months on disk."""
    import os

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    fact_dir = str(tmp_path / "orders_by_month")
    (o.withColumn("od_month", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("od_month").mode("overwrite").parquet(fact_dir))
    months_on_disk = [d.split("=", 1)[1] for d in os.listdir(fact_dir)
                      if d.startswith("od_month=")]

    # a proper dim TABLE (month -> quarter attributes); the query filters
    # on the ATTRIBUTE, so the fact's partition values are only knowable
    # at runtime through the join — static pruning cannot fire
    dim = spark.createDataFrame(
        [(m, m[:4], (int(m[5:]) - 1) // 3 + 1) for m in months_on_disk],
        "od_month string, yr string, qtr int")
    target = sorted(m for m in months_on_disk
                    if m.startswith("1995") and int(m[5:]) <= 3)

    # broadcast(dim) pins the build side: at test SF the fact is tiny
    # enough that Spark would otherwise broadcast IT, which inverts the
    # join and makes DPP moot; at 100 TB the fact side is never the small
    # one, so the hint reproduces the production shape
    fact = spark.read.parquet(fact_dir)
    j = (fact.join(F.broadcast(dim), "od_month")
         .filter("yr = '1995' AND qtr = 1")
         .groupBy("od_month").agg(F.count(F.lit(1)).alias("n")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan

    rows = {r.od_month: r.n for r in j.collect()}
    assert sorted(rows) == target
    # ground truth from a static path filter, no join involved
    for m in target:
        assert rows[m] == spark.read.parquet(
            f"{fact_dir}/od_month={m}").count()

    def scan_metric(df, name):
        def walk(n):
            # AQE wraps the result, and materialized stages hide their
            # subtree: descend through both, not children()
            if "AdaptiveSparkPlan" in n.nodeName():
                return walk(n.finalPhysicalPlan())
            if "QueryStage" in n.nodeName():
                return walk(n.plan())
            if "Scan parquet" in n.nodeName():
                m = n.metrics()
                if m.contains(name):
                    return m.apply(name).value()
            cs = n.children()
            for i in range(cs.length()):
                got = walk(cs.apply(i))
                if got is not None:
                    return got
            return None
        return walk(df._jdf.queryExecution().executedPlan())

    # executed fact scan read ONLY the dim-selected months: 3 of the
    # months on disk (the scan also reports the static total it avoided)
    assert scan_metric(j, "numPartitions") == len(target) < len(months_on_disk)
    assert scan_metric(j, "staticFilesNum") == len(months_on_disk)


# -- Dynamic partition overwrite: backfill replaces ONLY the touched months --

def test_dynamic_partition_overwrite_replaces_only_touched_partitions(
        spark, tmp_path):
    """Incremental backfill at 100 TB: re-processing one month must replace
    exactly that month's directory, not truncate the table (static
    overwrite) and not append duplicates. `partitionOverwriteMode=dynamic`
    scopes the overwrite to the partitions PRESENT IN THE BATCH; proven by
    file mtimes (untouched months keep their files) and row counts (the
    touched month is replaced, not doubled)."""
    import os

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    fact_dir = str(tmp_path / "orders_by_month")
    with_month = o.withColumn("od_month",
                              F.date_format("o_orderdate", "yyyy-MM"))
    with_month.write.partitionBy("od_month").mode("overwrite").parquet(
        fact_dir)
    months = sorted(d for d in os.listdir(fact_dir)
                    if d.startswith("od_month="))
    target = months[0].split("=", 1)[1]
    before_rows = spark.read.parquet(fact_dir).count()
    target_rows = spark.read.parquet(fact_dir).filter(
        F.col("od_month") == target).count()
    stamp = {d: sorted(os.listdir(f"{fact_dir}/{d}")) for d in months}

    conf = spark.conf
    old = conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # backfill: the target month re-derived (here: same rows, so the
        # replace must be an exact no-op on counts)
        batch = with_month.filter(F.col("od_month") == target)
        batch.write.partitionBy("od_month").mode("overwrite").parquet(
            fact_dir)
    finally:
        if old is None:
            conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            conf.set("spark.sql.sources.partitionOverwriteMode", old)

    after = spark.read.parquet(fact_dir)
    # nothing truncated, nothing duplicated
    assert after.count() == before_rows
    assert after.filter(F.col("od_month") == target).count() == target_rows
    # untouched months kept their exact files; the target got new ones
    for d in months:
        files = sorted(os.listdir(f"{fact_dir}/{d}"))
        if d == f"od_month={target}":
            assert files != stamp[d]
        else:
            assert files == stamp[d], d


# -- AQE partition coalescing: tiny shuffle partitions merge at runtime ------

def test_aqe_coalesces_small_shuffle_partitions(spark):
    """The inverse of the skew split: a shuffle sized for the BIG stage
    (here 64 partitions) produces hundreds of near-empty tasks when the
    data after filtering/aggregation is small — at 1000 executors that is
    pure scheduling overhead (task launch >> work). AQE's
    coalescePartitions must merge them to the advisory size at runtime:
    the executed plan shows `AQEShuffleRead coalesced` and the
    post-shuffle stage runs FAR fewer tasks than the static 64."""
    conf = spark.conf
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
        "spark.sql.shuffle.partitions": "64",
    }
    old = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        agg = li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"))
        rows = agg.collect()
        assert len(rows) >= 3  # the data survived
        final = agg._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in final
        assert "coalesced" in final, final
        # the merged read is drastically narrower than the static plan:
        # tiny post-agg data under a 64MB advisory size collapses to ~1
        assert agg.rdd.getNumPartitions() < 64 / 4
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_bucketed_append_preserves_colocated_join(spark, tmp_path):
    """The bucketed layout is only worth its write cost if INGEST can
    continue into it: appending with the same bucketBy/sortBy spec must
    keep the join exchange-free (each append adds one file per bucket;
    Spark plans per-bucket reads across all files of a bucket). A
    mismatched append would either error or silently degrade to a
    shuffle — this pins the zero-exchange plan AND row totality across
    an append."""
    from inspectadb_spark.operators.scale import bucketed_write

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktapp LOCATION '{tmp_path}/bktapp'")
    try:
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
            .withColumnRenamed("l_orderkey", "o_orderkey")
        first = o.filter("o_orderkey % 2 = 0")
        second = o.filter("o_orderkey % 2 = 1")
        bucketed_write(first, "bktapp.o_b", "o_orderkey", 4,
                       sort_col="o_orderkey")
        bucketed_write(li, "bktapp.l_b", "o_orderkey", 4,
                       sort_col="o_orderkey")
        (second.write.format("parquet").mode("append")
         .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
         .saveAsTable("bktapp.o_b"))
        j = (spark.table("bktapp.o_b").hint("merge")
             .join(spark.table("bktapp.l_b"), "o_orderkey"))
        assert count_exchanges(j) == 0, explain_str(j, "simple")
        assert j.count() == li.count()
        # both halves really are in the table (the append landed)
        assert spark.table("bktapp.o_b").count() == o.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktapp CASCADE")


def test_filtered_pq_serving_keeps_partition_pruning(spark, tmp_path):
    """Scale guard for the r12 filtered-ANN work: adding the allowed-id
    semi join to the persisted IVF-PQ serve must NOT defeat the probed-
    cells partition filter — the executed code-lists scan still reads
    exactly n_probe of the cell directories. A regression here silently
    turns "read 2 cells" into "read the whole index" at 100 TB."""
    import os as _os

    from inspectadb_spark.operators.similarity import (
        _probe_cells, ivf_pq_topk_from_index, kmeans_fit,
        load_ivf_centroids, pq_fit, save_ivf_pq_index,
    )
    from tests.conftest import SF_DIR

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cents, _ = kmeans_fit(e, k=6, iters=1)
    books = pq_fit(e, m=8, ks=16, iters=2, sample=400)
    idx = str(tmp_path / "ivfpq")
    save_ivf_pq_index(e, cents, books, idx)
    allowed = d.filter(F.col("lang") == "en").select("doc_id")

    served = ivf_pq_topk_from_index(spark, idx, 
                                    [float(x) for x in
                                     e.filter("vec_id = 11")
                                     .first()["embedding"]],
                                    k=5, n_probe=2, allowed=allowed)
    served.collect()

    def pq_scan_metric(df, name):
        def walk(n):
            nm = n.nodeName()
            if "AdaptiveSparkPlan" in nm:
                return walk(n.finalPhysicalPlan())
            if "QueryStage" in nm:
                return walk(n.plan())
            # identify the code-lists scan by its _vnorm output attribute
            # (the Location path truncates in toString under deep tmp dirs)
            if "Scan parquet" in nm and "_vnorm" in n.toString():
                m = n.metrics()
                if m.contains(name):
                    return m.apply(name).value()
            cs = n.children()
            for i in range(cs.length()):
                got = walk(cs.apply(i))
                if got is not None:
                    return got
            return None
        return walk(df._jdf.queryExecution().executedPlan())

    probe = _probe_cells(load_ivf_centroids(spark, idx),
                         [float(x) for x in
                          e.filter("vec_id = 11").first()["embedding"]], 2)
    n_cells = len([x for x in _os.listdir(f"{idx}/pq_lists")
                   if x.startswith("_cell=")])
    got = pq_scan_metric(served, "numPartitions")
    assert got == len(probe) < n_cells, (got, len(probe), n_cells)
