"""Class-A approximate operators (SURVEY.md §2.1): sketches and sampling are
engine-specific, so they are verified against exact recomputation with
tolerances — never hash-matched across engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_count_distinct_within_5pct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select(F.count_distinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.05


def test_percentile_approx_brackets_exact(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select(F.percentile("value", 0.5).alias("m")).first()["m"]
    approx = ev.select(
        F.percentile_approx("value", 0.5, 10_000).alias("m")
    ).first()["m"]
    # t-digest-style sketch at high accuracy: within 1% of the exact median
    assert abs(approx - exact) <= max(1e-9, 0.01 * abs(exact))


def test_sample_is_seeded_deterministic_and_sized(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    s1 = o.sample(fraction=0.2, seed=7).select("o_orderkey").collect()
    s2 = o.sample(fraction=0.2, seed=7).select("o_orderkey").collect()
    assert s1 == s2  # same seed -> same sample (per engine)
    n = o.count()
    k = len(s1)
    # Bernoulli sample: expect 0.2n within generous binomial bounds
    assert 0.1 * n <= k <= 0.3 * n


def test_tablesample_sql(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    o.createOrReplaceTempView("_orders_sample")
    n = spark.sql(
        "SELECT COUNT(*) FROM _orders_sample TABLESAMPLE (20 PERCENT) REPEATABLE (7)"
    ).first()[0]
    total = o.count()
    assert 0.1 * total <= n <= 0.3 * total


# --------------------------------------------------------------------------
# Mergeable HLL sketches: rollup-merge must equal direct sketching, and both
# must track exact distincts within the HLL error bound.

def test_hll_sketch_rollup_merge_equals_direct(spark):
    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.operators.sketches import merge_sketches, sketch_distinct_by
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR).select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        "user_id",
    )
    daily = sketch_distinct_by(ev, ["week", "day"], "user_id")
    # rollup: weekly estimate from stored daily sketches, no raw rescan
    weekly_rolled = {r.week: r.estimate for r in
                     merge_sketches(daily, ["week"]).collect()}
    # direct: sketch the raw rows at weekly grain
    weekly_direct = {r.week: r.estimate for r in
                     sketch_distinct_by(ev, ["week"], "user_id").collect()}
    assert weekly_rolled == weekly_direct  # merge is lossless
    exact = {r.week: r.n for r in
             ev.groupBy("week").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    for wk, est in weekly_rolled.items():
        assert abs(est - exact[wk]) / exact[wk] < 0.05, (wk, est, exact[wk])


def test_hll_sketch_is_order_insensitive(spark):
    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.operators.sketches import sketch_distinct_by
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR).select("event_type", "user_id")
    a = {r.event_type: r.estimate for r in
         sketch_distinct_by(ev, ["event_type"], "user_id").collect()}
    b = {r.event_type: r.estimate for r in
         sketch_distinct_by(ev.repartition(17), ["event_type"],
                            "user_id").collect()}
    assert a == b
