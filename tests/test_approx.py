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
