"""Result cache (operators/result_cache.py): hit/miss addressing, silent
invalidation on input change (the CDC-apply composition), session-stable
fingerprints, and the plan pin that a hit never touches the base table.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from inspectadb_spark.operators.result_cache import (
    ResultCache,
    fingerprint,
    plan_key,
)


@pytest.fixture()
def base_path(spark, tmp_path):
    p = str(tmp_path / "fact")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") * 3).alias("v")).write.parquet(p)
    return p


def _q(spark, path):
    return (spark.read.parquet(path).groupBy("g")
            .agg(F.sum("v").alias("sv"), F.count("*").alias("n")))


def test_hit_after_miss_same_values(spark, base_path, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    r1, hit1 = rc.get_or_compute(_q(spark, base_path))
    r2, hit2 = rc.get_or_compute(_q(spark, base_path))
    assert not hit1 and hit2
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(r1) == rows(r2) == rows(_q(spark, base_path))


def test_hit_plan_scans_cache_not_base(spark, base_path, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    rc.get_or_compute(_q(spark, base_path))
    r, hit = rc.get_or_compute(_q(spark, base_path))
    assert hit
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "rc" in plan and "fact" not in plan


def test_input_change_invalidates_silently(spark, base_path, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    _, h0 = rc.get_or_compute(_q(spark, base_path))
    assert not h0
    # CDC-style rewrite: overwrite the table with one changed row
    time.sleep(0.01)  # ensure mtime moves even on coarse clocks
    upd = spark.read.parquet(base_path).withColumn(
        "v", F.when(F.col("id") == 0, 999).otherwise(F.col("v")))
    upd.write.mode("overwrite").parquet(str(tmp_path / "fact2"))
    # emulate in-place table swap
    import shutil

    shutil.rmtree(base_path)
    shutil.move(str(tmp_path / "fact2"), base_path)
    r, hit = rc.get_or_compute(_q(spark, base_path))
    assert not hit, "rotated input files must invalidate the cache entry"
    got = {row["g"]: row["sv"] for row in r.collect()}
    assert got[0] == sum(i * 3 for i in range(7, 100, 7)) + 999


def test_different_query_different_entry(spark, base_path, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    rc.get_or_compute(_q(spark, base_path))
    other = (spark.read.parquet(base_path).groupBy("g")
             .agg(F.max("v").alias("mv")))
    _, hit = rc.get_or_compute(other)
    assert not hit


def test_plan_key_stable_across_alias_ids(spark, base_path):
    # two independently-built identical queries get different expression
    # ids; the canonicalized key and fingerprint must still agree
    a, b = _q(spark, base_path), _q(spark, base_path)
    assert plan_key(a) == plan_key(b)
    assert fingerprint(a) == fingerprint(b)


def test_vacuum_only_causes_misses(spark, base_path, tmp_path):
    rc = ResultCache(spark, str(tmp_path / "rc"))
    rc.get_or_compute(_q(spark, base_path))
    assert rc.vacuum() == 1
    r, hit = rc.get_or_compute(_q(spark, base_path))
    assert not hit
    assert r.count() == 7
    assert len(os.listdir(rc.cache_dir)) == 1
