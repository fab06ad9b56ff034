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
    assert len(os.listdir(rc.store_dir)) == 1


def test_format_version_bump_reclaims_old_entries(spark, base_path,
                                                  tmp_path):
    # entries minted under a different fingerprint recipe can never hit
    # again — a new ResultCache reclaims them deliberately instead of
    # letting them linger unaddressable until a manual vacuum (ADVICE
    # r12). v1 stored entries directly under cache_dir; other v* dirs
    # are other recipe versions.
    import pathlib

    cache = tmp_path / "rc"
    (cache / "0123abcd0123abcd0123abcd0123abcd").mkdir(parents=True)
    (cache / "0123abcd0123abcd0123abcd0123abcd" / "_SUCCESS").touch()
    (cache / "v999").mkdir()
    rc = ResultCache(spark, str(cache))
    assert rc.reclaimed == 2
    assert sorted(os.listdir(str(cache))) == [
        pathlib.Path(rc.store_dir).name]
    # the store still works end to end after reclamation
    _, hit = rc.get_or_compute(_q(spark, base_path))
    assert not hit
    _, hit = rc.get_or_compute(_q(spark, base_path))
    assert hit


# -- review regressions: fingerprint must NOT collide distinct queries -------

def test_fingerprint_distinguishes_output_alias_names(spark, base_path,
                                                      tmp_path):
    # canonicalization erases Alias names (Alias -> ""), so sum(v) AS a
    # and sum(v) AS b canonicalize identically; the fingerprint mixes the
    # output schema back in so a hit can never serve the wrong column
    # names (ADVICE r11)
    base = spark.read.parquet(base_path)
    a = base.groupBy("g").agg(F.sum("v").alias("total_a"))
    b = base.groupBy("g").agg(F.sum("v").alias("total_b"))
    assert fingerprint(a) != fingerprint(b)
    rc = ResultCache(spark, str(tmp_path / "rc"))
    rc.get_or_compute(a)
    got, hit = rc.get_or_compute(b)
    assert not hit
    assert got.columns == ["g", "total_b"]
    # same aliases rebuilt from scratch still hit
    a2 = base.groupBy("g").agg(F.sum("v").alias("total_a"))
    _, hit2 = rc.get_or_compute(a2)
    assert hit2

def test_plan_key_distinguishes_literals_resembling_expr_ids(spark):
    from inspectadb_spark.operators.result_cache import plan_key

    df = spark.createDataFrame([("issue#123", 1), ("issue#999", 2)],
                               "tag string, v int")
    a = plan_key(df.filter(F.col("tag") == "issue#123"))
    b = plan_key(df.filter(F.col("tag") == "issue#999"))
    assert a != b
    # and an '@hex' literal is not an object address
    c = plan_key(df.filter(F.col("tag") == "@deadbeef"))
    d = plan_key(df.filter(F.col("tag") == "@cafe0123"))
    assert c != d
    # while the SAME query rebuilt from scratch still hits
    assert plan_key(df.filter(F.col("tag") == "issue#123")) == a


def test_plan_key_distinguishes_self_join_attribute_identity(spark):
    from inspectadb_spark.operators.result_cache import plan_key

    t = spark.createDataFrame([(1, 10), (1, 20)], "k int, v int")
    t.createOrReplaceTempView("rc_t")
    s1 = spark.sql("SELECT t1.v AS a, t2.v AS b FROM rc_t t1 JOIN rc_t t2 "
                   "ON t1.k = t2.k ORDER BY t1.v LIMIT 1")
    s2 = spark.sql("SELECT t1.v AS a, t2.v AS b FROM rc_t t1 JOIN rc_t t2 "
                   "ON t1.k = t2.k ORDER BY t2.v LIMIT 1")
    # different answers (10,20) vs (10,10) -> must be different keys
    assert plan_key(s1) != plan_key(s2)


def test_plan_key_distinguishes_wide_projections_past_print_cutoff(spark):
    from inspectadb_spark.operators.result_cache import plan_key

    base = spark.range(5)
    wide1 = base.select(*[(F.col("id") + i).alias(f"c{i}")
                          for i in range(30)])
    wide2 = base.select(*[(F.col("id") + i).alias(f"c{i}")
                          for i in range(28)]
                        + [(F.col("id") + 99).alias("c28"),
                           (F.col("id") + 100).alias("c29")])
    assert plan_key(wide1) != plan_key(wide2)


def test_cache_invalidates_paths_with_spaces(spark, tmp_path):
    from inspectadb_spark.operators.result_cache import (
        ResultCache, input_versions,
    )

    d = tmp_path / "has space"
    src = str(d / "t.parquet")
    spark.createDataFrame([(1,)], "v int").write.parquet(src)
    df = spark.read.parquet(src).groupBy().sum("v")
    # the version vector must carry real stat results, not the -1 sentinel
    assert all(size >= 0 and mt >= 0 for _, size, mt in input_versions(df))
    cache = ResultCache(spark, str(tmp_path / "cache"))
    r1, hit1 = cache.get_or_compute(df)
    assert not hit1 and r1.first()[0] == 1
    # in-place overwrite with new bytes must MISS, not serve stale rows
    import time as _t
    _t.sleep(0.01)
    spark.createDataFrame([(5,)], "v int").write.mode("overwrite").parquet(src)
    df2 = spark.read.parquet(src).groupBy().sum("v")
    r2, hit2 = cache.get_or_compute(df2)
    assert not hit2 and r2.first()[0] == 5
