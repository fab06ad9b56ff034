"""UDF / UDAF / UDTF surface tests (SURVEY.md §2.2l) + sources/quality units."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from inspectadb_spark.functions.udfs import (
    SplitWordsUDTF,
    mapinpandas_tokens,
    net_price_pandas,
    weighted_mean_pandas,
    zscore_normalize,
)
from tests.conftest import SF_DIR


def test_scalar_pandas_udf_matches_builtin(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(500)
    got = li.select(
        F.round(net_price_pandas("l_extendedprice", "l_discount"), 6).alias("u"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("b"),
    )
    assert got.filter(F.col("u") != F.col("b")).count() == 0


def test_grouped_agg_pandas_udf(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0)], ["k", "v", "w"]
    )
    rows = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean_pandas("v", "w").alias("wm")).collect()
    }
    assert math.isclose(rows["a"], (1 * 1 + 3 * 3) / 4)  # 2.5
    assert math.isclose(rows["b"], 10.0)


def test_apply_in_pandas_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], ["k", "v"]
    )
    out = zscore_normalize(df, "k", "v").collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append(r["zscore"])
    assert sorted(by_k["a"]) == [-1.0, 1.0]
    assert by_k["b"] == [0.0, 0.0]  # zero variance -> 0, not NaN


def test_udtf_split_words(spark):
    if SplitWordsUDTF is None:
        pytest.skip("udtf not available")
    spark.udtf.register("split_words", SplitWordsUDTF)
    rows = spark.sql("SELECT * FROM split_words('x y z')").collect()
    assert [(r["word"], r["pos"]) for r in rows] == [("x", 0), ("y", 1), ("z", 2)]


def test_mapinpandas_tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    got = mapinpandas_tokens(docs).groupBy().count().first()[0]
    want = docs.select(F.explode(F.split("text", " "))).count()
    assert got == want


# -- sources ------------------------------------------------------------------

def test_jdbc_source_option_assembly():
    from inspectadb_spark.sources.jdbc import JdbcSnapshotSource

    src = JdbcSnapshotSource(
        url="jdbc:postgresql://h:5432/db", table="orders",
        partition_column="o_orderkey", lower_bound=0, upper_bound=1000,
        num_partitions=4,
    )
    opts = src.reader_options()
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "4"
    with pytest.raises(ValueError):
        JdbcSnapshotSource(url="http://x", table="t").reader_options()
    with pytest.raises(ValueError):
        JdbcSnapshotSource(
            url="jdbc:postgresql://h/db", table="t", partition_column="k"
        ).reader_options()


def test_read_with_drift_additive_column(spark, tmp_path):
    from inspectadb_spark.sources.files import read_with_drift

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, "x")], ["id", "v"]).write.parquet(a)
    spark.createDataFrame([(2, "y", 9.5)], ["id", "v", "extra"]).write.parquet(b)
    target = spark.createDataFrame([], "id bigint, v string, extra double").schema
    out = read_with_drift(spark, [a, b], target).orderBy("id").collect()
    assert [tuple(r) for r in out] == [(1, "x", None), (2, "y", 9.5)]


# -- quality ------------------------------------------------------------------

def test_profile_and_nullrate(spark):
    from inspectadb_spark.operators.quality import null_rate_violations, profile

    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, None), (None, "b")], "k int, v string"
    )
    p = {r["column"]: r for r in profile(df).collect()}
    assert p["k"]["n"] == 4 and p["k"]["n_null"] == 1 and p["k"]["n_distinct"] == 3
    assert p["v"]["n_null"] == 2 and p["v"]["min_str"] == "a"
    viol = null_rate_violations(df, {"k": 0.5, "v": 0.25}).collect()
    assert [v["column"] for v in viol] == ["v"]


# --------------------------------------------------------------------------
def test_observe_dq_counters_ride_the_job(spark):
    """df.observe counts bad rows inline — no second scan of the source."""
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.quality import with_dq_observation
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    checked, obs = with_dq_observation(
        orders,
        checks={
            "n_rows": F.count(F.lit(1)),
            "null_cust": F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
            "neg_price": F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)),
        },
    )
    # one action drives both the business result and the DQ counters
    n_f = checked.filter("o_orderstatus = 'F'").count()
    m = obs.get
    assert m["n_rows"] == orders.count()
    assert m["null_cust"] == 0
    assert m["neg_price"] == 0
    assert 0 < n_f < m["n_rows"]


# -- Python DataSource API (sources/pydatasource.py) -------------------------

def test_python_datasource_batch_partitioned_and_deterministic(spark):
    from inspectadb_spark.sources.pydatasource import register

    register(spark)
    df = (spark.read.format("synthetic_events")
          .options(rows="500", partitions="8").load())
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value"]
    assert df.rdd.getNumPartitions() == 8
    rows1 = sorted(map(tuple, df.collect()))
    rows2 = sorted(map(tuple, (
        spark.read.format("synthetic_events")
        .options(rows="500", partitions="3").load()).collect()))
    assert len(rows1) == 500
    assert rows1 == rows2            # partitioning-invariant generation
    assert len({r[0] for r in rows1}) == 500


def test_python_datasource_stream_replays_batch_exactly(spark, tmp_path):
    import time

    from inspectadb_spark.sources.pydatasource import register

    register(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .options(rows="300", batch_rows="120").load()
        .writeStream.format("memory").queryName("pyds")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("pyds").count() >= 300:
            break
        time.sleep(1)
    q.stop()
    got = sorted(map(tuple, spark.table("pyds").collect()))
    want = sorted(map(tuple, (
        spark.read.format("synthetic_events").options(rows="300").load()
    ).collect()))
    assert got == want
