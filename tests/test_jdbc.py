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
