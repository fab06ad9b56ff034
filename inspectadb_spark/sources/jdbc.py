"""JDBC snapshot source — CDC bootstrap interface (SURVEY.md §2.2a M7).

A CDC pipeline's initial load is a parallel snapshot of the OLTP table; the
change stream then takes over from the snapshot's consistent point. ``load``
performs option assembly and validation and hands off to ``spark.read.jdbc``.
The fetch path itself is integration-tested against embedded Derby (the one
JDBC engine whose driver ships inside the Spark distribution) in
tests/test_jdbc.py — partitioned parallel reads included; production targets
(Postgres/MySQL) differ only in url/driver strings.

Scale contract: ALWAYS partition the read (``partition_column`` +
bounds + ``num_partitions``) — an unpartitioned JDBC read is a single task
pulling the whole table through one connection. Bounds should come from a
cheap ``SELECT min(pk), max(pk)`` against the source, not from a guess.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSnapshotSource:
    url: str                      # jdbc:postgresql://host:5432/db etc.
    table: str                    # table name or "(subquery) alias"
    partition_column: str | None = None  # numeric/date PK for parallel fetch
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000
    driver: str | None = None     # JDBC driver class; None = DriverManager lookup

    def reader_options(self) -> dict[str, str]:
        """The validated option dict handed to ``spark.read.jdbc``."""
        if not self.url.startswith("jdbc:"):
            raise ValueError(f"not a jdbc url: {self.url!r}")
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
        }
        if self.driver is not None:
            opts["driver"] = self.driver
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound"
                )
            if self.lower_bound >= self.upper_bound:
                raise ValueError("lower_bound must be < upper_bound")
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def load(self, spark: SparkSession) -> DataFrame:
        """Build the JDBC scan (requires a driver jar on the classpath)."""
        return spark.read.format("jdbc").options(**self.reader_options()).load()
