"""Custom sources via Spark 4's Python DataSource API (SURVEY.md §2.2a
extensibility: the public seam for ingesting systems Spark has no built-in
connector for — the pure-Python analog of a DSv2 connector).

``SyntheticEventsDataSource`` is a deterministic generator in the shape of
the corpus ``events`` table. It exists to prove the full surface:

- ``schema()`` declares the contract (no inference pass);
- ``reader().partitions()`` splits the scan into independent input
  partitions, so the read parallelizes across executors exactly like a
  file scan — generation happens where the partition is scheduled, the
  driver only ships (start, end) bounds;
- ``simpleStreamReader()`` exposes the same rows as an offset-tracked
  micro-batch stream (initialOffset -> read(start) -> next offset), the
  minimal custom streaming source contract (the full ``streamReader``
  adds partition-level splits; the simple variant is the documented
  entry point when per-batch planning fits on one node).

Determinism: every value derives from md5(event_id) arithmetic — any
partitioning, engine restart, or replay yields byte-identical rows, which
is what makes the source usable in the oracle/replay test harness.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,  # noqa: F401  (re-export for discoverability)
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH_START = 1_700_000_000  # 2023-11-14 22:13:20 UTC, arbitrary fixed origin


def _row(event_id: int):
    import datetime as dt

    h = hashlib.md5(f"synth:{event_id}".encode()).hexdigest()
    user_id = int(h[:4], 16) % 1000
    etype = _TYPES[int(h[4:6], 16) % len(_TYPES)]
    value = round(int(h[6:12], 16) % 50_000 / 100.0, 2)
    ts = dt.datetime.utcfromtimestamp(_EPOCH_START + event_id * 7)
    return (event_id, ts, user_id, etype, value)


_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampNTZType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _Range(i * step, min((i + 1) * step, self.n_rows))
            for i in range(self.n_parts)
            if i * step < self.n_rows
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for eid in range(partition.start, partition.end):
            yield _row(eid)


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next event_id to emit; each micro-batch advances by
    ``batch_rows``. Offsets are plain dicts, checkpoint-serializable, and
    ``read(start)`` is pure — replaying a batch after failure regenerates
    identical rows (exactly-once via deterministic re-read)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("rows", 1000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter([_row(e) for e in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(e) for e in range(start["next"], end["next"])])


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
