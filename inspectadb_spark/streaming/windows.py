"""Windowed streaming aggregations + streaming dedup.

Watermarks bound state: with delay d, window state older than
max_event_time - d is evicted and late rows beyond d are dropped (S1 test
asserts via StreamingQueryProgress.stateOperators). At 100 TB equivalents
(high-velocity streams), state lives in the executor-local state store
(RocksDB on clusters) keyed by (window, group keys) — key cardinality, not
stream volume, bounds memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inspectadb_spark.queries.registry import dec


def _with_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    return df.withWatermark(ts_col, delay) if delay else df


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Fixed-bucket count+sum per (window start, key). Batch analog: Q49."""
    df = _with_watermark(events, ts_col, watermark)
    # Group by the FULL window struct: it carries the event-time metadata that
    # makes the agg watermark-aware (late-input drop + state eviction). Keying
    # on window.start alone silently degrades to an unbounded-state agg.
    return (
        df.groupBy(F.window(ts_col, window), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(dec(value_col))).cast("double").alias("sv"),
        )
        .select(F.col("window.start").alias("w"), key_col, "n", "sv")
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping-bucket count+sum. Batch analog: Q50."""
    df = _with_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(dec(value_col))).cast("double").alias("sv"),
        )
        .select(F.col("window.start").alias("wstart"), key_col, "n", "sv")
    )


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key: count + [start, end) where end is
    last event + gap. Batch analog: Q48 (end_ts = session_end - gap)."""
    df = _with_watermark(events, ts_col, watermark)
    sw = F.session_window(ts_col, gap)
    return df.groupBy(F.col(key_col), sw).agg(F.count("*").alias("n")).select(
        key_col,
        F.col("session_window.start").alias("start_ts"),
        F.col("session_window.end").alias("end_gap"),
        "n",
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
    within_watermark: bool = False,
) -> DataFrame:
    """Exactly-once-ish re-delivery tolerance: drop duplicate keys within the
    watermark horizon (state = seen keys, GC'd by the watermark).

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark`` (Spark
    ≥3.5): keys match even when the duplicates carry DIFFERENT event times
    (e.g. a producer re-send stamped at arrival), as long as they fall
    inside the watermark delay of first sight — the right semantics for
    at-least-once sources whose retries re-stamp the record."""
    df = _with_watermark(events, ts_col, watermark)
    if within_watermark:
        if not watermark:
            raise ValueError("within_watermark dedup requires a watermark")
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
