"""Time-series operators over event streams: gap-filled resampling with
forward fill, and windowed conversion funnels (SURVEY.md §1.1 — time series
are event-time ordered rows handled with window functions, not a dedicated
array type).

Scale notes: both operators shuffle once on user_id (resample's grid explode
and window sort live inside that partitioning; funnel's two sides co-shuffle
on the same key). Grid density is bounded per user by span/step, so output
is O(users x span/step) regardless of raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    step: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Regularize each key's series onto a fixed grid, forward-filling gaps.

    Buckets are ``date_trunc`` periods; the per-bucket aggregate is an
    exact-decimal mean (4dp) so partial-agg order can't perturb it; the grid
    spans each key's own [min, max] bucket; fill is last-known-value
    (``last(..., ignorenulls)`` over row frame). ``is_gap`` marks filled rows.
    """
    unit = step.split()[1].rstrip("s")  # "1 day" -> day
    actual = (
        events.groupBy(
            F.col(key_col).alias("k"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.round(
                (F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
                 / F.count("*")).cast("decimal(18,6)"), 4
            ).cast("double").alias("v")
        )
    )
    grid = (
        actual.groupBy("k")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select("k", F.explode(F.expr(f"sequence(lo, hi, interval {step})")).alias("bucket"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, ["k", "bucket"], "left")
        .select(
            F.col("k").alias(key_col),
            "bucket",
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
            F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


def funnel(
    events: DataFrame,
    first_event: str = "signup",
    then_event: str = "purchase",
    within: str = "24 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-step conversion funnel: per first-event day, how many keys did
    ``first_event`` and how many of those did ``then_event`` within the
    window after their FIRST occurrence. Both sides shuffle once on the key;
    the conversion check is a semi join (no fan-out on repeat events)."""
    firsts = (
        events.filter(F.col(type_col) == first_event)
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.min(ts_col).alias("t0"))
    )
    seconds = events.filter(F.col(type_col) == then_event).select(
        F.col(key_col).alias("k2"), F.col(ts_col).alias("t1")
    )
    converted = firsts.join(
        seconds,
        (F.col("k") == F.col("k2"))
        & (F.col("t1") > F.col("t0"))
        & (F.col("t1") <= F.col("t0") + F.expr(f"INTERVAL {within}")),
        "left_semi",
    ).select("k", F.lit(1).alias("conv"))
    return (
        firsts.join(converted, "k", "left")
        .groupBy(F.date_trunc("day", "t0").alias("day"))
        .agg(
            F.count("*").alias("n_first"),
            F.count("conv").alias("n_converted"),
        )
        .orderBy("day")
    )
