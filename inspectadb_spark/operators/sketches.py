"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark
built-ins) — the continuous-aggregate pattern for COUNT(DISTINCT) at 100 TB
(SURVEY.md §2.2d approx class; composes with q59's hierarchical rollup).

Exact distinct counts cannot be rolled up (daily distincts don't sum to
weekly distincts), so a scale pipeline stores a per-bucket SKETCH instead:
sketches are order-insensitive and mergeable, so any coarser tier — weekly,
monthly, all-time, or ad-hoc bucket unions — comes from merging the stored
binaries, never from rescanning raw events. Estimate error is the standard
HLL bound (~1.04/sqrt(2^lgK)); tests pin 5% against exact and, critically,
rollup-merge ≡ direct-sketch (lossless merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct_by(
    df: DataFrame,
    bucket_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketch of ``value_col`` (binary, storable/mergeable) +
    its point estimate. One aggregation, map-side combinable."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))).alias("estimate"),
    )


def merge_sketches(
    sketches: DataFrame,
    bucket_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll stored sketches up to a coarser bucketing — touches only the
    sketch binaries (bytes per bucket), never the raw rows."""
    return sketches.groupBy(*bucket_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col)).alias("estimate"),
        F.hll_union_agg(sketch_col).alias("sketch"),
    )
