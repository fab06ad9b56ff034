"""Pareto skyline (maximal-vector) operator — SURVEY.md §2.2m round 4.

``skyline_2d`` computes the 2-D Pareto frontier (minimize one column,
maximize the other) with the sort-scan formulation instead of the naive
O(n²) dominance join: over DISTINCT (min_col, max_col) pairs sorted by
(min_col ASC, max_col DESC), a pair is dominated iff the running max of
``max_col`` over strictly-preceding rows reaches it — every preceding row
has min_col ≤ current (ties sort larger max first), so a preceding ≥ max
implies a dominator, and conversely. Equal-value duplicates are resolved
by computing the frontier on distinct pairs and semi-joining the full
input back (conventional skyline keeps all copies of a frontier point).

Cost: one distinct + ONE sort + one window + one semi join — no pairwise
comparison. The window is a single global ordering; at 100 TB pre-filter
with a coarse grid (only cells on the grid's own staircase frontier can
contain skyline points — a scan-side filter that drops ~all of the data)
before the exact pass; the q158 oracle (brute-force NOT EXISTS dominance)
independently specifies the semantics the optimization must preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ↓, maximize ↑)."""
    pairs = df.select(minimize, maximize).distinct()
    w = (
        Window.orderBy(F.col(minimize).asc(), F.col(maximize).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        pairs.withColumn("_runmax", F.max(maximize).over(w))
        .filter(F.col("_runmax").isNull() | (F.col("_runmax") < F.col(maximize)))
        .select(minimize, maximize)
    )
    return df.join(frontier, [minimize, maximize], "left_semi")
