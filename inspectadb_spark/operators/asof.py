"""As-of (time-travel) join — SURVEY.md §2.2c Q13.

Spark has no native ASOF JOIN; the scalable formulation is the union-merge:
tag both sides, union, and carry the latest left payload forward with a
``last(ignorenulls)`` running window. One shuffle on the key, one sort on
(ts, side, id) — O(n log n) total, no range-join blowup, no per-key collect.
This is the plan a native as-of operator would execute anyway.

At 100 TB: partition by key (high-cardinality user/instrument ids), optionally
pre-bucket both inputs on the key so the union avoids a shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each ``right`` row, attach the payload of the latest ``left`` row
    with ``left_ts <= right_ts`` (same ``on`` keys). ``inclusive=False`` makes
    the match strict (``<``).

    Returns all ``right`` columns plus ``payload_cols`` (NULL when no prior
    left row exists).
    """
    on = list(on)
    payload_cols = list(payload_cols)
    # side marker orders left rows before right rows at equal timestamps for
    # inclusive matches, after them for strict matches.
    left_side = 0 if inclusive else 1
    right_side = 1 - left_side

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        "*",
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        *[F.lit(None).alias(f"_p_{c}") for c in payload_cols],
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    keep_right = [c for c in right.columns]
    return carried.filter(F.col("_side") == right_side).select(*keep_right, *payload_cols)
