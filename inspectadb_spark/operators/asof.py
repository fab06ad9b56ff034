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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each ``right`` row, attach the payload of the matching ``left``
    row: the latest with ``left_ts <= right_ts`` (``direction="backward"``,
    default) or the earliest with ``left_ts >= right_ts``
    (``direction="forward"``). ``inclusive=False`` makes the match strict.
    ``tolerance_us`` bounds the match distance in exact microseconds —
    beyond it the payload is NULL (pandas ``merge_asof(tolerance=...)``
    semantics; applied post-match, so it equals "no match within
    tolerance").

    Returns all ``right`` columns plus ``payload_cols`` (NULL when no
    matching left row exists). Same union-merge scale shape in both
    directions: one shuffle on the key, one in-partition sort.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    on = list(on)
    payload_cols = list(payload_cols)
    # Side markers order left rows so that at EQUAL timestamps the left row
    # is inside the carry window iff the match is inclusive:
    #   backward carries over (unbounded preceding → current row),
    #   forward over (current row → unbounded following).
    if direction == "backward":
        left_side = 0 if inclusive else 1
    else:
        left_side = 1 if inclusive else 0
    right_side = 1 - left_side

    carry = list(payload_cols)
    if tolerance_us is not None:
        carry.append("_match_ts")  # the matched row's own ts, for distance

    def _lcol(c):
        return F.col(left_ts) if c == "_match_ts" else F.col(c)

    # ONE struct per left row, not one column per payload: the struct is
    # non-null for every left row even when its payload FIELDS are null,
    # so last/first(ignorenulls) always carries the whole matching row
    # atomically — per-column carries would replace a NULL payload value
    # in the matching row with the value of an older/farther row (and,
    # with tolerance, could smuggle in a payload from outside it).
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.struct(*[_lcol(c).alias(c) for c in carry]).alias("_pl"),
    )
    r_tagged = right.select(
        "*",
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    base = Window.partitionBy(*on).orderBy("_ts", "_side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        picked = F.last("_pl", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        picked = F.first("_pl", ignorenulls=True).over(w)

    carried = merged.select(
        "*", *[picked.getField(c).alias(c) for c in carry]
    )
    if tolerance_us is not None:
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        if direction == "backward":
            dist = us(F.col("_ts")) - us(F.col("_match_ts"))
        else:
            dist = us(F.col("_match_ts")) - us(F.col("_ts"))
        carried = carried.select(
            *[c for c in carried.columns if c not in payload_cols],
            *[
                F.when(dist <= tolerance_us, F.col(c)).alias(c)
                for c in payload_cols
            ],
        )
    keep_right = [c for c in right.columns]
    return carried.filter(F.col("_side") == right_side).select(*keep_right, *payload_cols)


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of generalized to NEAREST-in-time: for each ``right`` row, attach
    the payload of the ``left`` row minimizing ``|left_ts - right_ts|``
    (same keys; ties break toward the EARLIER left row, matching the
    convention of pandas ``merge_asof(direction='nearest')``).
    ``tiebreak`` names a payload column used as the final sort key so that
    equal-timestamp left rows pick deterministically.

    Same union-merge scale shape as ``asof_join`` — one shuffle on the key,
    one sort on (ts, side): the previous candidate is carried forward with
    ``last(ignorenulls)`` and the next candidate backward with
    ``first(ignorenulls)`` over the SAME sort, then a pure-integer
    microsecond comparison picks the winner. No range join, no per-key
    collect, O(n log n).

    Left rows at the right row's exact timestamp count as "previous"
    (distance 0, wins every tie). All payload columns travel in ONE
    struct per left row (non-null iff the row is a left row), so the
    carried match is atomic even when individual payload VALUES are null
    — per-column ignorenulls carries would mix fields from different
    left rows whenever the nearest row holds a null.
    """
    on = list(on)
    payload_cols = list(payload_cols)
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(left_ts).alias("_lts"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_pl"),
    )
    r_tagged = right.select(
        "*",
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_lts"),
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    order_cols = [F.col("_ts"), F.col("_side")]
    if tiebreak is not None:
        # null for right rows; same-(ts, side) rows are all one side, so
        # this only orders equal-timestamp LEFT rows deterministically
        order_cols.append(F.col("_pl").getField(tiebreak))
    base = Window.partitionBy(*on).orderBy(*order_cols)
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    prev_ts = F.last("_lts", ignorenulls=True).over(w_prev)
    next_ts = F.first("_lts", ignorenulls=True).over(w_next)

    def _us(c):  # NTZ-safe exact microseconds (session tz is pinned UTC)
        return F.unix_micros(c.cast("timestamp"))

    d_prev = _us(F.col("_ts")) - _us(prev_ts)
    d_next = _us(next_ts) - _us(F.col("_ts"))
    use_prev = next_ts.isNull() | (prev_ts.isNotNull() & (d_prev <= d_next))
    chosen = F.when(
        use_prev, F.last("_pl", ignorenulls=True).over(w_prev)
    ).otherwise(F.first("_pl", ignorenulls=True).over(w_next))
    picked = merged.select(
        "*", *[chosen.getField(c).alias(c) for c in payload_cols],
    )
    keep_right = [c for c in right.columns]
    return picked.filter(F.col("_side") == 1).select(*keep_right, *payload_cols)
