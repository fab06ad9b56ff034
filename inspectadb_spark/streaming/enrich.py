"""Streaming as-of enrichment — the stream-side analog of the batch as-of
join (operators/asof.py, SURVEY.md §2.2c Q13): attach to each event the
latest dimension row with ``dim_ts <= event_ts`` (same keys).

The scalable formulation avoids stream-side state entirely: the versioned
dimension is converted ONCE (batch side) into SCD2-style validity intervals
``[valid_from, valid_to)`` with a single ``lead()`` window, after which each
event matches EXACTLY ONE version and the enrichment is a stateless
stream–static join — no watermark-bounded join state, no per-event
aggregation, exactly-once for free, and the dim side broadcasts (typical
dimensions) or bucket-joins (huge ones). A stream–stream interval join +
max_by per event would carry O(stream x horizon) state to compute the same
answer.

At 100 TB-equivalents: the interval build is one shuffle of the DIMENSION
(small); the event stream itself never shuffles. For slowly-changing dims
refreshed between micro-batches, rebuild the interval frame per trigger via
``foreachBatch`` — the operator composes unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_validity_intervals(
    dim: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Versioned dimension rows -> SCD2 validity intervals per key:
    ``(_asof_from, _asof_to)`` half-open, ``_asof_to`` NULL for the current
    version. One window, one shuffle on the key."""
    on = list(on)
    w = Window.partitionBy(*on).orderBy(ts_col)
    return dim.select(
        *[F.col(k).alias(f"_asof_k_{k}") for k in on],
        F.col(ts_col).alias("_asof_from"),
        F.lead(ts_col).over(w).alias("_asof_to"),
        *[F.col(c) for c in payload_cols],
    )


def asof_enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    event_ts: str,
    dim_ts: str,
    payload_cols: Sequence[str],
    inclusive: bool = True,
    watermark: str | None = None,
) -> DataFrame:
    """Enrich a (possibly streaming) event frame with the latest ``dim`` row
    at or before each event's ``event_ts`` (strictly before when
    ``inclusive=False``). Events with no prior dim version keep NULL
    payloads — identical semantics to ``operators.asof.asof_join`` with the
    dimension as the left side.

    ``watermark`` (e.g. "1 hour") is applied to the stream's ``event_ts``
    when given — not needed by this stateless join itself, but it bounds
    state for any stateful operator composed downstream.
    """
    on = list(on)
    payload_cols = list(payload_cols)
    if watermark is not None:
        stream = stream.withWatermark(event_ts, watermark)
    iv = dim_validity_intervals(dim, on, dim_ts, payload_cols)
    ev = F.col(event_ts)
    lo = (F.col("_asof_from") <= ev) if inclusive else (F.col("_asof_from") < ev)
    hi = F.col("_asof_to").isNull() | (
        (ev < F.col("_asof_to")) if inclusive else (ev <= F.col("_asof_to"))
    )
    cond = lo & hi
    for k in on:
        cond = cond & (stream[k] == iv[f"_asof_k_{k}"])
    return stream.join(iv, cond, "left").drop(
        *[f"_asof_k_{k}" for k in on], "_asof_from", "_asof_to"
    )
