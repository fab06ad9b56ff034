"""Gap-based sessionization (SURVEY.md §2.3 Q48; streaming analog §2.2k S4).

Classic two-window formulation: flag rows whose gap to the previous event
exceeds the threshold, then a running sum of flags yields the session index.
Both windows share one partitioning (user) and ordering (ts, id), so Spark
plans a single shuffle + single sort — the plan a hand-built engine would
pick. At 100 TB the shuffle is on user_id (high cardinality, low skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "INTERVAL 30 MINUTE",
) -> DataFrame:
    """Assign a per-user ``session_id`` (0-based) using a max-gap rule."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > F.expr(gap), 1
    ).otherwise(0)
    return events.withColumn("_brk", brk).withColumn(
        "session_id", F.sum("_brk").over(run)
    ).drop("_brk")
