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


def session_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap: str = "INTERVAL 30 MINUTE",
) -> DataFrame:
    """Within-session event-type transition counts (path analysis / Markov
    bigrams): (from_type, to_type, n) over consecutive events in the same
    session.

    The successor lookup uses the SAME window spec as sessionization
    (partition user, order ts+id) and filters out cross-session successors
    by comparing lead(session_id) — so the whole pipeline is one shuffle +
    one sort on user_id, plus the final small rollup on the type pair
    (bounded by |types|²).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    s = sessionize(events, user_col, ts_col, id_col, gap)
    t = s.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
        F.col("session_id"),
        F.lead("session_id").over(w).alias("_to_sess"),
    )
    return (
        t.filter(F.col("to_type").isNotNull()
                 & (F.col("_to_sess") == F.col("session_id")))
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .orderBy("from_type", "to_type")
    )


def sessionize_dynamic(
    events: DataFrame,
    gap_col,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-row-gap sessionization (native analog: ``F.session_window`` with
    a dynamic gap expression — q101 proves the two agree row-for-row).
    ``gap_col`` must be interval-typed (e.g. a CASE over
    ``F.expr("INTERVAL 45 MINUTE")``) — unlike ``session_window``, plain
    timestamp arithmetic does not coerce duration strings.

    Each event extends its session to ``ts + gap``; a new session starts
    when an event's ts reaches the running max of all previous extents
    (Spark merges session windows while start < end, end exclusive). Both
    windows (running max, running sum) share the sessionize partitioning,
    so the plan stays one shuffle + one sort per key.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_max_end = (
        F.max(F.col(ts_col) + gap_col)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    brk = F.when(
        prev_max_end.isNull() | (F.col(ts_col) >= prev_max_end), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("_brk", brk).withColumn(
        "session_id", F.sum("_brk").over(run)
    ).drop("_brk")


def capped_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
    cap_s: int = 14400,
) -> DataFrame:
    """Sessionize with BOTH a max-gap rule and a max-duration cap anchored
    at the session START — the semantics analytics teams actually want
    ("a session can never exceed 4 h"), and one the window closed form
    can NOT express: whether row i starts a session depends on the start
    chosen for its predecessor, a genuinely sequential recurrence.

    This is the sanctioned Pandas-UDF escape hatch (SURVEY §2.2l): one
    shuffle on the user key, then an Arrow-batched per-group pass whose
    cost is O(rows in group) with bounded memory — exactly the shape the
    built-ins can't reach but a 1000-executor cluster still parallelizes
    perfectly (the sequential dependency is per-user only). The DuckDB
    oracle expresses the same recurrence as a recursive CTE, so the
    operator is still hash-verified end to end (q179).
    """
    import pandas as pd

    out_schema = (
        f"{user_col} bigint, session_id bigint, n_events bigint, "
        "ts_start timestamp, ts_end timestamp"
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        # pin the resolution before the integer view: Arrow/pandas may hand
        # datetime64 in ns or µs depending on version, and a silent unit
        # change would rescale every gap comparison
        us = pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        gap_us, cap_us = gap_s * 1_000_000, cap_s * 1_000_000
        sid, start = 0, None
        sids = []
        prev = None
        for t in us:
            if start is None:
                start = t
            elif t - prev > gap_us or t - start > cap_us:
                sid += 1
                start = t
            sids.append(sid)
            prev = t
        pdf = pdf.assign(_sid=sids)
        g = pdf.groupby("_sid", sort=True)
        return pd.DataFrame({
            user_col: [pdf[user_col].iloc[0]] * len(g),
            "session_id": list(g.groups.keys()),
            "n_events": g.size().to_list(),
            "ts_start": g[ts_col].min().to_list(),
            "ts_end": g[ts_col].max().to_list(),
        })

    return events.select(user_col, ts_col, id_col).groupBy(
        user_col
    ).applyInPandas(assign, out_schema)
