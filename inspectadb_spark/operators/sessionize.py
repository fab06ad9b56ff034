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
    shuffle on the user key, then an Arrow-batched pass whose cost is
    O(rows) with bounded memory — exactly the shape the built-ins can't
    reach but a 1000-executor cluster still parallelizes perfectly (the
    sequential dependency is per-user only). The DuckDB oracle expresses
    the same recurrence as a recursive CTE, so the operator is still
    hash-verified end to end (q179).

    r13 shape (guide §4): the old ``groupBy(user).applyInPandas`` paid a
    pandas frame build + ``sort_values`` + a row-at-a-time Python loop +
    a pandas groupby PER USER (~15 ms x 1.5k users = 23 s at sf0.1 for
    100k rows). Now the rows are hash-repartitioned on the user key and
    Tungsten-sorted (user, ts, id) in the JVM, and ONE mapInPandas pass
    per partition assigns sessions for every user in an Arrow batch
    vectorized: gap breaks are an array compare, and the cap recurrence
    — the only sequential part — advances by ``searchsorted`` jumps, one
    iteration per EMITTED SESSION rather than per row. Users split
    across Arrow batch boundaries are carried over (rows of a
    partition's current last user are held back until the next batch
    confirms the user is complete), so the recurrence never sees a
    truncated user. Result columns, dtypes and values are identical
    (q179 oracle MATCH re-proved at sf0.001/0.01/0.1).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{user_col} bigint, session_id bigint, n_events bigint, "
        "ts_start timestamp, ts_end timestamp"
    )
    gap_us, cap_us = gap_s * 1_000_000, cap_s * 1_000_000

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows: >= 1 COMPLETE users, already sorted (user, ts, id).
        # pin the resolution before the integer view: Arrow/pandas may
        # hand datetime64 in ns or µs depending on version, and a silent
        # unit change would rescale every gap comparison
        us = (pdf[ts_col].astype("datetime64[ns]").astype("int64")
              // 1000).to_numpy()
        users = pdf[user_col].to_numpy()
        n = len(us)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        # gap breaks depend only on consecutive deltas WITHIN a user
        # (the recurrence's `t - prev > gap` term), so they segment the
        # stream independently of where sessions start
        gap_brk = new_user.copy()
        gap_brk[1:] |= (us[1:] - us[:-1]) > gap_us
        run_starts = np.flatnonzero(gap_brk)
        run_ends = np.append(run_starts[1:], n)
        # within a gap-run the ONLY break is the cap: session starting
        # at index idx ends before the first ts > ts[idx] + cap, which
        # searchsorted finds in O(log run) — the loop iterates once per
        # emitted session, not once per row
        sess_starts = []
        for i, j in zip(run_starts, run_ends):
            idx = int(i)
            while idx < j:
                sess_starts.append(idx)
                idx = int(i) + int(np.searchsorted(
                    us[i:j], us[idx] + cap_us, side="right"))
        sess_starts = np.asarray(sess_starts, dtype=np.int64)
        sess_ends = np.append(sess_starts[1:], n)
        su = users[sess_starts]
        first = np.empty(len(su), dtype=bool)
        first[0] = True
        first[1:] = su[1:] != su[:-1]
        pos = np.arange(len(su), dtype=np.int64)
        sid = pos - np.maximum.accumulate(np.where(first, pos, 0))
        ts_vals = pdf[ts_col].to_numpy()
        return pd.DataFrame({
            user_col: su,
            "session_id": sid,
            "n_events": sess_ends - sess_starts,
            "ts_start": ts_vals[sess_starts],
            "ts_end": ts_vals[sess_ends - 1],
        })

    def assign(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            # hold back the partition's current last user: its rows may
            # continue in the next Arrow batch (sorted by user, so they
            # are exactly the trailing block)
            cut = len(pdf) - int((pdf[user_col] == pdf[user_col]
                                  .iloc[-1]).sum())
            buf = pdf.iloc[cut:]
            if cut:
                yield emit(pdf.iloc[:cut])
        if buf is not None and len(buf):
            yield emit(buf)

    return (
        events.select(user_col, ts_col, id_col)
        .repartition(F.col(user_col))
        .sortWithinPartitions(user_col, ts_col, id_col)
        .mapInPandas(assign, out_schema)
    )
