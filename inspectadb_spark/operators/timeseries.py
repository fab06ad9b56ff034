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


def retention_cohorts(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week; for each
    week offset k, the fraction of the cohort active k weeks later.

    Shuffle shape: one per-key aggregation produces the cohort week AND the
    distinct active-week set together (no key-level join), then two tiny
    rollups on week keys. Repeat events never fan out — collect_set holds at
    most weeks-in-span entries per key.
    Returns (cohort_week, week_offset, n_cohort, n_active, retention).
    """
    # ONE per-key aggregation yields both the cohort week (min of the
    # monotone week truncation == truncation of min ts) and the distinct
    # active-week set — no user-level join, which at 100 TB would be the
    # dominant shuffle. Weeks-per-key is bounded by the observation span, so
    # collect_set state stays tiny.
    per_user = (
        events.select(F.col(key_col), F.date_trunc("week", F.col(ts_col)).alias("week"))
        .groupBy(key_col)
        .agg(F.min("week").alias("cohort_week"), F.collect_set("week").alias("weeks"))
    )
    joined = per_user.select("cohort_week", F.explode("weeks").alias("week")).select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("int").alias("week_offset"),
    )
    per_offset = joined.groupBy("cohort_week", "week_offset") \
        .agg(F.count("*").alias("n_active"))  # weeks already distinct per key
    sizes = per_user.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    # exact ints -> IEEE double division -> exact-decimal round: engine-stable
    rate = (F.col("n_active").cast("double") / F.col("n_cohort")).cast("decimal(18,6)")
    return (
        per_offset.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_cohort", "n_active",
            F.round(rate, 4).cast("double").alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def time_weighted_avg(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """Time-weighted average of a sampled signal per key (TimescaleDB-style
    ``time_weight('LOCF')``): each observation holds until the next one, so
    its weight is the µs gap to the successor; the final observation carries
    no weight.

    One shuffle (window partition by key); the weighted sums are exact
    DECIMALs (value·µs fits DECIMAL(38,6) for month-scale spans), so the
    result is independent of partial-agg order. Returns
    (key, n_obs, span_s, twa).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # ts may be TIMESTAMP_NTZ (events ns-shim); unix_micros wants LTZ, and the
    # session TZ is pinned UTC so the cast is value-identity.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = (F.lead(us).over(w) - us).alias("dur_us")
    spans = events.select(F.col(key_col), F.col(val_col).cast("decimal(18,6)").alias("v"), dur) \
        .filter(F.col("dur_us").isNotNull())
    return (
        spans.groupBy(key_col)
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("dur_us").alias("_dur"),
            F.sum((F.col("v") * F.col("dur_us")).cast("decimal(38,6)")).alias("_wsum"),
        )
        .select(
            F.col(key_col), "n_obs",
            F.round((F.col("_dur") / F.lit(1000000)).cast("decimal(18,6)"), 4)
            .cast("double").alias("span_s"),
            F.round((F.col("_wsum").cast("double") / F.col("_dur").cast("double"))
                    .cast("decimal(18,6)"), 4).cast("double").alias("twa"),
        )
    )


def sequence_funnel(
    events: DataFrame,
    steps: list[str],
    window: str = "72 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered multi-step sequence match (MATCH_RECOGNIZE shape): for each
    key, the earliest chain step1 < step2 < ... < stepN where every step
    falls within ``window`` of the FIRST step's first occurrence.

    Earliest-chain semantics make the match greedy-minimal and unique per
    key, so each stage is a min() aggregation — never a fan-out over all
    event combinations. Stage i is a join of the per-key state (one row per
    surviving key) against only type-i events, co-partitioned on the key
    after the first shuffle. Returns per first-step day:
    (day, n_start, n_complete, rate).
    """
    t1 = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(key_col).agg(F.min(ts_col).alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {window}")
    state = t1
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(key_col), F.col(ts_col).alias("_ts"))
        carry = [c for c in state.columns if c != key_col]
        state = (
            state.join(nxt, key_col)
            .filter((F.col("_ts") > F.col(f"t{i-1}")) & (F.col("_ts") <= deadline))
            .groupBy(key_col, *carry)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
    done = state.select(F.col(key_col), F.lit(1).alias("_done"))
    rate = (F.col("n_complete").cast("double") / F.col("n_start")).cast("decimal(18,6)")
    return (
        t1.join(done, key_col, "left")
        .groupBy(F.date_trunc("day", F.col("t1")).alias("day"))
        .agg(F.count("*").alias("n_start"), F.count("_done").alias("n_complete"))
        .select("day", "n_start", "n_complete",
                F.round(rate, 4).cast("double").alias("rate"))
        .orderBy("day")
    )


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    alpha: float = 0.3,
    k: int = 10,
    out: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average per key.

    EWMA is inherently recursive (state = f(state, x)), which neither
    distributes nor SQL-expresses; the scale-safe form truncates the tail:
    weights (1-a)^j decay geometrically, so the j >= k terms contribute
    < (1-a)^k of the total and the k-term window is exact to that tolerance
    (k=10, a=0.3 -> < 3%). That truncation turns the recursion into a fixed
    linear combination of lag(value, j), j in [0, k) — pure window offsets
    over ONE per-key sort, no UDF, no state, identical text in any SQL
    engine (q93's oracle). Leading rows renormalize over the lags that
    exist (pandas ewm adjust=True semantics).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        wj = F.lit((1.0 - alpha) ** j)
        lj = F.lag(value_col, j).over(w)
        num = num + F.coalesce(lj, F.lit(0.0)) * wj
        den = den + F.when(lj.isNotNull(), wj).otherwise(F.lit(0.0))
    return df.withColumn(out, num / den)


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "hour",
) -> DataFrame:
    """Peak concurrent intervals per time bucket (max sessions open at once
    each hour — capacity planning over sessionized activity) via a
    TWO-LEVEL sweep line.

    The textbook sweep (sort every +1/-1 boundary globally, running sum) is
    a single-partition window — unusable at scale. Split it: (1) within
    each bucket, a partitioned window computes the local running sum and
    its max plus the bucket's net delta — the big data shuffles once, on
    the bucket key; (2) the carry-in level per bucket is a running sum over
    the per-bucket nets — a window over |buckets| rows (aggregated, tiny —
    e.g. 10 years of hours is 87k rows), the same collapse-then-scan trick
    as q74's cumulative users. Peak(bucket) = carry_in + max local prefix.

    Intervals are inclusive at both ends; at equal timestamps starts order
    before ends (delta DESC), so a session ending at t and one starting at
    t count as concurrent. Equal-(ts, delta) tie order cannot change the
    max prefix (consecutive equal deltas commute), so the result is
    deterministic without a full tie-break. Buckets with no boundary
    events emit no row (the level is flat there by construction).
    """
    b = intervals.select(
        F.col(start_col).alias("_ts"), F.lit(1).alias("_d")
    ).unionAll(
        intervals.select(F.col(end_col).alias("_ts"), F.lit(-1).alias("_d"))
    ).withColumn("_b", F.date_trunc(bucket, F.col("_ts")))
    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.col("_ts"), F.col("_d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per = (
        b.withColumn("_run", F.sum("_d").over(w_in))
        .groupBy("_b")
        .agg(F.max("_run").alias("_peak_local"), F.sum("_d").alias("_net"))
    )
    w_carry = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per.withColumn("_carry", F.coalesce(F.sum("_net").over(w_carry), F.lit(0)))
        .select(
            F.col("_b").alias("bucket"),
            (F.col("_carry") + F.col("_peak_local")).cast("bigint").alias("peak"),
        )
        .orderBy("bucket")
    )


def resample_interpolate(
    events: DataFrame,
    step: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled resampling with LINEAR interpolation — the smooth-fill
    sibling of ``resample_ffill``: each missing grid point gets
    ``prev + (next - prev) * elapsed/gap`` from its nearest observed
    neighbours. The grid spans each key's own [min, max] observed bucket,
    so interior gaps always have both neighbours (no edge extrapolation).

    Determinism: observed per-bucket means are 4dp-pinned; the interpolation
    weight is a ratio of exact epoch-second integers; the single double
    expression is evaluated in the same operation order on any engine and
    re-pinned to 4dp.

    Scale shape: identical to ``resample_ffill`` — one (key, bucket) agg,
    per-key grid explode, ONE partitioned sort serving both the backward
    and forward carry windows.
    """
    unit = step.split()[1].rstrip("s")
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
    wb = (Window.partitionBy("k").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("k").orderBy("bucket")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_b = F.when(F.col("v").isNotNull(), F.col("bucket"))
    joined = (
        grid.join(actual, ["k", "bucket"], "left")
        .select(
            "k", "bucket", "v",
            F.last("v", ignorenulls=True).over(wb).alias("pv"),
            F.last(obs_b, ignorenulls=True).over(wb).alias("pb"),
            F.first("v", ignorenulls=True).over(wf).alias("nv"),
            F.first(obs_b, ignorenulls=True).over(wf).alias("nb"),
        )
    )
    frac = (
        (F.unix_timestamp("bucket") - F.unix_timestamp("pb")).cast("double")
        / (F.unix_timestamp("nb") - F.unix_timestamp("pb")).cast("double")
    )
    interp = F.round(
        (F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .cast("decimal(18,6)"), 4).cast("double")
    return joined.select(
        F.col("k").alias(key_col), "bucket",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp).alias("v_interp"),
        F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("is_gap"),
    )


def activity_streaks(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streak statistics.

    The classic anchor-date trick — day − row_number() is constant within a
    run of consecutive days — makes the whole computation two aggregations
    over ONE user-keyed shuffle (the distinct, the window and both groupBys
    all share the user partitioning; no self-join, no day-range explode).
    Output: (user, n_active_days, n_streaks, longest_streak).
    """
    days = df.select(
        F.col(user_col), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    w = Window.partitionBy(user_col).orderBy("day")
    grp = days.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    streaks = grp.groupBy(user_col, "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy(user_col).agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
    )


def cusum_alerts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    k: float,
    h: float,
) -> DataFrame:
    """One-sided CUSUM change-point detection per key, in exact decimal.

    The textbook recursion S_t = max(0, S_{t−1} + (x_t − k)) has no direct
    window form, but its closed form does: with P_t = Σ_{i≤t}(x_i − k),
    S_t = P_t − min(0, min_{i≤t} P_i) — two window functions over ONE
    (key, ts) sort (the 0 term is the implicit S_0 = 0 anchor). All arithmetic is DECIMAL(18,6) (exact, associative), so the
    alert decision S_t > h is byte-identical on any engine. An upward mean
    shift of Δ is flagged after ≈ h/(Δ−k+μ) observations (k = reference
    level ≈ in-control mean + slack, h = decision interval).

    Output per key: n_alerts (rows with S > h), max_cusum (4 dp), n rows.
    Scale: one key shuffle + in-partition sort shared by both windows; the
    rollup rides the same partitioning.
    """
    kd = F.lit(k).cast("decimal(18,6)")
    hd = F.lit(h).cast("decimal(18,6)")
    base = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = F.sum(F.col(value_col).cast("decimal(18,6)") - kd).over(run)
    stats = (
        df.withColumn("_p", p)
        .withColumn(
            "_s",
            F.col("_p")
            - F.least(F.lit(0).cast("decimal(18,6)"), F.min("_p").over(run)),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.when(F.col("_s") > hd, 1)).alias("n_alerts"),
            F.round(F.max("_s").cast("decimal(18,6)"), 4)
            .cast("double")
            .alias("max_cusum"),
            F.count("*").alias("n"),
        )
    )
    return stats


def calendar_dim(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Generate the calendar dimension spanning the data's date range —
    every day (including zero-activity gaps) with its date attributes.
    The warehouse date-dim build: one 1-row min/max aggregation, one
    sequence explode (span-sized, not data-sized), zero shuffle of the
    fact table. Week numbers are ISO (identical in Spark and DuckDB);
    day-of-week is Spark's 1=Sunday convention (oracle shifts DuckDB's
    0-based value).
    """
    span = df.agg(
        F.min(F.to_date(ts_col)).alias("d0"), F.max(F.to_date(ts_col)).alias("d1")
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    return days.select(
        F.col("day").cast("date").alias("day"),
        F.dayofweek("day").cast("int").alias("dow"),
        F.weekofyear("day").cast("int").alias("week"),
        F.month("day").cast("int").alias("month"),
        F.quarter("day").cast("int").alias("quarter"),
        F.dayofweek("day").isin(1, 7).alias("is_weekend"),
    )


def rle_compress(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Run-length encoding of a per-key state stream: consecutive rows with
    the same state collapse to one (key, state, ts_start, ts_end, n) run —
    the state-change-log compression a CDC pipeline applies before
    archiving. The islands trick again: change flag via lag over ONE
    (key, ts) sort, run id via running sum over the same sort, one rollup.
    Output size = number of state CHANGES, not rows.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    run = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chg = F.when(
        F.lag(state_col).over(w).isNull()
        | (F.col(state_col) != F.lag(state_col).over(w)),
        1,
    ).otherwise(0)
    runs = df.withColumn("_chg", chg).withColumn(
        "run_id", F.sum("_chg").over(run).cast("bigint")
    )
    return runs.groupBy(key_col, "run_id").agg(
        F.first(state_col).alias(state_col),
        F.min(ts_col).alias("ts_start"),
        F.max(ts_col).alias("ts_end"),
        F.count("*").alias("n"),
    )
