"""Data-quality checks (SURVEY.md §2.2j "inspect/automate" surface).

Everything is expressed as plain aggregates / anti-joins so Catalyst keeps
it in one scan per table: ``profile`` computes all per-column stats in a
single pass (one row out per column, via a literal-exploded long format),
``referential_orphans`` is a broadcast-able left-anti join, ``uniqueness``
a count-distinct delta. At 100 TB these run as map-side partial aggregates —
no operator here shuffles anything wider than the stat rows themselves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile in ONE scan: rows, nulls, distincts, min/max
    (rendered as strings so heterogeneous columns stack in long format)."""
    cols = list(cols) if cols is not None else df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__n").cast("bigint").alias("n"),
                    F.col(f"{c}__nulls").cast("bigint").alias("n_null"),
                    F.col(f"{c}__distinct").cast("bigint").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_str"),
                    F.col(f"{c}__max").alias("max_str"),
                )
                for c in cols
            ])
        ).alias("p")
    )
    return stacked.select("p.*")


def uniqueness(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-uniqueness check: total rows, distinct keys, duplicate surplus."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])).alias(
            "n_dup"
        ),
    )


def referential_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose FK has no matching parent PK (left-anti join; the
    parent side is typically dimension-sized → broadcast)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")


def null_rate_violations(
    df: DataFrame, max_null_rate: dict[str, float]
) -> DataFrame:
    """Columns whose null rate exceeds the declared bound; one scan."""
    aggs = [
        (
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias(c)
        for c in max_null_rate
    ]
    rates = df.agg(*aggs)
    stacked = rates.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("double").alias("null_rate"),
                    F.lit(bound).alias("bound"),
                )
                for c, bound in max_null_rate.items()
            ])
        ).alias("v")
    ).select("v.*")
    return stacked.filter(F.col("null_rate") > F.col("bound"))


def with_dq_observation(
    df: DataFrame,
    name: str = "dq",
    checks: dict[str, F.Column] | None = None,
):
    """Attach zero-cost inline DQ counters to a plan via ``df.observe``.

    Returns (df, Observation). The metrics ride the existing job — no second
    scan, no extra shuffle: accumulators are merged driver-side as tasks
    finish, which is what makes this the right 100 TB shape for "count the
    bad rows while loading" (vs a separate validation pass). Read
    ``obs.get`` AFTER an action on the returned df.
    """
    from pyspark.sql import Observation

    if checks is None:
        checks = {"n_rows": F.count(F.lit(1))}
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in checks.items()]), obs


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Robust per-group statistics: exact interpolated percentiles at
    ``lo``/``hi`` and the winsorized mean (values clamped into [p_lo, p_hi]
    before averaging) — outlier-proof profiling for skewed distributions
    like document lengths, where a handful of megadocs swamp a plain mean.

    Determinism: percentiles are 4dp-pinned; clamped values are exact
    decimals (integers or the pinned percentiles), so the mean is an exact
    decimal sum divided once — aggregation-order-proof.

    Plan/scale: one per-group percentile agg (exact percentile needs the
    group's values — at 100 TB substitute approx_percentile for the profile
    half; the clamp+mean half is unchanged), the tiny quantile frame
    broadcast back, one scan-side clamp + decimal agg. No data shuffle
    beyond the two group aggs.
    """
    def r4(c):
        return F.round(c.cast("decimal(18,6)"), 4).cast("double")

    qs = df.groupBy(group_col).agg(
        r4(F.expr(f"percentile({value_col}, {lo})")).alias("p_lo"),
        r4(F.expr(f"percentile({value_col}, {hi})")).alias("p_hi"),
        F.count("*").alias("n"),
    )
    clamped = F.greatest(
        F.least(F.col(value_col).cast("double"), F.col("p_hi")), F.col("p_lo"))
    return (
        df.join(F.broadcast(qs), group_col)
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.max("p_lo").alias("p_lo"),
            F.max("p_hi").alias("p_hi"),
            r4(F.sum(clamped.cast("decimal(18,6)")).cast("double")
               / F.count("*")).alias("win_mean"),
        )
    )


def mad_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Median absolute deviation per group — the robust spread companion to
    ``winsorized_stats``: MAD = median(|x - median(x)|). Used to flag
    anomalous feeds whose spread explodes without any mean shift.

    Two group aggregations (the median needs the group's values; at 100 TB
    substitute approx_percentile in the first pass), with the 4dp-pinned
    medians broadcast between them. Returns (group_col, n, med, mad).
    """
    def r4(c):
        return F.round(c.cast("decimal(18,6)"), 4).cast("double")

    med = df.groupBy(group_col).agg(
        r4(F.expr(f"percentile({value_col}, 0.5)")).alias("med"),
        F.count("*").alias("n"),
    )
    dev = F.abs(F.col(value_col).cast("double") - F.col("med"))
    return (
        df.join(F.broadcast(med), group_col)
        .withColumn("_dev", dev)
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.max("med").alias("med"),
            r4(F.expr("percentile(_dev, 0.5)")).alias("mad"),
        )
    )


def isotonic_calibrate(
    binned: DataFrame,
    group_col: str = "event_type",
    x_col: str = "bin",
    y_col: str = "obs_rate_ppm",
    w_col: str = "n",
) -> DataFrame:
    """Isotonic (PAVA) calibration of a binned rate curve: the
    monotone-non-decreasing fit minimizing weighted squared error — the
    standard post-hoc calibrator for a quality/ranking score (pairs with
    q185 AUC for discrimination and q196 bins for raw reliability).

    Pool-adjacent-violators is a sequential recurrence (like q179's capped
    sessions), so it runs as the sanctioned ``applyInPandas`` escape hatch:
    one shuffle on the group key, then a per-group Arrow pass over the BIN
    table — which is histogram-sized, never data-sized, so the Python-side
    work is O(bins) per group regardless of corpus size (the corpus was
    already reduced by the q196-style binning aggregation). Deterministic:
    input sorted by ``x_col`` inside the group, pure float arithmetic with
    a fixed pooling order; pinned in tests against the O(n³) max-min
    closed form (an independent formulation of the isotonic fit).

    Output: group, x, w, y, iso (fitted value, 4 dp).
    """
    import pandas as pd

    schema = (f"{group_col} string, {x_col} int, {w_col} bigint,"
              f" {y_col} bigint, iso double")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        # blocks of (weighted mean, weight); pool while out of order
        blocks: list[list[float]] = []  # [mean, weight, count]
        for y, w in zip(pdf[y_col].astype(float), pdf[w_col].astype(float)):
            blocks.append([y, w, 1])
            while len(blocks) >= 2 and blocks[-2][0] >= blocks[-1][0]:
                m2, w2, c2 = blocks.pop()
                m1, w1, c1 = blocks.pop()
                blocks.append([(m1 * w1 + m2 * w2) / (w1 + w2),
                               w1 + w2, c1 + c2])
        iso = []
        for m, _, c in blocks:
            iso.extend([round(m, 4)] * c)
        out = pdf[[group_col, x_col, w_col, y_col]].copy()
        out["iso"] = iso
        return out

    return binned.groupBy(group_col).applyInPandas(fit, schema)


# -- schema-inspection audits (discovery, not enforcement) --------------------
# The "inspect" half of a CDC automation tool: given a pile of replicated
# tables, DISCOVER the constraint graph — which columns embed in which
# (inclusion dependencies / FK candidates), which determine which
# (functional dependencies), which combinations identify rows (candidate
# keys) — rather than checking constraints someone already declared.


def inclusion_audit(
    cases: Sequence[tuple], 
) -> DataFrame:
    """Inclusion-dependency (FK-candidate) audit. ``cases`` is a sequence of
    (label, child_df, fk_col, parent_df, pk_col); output is one row per
    case: non-null child rows, distinct child keys, how many embed in the
    parent's key domain, orphan keys, containment in ppm, and a holds flag.

    Scale shape (100 TB): per case, the child table is scanned ONCE — a
    single groupBy(fk).count() collapses it to its key domain with map-side
    partial aggregation (the only shuffle that sees child-sized data). The
    parent key domain (dimension-sized -> broadcast) left-joins in as a
    match marker, and ONE fold over that joined frame produces all three
    counts (n_child_rows = SUM(cnt), n_child_keys = COUNT(*),
    n_matched_keys = COUNT(marker)). A single consumer means the optimizer
    cannot prune the two uses differently (the r13 lesson: a stats branch
    and a semi-join branch over the "same" frame get different pushed
    filters/prunes and stop sharing the scan).
    """
    from functools import reduce

    outs = []
    for label, child, fk, parent, pk in cases:
        per_key = (
            child.filter(F.col(fk).isNotNull())
            .select(F.col(fk).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pkd = (parent.select(F.col(pk).alias("k")).distinct()
               .withColumn("m", F.lit(1)))
        row = (
            # pkd is distinct on k, so the left join is fan-out-free: one
            # row per child key, marker m non-null iff the key embeds.
            # SUM over zero groups is NULL, but an all-NULL fk column must
            # report 0 child rows (vacuous-edge contract) — hence coalesce
            per_key.join(pkd, "k", "left")
            .agg(
                F.coalesce(F.sum("cnt"), F.lit(0).cast("bigint"))
                .alias("n_child_rows"),
                F.count(F.lit(1)).alias("n_child_keys"),
                F.count("m").alias("n_matched_keys"))
            .select(
                F.lit(label).alias("relation"),
                "n_child_rows", "n_child_keys", "n_matched_keys",
                (F.col("n_child_keys") - F.col("n_matched_keys"))
                .alias("n_orphan_keys"),
                # an all-NULL fk column has zero child keys: containment
                # is undefined (NULL ppm via the nullif guard) and the
                # edge must NOT be certified as holding — it's vacuous,
                # not verified (ADVICE r05 item 4)
                F.expr("n_matched_keys * 1000000"
                       " DIV nullif(n_child_keys, 0)")
                .alias("containment_ppm"),
                ((F.col("n_child_keys") == F.col("n_matched_keys"))
                 & (F.col("n_child_keys") > 0))
                .alias("holds"),
            )
        )
        outs.append(row)
    return reduce(lambda a, b: a.unionAll(b), outs)


def fd_audit(cases: Sequence[tuple]) -> DataFrame:
    """Functional-dependency audit. ``cases`` is a sequence of
    (label, df, lhs_cols, rhs_col); a dependency lhs -> rhs holds when no
    lhs group contains more than one distinct rhs value. Output per case:
    lhs group count, violating group count, worst fan-out, holds flag.

    Scale shape: per case, ONE groupBy on the lhs with a COUNT(DISTINCT
    rhs) (Spark plans it as the standard two-phase expand), then a global
    one-row fold. Nothing wider than the group count is ever shuffled.
    """
    from functools import reduce

    outs = []
    for label, df, lhs, rhs in cases:
        nd = (
            df.groupBy(*[F.col(c) for c in lhs])
            .agg(F.count_distinct(F.col(rhs)).alias("nd"))
        )
        row = nd.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .alias("n_violating"),
            F.max("nd").alias("max_rhs_per_group"),
        ).select(
            F.lit(label).alias("fd"),
            "n_groups", "n_violating", "max_rhs_per_group",
            (F.col("n_violating") == 0).alias("holds"),
        )
        outs.append(row)
    return reduce(lambda a, b: a.unionAll(b), outs)


def key_candidates(cases: Sequence[tuple]) -> DataFrame:
    """Candidate-key audit. ``cases`` is a sequence of (label, df, cols);
    output per case: rows, distinct key tuples, duplicate surplus, is_key.
    ``count_distinct`` over multiple columns skips rows with any NULL key
    part (SQL semantics in both engines), so a nullable column can never
    masquerade as a key by NULL-padding."""
    from functools import reduce

    outs = []
    for label, df, cols in cases:
        row = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(*[F.col(c) for c in cols]).alias("n_distinct"),
        ).select(
            F.lit(label).alias("key"),
            "n_rows", "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_dup"),
            (F.col("n_rows") == F.col("n_distinct")).alias("is_key"),
        )
        outs.append(row)
    return reduce(lambda a, b: a.unionAll(b), outs)


def enforce_inclusion(
    child: DataFrame, parent: DataFrame, fk: str, pk: str,
    null_is_valid: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Enforcement follow-up to ``inclusion_audit``: split the child into
    (clean, quarantined) by FK validity — the route-vs-reject step a CDC
    pipeline runs on every ingest batch. NULL fks are routed per
    ``null_is_valid`` (SQL FKs ignore NULLs; strict pipelines quarantine
    them).

    Scale shape: ONE broadcast left join against the parent's distinct key
    domain decides both outputs; the two returned frames share the probed
    plan, so materializing both costs one scan each with the same join.
    """
    pkd = F.broadcast(parent.select(F.col(pk).alias("__pk")).distinct())
    probed = child.join(pkd, child[fk] == F.col("__pk"), "left")
    is_null = F.col(fk).isNull()
    matched = F.col("__pk").isNotNull()
    ok = (matched | is_null) if null_is_valid else matched
    clean = probed.filter(ok).drop("__pk")
    quarantined = probed.filter(~ok).drop("__pk")
    return clean, quarantined

