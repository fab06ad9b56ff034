"""Release-hygiene privacy audits: k-anonymity / l-diversity over
quasi-identifier groups (SURVEY.md §2.2j data-quality extension — the
privacy face of the DQ family).

Why this exists: before a corpus (or a per-segment statistics card derived
from it) leaves the pipeline, the standing questions are Sweeney's: how
many rows sit in quasi-identifier groups smaller than k (re-identifiable
by linking), and how many groups are sensitive-attribute monocultures
(attribute disclosure even at large k — Machanavajjhala's l-diversity).
Both reduce to exact integer statistics over one QI group-by, so the audit
is fully deterministic and DuckDB-oracled, unlike heuristic PII regex
screens (operators/text.py redact/blocklist cover that content-level
face; this module covers the structural/linkage face).

Decomposability contract: the per-group sufficient statistics are a COUNT
and a bounded distinct-value SET of the sensitive attribute — exactly the
`count` and `set` kinds of streaming IncrementalAggregate — so the live
monitor (S55) maintains the SAME group table incrementally and reads out
through the SAME closed form: batch ≡ stream is an identity of code.

100 TB story: one scan + one map-side-combinable group-by on the QI key
(collect_set merges because the sensitive domain is bounded — enforce
that before using the `set` kind on a high-cardinality attribute); the
group table is |QI domain|-sized, and the threshold sweep explodes THAT
model-sized table, never the corpus. No joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["anonymize_sweep", "anonymize_sweep_from_groups",
           "dp_noisy_release", "dp_noisy_sum_release", "dp_release_from_counts",
           "dp_thresholded_release",
           "k_anonymity_readout", "k_anonymize",
           "qi_group_stats", "sensitive_pair_counts",
           "t_closeness_readout"]


def qi_group_stats(df: DataFrame, qi_cols: list[Column | str],
                   sensitive_col: str) -> DataFrame:
    """(QI)-grain sufficient statistics: exact group size ``n`` and the
    sorted distinct sensitive-value set ``svals``. Sorted so the state
    bytes are canonical across merge orders — the same convention as the
    IncrementalAggregate `set` kind, whose live state has this exact
    shape (S55)."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_set(sensitive_col)).alias("svals"),
    )


def k_anonymity_readout(groups: DataFrame,
                        thresholds: tuple[int, ...] = (2, 5, 10, 20),
                        l_bar: int = 2) -> DataFrame:
    """k-anonymity / l-diversity audit closed form over a (QI)-grain group
    table with columns (n, svals) — shared VERBATIM by the q343 batch
    query and the S55 live monitor.

    One output row per k threshold: group/row counts below k (the
    re-identification risk mass, also as exact integer ppm of all rows)
    and the l-diversity monoculture counters (groups/rows whose sensitive
    set has fewer than ``l_bar`` distinct values — attribute disclosure
    no k can fix). All integer arithmetic; the threshold sweep explodes
    the model-sized group table, not the corpus.
    """
    g = groups.select(F.col("n").cast("bigint").alias("n"),
                      F.size("svals").cast("bigint").alias("l"))
    x = g.withColumn(
        "k", F.explode(F.array(*[F.lit(int(k)) for k in thresholds])))
    return (
        x.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("bigint").alias("groups_lt_k"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("bigint").alias("rows_lt_k"),
            F.expr("SUM(CASE WHEN n < k THEN n ELSE 0 END) * 1000000"
                   " DIV SUM(n)").cast("bigint").alias("rows_lt_k_ppm"),
            F.sum(F.when(F.col("l") < l_bar, 1).otherwise(0))
            .cast("bigint").alias("groups_l_lt_2"),
            F.sum(F.when(F.col("l") < l_bar, F.col("n")).otherwise(0))
            .cast("bigint").alias("rows_l_lt_2"),
        )
        .orderBy("k")
    )


def sensitive_pair_counts(df: DataFrame, qi_cols: list[Column | str],
                          sensitive_col: str) -> DataFrame:
    """(QI, sensitive)-grain exact counts ``c`` — the sufficient statistic
    for t-closeness (Li, Li & Venkatasubramanian 2007). This is exactly the
    `count` IncrementalAggregate kind keyed by (QI, sensitive), so the live
    monitor (S57) maintains the SAME pair table incrementally and reads out
    through the SAME ``t_closeness_readout`` closed form."""
    return df.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c"))


def t_closeness_readout(
        pairs: DataFrame, qi_cols: list[str], sensitive_col: str,
        thresholds_ppm: tuple[int, ...] = (100000, 200000, 300000, 500000),
) -> DataFrame:
    """t-closeness audit closed form over a (QI, sensitive)-grain count
    table ``pairs`` (columns: *qi_cols, sensitive_col, c) — shared VERBATIM
    by the q345 batch query and the S57 live monitor.

    A QI group violates t-closeness when the total-variation distance
    between its sensitive-attribute distribution p and the corpus-global
    distribution q exceeds t: even a large, l-diverse group leaks
    (skewness attack) if, say, 90% of it shares one sensitive value that
    is 20% globally. TVD = (1/2)·Σ_s|p_s − q_s| is kept integer-exact by
    scaling with 2·n·N:

        2·n·N·TVD = Σ_{s in domain} |c_s·N − cs_s·n|
                  = Σ_{s in group} (|c_s·N − cs_s·n| − cs_s·n) + n·N

    where the second form folds every sensitive value ABSENT from the
    group (|0 − cs·n| = cs·n) into the closed-form n·N correction — so the
    plan joins only the observed pair table against the broadcast global
    marginal, never QI-domain × sensitive-domain. ``tvd_ppm`` is then an
    exact integer DIV. One output row per t threshold: groups/rows above
    t (the skew-leakage mass, with exact ppm) plus the corpus-wide max
    TVD (the smallest t the release could honestly claim).

    100 TB story: one scan + one map-side-combinable (QI, s) group-by; the
    global marginal is |sensitive domain|-sized (broadcast), the per-group
    window shuffles on the QI key once, and the threshold sweep explodes
    the model-sized group table. The cross products and the ×10⁶ ppm step
    run in DECIMAL(38,0) — on bigint, (dev + n·N)·10⁶ wraps once n·N
    passes ~4.6×10¹², far below real corpus sizes; decimal keeps the
    division exact to counts of ~10¹⁶ a side, and it prices in only on
    the (QI, s)-grain table, never the corpus scan.
    """
    from pyspark.sql import Window

    p = pairs.select(*qi_cols, F.col(sensitive_col).alias("_s"),
                     F.col("c").cast("decimal(20,0)").alias("c"))
    marg = p.groupBy("_s").agg(
        F.sum("c").cast("decimal(20,0)").alias("cs")) \
        .withColumnRenamed("_s", "_sm")
    tot = p.agg(F.sum("c").cast("decimal(20,0)").alias("big_n"))
    w = Window.partitionBy(*qi_cols)
    # null-safe equality: NULL is a distinguishable sensitive category (to
    # an attacker it IS a value) — groupBy keeps it as a group in both the
    # pair table and the marginal, so a plain equi-join would drop those
    # rows from n/cs while big_n still counts them, corrupting tvd_ppm
    j = (p.join(F.broadcast(marg), F.col("_s").eqNullSafe(F.col("_sm")))
         .drop("_sm")
         .join(F.broadcast(tot))
         .withColumn("n", F.sum("c").over(w).cast("decimal(20,0)")))
    g = (j.groupBy(*qi_cols)
         .agg(F.min("n").alias("n"), F.min("big_n").alias("big_n"),
              F.sum(F.abs(F.col("c") * F.col("big_n")
                          - F.col("cs") * F.col("n"))
                    - F.col("cs") * F.col("n"))
              .cast("decimal(38,0)").alias("dev"))
         .withColumn("tvd_ppm",
                     F.expr("(dev + n * big_n) * 1000000"
                            " DIV (2 * n * big_n)").cast("bigint")))
    x = g.withColumn(
        "t_ppm", F.explode(F.array(*[F.lit(int(t)) for t in thresholds_ppm])))
    over = F.col("tvd_ppm") > F.col("t_ppm")
    return (
        x.groupBy("t_ppm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(over, 1).otherwise(0)).cast("bigint")
            .alias("groups_gt_t"),
            F.sum(F.when(over, F.col("n")).otherwise(0)).cast("bigint")
            .alias("rows_gt_t"),
            F.expr("SUM(CASE WHEN tvd_ppm > t_ppm THEN n ELSE 0 END)"
                   " * 1000000 DIV SUM(n)").cast("bigint")
            .alias("rows_gt_t_ppm"),
            F.max("tvd_ppm").cast("bigint").alias("max_tvd_ppm"),
        )
        .orderBy("t_ppm"))


def _check_base_width(base_width: float) -> None:
    if base_width < 1 or float(base_width) != int(base_width):
        raise ValueError(
            f"base_width must be a positive integer-valued width, got "
            f"{base_width!r}: the published/enforced `width` column is "
            f"m * int(base_width), so a fractional width would measure "
            f"risk on one banding and release another")


def anonymize_sweep(df: DataFrame, group_cols: list[str], value_col: str,
                    k: int = 5, base_width: float = 2000.0,
                    multipliers: tuple[int, ...] = (1, 2, 4, 8),
                    budget_ppm: int = 50000) -> DataFrame:
    """Global-recoding operating curve for k-anonymization: for each
    generalization width ``base_width * m`` report the exact sub-k risk
    mass, and flag the CHOSEN width — the smallest whose residual risk is
    within ``budget_ppm``, else the widest (the residue is then
    suppressed; see ``k_anonymize``). The enforce-side companion of the
    ``k_anonymity_readout`` audit: the audit says how exposed a release
    is, the sweep says what generalizing costs and where the ladder stops
    paying.

    Scale shape: the corpus is scanned ONCE into the base-width group
    table; every coarser width is re-aggregated from that model-sized
    table — valid because floor(v / (w·m)) = floor(floor(v / w) / m)
    (the floor-nesting law, unit-pinned), so widening bands only ever
    merges whole base cells. The selection is a one-row aggregate
    broadcast back onto the sweep.

    ``base_width`` must be a positive integer-valued width: the reported
    (and enforced — ``k_anonymize`` re-bands by it) ``width`` column is
    ``m · int(base_width)``, so a fractional width would measure risk on
    one banding and publish/enforce another.
    """
    _check_base_width(base_width)
    b0 = F.floor(F.col(value_col) / F.lit(float(base_width))).cast("int")
    g0 = (df.select(*group_cols, b0.alias("b0"))
          .groupBy(*group_cols, "b0").agg(F.count(F.lit(1)).alias("n")))
    return anonymize_sweep_from_groups(g0, group_cols, k=k,
                                       base_width=base_width,
                                       multipliers=multipliers,
                                       budget_ppm=budget_ppm)


def anonymize_sweep_from_groups(groups: DataFrame, group_cols: list[str],
                                k: int = 5, base_width: float = 2000.0,
                                multipliers: tuple[int, ...] = (1, 2, 4, 8),
                                budget_ppm: int = 50000) -> DataFrame:
    """The sweep closed form over a base-width (QI, b0)-grain count table
    ``groups`` (columns: *group_cols, b0, n) — shared VERBATIM by the
    q344 batch query and the S56 live generalization watch, whose
    IncrementalAggregate state has exactly this shape (`count` kind keyed
    by the QI cell). Everything below the base group-by is model-sized,
    so the live readout costs the same regardless of stream history."""
    _check_base_width(base_width)
    g0 = groups.select(*group_cols, F.col("b0").cast("int").alias("b0"),
                       F.col("n").cast("bigint").alias("n"))
    x = g0.withColumn(
        "m", F.explode(F.array(*[F.lit(int(m)) for m in multipliers])))
    g = (x.select("m", *group_cols,
                  F.floor(F.col("b0") / F.col("m").cast("double"))
                  .cast("int").alias("band"), "n")
         .groupBy("m", *group_cols, "band").agg(F.sum("n").alias("n")))
    s = (g.groupBy("m")
         .agg(
             F.count(F.lit(1)).cast("bigint").alias("n_groups"),
             F.sum(F.when(F.col("n") < k, 1).otherwise(0))
             .cast("bigint").alias("groups_lt_k"),
             F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
             .cast("bigint").alias("rows_lt_k"),
             F.expr(f"SUM(CASE WHEN n < {int(k)} THEN n ELSE 0 END)"
                    " * 1000000 DIV SUM(n)")
             .cast("bigint").alias("rows_lt_k_ppm"))
         .select((F.col("m") * F.lit(int(base_width))).cast("int")
                 .alias("width"),
                 "n_groups", "groups_lt_k", "rows_lt_k", "rows_lt_k_ppm"))
    # the selection rides an unpartitioned window over the LADDER table —
    # |multipliers| rows by construction (the q246 bounded-post-rollup
    # pattern, inventoried in tests/test_window_lint.py) — so the sweep
    # consumes its input exactly once: one corpus scan for the whole
    # ladder, plan-pinned in tests/test_privacy.py.
    from pyspark.sql import Window

    w = Window.partitionBy()
    cw = F.coalesce(
        F.min(F.when(F.col("rows_lt_k_ppm") <= budget_ppm,
                     F.col("width"))).over(w),
        F.max("width").over(w))
    return (s.select("width", "n_groups", "groups_lt_k", "rows_lt_k",
                     "rows_lt_k_ppm",
                     (F.col("width") == cw).cast("int").alias("is_chosen"))
            .orderBy("width"))


def k_anonymize(df: DataFrame, group_cols: list[str], value_col: str,
                k: int = 5, base_width: float = 2000.0,
                multipliers: tuple[int, ...] = (1, 2, 4, 8),
                budget_ppm: int = 50000) -> tuple[DataFrame, DataFrame]:
    """Enforce k-anonymity by global recoding + suppression: generalize
    ``value_col`` to the band width chosen by ``anonymize_sweep`` (the
    smallest within the residual-risk budget, else the widest), then
    SUPPRESS the rows still in sub-k groups. Returns ``(kept,
    suppressed)`` — a total, deterministic split; every group of ``kept``
    has at least k rows (the post-condition the unit tests pin), and
    ``kept`` carries the generalized interval (band_lo, band_hi) instead
    of the raw value, which is dropped.

    Like the quarantine-ingest split, both halves are first-class
    outputs: suppressed rows are retained (with full columns) for review,
    not silently deleted.
    """
    sweep = anonymize_sweep(df, group_cols, value_col, k=k,
                            base_width=base_width,
                            multipliers=multipliers, budget_ppm=budget_ppm)
    cw = sweep.filter("is_chosen = 1").select(
        F.col("width").cast("double").alias("cw"))
    banded = (df.join(F.broadcast(cw))
              .withColumn("band",
                          F.floor(F.col(value_col) / F.col("cw"))
                          .cast("int")))
    sizes = banded.groupBy(*group_cols, "band").agg(
        F.count(F.lit(1)).alias("_gn"))
    tagged = banded.join(sizes, [*group_cols, "band"])
    kept = (tagged.filter(F.col("_gn") >= k)
            .withColumn("band_lo", F.col("band") * F.col("cw"))
            .withColumn("band_hi", (F.col("band") + 1) * F.col("cw"))
            .drop("_gn", "band", "cw", value_col))
    suppressed = tagged.filter(F.col("_gn") < k).drop("_gn", "band", "cw")
    return kept, suppressed


def dp_noisy_release(df: DataFrame, group_cols: list[str],
                     releases: tuple[tuple[str, float], ...] = (
                         ("e05", 0.5), ("e20", 2.0)),
                     sensitivity: int = 1, salt: str = "dp") -> DataFrame:
    """Laplace-mechanism noisy count release (Dwork et al. 2006) over
    ``group_cols``, one arm per (label, epsilon) rung: the release-side
    complement of the audit/enforce family — k-anonymize suppresses, the
    DP release perturbs, trading exactness for a worst-case privacy bound
    (each count is ε-DP at the given sensitivity; the ladder's total spend
    is Σε by sequential composition, asserted in tests).

    Noise is the textbook inverse-CDF Laplace draw,
    ``-(Δ/ε)·sgn(u−½)·ln(1−2|u−½|)``, with u derived DETERMINISTICALLY
    from md5(cell key, salt, rung label) — a keyed-PRF stand-in for the
    mechanism's RNG (the seeded-sampling convention of q65/q83) so a
    release is replayable, engine-invariant, and each rung draws
    independent noise. Production note: a keyed PRF is only as private as
    the key — rotate ``salt`` per release and treat it as a secret, or
    swap in real RNG where replayability isn't required; everything else
    is unchanged.

    Exactness contract: u = (v + ½)/2³² from the first 8 md5 nibbles is
    an exact double (all terms are multiples of 2⁻³² — no rounding
    anywhere before the ln); ln is quantized DECIMAL(18,6)→ROUND 4 (the
    q132 two-step) BEFORE the exact-decimal scale multiply, so the noisy
    count is bit-identical on any engine. ε rungs must keep Δ/ε
    decimal-exact (0.5/2.0 do). Negative noisy counts are released as-is:
    clamping is post-processing the consumer may apply, but baking it in
    would bias the release.

    100 TB story: one map-side-combinable group-by; the rung ladder
    explodes the model-sized group table; noise is scan-side expression
    arithmetic (whole-stage codegen, no shuffle beyond the group-by).

    The per-cell count is the `count` IncrementalAggregate kind, so the
    live release (S58) maintains the same count table incrementally and
    reads out through ``dp_release_from_counts`` — and because the noise
    is a pure function of the cell key, batch ≡ stream is exact, not just
    distribution-equal."""
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    return dp_release_from_counts(counts, group_cols, releases=releases,
                                  sensitivity=sensitivity, salt=salt)


def _attach_laplace_draw(x: DataFrame, group_cols: list[str],
                         salt: str) -> DataFrame:
    """Shared keyed-PRF Laplace draw: given a table carrying the cell key
    and an exploded ``lbl`` rung column, append ``_sg`` (±1) and ``_lnq``
    (the DECIMAL-quantized ln factor) from md5(cell:salt:lbl). See
    ``dp_noisy_release`` for the exactness contract.

    NULL group values encode as an explicit control-char sentinel (not
    concat_ws's silent skip, under which cells ('x', NULL) and (NULL,
    'x') would collapse onto the same key and draw IDENTICAL — i.e. not
    independent — noise). Each part is LENGTH-PREFIXED (``len#part``)
    before the ':' join so the encoding is injective: without it,
    ('a:b','c') and ('a','b:c') concatenate identically and two distinct
    cells draw the same, non-independent noise."""
    key_parts = ", ".join(
        f"concat(cast(length(ifnull(cast({c} as string), chr(1)))"
        f" as string), '#', ifnull(cast({c} as string), chr(1)))"
        for c in group_cols)
    return (x.withColumn("_v", F.expr(
        f"CAST(conv(substr(md5(cast("
        f"concat_ws(':', {key_parts},"
        f" '{salt}', lbl) as binary)), 1, 8), 16, 10) AS BIGINT)"))
        .withColumn("_u", (F.col("_v") + F.lit(0.5)) / F.lit(4294967296.0))
        .withColumn("_sg", F.when(F.col("_u") >= 0.5, 1).otherwise(-1))
        .withColumn("_lnq", F.round(
            F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("_u") - F.lit(0.5)))
            .cast("decimal(18,6)"), 4)))


def _rung_explode(releases: tuple[tuple[str, float], ...]) -> Column:
    return F.explode(F.array(*[
        F.struct(F.lit(lbl).alias("lbl"), F.lit(float(e)).alias("eps"))
        for lbl, e in releases]))


def dp_release_from_counts(
        counts: DataFrame, group_cols: list[str],
        releases: tuple[tuple[str, float], ...] = (
            ("e05", 0.5), ("e20", 2.0)),
        sensitivity: int = 1, salt: str = "dp") -> DataFrame:
    """The Laplace-release closed form over a (cell)-grain count table
    ``counts`` (columns: *group_cols, n) — shared VERBATIM by the q347
    batch query and the S58 live release, whose IncrementalAggregate state
    has exactly this shape (`count` kind keyed by the cell)."""
    x = (counts.select(*group_cols, F.col("n").cast("bigint").alias("n"))
         .withColumn("_r", _rung_explode(releases))
         .select(*group_cols, "n", F.col("_r.lbl").alias("lbl"),
                 F.col("_r.eps").alias("eps")))
    x = _attach_laplace_draw(x, group_cols, salt).withColumn(
        "_b", (F.lit(float(sensitivity)) / F.col("eps"))
        .cast("decimal(18,6)"))
    return (x.select(
        "lbl", "eps", *group_cols,
        F.round(F.col("n") + (-F.col("_sg")) * F.col("_b") * F.col("_lnq"),
                0).cast("bigint").alias("n_noisy"))
        .orderBy("lbl", *group_cols))


def dp_noisy_sum_release(
        df: DataFrame, group_cols: list[str], contributor_col: str,
        value_col: str, clip: float,
        releases: tuple[tuple[str, float], ...] = (
            ("e05", 0.5), ("e20", 2.0)),
        salt: str = "dpsum") -> DataFrame:
    """Bounded-contribution Laplace SUM release — the realistic sibling of
    the count release: an unbounded SUM has unbounded sensitivity (one
    whale order moves it arbitrarily), so user-level DP first CLIPS each
    contributor's total at ``clip`` and then the release's sensitivity is
    exactly ``clip`` — the standard contribution-bounding recipe
    (Dwork & Roth 2014 §3; the DP-SGD gradient-clipping idea applied to
    analytics). Assumes each contributor maps to ONE cell (customer →
    nation here); a cross-cell contributor would need its GLOBAL total
    clipped instead.

    Two-level plan, both map-side combinable: (cell, contributor) sums in
    exact DECIMAL(18,6) → clamp to [−clip, clip] → cell sums → the shared
    keyed-PRF Laplace draw with b = clip/ε (decimal-exact for the default
    ladder). The clamp is TWO-SIDED: on a signed value column (refunds,
    chargebacks) a one-sided LEAST would leave negative contributions
    unbounded and the claimed sensitivity false. Clipping diagnostics
    (how many contributors bind) are NOT released — that statistic is not
    protected; audit it in tests. Noisy sums release rounded to integer
    units, negatives unclamped."""
    per = df.groupBy(*group_cols, contributor_col).agg(
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"))
    c = F.lit(float(clip)).cast("decimal(18,6)")
    clipped = per.select(
        *group_cols,
        F.greatest(F.least(F.col("_s"), c), -c).alias("_cs"))
    cells = clipped.groupBy(*group_cols).agg(F.sum("_cs").alias("t"))
    x = (cells.withColumn("_r", _rung_explode(releases))
         .select(*group_cols, "t", F.col("_r.lbl").alias("lbl"),
                 F.col("_r.eps").alias("eps")))
    x = _attach_laplace_draw(x, group_cols, salt).withColumn(
        "_b", (F.lit(float(clip)) / F.col("eps")).cast("decimal(18,6)"))
    return (x.select(
        "lbl", "eps", *group_cols,
        F.round(F.col("t") + (-F.col("_sg")) * F.col("_b") * F.col("_lnq"),
                0).cast("bigint").alias("sum_noisy"))
        .orderBy("lbl", *group_cols))


def dp_thresholded_release(
        df: DataFrame, group_cols: list[str], delta: float = 1e-6,
        releases: tuple[tuple[str, float], ...] = (
            ("e05", 0.5), ("e20", 2.0)),
        sensitivity: int = 1, salt: str = "dp") -> DataFrame:
    """Stability-based thresholded histogram release — the recipe for the
    case the plain count release cannot handle: when the CELL KEYS
    themselves are data (user-generated strings, rare categories), merely
    publishing that a key exists leaks the presence of its ≥1 contributors.
    The fix (Korolova et al. 2009's (ε,δ) partition selection, the
    workhorse of production DP histograms): add Laplace noise as usual,
    then publish ONLY cells whose noisy count clears

        τ = ⌈1 + (Δ/ε)·ln(1/(2δ))⌉

    which bounds the probability that a key with a single contributor is
    ever published by δ — turning ε-DP over known domains into (ε,δ)-DP
    over unknown ones. τ is integer (driver-side ceil of an exact formula)
    so the drop decision is engine-invariant; a stricter ε means a larger
    noise scale and therefore a HIGHER bar to publish — small cells
    survive the loose rung and vanish from the strict one. Emits τ per
    rung for auditability; everything else inherits the
    ``dp_noisy_release`` contract (keyed-PRF noise, unclamped, one
    group-by + model-sized ladder)."""
    import math

    rel = dp_noisy_release(df, group_cols, releases=releases,
                           sensitivity=sensitivity, salt=salt)
    tau = {lbl: int(math.ceil(
        1.0 + (float(sensitivity) / e) * math.log(1.0 / (2.0 * delta))))
        for lbl, e in releases}
    tau_col = F.coalesce(*[
        F.when(F.col("lbl") == lbl, F.lit(t)) for lbl, t in tau.items()])
    return (rel.withColumn("tau", tau_col.cast("int"))
            .filter(F.col("n_noisy") >= F.col("tau"))
            .orderBy("lbl", *group_cols))
