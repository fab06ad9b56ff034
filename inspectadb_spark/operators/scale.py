"""Skew & co-location operators — the 100 TB shuffle-hygiene toolkit
(SURVEY.md §4.2 / M8).

AQE handles moderate skew at runtime (skew-join split); these helpers are
for the cases planners can't fix:

- ``salted_join``: a hot key (one user, one null-ish default) concentrates a
  shuffle partition. Salting fans the hot side into S sub-keys and replicates
  the other side S ways, so the hot key's rows spread over S tasks. Identical
  results to a plain inner/left join (verified by tests).
- ``two_level_agg``: skewed groupBy keys aggregate in two hops — first by
  (key, salt) [spreads the hot key], then by key [merges the S partials].
  Works for any algebraic aggregate (sum/count/min/max).
- ``bucketed_write`` / co-located joins: pre-shuffle both sides of a
  recurring join into the same bucket layout; subsequent equi-joins on the
  bucket key need NO exchange (plan-audited in tests) — at 100 TB this is
  the difference between re-shuffling terabytes per query and never
  shuffling them again.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_group_stats(df: DataFrame, keys: Sequence[str],
                     **aggs) -> DataFrame:
    """Attach group-level aggregates to every row as WINDOW columns —
    the mechanized r13/r14 fix for the ``groupBy`` branch + join-back
    shape (guide §2.4).

    ``df.join(df.groupBy(k).agg(...), k)`` re-executes the shared frame
    once per consumer: the join-implied ``isnotnull(k)`` filter and the
    branch's column prune push into each branch's scan, the subtrees stop
    being byte-identical, and exchange/stage reuse is lost — one full
    base-table pass PER BRANCH (the r13 audit found thirteen queries
    paying this). A ``partitionBy(keys)`` window computes the same values
    on the one shuffled stream in place.

    Equivalence bound: the window ≡ the INNER join-back only when every
    row's key group is kept (true by construction — the group frame
    derives from ``df`` itself and inner-joining back on its own keys
    drops only NULL-key rows, which the caller must handle explicitly if
    NULL keys exist). It does NOT apply when the join-back intentionally
    drops or invents keys (left/anti OOV probes like q302's KN tables,
    where absent-key NULLs are the signal).

    ``aggs``: name -> PLAIN aggregate Column (the window wraps the
    aggregate itself, so post-aggregate expressions like ``.cast`` belong
    on the returned column, not inside), e.g.
    ``with_group_stats(df, ["k"], total=F.sum("x"), n=F.count(F.lit(1)))``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow input to the session's default
    parallelism — ONLY when its scan has fewer splits than cores.

    The guide-§2.1 straggler fix for per-row-expensive projections
    (md5-per-position gram explodes, replica expansions): a small file
    arrives as one input split, so the N-times-amplified downstream work
    runs in a single task while the rest of the cluster idles. The
    repartition shuffles only the narrow INPUT rows (cheap relative to
    the amplified work). Scale-adaptive by construction: on a corpus
    whose scan already has >= defaultParallelism splits this is a
    NO-OP — no shuffle is added at 100 TB, where the scan parallelizes
    itself. Results are unaffected: callers key every downstream
    operation, never partition placement.

    Call it on SCAN-SIDE frames only (probing partition counts through a
    join lineage could execute query stages under AQE); streaming frames
    pass through untouched (micro-batch sizing is the trigger's job)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to left-side key skew.

    Left rows get a deterministic salt from a row-content hash (xxhash64 of
    all columns — no RNG, so retries/speculative tasks agree); right rows are
    replicated ``salt`` times. The join key becomes (on, salt), then salt is
    dropped. Result == left.join(right, on, how), row-for-row.
    """
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_replicated, [on, "_salt"], how)
    return out.drop("_salt")


def two_level_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant groupBy for algebraic aggregates.

    ``aggs`` maps output column -> "fn(col)" with fn in {sum, count, min,
    max}. Stage 1 groups by (keys, salt) — the hot key spreads across
    ``salt`` reducers; stage 2 merges partials by keys alone (count merges
    via sum). Result == df.groupBy(keys).agg(...) exactly, because these
    aggregates are associative.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    first, second = [], []
    for out_col, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(")
        fn = fn.strip().lower()
        if fn not in merge_fn:
            raise ValueError(f"not algebraic: {spec!r}")
        first.append(F.expr(f"{fn}({col})").alias(f"_p_{out_col}"))
        second.append(F.expr(f"{merge_fn[fn]}(_p_{out_col})").alias(out_col))
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*first)
    return partial.groupBy(*keys).agg(*second)


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    Both sides of a recurring join written with the SAME (col, num_buckets)
    lets Catalyst plan a SortMergeJoin with zero Exchange — the shuffle was
    paid once at write time. Requires saveAsTable (bucket metadata lives in
    the catalog, not the files)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Key-distribution diagnostics for shuffle planning: the top-k heavy
    keys with integer-exact share and times-average factors.

    This is the operator you run BEFORE choosing a salted_join /
    two_level_agg treatment: it answers "is this key skewed, and by how
    much" with one groupBy + a broadcast of 1-row global stats.  All
    derived measures are integer floor arithmetic (share in ppm, skew as
    x-average ×100), so the profile is byte-identical on any engine and
    any partitioning.  Output: rank, key (stringified), cnt, share_ppm,
    x_avg_x100.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_n_keys")
    )
    from pyspark.sql import Window

    top = (
        counts.orderBy(F.col("cnt").desc(), "key")
        .limit(top_k)
        .join(F.broadcast(stats))
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "key"))
            .cast("int")
            .alias("rank"),
            "key",
            "cnt",
            F.expr("cnt * 1000000 DIV _total").alias("share_ppm"),
            F.expr("cnt * 100 * _n_keys DIV _total").alias("x_avg_x100"),
        )
    )
    return top


def zorder_key(x: str, y: str, bits: int = 8):
    """Morton (z-order) interleave of two pre-quantized coordinates as a
    Column — pure integer arithmetic (DIV/%/×), so the key is byte-identical
    in any engine; no bit-op dialect differences.

    Z-ordering is the multi-dimensional clustering layout (Delta/Iceberg
    OPTIMIZE ZORDER): range-partitioning + sorting by the interleaved key
    co-locates rows that are close in BOTH dimensions, so scans filtering
    on either column prune most files. Inputs must already be quantized to
    [0, 2^bits); the caller owns the quantization (it is domain knowledge).
    """
    terms = []
    for j in range(bits):
        terms.append(f"(({x} DIV {1 << j}) % 2) * {1 << (2 * j)}")
        terms.append(f"(({y} DIV {1 << j}) % 2) * {1 << (2 * j + 1)}")
    return F.expr(" + ".join(terms))


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, bits: int = 8, num_partitions: int = 32
) -> DataFrame:
    """Repartition-by-range + in-partition sort on the z-order key: the
    write-side layout operator. Each output file then covers a compact
    rectangle of (x, y) space — the property the q146 locality audit pins."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    return keyed.repartitionByRange(num_partitions, "_zkey").sortWithinPartitions(
        "_zkey"
    )


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for plan audits / shuffle counting)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the
    metric to minimize; plan-audit tests pin expected values so a regression
    that silently adds a shuffle fails CI."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        # BroadcastExchange ships a dim to every executor once — not a
        # shuffle of the data; ReusedExchange re-reads an existing one.
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Equi-join rewrite of the keyless interval-containment join
    (``p.ts BETWEEN i.start AND i.end`` with NO shared equi key) — the
    shape Spark would otherwise plan as BroadcastNestedLoopJoin (fine for
    small interval sets, catastrophic for millions of intervals).

    Both sides map onto a fixed time grid: each interval explodes to the
    cells it overlaps, each point keys to its single cell, and the join
    becomes a plain shuffled equi-join on the cell id with an exact
    containment post-filter. A matching (point, interval) pair collides
    in exactly ONE cell — the point's — so the rewrite needs no dedup and
    is row-identical to the theta join (parity-tested).

    Scale shape (100 TB): cost is one equi-shuffle on the cell key plus
    interval replication by ceil(span/bin)+1. Pick ``bin_seconds`` near
    the typical interval span: larger bins cut replication but widen the
    post-filtered candidate set; both sides of that tradeoff are linear,
    never quadratic. Skewed hot cells (an interval storm in one hour)
    compose with salted_join on the cell id.
    """
    us = 1_000_000 * bin_seconds
    pb = points.withColumn(
        "_cell",
        F.expr(f"unix_micros(CAST({point_ts} AS TIMESTAMP)) DIV {us}"))
    ib = intervals.withColumn(
        "_cell",
        F.explode(F.sequence(
            F.expr(f"unix_micros(CAST({start_col} AS TIMESTAMP)) DIV {us}"),
            F.expr(f"unix_micros(CAST({end_col} AS TIMESTAMP)) DIV {us}"))))
    return (
        pb.join(ib, "_cell")
        .filter((F.col(point_ts) >= F.col(start_col))
                & (F.col(point_ts) <= F.col(end_col)))
        .drop("_cell")
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact global ROW_NUMBER() over (value, id) WITHOUT a global sort —
    the distributed form of the rank every Lorenz/decile/ntile computation
    needs. A plain ``ROW_NUMBER() OVER (ORDER BY ...)`` moves the whole
    table through ONE task (Spark warns and obliges); this splits it:

    1. bucket = value DIV bucket_width (order-preserving integer bins);
    2. per-bucket counts → cumulative offsets via a window over the
       BUCKET table (rows = distinct buckets, small by construction);
    3. rank = offset[bucket] + row_number within bucket — a properly
       partitioned window.

    Result is bit-identical to the global window (parity-tested). Bucket
    skew (one value dominating) degrades a bucket to the naive case —
    pick bucket_width so typical buckets hold ~1e5-1e6 rows, and compose
    with a finer width (or salt + second-level offsets) for hot ranges.
    Appends a ``rank`` column (1-based).
    """
    from pyspark.sql import Window

    b = df.withColumn("_bkt", F.expr(f"{value_col} DIV {bucket_width}"))
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    woff = (Window.orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = counts.withColumn(
        "_off", F.sum("_n").over(woff) - F.col("_n")).drop("_n")
    win = Window.partitionBy("_bkt").orderBy(value_col, id_col)
    return (
        b.join(F.broadcast(offsets), "_bkt")
        .withColumn("rank", F.col("_off") + F.row_number().over(win))
        .drop("_bkt", "_off")
    )


def global_ntile(
    df: DataFrame,
    k: int,
    bucket_expr,
    order_cols: Sequence,
    out_col: str,
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY ...)`` WITHOUT a global single-task
    sort — the distributed form of every quantile-scoring window (RFM
    scores, decile labels). ``ntile`` is a closed-form function of
    (global rank, total count, k): the first ``n % k`` tiles hold
    ``n DIV k + 1`` rows, the rest ``n DIV k``, so

        tile(r) = ceil(r / (q+1))                      if r <= rem*(q+1)
                  rem + ceil((r - rem*(q+1)) / q)      otherwise
        with q = n DIV k, rem = n % k.

    The global rank comes from the same bucket-offset scheme as
    ``global_rank``: ``bucket_expr`` must be an integer expression
    MONOTONE NON-DECREASING along the requested order (for a DESC
    primary sort, negate: ``(-freq) DIV w``), coarse enough that the
    bucket table stays small; ``order_cols`` is the full ORDER BY
    (directions included, deterministic tiebreak last). Only per-bucket
    counts cross the single-partition exchange — the data-sized stream
    never enters an unpartitioned window. Bit-identical to the naive
    ``F.ntile(k).over(Window.orderBy(...))`` (parity-tested). Appends
    ``out_col`` as INT.
    """
    from pyspark.sql import Window

    b = df.withColumn("_bkt", bucket_expr)
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    woff = (Window.orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = counts.withColumn(
        "_off", F.sum("_n").over(woff) - F.col("_n")).drop("_n")
    total = counts.agg(F.sum("_n").cast("bigint").alias("_tot"))
    win = Window.partitionBy("_bkt").orderBy(*order_cols)
    ranked = (
        b.join(F.broadcast(offsets), "_bkt")
        .join(F.broadcast(total))
        .withColumn("_rk", F.col("_off") + F.row_number().over(win))
    )
    # greatest(q, 1): the ELSE branch is unreachable when q = 0 (every
    # rank falls in the first n tiles), but ANSI mode must never see a
    # DIV 0 even speculatively
    tile = F.expr(
        f"CASE WHEN _rk <= (_tot % {k}) * (_tot DIV {k} + 1) "
        f"THEN (_rk + _tot DIV {k}) DIV (_tot DIV {k} + 1) "
        f"ELSE _tot % {k} + (_rk - (_tot % {k}) * (_tot DIV {k} + 1) "
        f"+ greatest(_tot DIV {k}, 1) - 1) DIV greatest(_tot DIV {k}, 1) "
        f"END")
    return (ranked.withColumn(out_col, tile.cast("int"))
            .drop("_bkt", "_off", "_rk", "_tot"))


def global_running_max(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "run_max",
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact ``MAX(val) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — the running high-watermark of a log —
    WITHOUT a global single-task sort, by the same bucket-offset scheme as
    ``global_rank``:

    1. bucket = order DIV bucket_width (order-preserving);
    2. per-bucket max → strict-prefix max over the bucket table (small)
       gives each bucket its carry-in (max of ALL earlier buckets);
    3. within-bucket strict-preceding running max (properly partitioned
       window), combined with the carry-in via null-skipping GREATEST.

    Bit-identical to the naive global window (parity-tested). Requires
    ``order_col`` values unique (a log sequence / LSN / event id) so
    "preceding" is well-defined. First row's watermark is NULL.
    """
    from pyspark.sql import Window

    b = df.withColumn("_bkt", F.expr(f"{order_col} DIV {bucket_width}"))
    bmax = b.groupBy("_bkt").agg(F.max(val_col).alias("_bmax"))
    wprev = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = bmax.withColumn("_carry", F.max("_bmax").over(wprev)).drop("_bmax")
    win = (Window.partitionBy("_bkt").orderBy(order_col)
           .rowsBetween(Window.unboundedPreceding, -1))
    return (
        b.join(F.broadcast(carry), "_bkt")
        .withColumn(out_col,
                    F.greatest(F.col("_carry"), F.max(val_col).over(win)))
        .drop("_bkt", "_carry")
    )


def global_avg_rank2(
    df: DataFrame,
    value_col: str,
    out_col: str = "rank2",
    bucket_width: int = 1000,
) -> DataFrame:
    """TWICE the tie-averaged global rank of ``value_col`` (ascending),
    exact, WITHOUT a single-task global sort — the rank convention every
    rank statistic (Spearman's rho, Mann-Whitney U, Kruskal-Wallis)
    needs. For a value v:

        avg_rank(v) = #{rows < v} + (#{rows == v} + 1) / 2

    which is half-integral under even tie counts, so the helper returns
    ``rank2 = 2 * #{rows < v} + #{rows == v} + 1`` — always an integer,
    keeping every downstream moment sum exact.

    Scheme (same shape as ``global_rank``, one level shallower): ranks
    depend only on per-VALUE counts, so

    1. groupBy(value) -> (value, n) — one row per DISTINCT value;
    2. bucket = value DIV bucket_width; per-bucket count sums ->
       cumulative offsets via a window over the BUCKET table (bounded by
       value-range/width, not by rows);
    3. within-bucket prefix sums partitioned by bucket give
       #{rows < v}; join (value -> rank2) back on the value column.

    Only per-bucket sums cross the single-partition exchange; both the
    distinct-value aggregation and the final join shuffle on the value
    key. Parity-tested bit-identical to the naive global-window form.
    ``value_col`` must be integral (DIV bucketing); appends ``out_col``
    BIGINT.
    """
    return df.join(avg_rank2_map(df, value_col, out_col, bucket_width),
                   value_col)


def avg_rank2_map(
    df: DataFrame,
    value_col: str,
    out_col: str = "rank2",
    bucket_width: int = 1000,
) -> DataFrame:
    """The (value -> rank2) lookup behind ``global_avg_rank2``, exposed so
    a query that ranks SEVERAL columns of one frame can build each map
    from the base frame directly and join them all onto a single pass —
    CHAINING global_avg_rank2 calls instead re-plans the whole upstream
    lineage inside each call's count branch, multiplying base-table scans
    (q273 planned 7 lineitem scans that way; maps-then-join plans 3).
    Output: one row per distinct ``value_col`` with ``out_col`` BIGINT.
    """
    from pyspark.sql import Window

    vc = (df.groupBy(value_col).agg(F.count("*").alias("_n"))
          .withColumn("_bkt", F.expr(f"{value_col} DIV {bucket_width}")))
    bcounts = vc.groupBy("_bkt").agg(F.sum("_n").alias("_bn"))
    woff = (Window.orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = bcounts.withColumn(
        "_boff", F.sum("_bn").over(woff) - F.col("_bn")).drop("_bn")
    wless = (Window.partitionBy("_bkt").orderBy(value_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        vc.join(F.broadcast(offsets), "_bkt")
        .withColumn("_less", F.col("_boff") + F.sum("_n").over(wless)
                    - F.col("_n"))
        .select(value_col,
                (F.lit(2) * F.col("_less") + F.col("_n") + F.lit(1))
                .cast("bigint").alias(out_col))
    )
