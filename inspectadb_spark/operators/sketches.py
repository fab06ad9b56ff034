"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark
built-ins) — the continuous-aggregate pattern for COUNT(DISTINCT) at 100 TB
(SURVEY.md §2.2d approx class; composes with q59's hierarchical rollup).

Exact distinct counts cannot be rolled up (daily distincts don't sum to
weekly distincts), so a scale pipeline stores a per-bucket SKETCH instead:
sketches are order-insensitive and mergeable, so any coarser tier — weekly,
monthly, all-time, or ad-hoc bucket unions — comes from merging the stored
binaries, never from rescanning raw events. Estimate error is the standard
HLL bound (~1.04/sqrt(2^lgK)); tests pin 5% against exact and, critically,
rollup-merge ≡ direct-sketch (lossless merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct_by(
    df: DataFrame,
    bucket_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketch of ``value_col`` (binary, storable/mergeable) +
    its point estimate. One aggregation, map-side combinable."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_k))).alias("estimate"),
    )


def merge_sketches(
    sketches: DataFrame,
    bucket_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll stored sketches up to a coarser bucketing — touches only the
    sketch binaries (bytes per bucket), never the raw rows."""
    return sketches.groupBy(*bucket_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col)).alias("estimate"),
        F.hll_union_agg(sketch_col).alias("sketch"),
    )


# -- Count-Min frequency sketch (portable md5 bucketing) ----------------------
#
# COUNT(*)-per-key continuous aggregates have the same rollup problem HLL
# solves for COUNT(DISTINCT): storing exact per-key counts per bucket is
# O(cardinality) per bucket. A Count-Min sketch (Cormode & Muthukrishnan,
# J.Algorithms 2005) stores a depth x width counter grid instead; merge is
# element-wise addition (plain SUM), and a point estimate is the min over
# depth rows — never an underestimate. We represent the grid RELATIONALLY
# as (d, bucket, cnt) rows, so building it is one map-side-combinable
# groupBy (<= depth*width result rows regardless of input size), merging
# stored sketches is a SUM, and probing is a broadcast join — every step
# stays JVM-side and 100 TB-shaped. Bucketing uses the same two-hex-nibble
# md5 arithmetic as pipeline.assign_shards, so an identical sketch is
# expressible in DuckDB and the whole pipeline hash-matches (q94).

_HEX = "0123456789abcdef"


def _cms_bucket_expr(col: str, d: int, width: int, salt: str):
    """Bucket for hash row ``d``: two md5 hex nibbles of "<value>:<salt>:<d>"
    (uniform 0..255) mod ``width``. Engine-portable; q94's oracle inlines
    the identical strpos/substr arithmetic."""
    h = f"md5(cast(concat(cast({col} as string), ':{salt}:{d}') as binary))"
    v = (
        f"16 * (instr('{_HEX}', substr({h}, 1, 1)) - 1)"
        f" + instr('{_HEX}', substr({h}, 2, 1)) - 1"
    )
    return F.expr(f"CAST(({v}) % {width} AS INT)")


def _bucket_rows(col: str, depth: int, width: int, salt: str):
    return F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            _cms_bucket_expr(col, d, width, salt).alias("bucket"),
        )
        for d in range(depth)
    ])


def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the (d, bucket, cnt) counter grid for ``col``.

    One explode (xdepth rows, pipelined — no shuffle) + one aggregation
    whose result is <= depth*width rows: the reduce side is constant-size
    no matter how many input rows, so this scales to arbitrary input."""
    return (
        df.select(F.explode(_bucket_rows(col, depth, width, salt)).alias("e"))
        .select(F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge stored sketch grids (e.g. per-day) into one: element-wise SUM.
    Lossless: summing per-bucket grids is exactly the grid of the union."""
    return sketches.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate counts for ``probes[col]``: min over depth rows of the
    probed buckets (0 if unseen). The grid is tiny -> broadcast join; probes
    never shuffle beyond their own final groupBy."""
    e = (
        probes.select(col, F.explode(_bucket_rows(col, depth, width, salt)).alias("e"))
        .select(col, F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
    )
    return (
        e.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# -- Bloom membership filter (portable md5 bucketing) --------------------------
#
# The third mergeable sketch in the family (HLL: distinct counts, CMS:
# frequencies, Bloom: membership). Represented RELATIONALLY as distinct
# (bit,) rows: build is one distinct-agg bounded by m rows, merge is a
# UNION/distinct, and probing is k broadcast-joined bit lookups. No false
# negatives ever; false positives bounded by the standard (1-e^{-kn/m})^k.
# Same two-nibble md5 bucketing as CMS, so a DuckDB oracle reproduces the
# grid bit-for-bit.

def _md5_bits_sql(col: str, salt: str, nibbles: int = 6) -> str:
    """Portable md5→integer (instr/substr arithmetic — valid and identical
    in Spark SQL and DuckDB, unlike conv())."""
    h = f"md5(CAST({col} AS STRING) || ':{salt}')"
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - i)}"
        for i in range(nibbles)
    ]
    return "(" + " + ".join(terms) + ")"


def bloom_build(df: DataFrame, col: str, k: int = 4, m: int = 4096,
                salt: str = "bloom") -> DataFrame:
    """The set's (bit,) rows: bit_i(x) = md5-uniform_i(x) mod m, i < k."""
    bits = F.array(*[
        (F.expr(_md5_bits_sql(col, f"{salt}{i}")) % m).alias(f"b{i}")
        for i in range(k)
    ])
    return (
        df.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_probe(sketch: DataFrame, probes: DataFrame, col: str,
                k: int = 4, m: int = 4096, salt: str = "bloom") -> DataFrame:
    """probes + boolean ``maybe_member``: true iff ALL k bits are set.
    The sketch is ≤ m rows — broadcast; the probe side never shuffles."""
    e = probes.select(
        col,
        F.explode(F.array(*[
            (F.expr(_md5_bits_sql(col, f"{salt}{i}")) % m)
            for i in range(k)
        ])).alias("bit"),
    )
    hit = sketch.withColumn("_set", F.lit(1))
    return (
        e.join(F.broadcast(hit), "bit", "left")
        .groupBy(col)
        .agg((F.count("*") == F.count("_set")).alias("maybe_member"))
    )


# -- mergeable value-histogram quantile sketch ---------------------------------
#
# The fourth mergeable summary (HLL distincts, CMS frequencies, Bloom
# membership, histogram quantiles): per-bucket (bin, cnt) rows at a fixed
# value resolution. Merge = SUM per bin (lossless for the estimator);
# quantile estimate = the first bin whose cumulative count reaches p% —
# error bounded by one bin width, deterministically, on any engine
# (pure integer comparisons). The rollup-friendly alternative to exact
# percentiles (which cannot be merged across buckets).

def vhist_sketch(df: DataFrame, col: str, width: int, n_bins: int,
                 bucket_cols: list | None = None) -> DataFrame:
    """(bucket_cols..., bin, cnt) rows; bin = clamp(floor(col/width))."""
    b = F.expr(f"CAST(LEAST(FLOOR({col} / {width}.0), {n_bins - 1}) AS INT)")
    keys = list(bucket_cols or []) + [b.alias("bin")]
    return df.groupBy(*keys).agg(F.count("*").alias("cnt"))


def vhist_merge(sketches: DataFrame, bucket_cols: list | None = None) -> DataFrame:
    """Roll stored histograms up to coarser buckets: element-wise SUM."""
    keys = list(bucket_cols or []) + ["bin"]
    return sketches.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def vhist_quantile(sketch: DataFrame, pcts: list, width: int) -> DataFrame:
    """(p, est) per requested integer percent: est = upper edge of the
    first bin whose cumulative count covers p% (integer comparisons only,
    engine-exact; error ≤ one bin width)."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cum = sketch.select(
        "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                              Window.unboundedFollowing)
        ).alias("total"),
    )
    outs = []
    for p in pcts:
        est = (
            cum.filter(F.col("cum") * 100 >= F.lit(p) * F.col("total"))
            .agg(F.min("bin").alias("b"))
            .select(F.lit(p).alias("p"),
                    ((F.col("b") + 1) * width).cast("double").alias("est"))
        )
        outs.append(est)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def bottom_k(df: DataFrame, part_cols: list[str], k: int,
             h_col: str = "h") -> DataFrame:
    """The one KMV bottom-k rule, shared by every sketch site (batch
    signature, pairwise union merge, streaming state merge): distinct
    hashes per partition key, k lexicographically smallest kept. Keeping
    this in ONE place is what guarantees stored streaming state keeps
    matching batch-built signatures if the rule ever changes."""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(h_col)
    return (
        df.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
    )


def kmv_signature(df: DataFrame, group_col: str, key_col: str,
                  k: int = 128) -> DataFrame:
    """Bottom-k (KMV) distinct sketch per group: the k lexicographically
    smallest DISTINCT md5 digests of ``key_col``. Returns (g, h, r).

    A KMV signature is a mergeable distinct-set summary: the bottom-k of a
    union is computable from the per-part bottom-k's alone, so signatures
    roll up across partitions, days, or sources without rescanning raw
    keys. md5's lexicographic order is a fixed uniform order — no RNG, no
    seed, engine/run/partition invariant (same determinism contract as the
    md5 acceptance rules in operators/pipeline.py).

    NULL keys are excluded (md5(NULL) = NULL): Spark windows sort NULL
    FIRST while ANSI SQL engines sort it LAST, so a NULL in the signature
    would both displace a real k-th hash and break cross-engine parity —
    and a NULL key is not a set member in the first place.

    Scale shape (100 TB): one distinct on (group, digest) — the only
    data-sized shuffle — then a per-group bottom-k window over the
    distinct stream. Output is |groups| * k rows: constant per group.
    """
    h = (
        df.select(F.col(group_col).alias("g"),
                  F.md5(F.col(key_col).cast("string")).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    return bottom_k(h, ["g"], k)


def kmv_pairwise_jaccard(df: DataFrame, group_col: str, key_col: str,
                         k: int = 128) -> DataFrame:
    """Pairwise Jaccard-similarity ESTIMATES between groups from their KMV
    signatures: for each group pair, merge the two bottom-k signatures
    (bottom-k of the union) and count members present in both sets —
    J ≈ |both in merged sketch| / |merged sketch|. The scalable form of
    the exact cross-source overlap matrix (q137): pair cost is O(k), not
    O(shared n-grams), and signatures can be precomputed and stored.

    Pure-integer output (jaccard_ppm = m * 1e6 DIV kk) — no floats
    anywhere, so the estimate is byte-identical across engines.

    Scale shape: signatures are |groups| * k rows; every downstream step
    (pair enumeration, union merge, per-pair window) runs on that
    constant-size table, independent of corpus size.
    """
    sig = kmv_signature(df, group_col, key_col, k=k)
    groups = sig.select(F.col("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("src_a"))
        .join(groups.select(F.col("g").alias("src_b")),
              F.col("src_a") < F.col("src_b"))
    )
    ua = pairs.join(sig.withColumnRenamed("g", "src_a"), "src_a").select(
        "src_a", "src_b", "h", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    ub = pairs.join(sig.withColumnRenamed("g", "src_b"), "src_b").select(
        "src_a", "src_b", "h", F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    merged = (
        ua.unionByName(ub)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("fa").alias("fa"), F.max("fb").alias("fb"))
    )
    bottom = bottom_k(merged, ["src_a", "src_b"], k)
    return (
        bottom.groupBy("src_a", "src_b")
        .agg(F.count("*").alias("kk"),
             F.sum(F.col("fa") * F.col("fb")).alias("n_common"))
        .select(
            "src_a", "src_b", "kk", "n_common",
            F.expr("n_common * 1000000 DIV kk").alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters: bounded-memory candidate pruning + exact verify.
def heavy_hitters(
    stream: DataFrame,
    col: str = "gram",
    denom: int = 5000,
    m: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters — every item with ``cnt * denom >= total`` —
    found with a Misra–Gries candidate pass so the item domain is never
    shuffled (SURVEY.md §2.2d approx/sketch family; the frequency-domain
    peer of the KMV/CMS/Bloom/HLL/vhist mergeable summaries).

    Why not a plain groupBy: on a web-scale token/n-gram stream the key
    domain is billions (Heaps' law), so ``groupBy(item)`` shuffles the
    whole vocabulary to count items of which only ~denom can possibly
    qualify. Phase 1 instead runs a size-``m`` Misra–Gries summary per
    partition in one ``mapInPandas`` pass — bounded memory regardless of
    cardinality, emitting at most ``m`` candidate rows per partition plus
    one exact per-partition row count (item=NULL sentinel). Pigeonhole
    gives no-false-negatives: if an item's global count f >= total/denom
    then some partition has f_p >= n_p/denom, and MG(m >= denom) retains
    every local item with count > n_p/(m+1). Phase 2 semi-joins the stream
    against the broadcast candidate set and counts EXACTLY, so the output
    is engine-order-independent and hash-matches a GROUP BY ... HAVING
    oracle even though phase 1's internals are partition-order-dependent.

    Scale shape (100 TB): two scans, zero wide shuffles of the raw domain —
    phase 1 is scan+mapInPandas (Arrow-batched, value_counts-vectorized;
    the per-batch MG merge is the batched decrement form: subtract the
    (m+1)-th largest count from all and drop non-positives, total
    decrement <= n_p/(m+1)); phase 2's exchange carries only rows matching
    <= m*partitions candidates. cnt*denom stays far inside BIGINT
    (cnt <= 1e12 tokens * denom 5e3 = 5e15).
    """
    mm = m or denom

    def _mg(batches):
        import pandas as pd

        counter: dict = {}
        n = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            n += int(vc.sum())
            for k, v in vc.items():
                counter[k] = counter.get(k, 0) + int(v)
            if len(counter) > mm:
                kth = sorted(counter.values(), reverse=True)[mm]
                counter = {k: c - kth for k, c in counter.items() if c > kth}
        yield pd.DataFrame(
            {"item": list(counter.keys()) + [None],
             "cnt": list(counter.values()) + [n]}
        )

    summaries = stream.select(col).mapInPandas(_mg, "item string, cnt long")
    total = summaries.filter(F.col("item").isNull()).agg(
        F.sum("cnt").alias("tot"))
    cands = (summaries.filter(F.col("item").isNotNull())
             .select(F.col("item").alias("__cand")).distinct())
    counts = (
        stream.join(F.broadcast(cands), F.col(col) == F.col("__cand"),
                    "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * denom >= F.col("tot"))
        .select(F.col(col), "cnt", "tot",
                F.expr("cnt * 1000000 DIV tot").alias("freq_ppm"))
        .orderBy(F.desc("cnt"), F.asc(col))
    )


def equi_depth_histogram(df: DataFrame, value_col: str, id_col: str,
                         k: int = 10, bucket_width: int = 100_000) -> DataFrame:
    """Equi-depth (equi-height) histogram: ``k`` buckets holding equal row
    counts, with per-bucket bounds — the optimizer-statistics complement
    of the equi-width q100 (equi-width wastes bins on empty ranges;
    equi-depth puts resolution where the data is, which is what
    selectivity estimation actually wants). ``value_col`` must be
    integer-exact (cents, counts); ties break on ``id_col`` so bucket
    membership is total-ordered and engine-deterministic.

    Bucket of a row = (rank-1)·k DIV n over the exact global rank —
    computed with ``scale.global_rank`` (bucketed offsets + partitioned
    window), NOT a single-task global ORDER BY, so the shape survives
    100 TB; the only full-width shuffle is the rank's bucket window.
    Returns (bucket, n, lo, hi) — k rows.
    """
    from inspectadb_spark.operators.scale import global_rank

    n = df.select(F.count(F.lit(1)).alias("_n"))
    ranked = global_rank(df, value_col, id_col, bucket_width=bucket_width)
    return (
        ranked.join(F.broadcast(n))
        .select(F.col(value_col).alias("_v"),
                F.expr(f"(rank - 1) * {k} DIV _n").cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.min("_v").alias("lo"), F.max("_v").alias("hi"))
    )
