"""Kernel two-sample drift test over embeddings: the LINEAR-TIME MMD
estimator (SURVEY.md §2.2i extension set — the distribution-shift
guardrail family).

Position in the family: q173/S47 carry PSI for binned scalar features;
q316 carries the linear-KERNEL MMD² — ||μ_X − μ_Y||², the first-moment
member that by construction sees only MEAN shift. This module adds the
missing general member: RBF-kernel MMD, which detects variance / shape /
multimodal changes an identical-mean drift hides from both of those. The
quadratic estimator MMD_u is O(n²) and dead at scale; Gretton et al.
(JMLR 2012, §6) give the LINEAR-TIME estimator MMD_l — average a kernel
contrast h over disjoint 4-sample blocks — which is one scan,
embarrassingly parallel, and asymptotically normal, so the readout
carries its own CLT z-score: the monitor is its own significance test.

Determinism contract (SURVEY §5.3): each block's h is quantized to
DECIMAL(18,6) before the final sum, so the aggregate is order-exact
across partitionings and engines; Σh² rides the 12-dp DECIMAL(38,12)
kind (a product of 6-dp quantities is exactly 12 dp); readouts round at
4 dp via the r4 cast.

100 TB story: one scan + one shuffle on the block key (n/4 groups of 4
rows) + a global fold of two decimal sums — no pairwise structure ever
materializes, and the block pairing is id arithmetic, not a global sort
or row_number. Streaming note: MMD_l's block contrast needs all 4 rows
of a block together, so it is the scheduled/batch complement to S47's
incrementally-maintained PSI, not an IncrementalAggregate candidate —
state per in-flight block would be the raw vectors themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mmd_linear"]


# -- MMD: linear-time Maximum Mean Discrepancy --------------------------------

def mmd_linear(df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", sigma2: float = 64.0,
               y_shift=None) -> DataFrame:
    """Linear-time MMD (Gretton et al. 2012 MMD_l) between the even-id and
    odd-id halves of a vector table, RBF kernel exp(-||a-b||²/(2·sigma2)).

    Pairing contract: the caller's dense interleaved id IS the pairing —
    sample X = even ids, sample Y = odd ids, and consecutive id blocks of
    4 form the estimator's disjoint groups (x₁=4t, y₁=4t+1, x₂=4t+2,
    y₂=4t+3; a trailing partial block is dropped, as the estimator
    requires). Any FIXED pairing of i.i.d. samples is statistically valid
    (that is the linear-time trick); deriving it from the id keeps the
    plan window-free — no global row_number, no sort — so the single
    shuffle is the (t)-block group-by and the plan survives any scale-up.

    h(t) = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁); MMD_l = mean h.
    Each h is quantized DECIMAL(18,6); Σh and Σh² (12 dp) are the exact
    sufficient statistics; the readout carries the CLT z-score
    mean/√(var/n) so the monitor is its own significance test.

    ``y_shift``: optional Column→Column applied to the Y half (the q342
    site plants a +0.5 shift on one dimension to value-exercise the
    detection arm against the stationary fixture).

    Insufficient data is EXPLICIT, not silent: with fewer than 2 complete
    blocks the variance (and therefore ``h_sd``/``z``) is NULL while
    ``n_blocks`` states why — a monitor gating on |z| alone would never
    trip on a starved stream, so gate on ``n_blocks >= 2 AND |z| > c``
    (pinned in tests/test_drift.py).
    """
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    v = df.select(F.expr(f"{id_col} DIV 4").alias("t"),
                  (F.col(id_col) % 4).cast("int").alias("role"),
                  dbl.alias("v"))
    if y_shift is not None:
        v = v.withColumn(
            "v", F.when(F.col("role") % 2 == 1, y_shift(F.col("v")))
                  .otherwise(F.col("v")))
    # one row per (t, role) by id-density, so max(when(...)) is selection,
    # not choice; the filter drops the trailing partial block.
    g = (v.groupBy("t")
         .agg(F.count(F.lit(1)).alias("n_roles"),
              *[F.max(F.when(F.col("role") == r, F.col("v"))).alias(f"r{r}")
                for r in range(4)])
         .filter(F.col("n_roles") == 4))

    def k(a: Column, b: Column) -> Column:
        # sequential fold over the zipped dims: deterministic sum order
        d2 = F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda acc, x: acc + x)
        return F.exp(-d2 / F.lit(2.0 * sigma2))

    h = (k(F.col("r0"), F.col("r2")) + k(F.col("r1"), F.col("r3"))
         - k(F.col("r0"), F.col("r3")) - k(F.col("r2"), F.col("r1")))
    per = g.select(h.cast("decimal(18,6)").alias("hq"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("hq").alias("sh"),
        F.sum((F.col("hq") * F.col("hq")).cast("decimal(38,12)")).alias("sh2"))
    n = F.col("n_blocks")
    shd = F.col("sh").cast("double")
    sh2d = F.col("sh2").cast("double")
    # guard the degenerate counts explicitly: under ANSI (the Spark 4
    # default) n-1 = 0 would THROW mid-monitor instead of returning the
    # documented NULL insufficient-data signal
    mean_ = F.when(n > 0, shd / n)
    var_ = F.when(n > 1, (sh2d - shd * shd / n) / (n - F.lit(1)))

    def r4c(col: Column) -> Column:
        return F.round(col.cast("decimal(18,6)"), 4).cast("double")

    return agg.select(
        "n_blocks",
        r4c(mean_).alias("mmd_l"),
        r4c(F.sqrt(var_)).alias("h_sd"),
        r4c(mean_ / F.sqrt(var_ / n)).alias("z"))
