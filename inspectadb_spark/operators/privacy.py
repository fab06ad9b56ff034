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

__all__ = ["k_anonymity_readout", "qi_group_stats"]


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
