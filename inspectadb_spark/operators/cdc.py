"""CDC composite operators (SURVEY.md §2.2j — the reference product's core).

``apply_changelog`` folds a Debezium-style change log (op ∈ {c,u,d}, a total
order column such as an LSN) into current state; ``scd2_history`` derives
slowly-changing-dimension validity intervals.

Scale notes (100 TB): both operators shuffle once on the key columns (the
window partition). At cluster scale the change log should be bucketed or
range-partitioned by key so repeated applies reuse the layout; the latest-wins
window is an O(n log n_per_key) sort within partitions, and AQE handles skewed
hot keys. For continuous ingestion the same builder runs inside
``foreachBatch`` with ``mergeInto`` against a transactional sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str = "lsn",
) -> DataFrame:
    """Per key, the row with the greatest ``order_col`` — *including* delete
    tombstones. Streaming state must retain tombstones so a late lower-lsn
    change cannot resurrect a deleted key (see streaming/cdc_stream.py)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Latest-wins fold of a change log into current state.

    Keeps, per key, the row with the greatest ``order_col``; drops keys whose
    final operation is a delete. Idempotent under re-delivery of any prefix
    (same (key, order) wins deterministically).
    """
    return latest_per_key(changes, key_cols, order_col).filter(
        F.col(op_col) != delete_op
    )


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str = "lsn",
) -> DataFrame:
    """SCD2 validity intervals: each change version is valid from its own
    ``order_col`` until the next change for the same key (NULL = current)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return changes.withColumn("valid_from", F.col(order_col)).withColumn(
        "valid_to", F.lead(order_col).over(w)
    )
