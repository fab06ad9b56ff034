"""Incrementally-maintained aggregate tables (continuous-aggregate analog).

``foreachBatch`` folds each micro-batch's *partial* aggregates into a
persisted per-key aggregate table — the streaming materialized-view /
hypertable-rollup pattern: queries read the (tiny) aggregate table instead
of rescanning the raw stream history.

Only decomposable aggregates are supported, because only they merge by
re-aggregation: count (merge: sum), sum (sum — routed through
DECIMAL(18,6) so merge order can never change the value), min (min),
max (max). avg is derived as sum/count in the reader view, never stored.

State versions are written to alternating directories and atomically
re-pointed (same crash story as ``StreamingCdcApply``); on a transactional
table format the body of ``_merge_batch`` becomes a single MERGE INTO with
additive updates. Merge cost per batch is O(|groups| + |batch partials|) —
independent of stream history length; state size is the group count.

Idempotence caveat: unlike latest-wins CDC apply, additive merges are NOT
idempotent under micro-batch re-delivery, so exactly-once depends on the
checkpoint (foreachBatch re-runs a batch only after a crash *before* the
commit; the version pointer swap makes the re-run overwrite, not double-
apply, because state v_n is derived from v_{n-1} + batch, and a re-run
re-reads v_{n-1}).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# kind -> (partial agg sql over source expr, merge agg sql over partial col)
_KINDS = {
    "count": ("COUNT({src})", "SUM({c})"),
    "sum": ("SUM(CAST({src} AS DECIMAL(18,6)))", "SUM({c})"),
    "min": ("MIN({src})", "MIN({c})"),
    "max": ("MAX({src})", "MAX({c})"),
}


class IncrementalAggregate:
    """Maintains ``SELECT keys, aggs FROM stream GROUP BY keys`` incrementally.

    ``measures``: list of (alias, kind, source_sql_expr) with kind in
    count | sum | min | max.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_exprs: dict[str, str],
        measures: list[tuple[str, str, str]],
    ) -> None:
        for _, kind, _ in measures:
            if kind not in _KINDS:
                raise ValueError(f"non-decomposable aggregate kind: {kind!r}")
        self.spark = spark
        self.state_dir = state_dir
        self.key_exprs = dict(key_exprs)
        self.measures = list(measures)
        os.makedirs(state_dir, exist_ok=True)
        # Resume version numbering from the committed pointer: a fresh
        # process starting at 0 would overwrite the very version CURRENT
        # still points at (Spark refuses to overwrite a path it is reading
        # from) and would orphan the prior run's version directories.
        self._version = 0
        if os.path.exists(self._ptr()):
            with open(self._ptr()) as f:
                committed = os.path.basename(f.read().strip())
            if committed.startswith("v"):
                self._version = int(committed[1:])

    # -- state bookkeeping (same version-pointer pattern as StreamingCdcApply)
    def _ptr(self) -> str:
        return os.path.join(self.state_dir, "CURRENT")

    def table(self) -> DataFrame | None:
        """The current aggregate table (finalized columns)."""
        if not os.path.exists(self._ptr()):
            return None
        with open(self._ptr()) as f:
            return self.spark.read.parquet(f.read().strip())

    def _partial(self, batch: DataFrame) -> DataFrame:
        # group directly by the aliased key expressions (a select-then-group
        # would duplicate any key that is itself a plain column reference)
        keys = [F.expr(e).alias(a) for a, e in self.key_exprs.items()]
        aggs = [
            F.expr(_KINDS[kind][0].format(src=src)).alias(alias)
            for alias, kind, src in self.measures
        ]
        return batch.groupBy(*keys).agg(*aggs)

    def _merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        partial = self._partial(batch)
        state = self.table()
        merged_in = partial if state is None else state.unionByName(partial)
        merges = [
            F.expr(_KINDS[kind][1].format(c=alias)).alias(alias)
            for alias, kind, _ in self.measures
        ]
        new_state = merged_in.groupBy(*self.key_exprs).agg(*merges)
        self._version += 1
        out = os.path.join(self.state_dir, f"v{self._version}")
        new_state.write.mode("overwrite").parquet(out)
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(out)
        os.replace(tmp, self._ptr())
        old = os.path.join(self.state_dir, f"v{self._version - 2}")
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def start(self, stream: DataFrame, checkpoint_dir: str,
              available_now: bool = False, **options):
        """``available_now=True`` drains the current input and terminates —
        the batch-replay/backfill mode; default is a continuous query."""
        w = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start(**options)
