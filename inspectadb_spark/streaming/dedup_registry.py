"""Persistent cross-run dedup registry: exact first-seen-wins dedup whose
memory SURVIVES the stream.

Spark's native ``dropDuplicates`` on a stream dedups within one query's
state (bounded by a watermark, gone on checkpoint reset). A training-data
ingest pipeline needs the other contract: a key emitted in ANY previous
run — last week's crawl, a different source's feed — stays suppressed
forever. That registry has to live outside the streaming engine's state
store.

Mechanics (same crash story as ``IncrementalAggregate``):

- per micro-batch: within-batch first-wins (min (order_cols) per key, a
  window over batch-sized data), then a LEFT ANTI join against the
  persisted key registry — survivors are genuinely first-seen;
- survivors are written to ``out_dir/run=<checkpoint-hash>/batch=<id>/``
  with overwrite, so a crash-window re-delivery rewrites the same rows
  instead of appending duplicates (output idempotence by path, not by
  luck) and a NEW run's restarted batch numbering can never clobber an
  earlier run's output;
- the registry gains the survivors' keys via versioned directories and an
  atomic pointer swap; the (checkpoint, batch_id) guard skips re-applying
  a batch the pointer already covers.

100 TB design: registry state is one row per DISTINCT key ever seen —
store the md5/fingerprint, not the payload. The anti join is key-vs-key;
with the registry bucketed on the key it is exchange-free on the state
side, and the probe side is batch-sized. When even the key set outgrows
comfort, the registry swaps to the q181 Bloom representation (bounded
false-positive UNDERcount of new data, never duplicate emission — the
safe direction for dedup).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class DedupRegistry:
    """First-seen-wins dedup against a persisted cross-run key registry."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        out_dir: str,
        key_cols: list[str],
        order_cols: list[str],
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        os.makedirs(state_dir, exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)
        self._checkpoint: str | None = None
        self._version = 0
        committed = self._read_ptr()
        if committed is not None:
            base = os.path.basename(committed[0])
            if base.startswith("v"):
                self._version = int(base[1:])

    def _ptr(self) -> str:
        return os.path.join(self.state_dir, "CURRENT")

    def _read_ptr(self) -> tuple[str, str | None, int | None] | None:
        if not os.path.exists(self._ptr()):
            return None
        with open(self._ptr()) as f:
            lines = f.read().strip().splitlines()
        if len(lines) >= 3:
            return lines[0], lines[1], int(lines[2])
        return lines[0], None, None

    def seen_keys(self) -> DataFrame | None:
        committed = self._read_ptr()
        if committed is None:
            return None
        return self.spark.read.parquet(committed[0])

    def _run_tag(self) -> str:
        import hashlib

        return hashlib.md5((self._checkpoint or "").encode()).hexdigest()[:8]

    def emitted(self) -> DataFrame:
        """Everything this registry has ever let through (all runs)."""
        df = self.spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "run=*", "batch=*"))
        return df.drop("run", "batch")

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._read_ptr()
        if (
            committed is not None
            and self._checkpoint is not None
            and committed[1] == self._checkpoint
            and committed[2] is not None
            and batch_id <= committed[2]
        ):
            return  # re-delivered batch already inside the registry
        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.col(c) for c in self.order_cols])
        firsts = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        seen = self.seen_keys()
        if seen is not None:
            firsts = firsts.join(seen, self.key_cols, "left_anti")
        # output first (idempotent by run+batch path), then registry, then
        # the pointer swap
        out = os.path.join(self.out_dir, f"run={self._run_tag()}",
                           f"batch={batch_id}")
        firsts.write.mode("overwrite").parquet(out)
        new_keys = self.spark.read.parquet(out).select(*self.key_cols)
        merged = new_keys if seen is None else seen.unionByName(new_keys)
        self._version += 1
        state_out = os.path.join(self.state_dir, f"v{self._version}")
        merged.distinct().write.mode("overwrite").parquet(state_out)
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{state_out}\n{self._checkpoint or ''}\n{batch_id}")
        os.replace(tmp, self._ptr())
        old = os.path.join(self.state_dir, f"v{self._version - 2}")
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def start(self, stream: DataFrame, checkpoint_dir: str,
              available_now: bool = False, **options):
        self._checkpoint = checkpoint_dir
        w = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start(**options)


class BloomDedupRegistry(DedupRegistry):
    """The registry's bounded-memory form (the swap the base class's
    docstring promises): state is a Bloom bit-set (≤ m rows FOREVER,
    regardless of how many keys stream past) instead of one row per key.

    Direction of error is the safe one for dedup: a Bloom false positive
    suppresses a genuinely-new row (bounded UNDERcount of new data, rate
    ~ (1-e^{-kn/m})^k), but a key that was emitted can never be emitted
    again — no duplicates, ever. Use when the exact key set outgrows the
    anti-join; size m for the expected lifetime key count.

    Only the probe and the state representation change; batching,
    versioning, redelivery guard, and the run+batch-namespaced idempotent
    output are inherited.
    """

    def __init__(self, spark, state_dir, out_dir, key_cols, order_cols,
                 k: int = 4, m: int = 65536, salt: str = "dedupreg"):
        if len(key_cols) != 1:
            raise ValueError("Bloom registry keys on a single column; "
                             "pre-concatenate composite keys")
        super().__init__(spark, state_dir, out_dir, key_cols, order_cols)
        self._bloom = (key_cols[0], k, m, salt)

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from inspectadb_spark.operators.sketches import bloom_build, bloom_probe

        committed = self._read_ptr()
        if (
            committed is not None
            and self._checkpoint is not None
            and committed[1] == self._checkpoint
            and committed[2] is not None
            and batch_id <= committed[2]
        ):
            return
        col, k, m, salt = self._bloom
        w = Window.partitionBy(col).orderBy(
            *[F.col(c) for c in self.order_cols])
        firsts = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        seen = self.seen_keys()  # here: the bit table
        if seen is not None:
            probed = bloom_probe(seen, firsts.select(col).distinct(),
                                 col, k, m, salt)
            fresh = probed.filter(~F.col("maybe_member")).select(col)
            firsts = firsts.join(fresh, col, "left_semi")
        out = os.path.join(self.out_dir, f"run={self._run_tag()}",
                           f"batch={batch_id}")
        firsts.write.mode("overwrite").parquet(out)
        new_bits = bloom_build(
            self.spark.read.parquet(out).select(col), col, k, m, salt)
        merged = (new_bits if seen is None
                  else seen.unionByName(new_bits).distinct())
        self._version += 1
        state_out = os.path.join(self.state_dir, f"v{self._version}")
        merged.write.mode("overwrite").parquet(state_out)
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{state_out}\n{self._checkpoint or ''}\n{batch_id}")
        os.replace(tmp, self._ptr())
        old = os.path.join(self.state_dir, f"v{self._version - 2}")
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
