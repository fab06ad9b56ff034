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
- the registry gains the survivors' keys as a per-batch DELTA directory —
  O(batch keys) I/O per micro-batch, NOT a rewrite of every key ever seen
  (the r04 scale finding: ``seen ∪ new → distinct → overwrite`` was
  O(total keys) I/O per batch, a genuine 100 TB ingest killer). Every
  ``compact_every`` deltas, one compaction pass folds base+deltas into a
  fresh base (amortized O(total)/compact_every per batch);
- state is committed via an atomic pointer swap listing the exact
  base+delta directories a reader should union; superseded directories
  are retired one swap LATER, so a reader holding the previous pointer
  never has files deleted under its plan. The (checkpoint, batch_id)
  guard skips re-applying a batch the pointer already covers.

100 TB design: registry state is one row per DISTINCT key ever seen —
store the md5/fingerprint, not the payload. The anti join is key-vs-key;
with the base bucketed on the key it is exchange-free on the state side,
and the probe side is batch-sized. When even the key set outgrows
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
        compact_every: int = 8,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.compact_every = compact_every
        os.makedirs(state_dir, exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)
        self._checkpoint: str | None = None
        self._version = 0
        self._retired: list[str] = []  # dirs to delete at the NEXT swap
        committed = self._read_ptr()
        referenced: set[str] = set()
        if committed is not None:
            for p in committed["paths"]:
                base = os.path.basename(p)
                referenced.add(base)
                if base.startswith(("v", "d")):
                    try:
                        self._version = max(self._version, int(base[1:]))
                    except ValueError:
                        pass
        # Init-time GC (ADVICE r05 item 2): retirement is tracked in
        # memory, so a crash between pointer swaps — or any shutdown after
        # the final swap — would leak the superseded (or partially
        # written, never-committed) state dirs forever. At init no reader
        # can hold an older pointer (single-writer registry; readers
        # resolve the pointer per batch), so every v*/d* dir the committed
        # pointer does not reference is garbage. The one-swap grace for a
        # LIVE reader is unchanged — it lives in _swap_ptr.
        import re as _re

        for entry in os.listdir(self.state_dir):
            d = os.path.join(self.state_dir, entry)
            if (os.path.isdir(d) and _re.fullmatch(r"[vd]\d+", entry)
                    and entry not in referenced):
                shutil.rmtree(d, ignore_errors=True)

    # -- pointer ---------------------------------------------------------
    def _ptr(self) -> str:
        return os.path.join(self.state_dir, "CURRENT")

    def _read_ptr(self) -> dict | None:
        """Pointer format (atomic-replace committed):
        line 0: '|'-joined state paths to union (base first, then deltas)
        line 1: checkpoint dir of the last applied batch
        line 2: last applied batch id
        """
        if not os.path.exists(self._ptr()):
            return None
        with open(self._ptr()) as f:
            lines = f.read().strip().splitlines()
        paths = [p for p in lines[0].split("|") if p]
        ckpt = lines[1] if len(lines) >= 2 else None
        batch = int(lines[2]) if len(lines) >= 3 and lines[2] else None
        return {"paths": paths, "checkpoint": ckpt, "batch": batch}

    def _swap_ptr(self, paths: list[str], batch_id: int,
                  superseded: list[str]) -> None:
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{'|'.join(paths)}\n{self._checkpoint or ''}\n{batch_id}")
        os.replace(tmp, self._ptr())
        # one-swap grace: retire what the PREVIOUS pointer referenced only
        # now, so a reader that resolved that pointer still has its files
        for d in self._retired:
            shutil.rmtree(d, ignore_errors=True)
        self._retired = [d for d in superseded if d not in paths]

    # -- reads -----------------------------------------------------------
    def seen_keys(self) -> DataFrame | None:
        committed = self._read_ptr()
        if committed is None or not committed["paths"]:
            return None
        return self.spark.read.parquet(*committed["paths"])

    def _run_tag(self) -> str:
        import hashlib

        return hashlib.md5((self._checkpoint or "").encode()).hexdigest()[:8]

    def emitted(self) -> DataFrame:
        """Everything this registry has ever let through (all runs)."""
        df = self.spark.read.option("basePath", self.out_dir).parquet(
            os.path.join(self.out_dir, "run=*", "batch=*"))
        return df.drop("run", "batch")

    # -- per-batch apply ---------------------------------------------------
    def _guarded(self, committed: dict | None, batch_id: int) -> bool:
        return (
            committed is not None
            and self._checkpoint is not None
            and committed["checkpoint"] == self._checkpoint
            and committed["batch"] is not None
            and batch_id <= committed["batch"]
        )

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._read_ptr()
        if self._guarded(committed, batch_id):
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
            # NULL-SAFE anti join: a NULL dedup key is a key like any
            # other (grouping already treats NULLs as equal), but plain
            # column equality never matches NULL = NULL — a bare
            # `join(..., key_cols, "left_anti")` would re-emit the
            # null-key row every batch forever
            cond = None
            for c in self.key_cols:
                eq = firsts[c].eqNullSafe(seen[c])
                cond = eq if cond is None else (cond & eq)
            firsts = firsts.join(seen, cond, "left_anti")
        # output first (idempotent by run+batch path), then the key delta,
        # then the pointer swap
        out = os.path.join(self.out_dir, f"run={self._run_tag()}",
                           f"batch={batch_id}")
        firsts.write.mode("overwrite").parquet(out)
        new_keys = self.spark.read.parquet(out).select(*self.key_cols)
        prev_paths = committed["paths"] if committed else []
        self._version += 1
        if len(prev_paths) + 1 > self.compact_every:
            # compaction pass: fold base+deltas+this batch into a new base
            state_out = os.path.join(self.state_dir, f"v{self._version}")
            merged = (self.spark.read.parquet(*prev_paths)
                      .unionByName(new_keys).distinct())
            merged.write.mode("overwrite").parquet(state_out)
            self._swap_ptr([state_out], batch_id, prev_paths)
        else:
            # O(batch keys) delta append — survivors are already distinct
            # within the batch (first-wins) and anti-joined against seen,
            # so the delta is disjoint from every earlier path
            delta_out = os.path.join(self.state_dir, f"d{self._version}")
            new_keys.write.mode("overwrite").parquet(delta_out)
            self._swap_ptr(prev_paths + [delta_out], batch_id, [])

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
    output are inherited. The state rewrite here is NOT a scale concern:
    the bit table is ≤ m rows by construction, so the per-batch rewrite
    is O(m), already bounded.
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
        if self._guarded(committed, batch_id):
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
        prev_paths = committed["paths"] if committed else []
        self._version += 1
        state_out = os.path.join(self.state_dir, f"v{self._version}")
        merged.write.mode("overwrite").parquet(state_out)
        self._swap_ptr([state_out], batch_id, prev_paths)


class WinnowingRegistry(DedupRegistry):
    """Incremental winnowing fingerprint index over a document stream —
    the live form of the q268 near-dup pair finder.

    Per micro-batch, each document's robust-winnowing postings
    (``operators/dedup.py::winnowing_fingerprints`` — a per-doc
    transform, so the per-batch result is identical to a batch run) are
    folded into the persisted index with the inherited delta-state
    machinery: first-seen doc wins (a re-delivered or re-crawled doc id
    adds no second posting set), O(batch postings) state I/O per batch,
    periodic compaction, atomic pointer swap with one-swap reader grace,
    crash-redelivery guard, and init-time GC — all the S36/S41/S42/S43
    contracts, unchanged, because the index rows ARE the registry keys
    ((doc_id, fp) pairs).

    ``pairs()`` evaluates the q268 pair semantics over the CURRENT
    index through the same shared code path as the batch operator
    (``neardup_pairs_from_postings``), so batch ≡ stream by
    construction — including the stop list, which is recomputed at read
    time over everything indexed so far rather than frozen per batch (a
    fingerprint whose document frequency crosses ``stop_df`` after more
    docs arrive is retroactively blocklisted, exactly as a batch rerun
    would).

    100 TB design: index state is one (doc_id, fp) row per posting —
    md5 strings, never document payloads; per-batch work is one
    batch-local fingerprint transform plus a postings-vs-index anti
    join on doc_id; ``pairs()`` is the fingerprint-bucketed equi-join
    whose per-bucket cost the broadcast stop list bounds by stop_df².
    """

    def __init__(self, spark: SparkSession, state_dir: str, out_dir: str,
                 k: int = 8, w: int = 4, stop_df: int = 50,
                 min_shared: int = 5, min_overlap_ppm: int = 500_000,
                 text_col: str = "text", id_col: str = "doc_id",
                 compact_every: int = 8) -> None:
        super().__init__(spark, state_dir, out_dir,
                         key_cols=[id_col, "fp"], order_cols=[id_col],
                         compact_every=compact_every)
        self._win = (k, w, text_col, id_col)
        self._pairs = (stop_df, min_shared, min_overlap_ppm)

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from inspectadb_spark.operators.dedup import winnowing_fingerprints

        committed = self._read_ptr()
        if self._guarded(committed, batch_id):
            return
        k, w, text_col, id_col = self._win
        fps = winnowing_fingerprints(batch, k=k, w=w, text_col=text_col,
                                     id_col=id_col)
        seen = self.seen_keys()
        if seen is not None:
            # first-seen doc wins: a re-delivered doc id contributes no
            # postings at all (doc-grain anti join, not posting-grain,
            # so a re-crawl with CHANGED text cannot half-merge)
            fps = fps.join(seen.select(id_col).distinct(),
                           id_col, "left_anti")
        super()._apply_batch(fps, batch_id)

    def index(self) -> DataFrame | None:
        """The maintained (doc_id, fp) posting table (None before any
        batch commits)."""
        return self.seen_keys()

    def pairs(self) -> DataFrame:
        """q268 near-dup pairs over everything indexed so far — the
        exact batch operator on the maintained postings."""
        from inspectadb_spark.operators.dedup import (
            neardup_pairs_from_postings,
        )

        fps = self.index()
        if fps is None:
            _, _, _, id_col = self._win
            return self.spark.createDataFrame(
                [], f"doc_a long, doc_b long, n_shared bigint, "
                    f"overlap_ppm bigint")
        stop_df, min_shared, min_overlap_ppm = self._pairs
        return neardup_pairs_from_postings(
            fps, stop_df=stop_df, min_shared=min_shared,
            min_overlap_ppm=min_overlap_ppm, id_col=self._win[3])
