"""Live IVF-index lifecycle: streaming ingestion and staleness watch.

A persisted ANN index (``save_ivf_index`` layout) is immutable between
offline rebuilds — but the collection is not: new embeddings keep
arriving. The lifecycle here:

- ``StreamingIvfIngest`` (S51): each micro-batch of new vectors is
  assigned its cell SCAN-SIDE against the frozen centroid model and
  written as a cell-partitioned DELTA directory; an atomic pointer swap
  commits base + deltas (the DedupRegistry crash story: delta paths are
  keyed by (run, batch) and rewritten with overwrite, so crash-window
  re-delivery rewrites the same files instead of appending duplicates;
  the pointer is the commit point; superseded dirs retire one swap late
  so a reader holding the previous pointer never loses files). Every
  ``compact_every`` commits, one pass folds base+deltas into a fresh
  cell-partitioned base — amortized O(total)/compact_every per batch,
  never a per-batch rewrite of the whole index.
- ``read_ivf_lists`` (operators/similarity.py): readers union the
  committed paths; every path is ``partitionBy("_cell")``, so probe-time
  partition pruning applies to base and deltas alike.
- ``StreamingIvfDrift`` (S52): the rebuild trigger. A (cell)-grain
  IncrementalAggregate maintains exact counts and DECIMAL(38,12) sums of
  each new vector's squared distance to its assigned centroid — the same
  Lloyd's objective ``kmeans_fit`` reports as inertia, so live mean
  distortion is directly comparable to the trained value. When the live
  readout drifts above the trained bar, the model is stale: rebuild
  offline, re-save, reset. State is one row per cell, forever.

100 TB notes: ingest I/O per batch is O(batch) (assignment is a codegen
projection, the write only touches the batch's cells); the drift state is
model-sized; compaction is the only O(total) pass and its cadence is a
dial. On a transactional table format the pointer file becomes the
table's own commit log.
"""

from __future__ import annotations

import os
import shutil
import warnings

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspectadb_spark.operators.similarity import (
    _argmin_cell,
    _best_score,
    _norm2,
    ivf_assign,
    load_ivf_centroids,
    load_pq_codebooks,
)
from inspectadb_spark.streaming.incremental import IncrementalAggregate


class StreamingIvfIngest:
    """Append a stream of new vectors into a persisted IVF index.

    The delta/pointer/compaction/GC machinery is FORMAT-AGNOSTIC (delta
    dirs are ``lists_delta/run=*/batch=*``, compacted bases ``lists_v*``,
    the commit point is the ``INGEST`` pointer, all under ``gc_index``'s
    contract); what varies by index format is only the per-batch
    transform (``_transform``) and the build-time base directory the
    reader falls back to (``_base_dirname``). ``StreamingIvfPqIngest``
    overrides exactly those two for the PQ-code tier."""

    _base_dirname = "lists"

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        compact_every: int = 8,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.spark = spark
        self.index_path = index_path
        self.compact_every = compact_every
        self.vec_col = vec_col
        self.id_col = id_col
        # the MODEL is frozen for the life of this ingester (rebuilds are
        # offline: new save_ivf_index + fresh ingester); same for the
        # quantization codebook on a quantized index
        self.cents = load_ivf_centroids(spark, index_path)
        self._load_models()
        self._checkpoint: str | None = None
        self._retired: list[str] = []
        existing = [
            d for d in os.listdir(index_path)
            if d.startswith("lists_v") and d[7:].isdigit()
        ]
        self._version = max((int(d[7:]) for d in existing), default=0)

    def _load_models(self) -> None:
        from inspectadb_spark.operators.similarity import _load_quant_model

        self._quant = _load_quant_model(self.spark, self.index_path)

    def _transform(self, batch: DataFrame) -> DataFrame:
        """Batch of raw vectors -> the cell-partitioned rows this index
        format stores (full-precision or int-quantized vectors here; PQ
        codes in the subclass). Scan-side only — no shuffle."""
        assigned = (ivf_assign(batch, self.cents, self.vec_col)
                    .select(F.col(self.id_col), F.col(self.vec_col),
                            F.col("_cell")))
        if self._quant is not None:
            from inspectadb_spark.operators.similarity import (
                quantize_embeddings,
            )

            lo, hi, bits = self._quant
            assigned = quantize_embeddings(assigned, lo, hi, self.vec_col,
                                           bits)
            if bits <= 15:
                assigned = assigned.withColumn(
                    self.vec_col, F.col(self.vec_col).cast("array<smallint>"))
        return assigned

    # -- pointer (DedupRegistry format) ------------------------------------
    def _ptr(self) -> str:
        return os.path.join(self.index_path, "INGEST")

    def _read_ptr(self) -> dict | None:
        if not os.path.exists(self._ptr()):
            return None
        with open(self._ptr()) as f:
            lines = f.read().strip().splitlines()
        if not lines:
            # zero-byte pointer (foreign non-atomic writer mid-write):
            # unreadable, same contract as read_ivf_lists/gc_index —
            # behave as "no committed ingest", never IndexError
            return None
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
        for d in self._retired:
            shutil.rmtree(d, ignore_errors=True)
        self._retired = [d for d in superseded if d not in paths]

    def committed_paths(self) -> list[str]:
        committed = self._read_ptr()
        if committed is None:
            return [os.path.join(self.index_path, self._base_dirname)]
        return committed["paths"]

    def _run_tag(self) -> str:
        import hashlib

        return hashlib.md5((self._checkpoint or "").encode()).hexdigest()[:8]

    # -- per-batch apply ---------------------------------------------------
    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._read_ptr()
        if (
            committed is not None
            and self._checkpoint is not None
            and committed["checkpoint"] == self._checkpoint
            and committed["batch"] is not None
            and batch_id <= committed["batch"]
        ):
            return  # crash-window re-delivery: already committed
        if batch.isEmpty():
            # an empty delta dir would break the committed-path union
            # (parquet schema inference has no file to read) — and there
            # is nothing to commit anyway
            return
        delta = os.path.join(
            self.index_path, "lists_delta",
            f"run={self._run_tag()}", f"batch={batch_id}")
        rows = self._transform(batch)
        rows.write.partitionBy("_cell").mode("overwrite").parquet(delta)
        prev = self.committed_paths()
        if len(prev) + 1 > self.compact_every:
            self._version += 1
            base = os.path.join(self.index_path, f"lists_v{self._version}")
            # per-path scans unioned: Spark refuses multi-root partition
            # discovery in a single read (see read_ivf_lists)
            merged = self.spark.read.parquet(prev[0])
            for p in prev[1:] + [delta]:
                merged = merged.unionByName(self.spark.read.parquet(p))
            (merged.write.partitionBy("_cell")
             .mode("overwrite").parquet(base))
            self._swap_ptr([base], batch_id, prev + [delta])
        else:
            self._swap_ptr(prev + [delta], batch_id, [])

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


class StreamingIvfPqIngest(StreamingIvfIngest):
    """Append a stream of new vectors into a persisted IVF-PQ index
    (S69) — the missing lifecycle leg at the PQ tier: without it, a code
    index can only grow by full offline rebuild.

    Each micro-batch is cell-assigned against the frozen centroid model
    and PQ-ENCODED against the frozen codebooks (both loaded once at
    construction — rebuilds are offline, same contract as the parent),
    so the delta dirs store (id, _pq, _vnorm, _cell) CODE rows — the
    rows ``read_ivf_pq_lists`` unions and ADC serves. Ingested codes are
    byte-identical to what a from-scratch ``save_ivf_pq_index`` over the
    same model would produce (pinned in S69), so serving cannot tell an
    ingested vector from a built one. Encoding drift (the codebook
    equivalent of centroid staleness) shows up in the SAME
    ``StreamingIvfDrift`` watch, since cell distortion is measured on
    the full-precision batch before encoding.

    Delta/pointer/compaction/GC are inherited unchanged — the machinery
    is format-agnostic, only the transform and base dir differ."""

    _base_dirname = "pq_lists"

    def _load_models(self) -> None:
        self._quant = None
        self._books = load_pq_codebooks(self.spark, self.index_path)

    def _transform(self, batch: DataFrame) -> DataFrame:
        from inspectadb_spark.operators.similarity import pq_encode

        assigned = ivf_assign(batch, self.cents, self.vec_col)
        return pq_encode(assigned, self._books, self.vec_col, self.id_col,
                         keep=("_cell",))


class StreamingIvfDrift(IncrementalAggregate):
    """Model-staleness watch: per-cell exact (n, Σd²) of incoming vectors
    under the FROZEN centroid model — Lloyd's objective, comparable to
    ``kmeans_fit``'s trained inertia. Readout via ``ivf_drift_readout``;
    batch ≡ stream byte-for-byte (decimal sums). State: one row per cell.
    """

    def __init__(self, spark: SparkSession, state_dir: str,
                 centroids: np.ndarray, vec_col: str = "embedding") -> None:
        super().__init__(
            spark, state_dir,
            key_exprs={"cell": "cell"},
            measures=[("n", "count", "*"), ("d2", "sum12", "d2")],
        )
        self._cents = np.asarray(centroids, dtype=np.float64)
        self._vec_col = vec_col

    def _partial(self, batch: DataFrame) -> DataFrame:
        d2 = (_norm2(self._vec_col)
              - _best_score(self._cents, self._vec_col)).cast("decimal(28,10)")
        assigned = batch.select(
            _argmin_cell(self._cents, self._vec_col).alias("cell"),
            d2.alias("d2"))
        return assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            F.sum(F.col("d2").cast("decimal(38,12)")).alias("d2"))


class StreamingPqDrift(IncrementalAggregate):
    """Codebook-staleness watch (S70) — the PQ-tier complement of
    ``StreamingIvfDrift``: S52 answers "does the frozen CENTROID model
    still fit the incoming vectors", this answers "do the frozen
    CODEBOOKS still reconstruct them". Per occupied cell, exact counts
    and DECIMAL sums of each incoming vector's PQ reconstruction error
    ||v − decode(encode(v))||² — the quantity ADC quality degrades with.
    Compare through the same ``ivf_drift_readout`` closed form against
    the training set's reconstruction error (``pq_reconstruction_stats``
    computes it with the identical expression, so the bar is exactly
    comparable). State: one row per cell, forever; the encode/decode
    round trip is a scan-side codegen projection, no shuffle before the
    per-cell combine."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 centroids, codebooks: np.ndarray,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> None:
        super().__init__(
            spark, state_dir,
            key_exprs={"cell": "cell"},
            measures=[("n", "count", "*"), ("d2", "sum12", "d2")],
        )
        self._cents = np.asarray(centroids, dtype=np.float64)
        self._books = np.asarray(codebooks, dtype=np.float64)
        self._vec_col = vec_col
        self._id_col = id_col

    def _partial(self, batch: DataFrame) -> DataFrame:
        assigned = ivf_assign(batch, self._cents, self._vec_col)
        scored = _pq_recon_d2(assigned, self._books, self._vec_col,
                              self._id_col)
        return scored.groupBy(F.col("_cell").alias("cell")).agg(
            F.count("*").alias("n"),
            F.sum(F.col("_recon_d2").cast("decimal(38,12)")).alias("d2"))


def _pq_recon_d2(assigned: DataFrame, books: np.ndarray, vec_col: str,
                 id_col: str) -> DataFrame:
    """Rows + ``_recon_d2`` = ||v − decode(encode(v))||², the PQ
    reconstruction error, as one scan-side codegen projection (encode →
    decode → zip_with square-diff → aggregate). DECIMAL(28,10)-quantized
    like StreamingIvfDrift's d2 so chunked merges are order-exact."""
    from inspectadb_spark.operators.similarity import (
        pq_decode_expr, pq_encode,
    )

    codes = pq_encode(assigned, books, vec_col, id_col,
                      keep=("_cell", vec_col))
    diff = F.zip_with(F.col(vec_col), pq_decode_expr(books),
                      lambda a, b: (a - b) * (a - b))
    d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    return codes.withColumn("_recon_d2", d2.cast("decimal(28,10)"))


def pq_reconstruction_stats(vectors: DataFrame, centroids,
                            codebooks: np.ndarray,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> tuple[float, int]:
    """(total reconstruction error, n) of ``vectors`` under the frozen
    models — computed with the exact expression StreamingPqDrift
    accumulates, so ``ivf_drift_readout(state, *these)`` compares live
    mean reconstruction error against a byte-comparable trained bar."""
    assigned = ivf_assign(vectors,
                          np.asarray(centroids, dtype=np.float64), vec_col)
    row = (_pq_recon_d2(assigned, np.asarray(codebooks, dtype=np.float64),
                        vec_col, id_col)
           .agg(F.sum(F.col("_recon_d2").cast("decimal(38,12)"))
                .alias("d2"),
                F.count(F.lit(1)).alias("n")).first())
    return float(row["d2"]), int(row["n"])


def ivf_drift_readout(state: DataFrame, trained_inertia: float,
                      n_trained: int) -> DataFrame:
    """Per-cell and overall mean squared distortion of post-training
    vectors vs the trained per-vector bar (trained_inertia/n_trained).
    4dp doubles over the |cells|-row state — a model-sized report."""
    bar = float(trained_inertia) / max(int(n_trained), 1)
    tot = state.agg(F.sum("n").alias("tn"), F.sum("d2").alias("td"))
    per_cell = state.select(
        "cell", F.col("n").cast("bigint").alias("n"),
        F.round((F.col("d2") / F.col("n")).cast("decimal(18,6)"), 4)
        .cast("double").alias("mean_d2"))
    overall = tot.select(
        F.lit(-1).alias("cell"), F.col("tn").cast("bigint").alias("n"),
        F.round((F.col("td") / F.col("tn")).cast("decimal(18,6)"), 4)
        .cast("double").alias("mean_d2"))
    return (per_cell.unionByName(overall)
            .withColumn("trained_bar",
                        F.round(F.lit(bar).cast("decimal(18,6)"), 4)
                        .cast("double"))
            .withColumn("stale", F.col("mean_d2") > 2 * F.col("trained_bar"))
            .orderBy("cell"))


class PointerUnreadableWarning(UserWarning):
    """``gc_index`` aborted: an INGEST pointer exists but is not a
    committed 3-line pointer (zero-byte or truncated). Distinct from an
    empty sweep — a permanently corrupt pointer would otherwise disable
    GC forever with no signal to the operator (ADVICE r12)."""


def gc_index(index_path: str) -> list[str]:
    """Remove orphaned list directories from a streamed-into index.

    The ingester retires superseded dirs ONE SWAP LATE (so a reader
    holding the previous pointer never loses files) — which means an
    ingester that stops right after a compaction leaves its final
    superseded base + deltas on disk forever, and abandoned checkpoints
    leave whole ``lists_delta/run=*`` trees behind. This pass deletes
    every ``lists_v*`` / ``lists_delta`` subtree NOT referenced by the
    committed INGEST pointer (the build-time ``lists`` base is always
    kept: with no pointer it IS the index). Run it in a quiet window or
    accept that a reader launched from a pointer older than the current
    one may lose its files — the same contract as the ingester's own
    deferred retirement, one step later.

    Returns the removed paths (for the operational log).

    Paths are compared via ``os.path.realpath``: the pointer may have
    been written from a different working directory or through a symlink
    than the one this call uses — a naive string compare would then see
    every committed dir as unreferenced and delete the LIVE index."""
    ptr = os.path.join(index_path, "INGEST")
    referenced: set[str] = set()
    if os.path.exists(ptr):
        with open(ptr) as f:
            lines = f.read().strip().splitlines()
        if len(lines) < 3:
            # An existing-but-incomplete pointer is UNREADABLE, not
            # empty: a foreign (non-atomic) writer may be mid-write, and
            # even a NON-empty fragment may hold only a prefix of line 1
            # — interpreting it would delete committed bases/deltas the
            # finished pointer is about to reference, unrecoverably. The
            # committed wire format is exactly 3 lines (paths, ckpt,
            # batch — pinned in tests), so anything shorter means line 1
            # may be truncated: GC must abort and delete NOTHING — and
            # say so: a safe abort must be distinguishable from an empty
            # sweep, or a permanently corrupt pointer silently disables
            # GC forever. Transient mid-writes resolve by the next run.
            # (Python dedups identical warnings within one process;
            # periodic GC jobs run in fresh processes, so a permanently
            # corrupt pointer re-warns on every scheduled sweep.)
            warnings.warn(PointerUnreadableWarning(
                f"gc_index: INGEST pointer at {ptr} has {len(lines)} "
                "line(s), committed format is 3 — possible foreign "
                "mid-write or corruption; GC aborted, nothing removed"),
                stacklevel=2)
            return []
        referenced = {
            os.path.realpath(p)
            for p in lines[0].split("|") if p}
    removed: list[str] = []
    for d in sorted(os.listdir(index_path)):
        full = os.path.realpath(os.path.join(index_path, d))
        if d.startswith("lists_v") and full not in referenced:
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
        elif d == "lists_delta":
            # prune per-(run, batch) leaves individually: a live run's
            # committed deltas stay, everything else goes
            for run in sorted(os.listdir(full)):
                rdir = os.path.join(full, run)
                for b in sorted(os.listdir(rdir)):
                    leaf = os.path.realpath(os.path.join(rdir, b))
                    if leaf not in referenced:
                        shutil.rmtree(leaf, ignore_errors=True)
                        removed.append(leaf)
                if not os.listdir(rdir):
                    os.rmdir(rdir)
            if not os.listdir(full):
                os.rmdir(full)
    return removed
