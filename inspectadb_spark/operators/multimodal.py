"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(SURVEY.md §2.2i mandated extension).

Design: media is carried as an opaque ``binary`` column next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` transforms — the only sanctioned Python path
(SNIPPETS.md [3]) — so each task processes a columnar batch of blobs with
numpy, never row-at-a-time Python.

Real image/audio codecs (PIL, ffmpeg, torchaudio) are not in this
container, so the codec here is a minimal deterministic raster format —
header ``IDBI`` + big-endian uint32 width/height (+ frame count for video)
followed by raw grayscale bytes — generated reproducibly from a seed
column. The Spark-side contract (schemas, batch shapes, partitioning,
output metadata) is exactly what a real codec UDF would see; swap
``_decode_blob``/``_encode_blob`` for PIL calls (guarded by HAVE_PIL) and
nothing else changes.

Scale notes: blobs stay columnar end-to-end (Parquet binary -> Arrow
binary -> numpy frombuffer, zero-copy where alignment allows). Decode is a
pure projection — no shuffle; at 100 TB tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down so batch_bytes =
rows x blob_size fits executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real codec slot — absent in this container, fake raster used instead
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MAGIC = b"IDBI"  # image
MAGIC_V = b"IDBV"  # video = frame count + concatenated frames


# -- fake codec (deterministic; same signature a PIL codec would have) --------

def _encode_blob(seed: int, width: int, height: int) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return MAGIC + struct.pack(">II", width, height) + pixels.tobytes()


def _decode_blob(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[:4] != MAGIC:
        raise ValueError("not an IDBI raster blob")
    w, h = struct.unpack(">II", blob[4:12])
    return w, h, np.frombuffer(blob, dtype=np.uint8, offset=12, count=w * h)


def _encode_video(seed: int, width: int, height: int, n_frames: int) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return MAGIC_V + struct.pack(">III", width, height, n_frames) + frames.tobytes()


# -- Spark-side operators -----------------------------------------------------

def attach_image_blobs(
    df: DataFrame, seed_col: str = "doc_id", width: int = 16, height: int = 16
) -> DataFrame:
    """Attach a deterministic image payload + typed metadata struct per row.
    Stand-in for an ingest that reads media files into a binary column.

    r14 negative result: spreading the input to session parallelism
    before the generate pass measured SLOWER across the whole q53
    family at sf0.1 (q53c 2.3→3.0 s, q53d 1.9→3.5 s medians, alternating
    A/B): 32 Python workers × ~150 rows pay more in worker spin-up and
    Arrow framing than the ~0.4 s of single-task numpy they spread, and
    q53d's banded self-join consumes the subtree twice. At real-ingest
    scale the scan arrives multi-split on its own."""
    schema = StructType(
        df.schema.fields
        + [
            StructField("payload", BinaryType()),
            StructField(
                "media_meta",
                StructType(
                    [
                        StructField("modality", StringType()),
                        StructField("width", IntegerType()),
                        StructField("height", IntegerType()),
                        StructField("n_bytes", LongType()),
                    ]
                ),
            ),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                _encode_blob(int(s), width, height) for s in pdf[seed_col]
            ]
            pdf = pdf.copy()
            pdf["payload"] = blobs
            pdf["media_meta"] = [
                {"modality": "image", "width": width, "height": height,
                 "n_bytes": len(b)}
                for b in blobs
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def decode_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Decode blobs and extract numeric features (mean/std pixel + n-bin
    histogram) in Arrow batches. This is the hot decode path a real pipeline
    runs over billions of images — shape: binary in, fixed-width numeric out."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_px", DoubleType()),
            StructField("std_px", DoubleType()),
            StructField("hist", ArrayType(LongType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shift = int(np.log2(256 // n_bins))
        for pdf in batches:
            # r14 (guide §4.2, the q53d phash shape): stack same-geometry
            # rasters into an (N, w*h) matrix — mean/std as axis-1
            # reductions (same pairwise order as the per-row contiguous
            # reduce, so doubles are bit-identical), histograms as ONE
            # flat bincount with per-row offsets (exact integers).
            ids = pdf[id_col].to_numpy()
            blobs = [bytes(b) for b in pdf[payload_col]]
            for b in blobs:
                if b[:4] != MAGIC:
                    raise ValueError("not an IDBI raster blob")
            hdr = np.array([struct.unpack(">II", b[4:12]) for b in blobs],
                           dtype=np.int64).reshape(len(blobs), 2)
            ws, hs = hdr[:, 0], hdr[:, 1]
            n_rows = len(blobs)
            mean_px = np.empty(n_rows)
            std_px = np.empty(n_rows)
            hists: list = [None] * n_rows
            for wh in np.unique(ws * (1 << 32) + hs):
                w, h = int(wh >> 32), int(wh & 0xFFFFFFFF)
                sel = np.nonzero((ws == w) & (hs == h))[0]
                px = np.stack([
                    np.frombuffer(blobs[i], dtype=np.uint8, offset=12,
                                  count=w * h) for i in sel
                ])
                mean_px[sel] = [round(float(v), 4)
                                for v in px.mean(axis=1)]
                std_px[sel] = [round(float(v), 4) for v in px.std(axis=1)]
                flat = ((px >> shift).astype(np.int64)
                        + np.arange(len(sel))[:, None] * n_bins)
                hb = np.bincount(flat.ravel(), minlength=len(sel) * n_bins)
                hb = hb.reshape(len(sel), n_bins)
                for k, i in enumerate(sel):
                    hists[i] = hb[k].tolist()
            yield pd.DataFrame({
                id_col: ids, "width": ws.astype(np.int32),
                "height": hs.astype(np.int32), "mean_px": mean_px,
                "std_px": std_px, "hist": hists,
            })

    return df.mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, payload_col: str = "payload"
) -> DataFrame:
    """Nearest-neighbour resize, blob -> blob (same schema out as in, new
    payload + updated metadata). With PIL present this becomes
    ``Image.resize``; the batch plumbing is identical."""
    schema = df.schema

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[payload_col]:
                w, h, px = _decode_blob(bytes(blob))
                img = px.reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = img[np.ix_(yi, xi)].ravel()
                out.append(
                    MAGIC + struct.pack(">II", out_w, out_h) + small.tobytes()
                )
            pdf = pdf.copy()
            pdf[payload_col] = out
            if "media_meta" in pdf.columns:
                pdf["media_meta"] = [
                    {**m, "width": out_w, "height": out_h, "n_bytes": len(b)}
                    for m, b in zip(pdf["media_meta"], out)
                ]
            yield pdf

    return df.mapInPandas(rs, schema)


def attach_video_blobs(
    df: DataFrame, seed_col: str = "doc_id", width: int = 8, height: int = 8,
    n_frames: int = 12,
) -> DataFrame:
    """Deterministic multi-frame payloads (video stand-in)."""
    schema = StructType(
        df.schema.fields + [StructField("payload", BinaryType()),
                            StructField("n_frames", IntegerType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                _encode_video(int(s), width, height, n_frames)
                for s in pdf[seed_col]
            ]
            pdf["n_frames"] = n_frames
            yield pdf

    return df.mapInPandas(gen, schema)


def sample_frames(
    df: DataFrame, every_k: int = 4, id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Explode every k-th frame of a video blob into image-blob rows
    (frame_idx, frame payload). One input row -> ceil(n/k) output rows; at
    scale repartition AFTER sampling so the fan-out doesn't skew tasks."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                blob = bytes(blob)
                if blob[:4] != MAGIC_V:
                    raise ValueError("not an IDBV video blob")
                w, h, n = struct.unpack(">III", blob[4:16])
                fsz = w * h
                for fi in range(0, n, every_k):
                    px = blob[16 + fi * fsz : 16 + (fi + 1) * fsz]
                    ids.append(int(i))
                    idxs.append(fi)
                    frames.append(MAGIC + struct.pack(">II", w, h) + px)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, out_schema)


def blob_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-SQL blob accounting (no decode): count + total/min/max bytes.
    Stays entirely in codegen — the cheap pre-flight check before paying for
    a decode pass."""
    ln = F.length(F.col(payload_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(ln).cast("bigint").alias("total_bytes"),
        F.min(ln).cast("bigint").alias("min_bytes"),
        F.max(ln).cast("bigint").alias("max_bytes"),
    )


# -- audio modality -----------------------------------------------------------

MAGIC_A = b"IDBA"  # audio = sample rate + int16 PCM mono


def _encode_audio(seed: int, sr: int, n_samples: int) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(1 << 15), 1 << 15, size=n_samples, dtype=np.int16)
    return MAGIC_A + struct.pack(">II", sr, n_samples) + pcm.tobytes()


def _decode_audio(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != MAGIC_A:
        raise ValueError("not an IDBA audio blob")
    sr, n = struct.unpack(">II", blob[4:12])
    return sr, np.frombuffer(blob, dtype=np.int16, offset=12, count=n)


def attach_audio_blobs(
    df: DataFrame, seed_col: str = "doc_id", sr: int = 8000, seconds: float = 0.25
) -> DataFrame:
    """Attach a deterministic mono-PCM payload + typed metadata per row —
    the audio analog of ``attach_image_blobs`` (with torchaudio/ffmpeg this
    slot decodes real files; the Spark plumbing is identical)."""
    n = int(sr * seconds)
    schema = StructType(
        df.schema.fields
        + [
            StructField("payload", BinaryType()),
            StructField(
                "media_meta",
                StructType(
                    [
                        StructField("modality", StringType()),
                        StructField("sample_rate", IntegerType()),
                        StructField("n_samples", LongType()),
                        StructField("n_bytes", LongType()),
                    ]
                ),
            ),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [_encode_audio(int(s), sr, n) for s in pdf[seed_col]]
            pdf = pdf.copy()
            pdf["payload"] = blobs
            pdf["media_meta"] = [
                {"modality": "audio", "sample_rate": sr, "n_samples": n,
                 "n_bytes": len(b)}
                for b in blobs
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode PCM and extract duration / RMS / zero-crossing rate in Arrow
    batches — binary in, fixed-width numeric out, the same hot-path shape as
    image decode."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("zcr", DoubleType()),
        ]
    )

    # r14 negative result: stacking same-length clips into an (N, n)
    # float64 matrix and reducing axis-1 measured 14x SLOWER than this
    # per-row loop in the kernel alone (0.07 -> 1.0 s per 5000 clips):
    # each clip is 2000 samples — already enough to amortize numpy call
    # overhead — and the 80 MB stacked temporaries evict cache, while the
    # 16 KB per-row arrays stay in L1/L2. The stacked shape only pays for
    # tiny rows (see decode_image_features' 256-px rasters).
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                sr, pcm = _decode_audio(bytes(blob))
                x = pcm.astype(np.float64)
                zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
                rows.append(
                    (int(i), sr, round(len(x) / sr, 4),
                     round(float(np.sqrt(np.mean(x * x))), 4),
                     round(zc / max(1, len(x) - 1), 4))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "duration_s", "rms", "zcr"]
            )

    return df.mapInPandas(extract, out_schema)


def window_audio(
    df: DataFrame, window_samples: int, hop_samples: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Fixed-length analysis windows with hop (the audio analog of document
    chunking): each clip fans out to ⌈(n-window)/hop⌉+1 rows of re-encoded
    PCM windows — the framing step before any feature/embedding model."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("win_idx", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )

    def win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                sr, pcm = _decode_audio(bytes(blob))
                k = 0
                for start in range(0, max(1, len(pcm) - window_samples + 1),
                                   hop_samples):
                    chunk = pcm[start:start + window_samples]
                    rows.append(
                        (int(i), k,
                         MAGIC_A + struct.pack(">II", sr, len(chunk))
                         + chunk.tobytes())
                    )
                    k += 1
            yield pd.DataFrame(rows, columns=[id_col, "win_idx", "payload"])

    return df.mapInPandas(win, out_schema)


# -- perceptual-hash near-duplicate detection ---------------------------------

def image_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    grid: int = 8,
) -> DataFrame:
    """Perceptual hash (average-hash family): decode, block-average the
    raster onto a ``grid``x``grid`` mosaic, set bit i iff block i's mean
    exceeds the whole-image mean — a 64-bit fingerprint that survives
    re-encoding and mild noise, unlike the byte-exact md5. With PIL present
    the decode swaps to a real codec; the mosaic/threshold math is
    unchanged. Returns (id_col, phash BIGINT).

    Scale: pure projection in Arrow batches (no shuffle); the hash is the
    64-bit signed reinterpretation so it parquet-packs as a plain long.

    r13: batches vectorize across images (guide §4) — same-dimension
    rasters stack into one (N, h, w) array, block means come from one
    reshape-reduce and the bit pack from one integer matmul, instead of a
    64-slice Python comprehension + 64-iteration pack loop per image.
    Bit-exact with the per-image path: pixels are uint8, so every block
    and global sum is an exact small integer in float64 REGARDLESS of
    summation order, and the divisors are identical — the threshold
    compare sees the same exact values. Images whose dims don't split
    evenly keep the per-image remainder-folding path (its block
    boundaries are the spec).
    """
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("phash", LongType())]
    )
    weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))

    def one(px: np.ndarray, w: int, h: int) -> int:
        img = px.reshape(h, w).astype(np.float64)
        ys = (np.arange(grid + 1) * h) // grid
        xs = (np.arange(grid + 1) * w) // grid
        blocks = np.array([
            img[ys[r]:ys[r + 1], xs[c]:xs[c + 1]].mean()
            for r in range(grid) for c in range(grid)
        ])
        bits = blocks > img.mean()
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        if val >= 1 << 63:
            val -= 1 << 64
        return val

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            decoded = [_decode_blob(bytes(b)) for b in pdf[payload_col]]
            out = np.empty(len(ids), dtype=np.int64)
            by_dim: dict[tuple[int, int], list[int]] = {}
            for k, (w, h, _) in enumerate(decoded):
                if w % grid == 0 and h % grid == 0:
                    by_dim.setdefault((w, h), []).append(k)
                else:
                    out[k] = one(decoded[k][2], w, h)
            for (w, h), idxs in by_dim.items():
                imgs = np.stack([decoded[k][2] for k in idxs]) \
                    .reshape(len(idxs), h, w).astype(np.float64)
                blocks = imgs.reshape(
                    len(idxs), grid, h // grid, grid, w // grid
                ).mean(axis=(2, 4)).reshape(len(idxs), grid * grid)
                gmean = imgs.mean(axis=(1, 2))
                bits = (blocks > gmean[:, None]).astype(np.uint64)
                out[idxs] = (bits @ weights).view(np.int64)
            yield pd.DataFrame({id_col: ids.astype(np.int64),
                                "phash": out})

    return df.mapInPandas(hash_batch, out_schema)


def phash_near_dup_pairs(
    hashed: DataFrame, max_hamming: int = 3, id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs by banded perceptual-hash match: split the
    64-bit phash into ``n_bands`` equal bands; candidates share at least one
    exact band; verify by full Hamming distance <= ``max_hamming``.

    COMPLETE by pigeonhole for max_hamming < n_bands: a pair within the
    Hamming budget differs in fewer bits than there are bands, so some band
    is untouched and the equi-join finds it. Scale: the join keys on
    (band_idx, band_bits) — uniform small keys, E[candidates] ~ n²/2^16 per
    band for random content, never all-pairs; the verify is one codegen'd
    bit_count(xor). Same banding scheme as MinHash-LSH, here with an exact
    completeness guarantee instead of a probabilistic one.
    """
    assert 64 % n_bands == 0, "bands must evenly split 64 bits"
    width = 64 // n_bands
    bands = F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("phash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("bits"),
        )
        for b in range(n_bands)
    ])).alias("bb")
    keyed = hashed.select(F.col(id_col), F.col("phash"), bands) \
        .select(id_col, "phash", "bb.band", "bb.bits")
    # r13: shuffle the banded frame on the join key ONCE, then derive the
    # two join sides by renaming ABOVE the exchange — the sides' plans are
    # identical up to the Exchange, so the second side becomes a
    # ReusedExchange and the upstream (for q53d: two chained Python
    # stages of blob gen + phash) runs once instead of once per side.
    keyed = keyed.repartition(F.col("band"), F.col("bits"))
    a = keyed.select(F.col(id_col).alias("i1"), F.col("phash").alias("h1"),
                     "band", "bits")
    b = keyed.select(F.col(id_col).alias("i2"), F.col("phash").alias("h2"),
                     "band", "bits")
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("i1") < F.col("i2"))
        .select("i1", "i2", ham.alias("hamming"))
        .distinct()  # a pair may share several bands
        .filter(F.col("hamming") <= max_hamming)
    )


# -- oracle-verifiable PCM8 audio path ---------------------------------------
# q53b/q53c's PCG64-generated payloads have no SQL analog, so their
# mapInPandas feature VALUES are only rows-only-checked. This codec
# derives the waveform from md5 (computable in portable SQL nibble by
# nibble), so the whole Arrow-batched decode -> vectorized-feature path
# is value-verified against a DuckDB oracle — the multimodal plumbing's
# strongest correctness check. All features are exact integer math
# (mean-square energy, not RMS: no sqrt, no floats anywhere).

def _pcm8_payload(doc_id: int, chunks: int) -> bytes:
    import hashlib

    return b"".join(
        hashlib.md5(f"{doc_id}:au:{k}".encode()).digest()
        for k in range(chunks))


def attach_pcm8_blobs(df: DataFrame, id_col: str = "doc_id",
                      chunks: int = 16) -> DataFrame:
    """Attach a deterministic md5-chained 8-bit PCM payload (16 bytes per
    chunk) as an opaque binary column — the decode slot a real audio
    loader would fill; here the bytes are reproducible in SQL."""
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("payload", BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "payload": [
                    _pcm8_payload(int(i), chunks) for i in pdf[id_col]
                ],
            })

    return df.select(id_col).mapInPandas(gen, schema)


def pcm8_frame_features(df: DataFrame, frame: int = 32,
                        silence_energy: int = 4000,
                        id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Vectorized frame-level audio features over PCM8 blobs: per doc,
    sample/frame counts, mean frame energy (sum of squared deviations
    from the 128 midpoint, integer-floor-divided by the frame length),
    silence-frame count (energy < ``silence_energy``), peak deviation,
    and hard-clip sample count (0/255). numpy over each Arrow batch —
    no Python per row, no shuffle (pure projection)."""
    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", LongType()),
        StructField("mean_energy", LongType()),
        StructField("n_silence", LongType()),
        StructField("peak", LongType()),
        StructField("n_clip", LongType()),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                a = np.frombuffer(bytes(blob), dtype=np.uint8) \
                    .astype(np.int64)
                d = a - 128
                n = d.size - (d.size % frame)
                energies = (d[:n] * d[:n]).reshape(-1, frame) \
                    .sum(axis=1) // frame
                rows.append((
                    int(i), int(a.size), int(energies.size),
                    int(energies.sum() // energies.size),
                    int((energies < silence_energy).sum()),
                    int(np.abs(d).max()),
                    int(((a == 0) | (a == 255)).sum()),
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return df.mapInPandas(extract, out_schema)
