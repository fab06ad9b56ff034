"""Multimodal binary-column plumbing tests: deterministic fake raster codec
over real mapInPandas/Arrow batch paths (SURVEY.md §2.2i)."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from inspectadb_spark.operators.multimodal import (
    MAGIC,
    attach_image_blobs,
    attach_video_blobs,
    blob_stats,
    decode_image_features,
    resize_images,
    sample_frames,
    _decode_blob,
    _encode_blob,
)
from tests.conftest import SF_DIR


def _docs(spark, n=30):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(n)


def test_codec_roundtrip_deterministic():
    b1 = _encode_blob(7, 4, 3)
    b2 = _encode_blob(7, 4, 3)
    assert b1 == b2 and b1[:4] == MAGIC and len(b1) == 12 + 12
    w, h, px = _decode_blob(b1)
    assert (w, h, len(px)) == (4, 3, 12)


def test_attach_and_stats(spark):
    d = _docs(spark)
    blobs = attach_image_blobs(d, width=8, height=8)
    row = blob_stats(blobs).first()
    assert row["n_blobs"] == 30
    assert row["min_bytes"] == row["max_bytes"] == 12 + 64
    meta = blobs.select("media_meta.modality", "media_meta.n_bytes").first()
    assert meta[0] == "image" and meta[1] == 76


def test_decode_features_match_local(spark):
    d = _docs(spark, 10)
    feats = {
        r["doc_id"]: r
        for r in decode_image_features(attach_image_blobs(d, width=8, height=8)).collect()
    }
    for doc_id in feats:
        _, _, px = _decode_blob(_encode_blob(int(doc_id), 8, 8))
        assert feats[doc_id]["mean_px"] == round(float(px.mean()), 4)
        assert sum(feats[doc_id]["hist"]) == 64


def test_resize(spark):
    d = _docs(spark, 5)
    small = resize_images(attach_image_blobs(d, width=16, height=16), 4, 4)
    for r in small.select("payload", "media_meta").collect():
        w, h = struct.unpack(">II", bytes(r["payload"])[4:12])
        assert (w, h) == (4, 4)
        assert r["media_meta"]["n_bytes"] == 12 + 16


def test_video_frame_sampling(spark):
    d = _docs(spark, 6)
    vids = attach_video_blobs(d, width=4, height=4, n_frames=10)
    frames = sample_frames(vids, every_k=3)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)  # frames 0,3,6,9
    f0 = frames.filter(F.col("frame_idx") == 0).first()
    w, h, px = _decode_blob(bytes(f0["frame"]))
    assert (w, h, len(px)) == (4, 4, 16)


def test_frame_pixels_match_source(spark):
    d = _docs(spark, 3)
    vids = attach_video_blobs(d, width=4, height=4, n_frames=6)
    frames = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"])
              for r in sample_frames(vids, every_k=2).collect()}
    rng = np.random.default_rng(int(next(iter(frames))[0]))
    allpx = rng.integers(0, 256, size=6 * 16, dtype=np.uint8)
    doc = next(iter(frames))[0]
    for fi in (0, 2, 4):
        _, _, px = _decode_blob(frames[(doc, fi)])
        assert np.array_equal(px, allpx[fi * 16 : (fi + 1) * 16])


def test_binary_file_source_globs_and_caps(spark, tmp_path):
    # raw-asset ingest front door: glob prunes at listing, max_bytes from
    # file metadata (never fetches oversized content)
    import os

    from inspectadb_spark.sources.files import read_binary_files

    for i in range(3):
        (tmp_path / f"img{i}.bin").write_bytes(b"\x89" * (10 + i * 100))
    (tmp_path / "skip.txt").write_text("nope")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin", max_bytes=150)
    rows = df.collect()
    assert {os.path.basename(r.path) for r in rows} == {"img0.bin", "img1.bin"}
    assert all(r.length == len(r.content) for r in rows)


# -- audio modality -----------------------------------------------------------

def test_audio_attach_decode_roundtrip(spark):
    from inspectadb_spark.operators.multimodal import (
        _decode_audio,
        attach_audio_blobs,
        audio_features,
    )

    base = spark.range(4).withColumnRenamed("id", "doc_id")
    clips = attach_audio_blobs(base, sr=8000, seconds=0.25)
    rows = clips.collect()
    assert all(r.media_meta.modality == "audio" and
               r.media_meta.n_samples == 2000 for r in rows)
    # deterministic: same seed -> same payload
    again = {r.doc_id: bytes(r.payload) for r in attach_audio_blobs(base).collect()}
    assert all(bytes(r.payload) == again[r.doc_id] for r in rows)

    feats = {r.doc_id: r for r in audio_features(clips).collect()}
    for r in rows:
        sr, pcm = _decode_audio(bytes(r.payload))
        import numpy as np

        x = pcm.astype("float64")
        assert feats[r.doc_id].duration_s == round(len(x) / sr, 4)
        assert feats[r.doc_id].rms == round(float(np.sqrt((x * x).mean())), 4)
        assert 0.0 < feats[r.doc_id].zcr < 1.0  # random PCM crosses often


def test_audio_windowing_covers_clip_with_hop(spark):
    from inspectadb_spark.operators.multimodal import (
        _decode_audio,
        attach_audio_blobs,
        window_audio,
    )

    base = spark.range(2).withColumnRenamed("id", "doc_id")
    clips = attach_audio_blobs(base, sr=8000, seconds=0.25)  # 2000 samples
    wins = window_audio(clips, window_samples=800, hop_samples=400)
    got = sorted((r.doc_id, r.win_idx) for r in wins.collect())
    # starts 0,400,800,1200: windows of 800 within 2000 -> 4 per clip
    assert got == [(d, k) for d in (0, 1) for k in range(4)]
    one = [r for r in wins.collect() if r.doc_id == 0 and r.win_idx == 1][0]
    sr, pcm = _decode_audio(bytes(one.payload))
    src = [r for r in clips.collect() if r.doc_id == 0][0]
    _, full = _decode_audio(bytes(src.payload))
    assert (pcm == full[400:1200]).all()


def test_phash_identical_and_perturbed_images(spark):
    """Identical payloads hash equal (hamming 0); a mild perturbation of a
    few blocks moves few bits and is caught within the banded budget; an
    unrelated image is not reported."""
    import struct

    import numpy as np

    from inspectadb_spark.operators.multimodal import (
        MAGIC,
        _decode_blob,
        _encode_blob,
        image_phash,
        phash_near_dup_pairs,
    )

    w = h = 16
    base = _encode_blob(7, w, h)
    # perturb: push the first two 2x2-ish blocks strongly bright — flips at
    # most a couple of mosaic bits
    _, _, px = _decode_blob(base)
    arr = px.reshape(h, w).copy()
    arr[0:2, 0:4] = 255
    pert = MAGIC + struct.pack(">II", w, h) + arr.astype(np.uint8).tobytes()
    other = _encode_blob(99, w, h)

    rows = [(0, base), (1, base), (2, pert), (3, other)]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    hashed = image_phash(df)
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert hs[0] == hs[1]  # determinism: same bytes -> same phash

    pairs = {(r.i1, r.i2): r.hamming
             for r in phash_near_dup_pairs(hashed, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and 1 <= pairs[(0, 2)] <= 3
    assert not any(3 in p for p in pairs)


def test_phash_banding_complete_vs_bruteforce(spark):
    """Pigeonhole completeness: banded candidates find EVERY pair within the
    Hamming budget (checked against the all-pairs answer on a small set)."""
    from inspectadb_spark.operators.multimodal import (
        attach_image_blobs,
        image_phash,
        phash_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    base = spark.range(40).withColumnRenamed("id", "doc_id")
    hashed = image_phash(attach_image_blobs(base)).cache()
    got = {(r.i1, r.i2) for r in
           phash_near_dup_pairs(hashed, max_hamming=3).collect()}
    a = hashed.select(F.col("doc_id").alias("i1"), F.col("phash").alias("h1"))
    b = hashed.select(F.col("doc_id").alias("i2"), F.col("phash").alias("h2"))
    brute = {
        (r.i1, r.i2)
        for r in a.crossJoin(b).filter("i1 < i2")
        .withColumn("hm", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter("hm <= 3").collect()
    }
    assert got == brute


def test_phash_vectorized_matches_per_image_reference(spark):
    """The r13 batch-vectorized phash must reproduce the original
    per-image slice-and-fold algorithm bit for bit, on grid-divisible
    dims (the vectorized path) AND remainder dims (the fallback path)."""
    import numpy as np

    from inspectadb_spark.operators.multimodal import (
        _decode_blob,
        attach_image_blobs,
        image_phash,
    )

    def reference(blob, grid=8):
        w, h, px = _decode_blob(bytes(blob))
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
        return val - (1 << 64) if val >= 1 << 63 else val

    base = spark.range(60).withColumnRenamed("id", "doc_id")
    for w, h in [(16, 16), (11, 13)]:  # divisible / remainder-fold dims
        blobs = attach_image_blobs(base, width=w, height=h)
        want = {r.doc_id: reference(r.payload)
                for r in blobs.select("doc_id", "payload").collect()}
        got = {r.doc_id: r.phash for r in image_phash(blobs).collect()}
        assert got == want, (w, h)


def test_stacked_feature_paths_match_per_row_reference(spark):
    """r14 equivalence pin: the stacked (N, n) batch kernels in
    audio_features / decode_image_features reproduce the old per-row
    loops bit-for-bit — including across MIXED blob geometries in one
    Arrow batch (the group-by-size path)."""
    from inspectadb_spark.operators.multimodal import (
        MAGIC_A,
        attach_audio_blobs,
        audio_features,
        _decode_audio,
        _encode_audio,
    )

    base = spark.range(40).withColumnRenamed("id", "doc_id")

    # audio: two sample rates / lengths mixed in one frame via union
    clips = attach_audio_blobs(base, sr=8000, seconds=0.25).unionByName(
        attach_audio_blobs(
            base.withColumn("doc_id", F.col("doc_id") + 1000),
            sr=4000, seconds=0.33,
        )
    )
    got = {r["doc_id"]: r for r in audio_features(clips).collect()}
    assert len(got) == 80
    for r in clips.select("doc_id", "payload").collect():
        sr, pcm = _decode_audio(bytes(r.payload))
        x = pcm.astype(np.float64)
        zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
        g = got[r.doc_id]
        assert g["sample_rate"] == sr
        assert g["duration_s"] == round(len(x) / sr, 4)
        assert g["rms"] == round(float(np.sqrt(np.mean(x * x))), 4)
        assert g["zcr"] == round(zc / max(1, len(x) - 1), 4)

    # images: two geometries mixed in one frame
    blobs = attach_image_blobs(base, width=8, height=8).unionByName(
        attach_image_blobs(
            base.withColumn("doc_id", F.col("doc_id") + 1000),
            width=16, height=9,
        )
    )
    gotf = {r["doc_id"]: r for r in decode_image_features(blobs).collect()}
    assert len(gotf) == 80
    for r in blobs.select("doc_id", "payload").collect():
        w, h, px = _decode_blob(bytes(r.payload))
        hist = np.bincount(px >> 4, minlength=16)
        g = gotf[r.doc_id]
        assert (g["width"], g["height"]) == (w, h)
        assert g["mean_px"] == round(float(px.mean()), 4)
        assert g["std_px"] == round(float(px.std()), 4)
        assert g["hist"] == hist.tolist()
