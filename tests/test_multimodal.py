"""Multimodal plumbing tests: binary round-trip, Arrow batch shapes,
row-level error channel, metadata-only projection pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_feature_store_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    encode_fake_image,
    media_metadata_stats,
    resize_images,
)


def _media_df(spark):
    rows = []
    for i in range(8):
        w, h = 4 + i, 3 + i
        blob = encode_fake_image(w, h, 3, seed=i)
        rows.append(
            (i, "image", f"mem://img/{i}", bytearray(blob), (w, h, 3, len(blob)))
        )
    rows.append((99, "image", "mem://img/bad", bytearray(b"\x89PNG garbage"), None))
    rows.append((100, "image", "mem://img/null", None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_extracts_features_and_errors(spark):
    media = _media_df(spark)
    got = {r.media_id: r for r in decode_images(media).collect()}
    assert len(got) == 10
    assert got[0].width == 4 and got[0].height == 3 and got[0].n_pixels == 12
    assert got[0].error is None
    assert 0 <= got[0].mean_intensity <= 255
    # poisoned blob and null payload become rows, not job failures
    assert got[99].error.startswith("NotImplementedError")
    assert got[99].width is None
    assert got[100].error.startswith("ValueError")


def test_resize_roundtrip(spark):
    media = _media_df(spark).where(F.col("media_id") < 8)
    resized = resize_images(media, (2, 2))
    decoded = {r.media_id: r for r in decode_images(resized).collect()}
    assert all(r.width == 2 and r.height == 2 for r in decoded.values())
    assert all(r.error is None for r in decoded.values())


def test_metadata_stats_prune_payload(spark, tmp_path):
    path = str(tmp_path / "media")
    _media_df(spark).write.parquet(path)
    media = spark.read.parquet(path)
    from mini_feature_store_spark.functions import plan_text

    stats = media_metadata_stats(media)
    plan = plan_text(stats)
    # binary payload column must not be in the parquet ReadSchema
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "payload" not in read_schema[0]
    row = stats.collect()[0]
    assert row.n_items == 10 and row.media_type == "image"


def test_arrow_batching_respects_max_records(spark):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        media = _media_df(spark).coalesce(1)
        assert decode_images(media).count() == 10
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def test_video_frame_sampling_composes_with_image_tier(spark):
    from mini_feature_store_spark.operators.multimodal import (
        decode_images,
        encode_fake_video,
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            (1, encode_fake_video(4, 3, 3, n_frames=25, seed=7)),
            (2, b"\x00\x01realmp4"),
        ],
        "media_id long, payload binary",
    )
    frames = sample_frames(media, every_k=10)
    rows = frames.collect()
    ok = [r for r in rows if r.error is None]
    assert [(r.media_id, r.frame_idx) for r in ok] == [(1, 0), (1, 10), (1, 20)]
    assert all(r.payload is not None for r in ok)
    bad = [r for r in rows if r.error is not None]
    assert len(bad) == 1 and "NotImplementedError" in bad[0].error
    # sampled frames decode through the image tier unchanged
    decoded = decode_images(frames.where("error is null")).collect()
    assert all(r.error is None and r.width == 4 and r.height == 3 for r in decoded)


def test_audio_features_duration_and_error_channel(spark):
    from mini_feature_store_spark.operators.multimodal import (
        audio_features,
        encode_fake_audio,
    )

    media = spark.createDataFrame(
        [(1, encode_fake_audio(8000, 16000, seed=3)), (2, b"RIFFwav")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert rows[1].error is None
    assert rows[1].sample_rate == 8000 and abs(rows[1].duration_s - 2.0) < 1e-9
    assert rows[1].rms > 0
    assert rows[2].error is not None and rows[2].sample_rate is None


def test_image_phash_near_dup_pairs(spark):
    """pHash must pair identical images at hamming 0, lightly-noised and
    uniformly-brightened variants within the default radius, and leave
    unrelated images unpaired; decode failures go to the error channel."""
    import struct as _struct

    import numpy as np

    from mini_feature_store_spark.operators.multimodal import (
        FAKE_MAGIC,
        image_phash,
        image_phash_pairs,
    )

    def blob(arr):
        h, w, c = arr.shape
        return (
            FAKE_MAGIC
            + _struct.pack("<HHB", w, h, c)
            + arr.astype(np.uint8).tobytes()
        )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 200, (48, 64, 3))
    noisy = np.clip(base + rng.integers(-3, 4, base.shape), 0, 255)
    bright = np.clip(base + 30, 0, 255)  # uniform brightness shift
    other = rng.integers(0, 200, (48, 64, 3))
    rows = [
        (0, "image", None, bytearray(blob(base)), None),
        (1, "image", None, bytearray(blob(base)), None),      # identical
        (2, "image", None, bytearray(blob(noisy)), None),     # near-dup
        (3, "image", None, bytearray(blob(bright)), None),    # brightness
        (4, "image", None, bytearray(blob(other)), None),     # unrelated
        (5, "image", None, bytearray(b"JPEGnotreally"), None),  # undecodable
    ]
    from mini_feature_store_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    hashes = {r.media_id: (r.phash, r.error) for r in image_phash(media).collect()}
    assert hashes[0][0] == hashes[1][0]  # identical -> identical hash
    assert hashes[5][0] is None and "NotImplementedError" in hashes[5][1]

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_phash_pairs(media, max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 6
    assert (0, 3) in pairs  # DC-drop + median threshold absorb the shift
    assert not any(4 in p or 5 in p for p in pairs)


def test_video_phash_neardup_planted_copies(spark):
    """Video-level near-dup: an exact re-encode shares all keyframe
    hashes; a partial-overlap edit shares some; unrelated videos share
    none. Frame seeds are hand-picked so the pHash vocabulary separates."""
    import struct

    from mini_feature_store_spark.operators.multimodal import (
        FAKE_VIDEO_MAGIC,
        encode_fake_image,
        video_phash_neardup,
    )

    def video(frame_seeds, w=12, h=9, c=3):
        frames = b"".join(
            encode_fake_image(w, h, c, seed=s)[9:] for s in frame_seeds
        )
        return (
            FAKE_VIDEO_MAGIC
            + struct.pack("<HHBH", w, h, c, len(frame_seeds))
            + frames
        )

    rows = [
        (1, video([1, 20, 40, 60])),
        (2, video([1, 20, 40, 60])),   # exact copy of 1
        (3, video([1, 20, 80, 95])),   # shares 2 frames with 1/2
        (4, video([5, 33, 70, 90])),   # unrelated
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in video_phash_neardup(
            media, every_k=1, min_shared=2, max_hamming=0
        ).collect()
    }
    assert pairs[(1, 2)] == 4          # full keyframe overlap
    assert pairs[(1, 3)] == 2 and pairs[(2, 3)] == 2
    assert not any(4 in p for p in pairs)  # unrelated video never pairs


def test_image_embed_stub_histogram_and_error_channel(spark):
    """The stub image tower's embedding is the exact mod-dim pixel
    histogram of the FAKE payload (integer sums, emitted as exact
    doubles); undecodable blobs land in the error column like
    decode_images."""
    from mini_feature_store_spark.operators.multimodal import (
        encode_fake_image,
        image_embed_stub,
    )

    w, h, c, seed = 5, 4, 3, 9
    rows = [
        (1, encode_fake_image(w, h, c, seed=seed)),
        (2, b"JPEGnotreally"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in image_embed_stub(media, dim=16).collect()}

    n = w * h * c
    expect = [0] * 16
    for i in range(n):
        expect[i % 16] += (seed + 31 * i) % 256
    assert [int(v) for v in out[1].image_embedding] == expect
    assert out[1].error is None
    assert out[2].image_embedding is None
    assert "NotImplementedError" in out[2].error


def test_alignment_gate_planted_pairs(spark):
    """Planted alignment: identical embeddings score cosine 1.0 and pass;
    orthogonal embeddings score 0.0 and fail; an anti-aligned pair is
    negative. The gate is a pure projection (no joins of its own)."""
    from mini_feature_store_spark.operators.multimodal import alignment_gate

    v = [1.0, 2.0, 3.0, 4.0]
    rows = [
        (1, v, v),                                  # aligned
        (2, [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (3, v, [-x for x in v]),                    # anti-aligned
    ]
    pairs = spark.createDataFrame(
        rows,
        "doc_id long, image_embedding array<double>, "
        "text_embedding array<double>",
    )
    got = {r.doc_id: r for r in alignment_gate(pairs, threshold=0.2).collect()}
    assert got[1].align_cos == 1.0 and got[1].admitted
    assert got[2].align_cos == 0.0 and not got[2].admitted
    assert got[3].align_cos == -1.0 and not got[3].admitted


def test_alignment_gate_zero_norm_rejects_concretely(spark):
    """A zero-norm tower output (0/0 cosine — NULL under legacy float
    division, NaN under ANSI/IEEE) must gate to align_cos = 0.0 and
    admitted = False, never NULL/NaN: a ``where(~admitted)`` rejection
    branch has to SEE the row (r10 ADVICE)."""
    from mini_feature_store_spark.operators.multimodal import alignment_gate

    pairs = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),  # zero image tower
            (2, [1.0, 2.0, 3.0], [0.0, 0.0, 0.0]),  # zero text tower
        ],
        "doc_id long, image_embedding array<double>, "
        "text_embedding array<double>",
    )
    out = alignment_gate(pairs, threshold=0.2)
    got = {r.doc_id: r for r in out.collect()}
    for i in (1, 2):
        assert got[i].align_cos == 0.0, got[i]
        assert got[i].admitted is False
    # the rejection branch must count both rows
    assert out.where(~F.col("admitted")).count() == 2
