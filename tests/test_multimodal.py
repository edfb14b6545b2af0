"""Multimodal column handling (multimodal/media.py).

The decode step is a deterministic stub (no Pillow/ffmpeg in this
container) — what these tests verify is the REAL part: canonical
schema, Arrow-batched mapInPandas plumbing, payload-size-aware
partitioning, row-explosion for frame sampling, and numpy feature
math over decoded buffers.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quanta_etl_spark.multimodal import media


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\x10\x20\x30" * 100, "image/png", 4, 3, 3, None),
        (2, b"\xff" * 16, "image/png", 2, 2, 3, None),
        (3, None, "image/png", None, None, None, None),
        (4, bytes(range(200)) * 10, "video/mp4", None, None, None, 3500),
        (5, (b"\x00\x01\xfe\xff" * 64), "audio/wav", None, None, None, 1000),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, mime_type string, width int, "
        "height int, n_channels int, duration_ms long",
    )
    return media.media_table(df)


def test_media_table_canonical_schema(media_df):
    assert [f.name for f in media_df.schema.fields] == [
        f.name for f in media.MEDIA_SCHEMA.fields
    ]
    sizes = {r["media_id"]: r["size_bytes"] for r in media_df.collect()}
    assert sizes[1] == 300
    assert sizes[3] is None  # null payload -> null size


def test_repartition_for_media(media_df):
    out = media.repartition_for_media(media_df, target_partition_bytes=1024)
    assert out.count() == 5
    assert out.rdd.getNumPartitions() >= 2


def test_repartition_for_media_spreads_large_payloads(spark):
    """Size-band salting: many large payloads must not pile into one
    task (they previously could — uniform media-id hashing)."""
    rows = [(i, b"L" * 4096) for i in range(8)]  # 8 large payloads
    rows += [(100 + i, b"s" * 8) for i in range(64)]  # tiny ones
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = media.repartition_for_media(df, target_partition_bytes=4096)
    per_part = (
        out.where(F.octet_length("content") >= 2048)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    # 8 large rows across >= 4 distinct partitions, no pileup > 3
    assert len(per_part) >= 4
    assert max(r["count"] for r in per_part) <= 3


def test_audio_features_sample_width(spark):
    df = spark.createDataFrame(
        [(1, b"\x01\xff\x80\x7f\x00")], "media_id long, content binary"
    )
    w1 = media.audio_features(df, sample_width=1).collect()[0]
    # int8: [1, -1, -128, 127, 0]
    assert w1["n_samples"] == 5 and w1["peak"] == 128.0
    w4 = media.audio_features(df, sample_width=4).collect()[0]
    assert w4["n_samples"] == 1  # one int32 sample, last byte dropped
    with pytest.raises(ValueError):
        media.audio_features(df, sample_width=3)


def test_decode_image_stub_shapes(media_df):
    decoded = media.decode_image(media_df.where(F.col("mime_type") == "image/png"))
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows[1]["width"] == 4 and rows[1]["height"] == 3
    arr = np.frombuffer(rows[1]["pixels"], dtype=np.uint8)
    assert arr.shape == (4 * 3 * 3,)
    # stub tiles payload bytes deterministically
    assert arr[0] == 0x10 and arr[1] == 0x20 and arr[2] == 0x30
    # null payload decodes to zeros at default 8x8
    null_arr = np.frombuffer(rows[3]["pixels"], dtype=np.uint8)
    assert null_arr.sum() == 0 and null_arr.size == 8 * 8 * 3


def test_image_features(media_df):
    feats = media.image_features(
        media.decode_image(media_df.where(F.col("media_id") == 2))
    ).collect()[0]
    assert feats["mean_intensity"] == 255.0
    assert feats["std_intensity"] == 0.0
    assert feats["channel_means"] == [255.0, 255.0, 255.0]
    assert feats["histogram"][-1] == 12  # all 12 pixels in top bin


def test_resize_images(media_df):
    decoded = media.decode_image(media_df.where(F.col("media_id") == 1))
    resized = media.resize_images(decoded, out_width=2, out_height=2).collect()[0]
    assert resized["width"] == 2 and resized["height"] == 2
    arr = np.frombuffer(resized["pixels"], dtype=np.uint8).reshape(2, 2, 3)
    src = np.frombuffer(
        media.decode_image(media_df.where(F.col("media_id") == 1))
        .collect()[0]["pixels"],
        dtype=np.uint8,
    ).reshape(3, 4, 3)
    # nearest-neighbor: out[0,0] == src[0,0], out[1,1] == src[1,2]
    assert (arr[0, 0] == src[0, 0]).all()
    assert (arr[1, 1] == src[1, 2]).all()


def test_sample_video_frames(media_df):
    frames = media.sample_video_frames(
        media_df.where(F.col("media_id") == 4), every_ms=1000
    ).collect()
    assert len(frames) == 3  # 3500ms at 1 fps -> 3 frames
    assert [f["frame_index"] for f in frames] == [0, 1, 2]
    assert [f["frame_ms"] for f in frames] == [0, 1000, 2000]
    assert all(len(f["frame"]) > 0 for f in frames)
    # media without duration yields no frames
    none = media.sample_video_frames(
        media_df.where(F.col("media_id") == 1), every_ms=1000
    ).count()
    assert none == 0


def test_audio_features(media_df):
    feats = media.audio_features(media_df.where(F.col("media_id") == 5)).collect()[0]
    # payload = [0x0100, 0xfffe] little-endian int16 = [256, -2] repeated
    assert feats["n_samples"] == 128
    assert feats["peak"] == 256.0
    assert feats["zero_crossings"] == 127  # alternating sign every sample
    expected_rms = float(np.sqrt((256.0**2 + 2.0**2) / 2))
    assert abs(feats["rms"] - expected_rms) < 1e-9


def test_binary_file_ingestion_to_media_table(spark, tmp_path):
    """binaryFile source → media_table: the multimodal ingestion path
    (one row per file, bytes + size, glob and size pruning at source)."""
    from quanta_etl_spark.sources.readers import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG" + b"\x00" * 60)
    (d / "b.png").write_bytes(b"\x89PNG" + b"\xff" * 10)
    (d / "c.txt").write_bytes(b"not media")
    raw = read_binary_files(spark, str(d), glob="*.png")
    assert raw.count() == 2  # txt pruned by glob
    small = read_binary_files(spark, str(d), glob="*.png", max_bytes=32)
    assert small.count() == 1  # 64-byte png pruned by size

    table = media.media_table(
        raw.select(
            F.xxhash64("path").alias("media_id"),
            F.col("content"),
            F.lit("image/png").alias("mime_type"),
        )
    )
    rows = table.collect()
    assert {r.size_bytes for r in rows} == {64, 14}
    assert all(r.mime_type == "image/png" for r in rows)


def test_perceptual_hash_equal_and_distinct(spark):
    from quanta_etl_spark.multimodal import media as mm
    import pyspark.sql.functions as F

    payloads = spark.createDataFrame(
        [
            (1, b"hello world, this is image one", "image/fake", 8, 8),
            (2, b"hello world, this is image one", "image/fake", 8, 8),
            (3, b"completely different payload bytes!", "image/fake", 8, 8),
        ],
        ["media_id", "content", "mime_type", "width", "height"],
    )
    hashed = {
        r["media_id"]: (r["phash_hi"], r["phash_lo"])
        for r in mm.perceptual_hash(
            mm.decode_image(mm.media_table(payloads))
        ).collect()
    }
    assert hashed[1] == hashed[2]          # identical payloads: equal hash
    assert hashed[1] != hashed[3]          # different payloads: differ
    # halves are unsigned 32-bit
    for hi, lo in hashed.values():
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_phash_neardup_banding_complete(spark):
    from quanta_etl_spark.multimodal import media as mm
    import pyspark.sql.functions as F
    import pytest as _pytest

    # hand-built hashes: 1<->2 differ in 2 bits (within 3), 3 is far
    hashed = spark.createDataFrame(
        [
            (1, 0x0000FFFF, 0x12345678),
            (2, 0x0100FFFF, 0x12345679),   # bits differ: one in hi, one in lo
            (3, 0xFFFF0000, 0x87654321),
        ],
        ["media_id", "phash_hi", "phash_lo"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.phash_neardup_pairs(hashed, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): 2}
    with _pytest.raises(ValueError):
        mm.phash_neardup_pairs(hashed, max_hamming=2)


def test_decode_image_real_codec_or_stub(spark):
    """The default decoder must work in BOTH environments: with Pillow
    installed it decodes real encoded images (image's own dims win);
    without it — or for payloads that aren't decodable images — the
    deterministic stub produces identical pixels whether or not Pillow
    exists. This container has no Pillow, but the test exercises the
    real path too whenever it runs somewhere that does."""
    from quanta_etl_spark.multimodal import media as mm

    # non-image payload: auto decoder must equal the stub exactly
    payload = b"definitely not a png"
    rows = [(1, payload, "image/fake", 4, 4)]
    df = mm.media_table(
        spark.createDataFrame(
            rows, "media_id long, content binary, mime_type string, "
                  "width int, height int"
        )
    )
    got = mm.decode_image(df).collect()[0]
    import numpy as np

    expected = mm._stub_decode_image(payload, 4, 4)
    assert (got.width, got.height, got.n_channels) == (4, 4, 3)
    assert got.pixels == expected.tobytes()

    try:
        from PIL import Image  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        import io

        img = Image.new("RGB", (6, 3), color=(10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        png_rows = [(2, buf.getvalue(), "image/png", None, None)]
        pdf = mm.media_table(
            spark.createDataFrame(
                png_rows, "media_id long, content binary, mime_type string, "
                          "width int, height int"
            )
        )
        r = mm.decode_image(pdf).collect()[0]
        # real dims (6x3) win over the 8x8 metadata defaults
        assert (r.width, r.height, r.n_channels) == (6, 3, 3)
        arr = np.frombuffer(r.pixels, dtype=np.uint8).reshape(3, 6, 3)
        assert (arr == [10, 20, 30]).all()
