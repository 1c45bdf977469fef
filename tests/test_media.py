"""Multimodal binary columns: audio (REAL PCM-WAV decode), video
(deterministic rawvid container through the real frame-sampling
plumbing), image resize (real numpy kernels), and the honest
NotImplementedError boundary for codecs this container cannot decode."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modlyn_spark.functions.image import (
    decode_bytes,
    png_encode,
    resize_images,
    resize_pixels,
)
from modlyn_spark.functions.media import (
    decode_audio_stats,
    rawvid_encode,
    sample_frame_stats,
    wav_decode,
    wav_encode,
)


def _tone(freq: float, sec: float, rate: int = 8000) -> np.ndarray:
    t = np.arange(int(sec * rate)) / rate
    return 0.5 * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_exact():
    x = _tone(440, 0.25)
    back, rate = wav_decode(wav_encode(x, 8000))
    assert rate == 8000
    assert len(back) == len(x)
    # PCM16 quantization bound: 1/32767 per sample
    assert np.abs(back - np.clip(x, -1, 1)).max() <= 1.5 / 32767


def test_audio_stats_spark(spark):
    rows = [
        ("a440", bytearray(wav_encode(_tone(440, 0.5), 8000)), "wav"),
        ("a880", bytearray(wav_encode(_tone(880, 0.25), 8000)), "wav"),
        ("quiet", bytearray(wav_encode(np.zeros(800), 8000)), "wav"),
    ]
    schema = StructType(
        [
            StructField("audio_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["audio_id"]: r for r in decode_audio_stats(df).collect()
    }
    assert got["a440"]["sample_rate"] == 8000
    assert np.isclose(got["a440"]["duration_sec"], 0.5, atol=1e-3)
    # sine RMS = amplitude / sqrt(2)
    assert np.isclose(got["a440"]["rms"], 0.5 / np.sqrt(2), atol=1e-3)
    # zero-crossing rate ~ 2f/rate
    assert np.isclose(
        got["a440"]["zero_crossing_rate"], 2 * 440 / 8000, rtol=0.05
    )
    assert np.isclose(
        got["a880"]["zero_crossing_rate"], 2 * 880 / 8000, rtol=0.05
    )
    assert got["quiet"]["rms"] == 0.0


def test_audio_codec_stub_is_honest(spark):
    schema = StructType(
        [
            StructField("audio_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    df = spark.createDataFrame([("x", bytearray(b"ID3junk"), "mp3")], schema)
    with pytest.raises(Exception, match="mp3"):
        decode_audio_stats(df).collect()


def test_video_frame_sampling(spark):
    rng = np.random.default_rng(3)
    # 10 frames with a hard scene cut at frame 5
    quiet = rng.integers(90, 110, size=(5, 8, 8, 3), dtype=np.uint8)
    loud = rng.integers(180, 220, size=(5, 8, 8, 3), dtype=np.uint8)
    clip = np.concatenate([quiet, loud])
    schema = StructType(
        [
            StructField("video_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    df = spark.createDataFrame(
        [("v1", bytearray(rawvid_encode(clip)), "rawvid")], schema
    )
    got = (
        sample_frame_stats(df, n_samples=4)
        .toPandas()
        .sort_values("frame_idx")
        .reset_index(drop=True)
    )
    assert got["n_frames"].tolist() == [10] * 4
    assert got["frame_idx"].tolist() == [0, 3, 6, 9]
    # the sampled pair straddling the cut must carry the largest delta
    deltas = dict(zip(got["frame_idx"], got["frame_delta"]))
    assert deltas[6] == max(got["frame_delta"])
    assert deltas[6] > 50  # quiet(~100) -> loud(~200)


def test_resize_kernels_real():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    # nearest 2x down: exact index gather
    down = resize_pixels(px, 6, 8, kernel="nearest")
    assert down.shape == (8, 6, 3)
    assert (down == px[::2, ::2]).all()
    # nearest integer upscale then downscale is the identity
    up = resize_pixels(px, 24, 32, kernel="nearest")
    assert (resize_pixels(up, 12, 16, kernel="nearest") == px).all()
    # bilinear on a constant image is constant; on a gradient it stays
    # monotone and within range
    const = np.full((9, 9, 3), 77, dtype=np.uint8)
    assert (resize_pixels(const, 5, 5, kernel="bilinear") == 77).all()
    grad = np.tile(np.arange(0, 240, 10, dtype=np.uint8)[None, :, None], (6, 1, 3))
    b = resize_pixels(grad, 12, 3, kernel="bilinear")
    assert (np.diff(b[0, :, 0].astype(int)) >= 0).all()
    # gray path
    g = rng.integers(0, 256, size=(10, 10), dtype=np.uint8)
    assert resize_pixels(g, 5, 5, kernel="bilinear").shape == (5, 5)


def test_resize_images_spark(spark):
    from modlyn_spark.sources.images import generate_images_df

    images = generate_images_df(spark, 6)
    small = resize_images(images, 4, 4).toPandas()
    assert (small["w"] == 4).all() and (small["h"] == 4).all()
    assert (small["fmt"] == "png").all()
    # decoded output really is 4x4 and matches a local resize of the
    # decoded original
    orig = images.limit(1).toPandas().iloc[0]
    row = small[
        (small["image_id"] == orig["image_id"])
        & (small["version"] == orig["version"])
    ].iloc[0]
    px = decode_bytes(bytes(row["bytes"]), "png")
    assert px.shape == (4, 4, 3)
    exp = resize_pixels(decode_bytes(bytes(orig["bytes"]), orig["fmt"]), 4, 4)
    assert (px == exp).all()
