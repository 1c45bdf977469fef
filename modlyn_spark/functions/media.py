"""Multimodal binary columns beyond images: audio and video.

Contract (task mandate): image/audio/video travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / frame-sample run
as Arrow-batched pandas UDFs, and binary payloads never cross a shuffle —
only extracted scalar features do.

What is REAL here vs stubbed (no media libraries ship in this container):

- AUDIO: PCM WAV decode is implemented for real — RIFF/fmt/data chunk
  parsing plus numpy frombuffer needs no codec library — and the feature
  extractor (duration, RMS, peak, zero-crossing rate) is therefore a real
  audio pipeline for the dominant uncompressed interchange format.
  Compressed codecs (mp3/ogg/flac) raise NotImplementedError with the
  library to install.
- VIDEO: a deterministic uncompressed container ("rawvid": magic, w, h,
  n_frames header + concatenated RGB24 frames) is decoded for real, so
  frame sampling / per-frame statistics exercise the actual Spark-side
  plumbing (schema, batching, explode shape) end to end. Real codecs
  (h264/vp9/av1) raise NotImplementedError naming PyAV/ffmpeg.

The stub boundary is the per-format ``decode`` dispatch — swapping in a
real codec touches nothing else.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# -- audio: PCM WAV -------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal mono PCM16 WAV writer (test/fixture side)."""
    pcm = np.clip(samples, -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM16 WAV: returns (float64 samples in [-1, 1], rate).
    Pure struct/numpy — real decode, no codec library."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, bits, channels = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag} (non-PCM) not supported"
                )
        elif cid == b"data":
            if bits is None:
                raise ValueError(
                    "malformed WAV: data chunk before (or without) fmt chunk"
                )
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit PCM not supported")
            pcm = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
            samples = pcm[::channels] if channels and channels > 1 else pcm
        pos += 8 + size + (size & 1)
    if samples is None or rate is None:
        raise ValueError("WAV stream has no data/fmt chunk")
    return samples, int(rate)


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt == "wav":
        return wav_decode(bytes(data))
    raise NotImplementedError(
        f"audio codec {fmt!r} needs a decoder library (e.g. soundfile/"
        "pyav); wire it into decode_audio — the Spark-side pipeline is "
        "format-agnostic"
    )


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
    ]
)


def decode_audio_stats(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "audio_id",
) -> DataFrame:
    """Per-clip audio features (duration / RMS / peak / zero-crossing
    rate). Arrow-batched; bytes are reduced to scalars before any
    shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for _, r in pdf.iterrows():
                x, rate = decode_audio(r[bytes_col], r[fmt_col])
                zc = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1
                    else 0.0
                )
                recs.append(
                    {
                        "audio_id": r[id_col],
                        "sample_rate": rate,
                        "n_samples": len(x),
                        "duration_sec": len(x) / rate if rate else 0.0,
                        "rms": float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        "peak": float(np.abs(x).max()) if len(x) else 0.0,
                        "zero_crossing_rate": zc,
                    }
                )
            yield pd.DataFrame(recs)

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, schema=AUDIO_STATS_SCHEMA
    )


# -- video: rawvid container ----------------------------------------------------

_RAWVID_MAGIC = b"RVID"


def rawvid_encode(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 -> rawvid bytes (test/fixture side)."""
    n, h, w, _ = frames.shape
    return _RAWVID_MAGIC + struct.pack("<III", w, h, n) + frames.tobytes()


def rawvid_decode(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:4] != _RAWVID_MAGIC:
        raise ValueError("not a rawvid stream")
    w, h, n = struct.unpack("<III", data[4:16])
    return np.frombuffer(data[16:], dtype=np.uint8).reshape(n, h, w, 3)


def decode_video(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "rawvid":
        return rawvid_decode(data)
    raise NotImplementedError(
        f"video codec {fmt!r} needs a decoder (PyAV/ffmpeg); wire it into "
        "decode_video — frame sampling and the Spark plumbing are "
        "codec-agnostic"
    )


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("px_mean", DoubleType()),
        StructField("px_var", DoubleType()),
        StructField("frame_delta", DoubleType()),
    ]
)


def sample_frame_stats(
    df: DataFrame,
    n_samples: int = 4,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "video_id",
) -> DataFrame:
    """Deterministic frame sampling + per-frame statistics: ``n_samples``
    evenly spaced frames per clip, each emitting pixel mean/var and the
    mean absolute delta to the PREVIOUS sampled frame (the scene-change
    signal). One input row explodes to n_samples output rows inside the
    UDF — the batch shape a real frame-embedding extractor would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for _, r in pdf.iterrows():
                frames = decode_video(r[bytes_col], r[fmt_col])
                n = len(frames)
                idx = np.unique(
                    np.linspace(0, n - 1, num=min(n_samples, n)).astype(int)
                )
                prev = None
                for i in idx:
                    f = frames[i].astype(np.float64)
                    delta = (
                        float(np.abs(f - prev).mean()) if prev is not None else 0.0
                    )
                    recs.append(
                        {
                            "video_id": r[id_col],
                            "frame_idx": int(i),
                            "n_frames": n,
                            "px_mean": float(f.mean()),
                            "px_var": float(f.var()),
                            "frame_delta": delta,
                        }
                    )
                    prev = f
            yield pd.DataFrame(recs)

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, schema=FRAME_STATS_SCHEMA
    )
