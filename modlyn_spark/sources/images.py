"""Deterministic synthetic image+caption table (the engine's primary input).

Schema is the authoritative input_hint shape (BASELINE.json):
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64`` plus ``ts:timestamp`` and ``version:bigint``
(one row per image-state event; an image's caption/phash update over time).

Everything is a pure function of (image_id, version) — no stored reference
data needed: any executor (or the test oracle) can recompute the expected
pixels/caption/phash for any row, which is what makes the decoded-pixel
allclose / PSNR / caption-equality invariants checkable row-by-row
(FIXTURES.md §1; mirrors the reference's seeded-synthetic test pattern,
reference: tests/test_dataset_type_alias.py:42-45).

Generation is distributed: ``spark.range(n_entities)`` fanned out with an
Arrow-batched UDF — at bench scale no driver-side materialization happens.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from modlyn_spark.functions.image import png_encode, qpng_encode
from modlyn_spark.functions.phash import average_hash

_BASE_EPOCH = np.datetime64("2024-01-01T00:00:00")
_SIZES = (8, 16, 32)


def _hsh(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def entity_id(i: int) -> str:
    return f"img_{i:08d}"


def entity_size(image_id: str) -> tuple[int, int]:
    h = _hsh(image_id + "|size")
    return _SIZES[h % 3], _SIZES[(h // 3) % 3]


def entity_fmt(image_id: str) -> str:
    # ~40% lossy rows exercise the PSNR path: qpng (quantized PNG) and
    # real baseline JPEG (functions/jpeg.py), ~20% each
    r = _hsh(image_id + "|fmt") % 5
    return "qpng" if r == 0 else ("jpeg" if r == 1 else "png")


def reference_pixels(image_id: str, version: int) -> np.ndarray:
    """Pure pixel function: gradient + version-phased checker, RGB uint8."""
    w, h = entity_size(image_id)
    seed = _hsh(f"{image_id}|px") % (1 << 32)
    amp = 40 + (seed % 60)
    cell = 2 + (seed % 3)
    y, x = np.mgrid[0:h, 0:w]
    grad = (x * 255 // max(w - 1, 1) + y * 255 // max(h - 1, 1)) // 2
    checker = (((x // cell) + (y // cell) + version) % 2) * amp
    base = np.clip(grad + checker, 0, 255)
    px = np.stack(
        [
            base,
            np.clip(base + (seed % 17), 0, 255),
            np.clip(255 - base, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    return px


def reference_caption(image_id: str, version: int) -> str:
    return f"caption {image_id} v{version}"


def encode_row(image_id: str, version: int) -> tuple[bytes, str]:
    px = reference_pixels(image_id, version)
    fmt = entity_fmt(image_id)
    if fmt == "qpng":
        data = qpng_encode(px)
    elif fmt == "jpeg":
        from modlyn_spark.functions.jpeg import jpeg_encode

        # q98 + 4:4:4: the checker+gradient reference pixels are
        # high-frequency; this clears the PSNR >= 40 dB invariant with
        # margin (measured worst ~43.8 dB over the generator corpus)
        data = jpeg_encode(px, quality=98, subsampling="444")
    else:
        data = png_encode(px)
    return data, fmt


def reference_phash(image_id: str, version: int) -> int:
    return average_hash(reference_pixels(image_id, version))


def _entity_timestamps(image_id: str, n_versions: int) -> np.ndarray:
    """Seeded inter-arrival gaps: bursts (1-5 s) and session breaks (>=1 h)."""
    rng = np.random.default_rng(_hsh(image_id + "|ts") % (1 << 32))
    gaps = rng.choice(
        [1, 2, 3, 5, 3600, 7200], size=n_versions, p=[0.3, 0.2, 0.2, 0.1, 0.1, 0.1]
    )
    start = int(rng.integers(0, 86400))
    offs = start + np.cumsum(gaps)
    return _BASE_EPOCH + offs.astype("timedelta64[s]")


IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("version", LongType(), False),
    ]
)


def _entity_records(i: int, hot_every: int, hot_factor: int) -> list[dict]:
    eid = entity_id(i)
    base_versions = 1 + _hsh(eid + "|nv") % 5
    n_versions = base_versions * (hot_factor if hot_every and i % hot_every == 0 else 1)
    ts = _entity_timestamps(eid, n_versions)
    w, h = entity_size(eid)
    recs = []
    # images are 2-periodic in version (checker phase) -> encode/hash only
    # the two distinct states and reuse (pure-function identical output)
    cache: dict[int, tuple[bytes, str, int]] = {}
    for v in range(n_versions):
        p = v % 2
        if p not in cache:
            data, fmt = encode_row(eid, p)
            cache[p] = (data, fmt, reference_phash(eid, p))
        data, fmt, ph = cache[p]
        recs.append(
            {
                "image_id": eid,
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": reference_caption(eid, v),
                "phash": ph,
                "ts": pd.Timestamp(ts[v]),
                "version": v,
            }
        )
    return recs


def _entity_rows(i: int, hot_every: int, hot_factor: int) -> pd.DataFrame:
    return pd.DataFrame(_entity_records(i, hot_every, hot_factor))


def generate_images_df(
    spark: SparkSession,
    n_entities: int,
    *,
    hot_every: int = 0,
    hot_factor: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed generation of the image-state table.

    ``hot_every=k`` makes every k-th entity "hot" with hot_factor x the
    versions — the skew fixture for salted as-of joins.
    """
    n_parts = num_partitions or max(
        4, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs: list[dict] = []
            for i in pdf["id"]:
                recs.extend(_entity_records(int(i), hot_every, hot_factor))
                if len(recs) >= 20_000:
                    yield pd.DataFrame(recs)
                    recs = []
            if recs:
                yield pd.DataFrame(recs)

    return (
        spark.range(0, n_entities, numPartitions=n_parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def generate_images_pandas(
    n_entities: int, *, hot_every: int = 0, hot_factor: int = 100
) -> pd.DataFrame:
    """Single-node twin of generate_images_df (oracle/test side)."""
    recs: list[dict] = []
    for i in range(n_entities):
        recs.extend(_entity_records(i, hot_every, hot_factor))
    return pd.DataFrame(recs)


def synth_feature_requests(
    images: pd.DataFrame, n_classes: int = 3, seed: int = 42
) -> pd.DataFrame:
    """Left side of the as-of join: (image_id, feature_ts, label) probes at,
    between, and before state timestamps; labels seeded categorical
    (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    rows = []
    for eid, g in images.groupby("image_id"):
        ts = g["ts"].sort_values().tolist()
        picks = rng.choice(len(ts), size=min(3, len(ts)), replace=False)
        for i in picks:
            rows.append((eid, ts[i] + pd.Timedelta(milliseconds=500)))
            rows.append((eid, ts[i]))
        rows.append((eid, ts[0] - pd.Timedelta(hours=1)))
    df = pd.DataFrame(rows, columns=["image_id", "feature_ts"]).drop_duplicates()
    df["label"] = rng.choice([f"class_{c}" for c in range(n_classes)], size=len(df))
    df = df.reset_index(drop=True)
    df["request_id"] = np.arange(len(df))
    return df
