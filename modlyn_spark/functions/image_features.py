"""Pixel-level image quality features — the vision-data counterpart of
the text quality scorer (``functions.text.quality_score``).

Large-scale image curation (LAION-style) gates on cheap per-image
statistics before any model sees a pixel: blur, flatness, exposure,
information content, colorfulness. This module computes them
distributed, one Arrow batch at a time, with the same contract as the
rest of the image tier (``functions.image``): binary payloads are
decoded INSIDE the map stage and never cross a shuffle — only the
scalar features do.

Features (all float64, computed on the luma plane ``0.299R + 0.587G +
0.114B`` unless noted):

- ``brightness`` — mean luma (exposure);
- ``contrast``  — population std of luma;
- ``blur_var``  — variance of the 4-neighbour Laplacian
  ``4·c − up − down − left − right`` over the interior (the classic
  variance-of-Laplacian focus measure; low = blurry). NULL for images
  smaller than 3×3;
- ``grad_energy`` — mean |∂x| + mean |∂y| of luma (edge density);
- ``entropy_bits`` — Shannon entropy of the 256-bin luma histogram.
  Bins use EXACT integer luma ``(299·R + 587·G + 114·B) div 1000`` so
  the binning is bit-identical in every implementation (float luma sits
  1 ulp from a rounding boundary on real images). 0 for a constant
  image, ≤ 8;
- ``colorfulness`` — Hasler–Süsstrunk metric
  ``sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(μ²_rg + μ²_yb)`` with
  ``rg = R − G``, ``yb = (R+G)/2 − B``; exactly 0.0 for grayscale;
- ``decode_ok`` — False (with NULL features) when the payload fails to
  decode, so corrupt blobs surface as rows, not job failures.

At 100 TB: a pure ``mapInPandas`` over the image table — zero
shuffles, scales embarrassingly; pair with
``session.ensure_parallelism`` for single-row-group sources.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modlyn_spark.functions.image import decode_bytes

_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("version", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("brightness", DoubleType()),
        StructField("contrast", DoubleType()),
        StructField("blur_var", DoubleType()),
        StructField("grad_energy", DoubleType()),
        StructField("entropy_bits", DoubleType()),
        StructField("colorfulness", DoubleType()),
    ]
)

_FEATURES = [
    "brightness", "contrast", "blur_var", "grad_energy",
    "entropy_bits", "colorfulness",
]


def pixel_features(px: np.ndarray) -> dict:
    """Feature dict for one decoded uint8 image ((h, w) or (h, w, 3))."""
    rgb = px.ndim == 3
    pxf = px.astype(np.float64)
    if rgb:
        luma = (
            0.299 * pxf[:, :, 0] + 0.587 * pxf[:, :, 1] + 0.114 * pxf[:, :, 2]
        )
    else:
        luma = pxf
    h, w = luma.shape
    out = {
        "brightness": float(luma.mean()),
        "contrast": float(luma.std()),
    }
    if h >= 3 and w >= 3:
        lap = (
            4.0 * luma[1:-1, 1:-1]
            - luma[:-2, 1:-1]
            - luma[2:, 1:-1]
            - luma[1:-1, :-2]
            - luma[1:-1, 2:]
        )
        out["blur_var"] = float(lap.var())
    else:
        out["blur_var"] = None
    gx = np.abs(np.diff(luma, axis=1)).mean() if w >= 2 else 0.0
    gy = np.abs(np.diff(luma, axis=0)).mean() if h >= 2 else 0.0
    out["grad_energy"] = float(gx + gy)
    if rgb:
        px64 = px.astype(np.int64)
        ibin = (
            299 * px64[:, :, 0] + 587 * px64[:, :, 1] + 114 * px64[:, :, 2]
        ) // 1000
    else:
        ibin = px.astype(np.int64)
    hist = np.bincount(ibin.ravel(), minlength=256)
    p = hist[hist > 0] / luma.size
    out["entropy_bits"] = float(-(p * np.log2(p)).sum())
    if rgb:
        rg = pxf[:, :, 0] - pxf[:, :, 1]
        yb = 0.5 * (pxf[:, :, 0] + pxf[:, :, 1]) - pxf[:, :, 2]
        out["colorfulness"] = float(
            np.sqrt(rg.var() + yb.var())
            + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
        )
    else:
        out["colorfulness"] = 0.0
    return out


def image_quality_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_col: str = "image_id",
    version_col: str = "version",
) -> DataFrame:
    """Decode each image and emit the quality-feature row (see module
    docstring). Rows whose payload is NULL or fails to decode come back
    with ``decode_ok = False`` and NULL features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for _, r in pdf.iterrows():
                rec = {
                    "image_id": r[id_col],
                    "version": int(r[version_col]),
                    "decode_ok": False,
                    **{k: None for k in _FEATURES},
                }
                try:
                    if r[bytes_col] is not None:
                        px = decode_bytes(bytes(r[bytes_col]), r[fmt_col])
                        rec.update(pixel_features(px))
                        rec["decode_ok"] = True
                except Exception:  # noqa: BLE001 — corrupt blob -> row
                    pass
                recs.append(rec)
            yield pd.DataFrame(recs)

    return df.select(id_col, version_col, bytes_col, fmt_col).mapInPandas(
        run, schema=_SCHEMA
    )


_CH_SCHEMA = StructType(
    [
        StructField("channel", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("ss", DoubleType()),
    ]
)


def channel_stat_partials(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Per-Arrow-batch per-channel moment partials ``(channel, n, s,
    ss)`` over decoded pixel values in [0, 255]: the map stage emits at
    most 4 rows PER BATCH (channels 0/1/2 + the decode-failure counter
    at channel -1), so the downstream aggregate is batch-count-sized.

    Grayscale images contribute their plane to ALL THREE channels (the
    loader convention: gray replicates to RGB), so the corpus constants
    are what the training reader will actually see. Pixels never leave
    the map stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = np.zeros(3, dtype=np.int64)
            s = np.zeros(3, dtype=np.float64)
            ss = np.zeros(3, dtype=np.float64)
            failed = 0
            for _, r in pdf.iterrows():
                try:
                    if r[bytes_col] is None:
                        raise ValueError("null payload")
                    px = decode_bytes(bytes(r[bytes_col]), r[fmt_col])
                except Exception:  # noqa: BLE001 — corrupt blob counts
                    failed += 1
                    continue
                a = np.asarray(px, dtype=np.float64)
                if a.ndim == 2:
                    a = a[:, :, None].repeat(3, axis=2)
                for c in range(3):
                    plane = a[:, :, c]
                    n[c] += plane.size
                    s[c] += plane.sum()
                    ss[c] += (plane * plane).sum()
            recs = [
                {"channel": c, "n": int(n[c]), "s": float(s[c]),
                 "ss": float(ss[c])}
                for c in range(3)
            ]
            recs.append(
                {"channel": -1, "n": failed, "s": 0.0, "ss": 0.0}
            )
            yield pd.DataFrame(recs)

    cols = [c for c in {bytes_col, fmt_col} if c in df.columns]
    return df.select(*cols).mapInPandas(run, schema=_CH_SCHEMA)


def channel_stats(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    *,
    ndigits: int = 6,
) -> DataFrame:
    """Corpus per-channel normalization constants ``(channel, n_pixels,
    mean, std)`` — the dataset-mean/std pair a training pipeline bakes
    into its input transform (the ImageNet-constants analog), plus the
    channel = -1 row counting undecodable payloads (NULL mean/std).

    ONE aggregate over the batch-sized partials; std is the population
    ``sqrt(E[x^2] - E[x]^2)`` on the combined sums, rounded to
    ``ndigits`` (the only float freedom is partial-sum order)."""
    from pyspark.sql import functions as F

    agg = channel_stat_partials(df, bytes_col, fmt_col).groupBy(
        "channel"
    ).agg(
        F.sum("n").alias("n_pixels"),
        F.sum("s").alias("__s"),
        F.sum("ss").alias("__ss"),
    )
    ok = (F.col("channel") >= 0) & (F.col("n_pixels") > 0)
    mean = F.col("__s") / F.col("n_pixels")
    var = F.greatest(
        F.lit(0.0), F.col("__ss") / F.col("n_pixels") - mean * mean
    )
    return agg.select(
        "channel",
        "n_pixels",
        F.when(ok, F.round(mean, ndigits)).alias("mean"),
        F.when(ok, F.round(F.sqrt(var), ndigits)).alias("std"),
    )
