"""Patch (tile) extraction — the ViT/masked-autoencoder front door.

Vision-transformer pipelines consume images as a grid of fixed-size
patches ("tokens"), not whole frames: 16x16 tiles for ViT, 8x8 for
perceptual codecs, arbitrary P for tile-based dedup or saliency
cropping. This operator decodes each payload INSIDE an Arrow map stage
(``functions.image.decode_bytes`` — same contract as the rest of the
image tier: bytes never cross a shuffle) and emits ONE ROW PER PATCH
with its grid coordinates plus either

- ``mode="features"`` — cheap per-patch luma statistics (mean, std,
  min, max): the tile-level quality/saliency signal (pick sharpest
  tile, drop letterbox borders, tile-level dedup keys), all float64
  and exactly reproducible, or
- ``mode="pixels"`` — the flattened patch luma plane as
  ``array<double>`` row-major: the embedding-ready token sequence
  (feed to a projection / PQ / ANN from the embeddings tier).

Grid semantics (ViT convention): the image is cropped to the largest
multiple of ``patch`` in each dimension (resize upstream if full
coverage matters — ``functions.image.resize_images``); patch (0, 0) is
the top-left tile, ``patch_row``/``patch_col`` index the grid. Luma is
the EXACT integer plane ``(299R + 587G + 114B) div 1000`` shared with
``functions.image_features`` (bit-identical across implementations;
float luma sits 1 ulp from rounding boundaries on real images).
Grayscale inputs use the pixel value directly. Undecodable or
sub-patch-size payloads emit ZERO rows (count them upstream with
``image_quality_features``'s decode_ok when the failure rate is the
metric).

At 100 TB: a pure ``mapInPandas`` — zero shuffles; the fan-out is
``(H // P) * (W // P)`` rows per image, i.e. ``pixels / P^2``, so the
output stays a fixed fraction of the decoded volume regardless of how
many images there are. Only scalar features (or P^2-double token
arrays) leave the stage. Pair with ``session.ensure_parallelism`` for
single-row-group sources.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modlyn_spark.functions.image import decode_bytes

_FEATURES = ["p_mean", "p_std", "p_min", "p_max"]


def _luma_plane(px: np.ndarray) -> np.ndarray:
    """Exact integer luma (same arithmetic as functions.image_features)."""
    if px.ndim == 2:
        return px.astype(np.int64)
    p = px.astype(np.int64)
    return (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000


def _patch_grid(luma: np.ndarray, patch: int) -> np.ndarray | None:
    """(rows, cols, patch, patch) view of the cropped luma plane."""
    h, w = luma.shape
    gr, gc = h // patch, w // patch
    if gr == 0 or gc == 0:
        return None
    crop = luma[: gr * patch, : gc * patch]
    return crop.reshape(gr, patch, gc, patch).transpose(0, 2, 1, 3)


def extract_patches(
    images: DataFrame,
    *,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: list[str] | None = None,
    patch: int = 8,
    mode: str = "features",
) -> DataFrame:
    """One row per (image, grid cell): patch coordinates + luma stats
    (``mode="features"``) or the flattened patch plane as doubles
    (``mode="pixels"``). See module docstring for grid semantics."""
    if mode not in ("features", "pixels"):
        raise ValueError(f"mode must be 'features' or 'pixels', got {mode!r}")
    if patch < 1:
        raise ValueError(f"patch must be >= 1, got {patch}")
    ids = list(id_cols) if id_cols else ["image_id"]
    missing = [c for c in ids + [bytes_col, fmt_col] if c not in images.columns]
    if missing:
        raise ValueError(f"missing columns: {missing}")

    id_fields = [images.schema[c] for c in ids]
    base = [
        StructField("patch_row", LongType()),
        StructField("patch_col", LongType()),
    ]
    if mode == "features":
        out_schema = StructType(
            id_fields + base + [StructField(f, DoubleType()) for f in _FEATURES]
        )
    else:
        out_schema = StructType(
            id_fields + base + [StructField("token", ArrayType(DoubleType()))]
        )
    names = [f.name for f in out_schema.fields]
    feat = mode == "features"
    p = int(patch)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs: list[tuple] = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                raw, fmt = d[bytes_col], d[fmt_col]
                if raw is None or fmt is None:
                    continue
                try:
                    px = decode_bytes(bytes(raw), str(fmt))
                except Exception:  # noqa: BLE001 — corrupt payload -> 0 rows
                    continue
                grid = _patch_grid(_luma_plane(px), p)
                if grid is None:
                    continue
                gr, gc = grid.shape[:2]
                idv = tuple(d[c] for c in ids)
                flat = grid.reshape(gr, gc, p * p).astype(np.float64)
                if feat:
                    mean = flat.mean(axis=2)
                    std = flat.std(axis=2)
                    lo = flat.min(axis=2)
                    hi = flat.max(axis=2)
                    for r in range(gr):
                        for c in range(gc):
                            recs.append(
                                idv
                                + (r, c, float(mean[r, c]), float(std[r, c]),
                                   float(lo[r, c]), float(hi[r, c]))
                            )
                else:
                    for r in range(gr):
                        for c in range(gc):
                            recs.append(idv + (r, c, flat[r, c].tolist()))
            yield pd.DataFrame(recs, columns=names)

    return images.select(*ids, bytes_col, fmt_col).mapInPandas(
        run, schema=out_schema
    )


def tile_fingerprints(
    images: DataFrame,
    *,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: list[str] | None = None,
    patch: int = 8,
) -> DataFrame:
    """One row per tile with an md5 fingerprint of its EXACT luma bytes —
    the join key for recurring-tile detection (see ``recurring_tiles``).

    The fingerprint is ``md5`` over the tile's integer luma values
    serialized as ``P*P`` big-endian uint16 (luma of a uint8 image is
    bounded by 255, uint16 keeps the contract if deeper sources appear)
    in row-major order: a pure function of pixel content, so the same
    tile content hashes identically on any engine or partitioning —
    the image analog of the corpus line fingerprint
    (``operators.dedup.corpus_line_dedup``).
    """
    if patch < 1:
        raise ValueError(f"patch must be >= 1, got {patch}")
    ids = list(id_cols) if id_cols else ["image_id"]
    missing = [c for c in ids + [bytes_col, fmt_col] if c not in images.columns]
    if missing:
        raise ValueError(f"missing columns: {missing}")
    import hashlib

    id_fields = [images.schema[c] for c in ids]
    out_schema = StructType(
        id_fields
        + [
            StructField("patch_row", LongType()),
            StructField("patch_col", LongType()),
            StructField("tile_fp", StringType()),
        ]
    )
    names = [f.name for f in out_schema.fields]
    p = int(patch)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs: list[tuple] = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                raw, fmt = d[bytes_col], d[fmt_col]
                if raw is None or fmt is None:
                    continue
                try:
                    px = decode_bytes(bytes(raw), str(fmt))
                except Exception:  # noqa: BLE001
                    continue
                grid = _patch_grid(_luma_plane(px), p)
                if grid is None:
                    continue
                gr, gc = grid.shape[:2]
                idv = tuple(d[c] for c in ids)
                for r in range(gr):
                    for c in range(gc):
                        blob = (
                            grid[r, c].astype(">u2").tobytes()
                        )
                        recs.append(
                            idv + (r, c, hashlib.md5(blob).hexdigest())
                        )
            yield pd.DataFrame(recs, columns=names)

    return images.select(*ids, bytes_col, fmt_col).mapInPandas(
        run, schema=out_schema
    )


def recurring_tiles(
    tiles: DataFrame,
    *,
    id_cols: list[str] | None = None,
    min_images: int = 3,
    position_sensitive: bool = False,
) -> DataFrame:
    """Tiles whose exact content recurs across >= ``min_images`` distinct
    images — watermarks, letterbox bars, UI chrome, template borders:
    the boilerplate that image curation strips the way C4 strips
    recurring lines from text corpora.

    Input is a ``tile_fingerprints`` frame. Counts are DISTINCT images
    per fingerprint (a flat region repeating inside ONE image is
    composition, not boilerplate). ``position_sensitive=True`` keys on
    (fingerprint, patch_row, patch_col) — anchored chrome like a
    bottom-right watermark — while the default catches the content
    anywhere in the grid.

    One map-side-combinable groupBy; output is fingerprint-vocabulary
    sized. Downstream: broadcast-semi join back onto the tile stream to
    mask or excise the recurring regions.
    """
    if min_images < 2:
        raise ValueError("min_images must be >= 2")
    ids = list(id_cols) if id_cols else ["image_id"]
    keys = ["tile_fp"] + (
        ["patch_row", "patch_col"] if position_sensitive else []
    )
    img = F.concat_ws("\x00", *[F.col(c).cast("string") for c in ids])
    return (
        tiles.groupBy(*keys)
        .agg(
            F.countDistinct(img).alias("n_images"),
            F.count("*").alias("n_tiles"),
        )
        .where(F.col("n_images") >= min_images)
    )
