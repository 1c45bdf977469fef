"""Tile fingerprints and recurring-tile detection: hashlib twin parity,
planted-watermark recall on constructed images, distinct-image counting
semantics (in-image repetition is not boilerplate), position-sensitive
mode, and partition invariance."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.functions.image import png_encode
from modlyn_spark.functions.patches import recurring_tiles, tile_fingerprints


def _luma(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.int64)
    a = img.astype(np.int64)
    return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000


def _twin_fp(img: np.ndarray, patch: int):
    lum = _luma(img)
    h, w = lum.shape
    out = []
    for r in range(h // patch):
        for c in range(w // patch):
            tile = lum[r * patch:(r + 1) * patch, c * patch:(c + 1) * patch]
            out.append(
                (r, c, hashlib.md5(tile.astype(">u2").tobytes()).hexdigest())
            )
    return out


def _corpus():
    """10 distinct random images, each with the same 8x8 'watermark'
    stamped into the bottom-right tile; one image also repeats a flat
    tile INSIDE itself (must not count as recurring across images)."""
    rng = np.random.RandomState(0)
    mark = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    imgs = {}
    for i in range(10):
        img = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
        img[16:24, 16:24] = mark
        if i == 0:
            img[0:8, 0:8] = 7
            img[8:16, 0:8] = 7
        imgs[f"im{i}"] = img
    return imgs, mark


def _df(spark, imgs):
    return spark.createDataFrame(
        pd.DataFrame(
            [
                {"image_id": k, "bytes": png_encode(v), "fmt": "png"}
                for k, v in imgs.items()
            ]
        )
    )


def test_fingerprint_twin_parity(spark):
    imgs, _ = _corpus()
    got = (
        tile_fingerprints(_df(spark, imgs), patch=8)
        .toPandas()
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for k, v in imgs.items():
        for r, c, fp in _twin_fp(v, 8):
            exp_rows.append(
                {"image_id": k, "patch_row": r, "patch_col": c, "tile_fp": fp}
            )
    exp = (
        pd.DataFrame(exp_rows)
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_recurring_watermark_found(spark):
    imgs, mark = _corpus()
    tiles = tile_fingerprints(_df(spark, imgs), patch=8)
    rec = recurring_tiles(tiles, min_images=3).toPandas()
    mark_fp = hashlib.md5(
        _luma(mark).astype(">u2").tobytes()
    ).hexdigest()
    assert set(rec["tile_fp"]) == {mark_fp}
    assert rec["n_images"].iloc[0] == 10
    assert rec["n_tiles"].iloc[0] == 10


def test_in_image_repetition_not_recurring(spark):
    imgs, _ = _corpus()
    tiles = tile_fingerprints(_df(spark, imgs), patch=8)
    rec = recurring_tiles(tiles, min_images=2).toPandas()
    flat_fp = hashlib.md5(
        (np.full((8, 8), 7, dtype=np.int64)).astype(">u2").tobytes()
    ).hexdigest()
    # the flat tile appears twice in im0 only: n_images = 1 < 2
    assert flat_fp not in set(rec["tile_fp"])


def test_position_sensitive_mode(spark):
    imgs, mark = _corpus()
    # move the mark to a different grid cell in half the images
    moved = {}
    for i, (k, v) in enumerate(imgs.items()):
        img = v.copy()
        if i % 2 == 0:
            img[16:24, 16:24] = 255 - img[16:24, 16:24]
            img[0:8, 16:24] = mark
        moved[k] = img
    tiles = tile_fingerprints(_df(spark, moved), patch=8)
    anywhere = recurring_tiles(tiles, min_images=6).toPandas()
    anchored = recurring_tiles(
        tiles, min_images=6, position_sensitive=True
    ).toPandas()
    assert len(anywhere) == 1  # mark recurs in all 10, position-free
    assert len(anchored) == 0  # but never >= 6 times at ONE position


def test_partition_invariance(spark):
    imgs, _ = _corpus()
    a = (
        tile_fingerprints(_df(spark, imgs).repartition(1), patch=8)
        .toPandas()
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    b = (
        tile_fingerprints(_df(spark, imgs).repartition(5), patch=8)
        .toPandas()
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_validation(spark):
    imgs, _ = _corpus()
    df = _df(spark, imgs)
    with pytest.raises(ValueError, match="patch"):
        tile_fingerprints(df, patch=0)
    with pytest.raises(ValueError, match="min_images"):
        recurring_tiles(tile_fingerprints(df), min_images=1)
