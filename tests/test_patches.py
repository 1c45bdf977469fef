"""Patch extraction: independent-twin parity (loops + two-pass moments
vs the engine's reshape grid), grid/crop semantics, pixels-mode token
layout, zero-row contract for corrupt/undersized payloads, partition
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.functions.image import png_encode
from modlyn_spark.functions.patches import extract_patches
from modlyn_spark.oracle.pandas_oracle import oracle_patch_features

FIX = "tests/fixtures/images_curation_input.parquet"


def _rng_img(seed: int, h: int, w: int, gray: bool = False) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


def _df(spark, imgs: dict[str, np.ndarray], extra_rows=()):
    rows = [
        {"image_id": k, "bytes": png_encode(v), "fmt": "png"}
        for k, v in imgs.items()
    ]
    rows += list(extra_rows)
    return spark.createDataFrame(pd.DataFrame(rows))


def test_twin_parity_mixed_sizes(spark):
    imgs = {
        "rgb_17x23": _rng_img(1, 17, 23),
        "gray_16x16": _rng_img(2, 16, 16, gray=True),
        "rgb_exact_8": _rng_img(3, 8, 8),
        "tall_33x9": _rng_img(4, 33, 9),
    }
    got = (
        extract_patches(_df(spark, imgs), patch=8)
        .toPandas()
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for k, v in imgs.items():
        for rec in oracle_patch_features(v, 8):
            exp_rows.append({"image_id": k, **rec})
    exp = (
        pd.DataFrame(exp_rows)
        .sort_values(["image_id", "patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["image_id"] == exp["image_id"]).all()
    for c in ["patch_row", "patch_col"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["p_mean", "p_std", "p_min", "p_max"]:
        np.testing.assert_allclose(
            got[c].to_numpy(float), exp[c].to_numpy(float),
            rtol=1e-12, atol=1e-9, err_msg=c,
        )


def test_grid_crop_semantics(spark):
    # 17x23 at patch=8 -> 2x2 grid (crop to 16x16); verify counts + the
    # exact tile content of patch (1, 2) is NOT emitted (col 2 needs 24)
    img = _rng_img(7, 17, 23)
    out = extract_patches(_df(spark, {"a": img}), patch=8).toPandas()
    assert len(out) == 4
    assert set(zip(out["patch_row"], out["patch_col"])) == {
        (0, 0), (0, 1), (1, 0), (1, 1)
    }


def test_pixels_mode_token_layout(spark):
    img = _rng_img(11, 16, 8)
    out = (
        extract_patches(_df(spark, {"a": img}), patch=8, mode="pixels")
        .toPandas()
        .sort_values(["patch_row", "patch_col"])
        .reset_index(drop=True)
    )
    assert len(out) == 2
    luma = (
        299 * img[..., 0].astype(np.int64)
        + 587 * img[..., 1].astype(np.int64)
        + 114 * img[..., 2].astype(np.int64)
    ) // 1000
    for r in range(2):
        tok = np.asarray(out.loc[r, "token"], dtype=np.float64)
        expect = luma[r * 8 : (r + 1) * 8, :8].astype(np.float64).ravel()
        np.testing.assert_array_equal(tok, expect)


def test_zero_row_contract(spark):
    # undersized, corrupt, NULL-bytes and NULL-fmt payloads emit nothing;
    # the valid image still comes through
    df = _df(
        spark,
        {"ok": _rng_img(5, 8, 8), "small": _rng_img(6, 7, 7)},
        extra_rows=[
            {"image_id": "corrupt", "bytes": b"\x89PNGnope", "fmt": "png"},
            {"image_id": "nullb", "bytes": None, "fmt": "png"},
            {"image_id": "nullf", "bytes": b"x", "fmt": None},
        ],
    )
    out = extract_patches(df, patch=8).toPandas()
    assert set(out["image_id"]) == {"ok"}
    assert len(out) == 1


def test_partition_invariance_on_fixture(spark):
    src = (
        spark.read.parquet(FIX)
        .where("bytes is not null")
        .orderBy("image_id", "version")
        .limit(40)
        .cache()
    )
    src.count()
    a = extract_patches(
        src.repartition(1), id_cols=["image_id", "version"], patch=16
    ).toPandas()
    b = extract_patches(
        src.repartition(7), id_cols=["image_id", "version"], patch=16
    ).toPandas()
    key = ["image_id", "version", "patch_row", "patch_col"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_patch1_identity(spark):
    img = _rng_img(9, 2, 3, gray=True)
    out = extract_patches(_df(spark, {"a": img}), patch=1).toPandas()
    assert len(out) == 6
    out = out.sort_values(["patch_row", "patch_col"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        out["p_mean"].to_numpy(float), img.astype(np.float64).ravel()
    )
    assert (out["p_std"].to_numpy(float) == 0.0).all()


def test_validation(spark):
    df = _df(spark, {"a": _rng_img(1, 8, 8)})
    with pytest.raises(ValueError, match="mode"):
        extract_patches(df, mode="wat")
    with pytest.raises(ValueError, match="patch"):
        extract_patches(df, patch=0)
    with pytest.raises(ValueError, match="missing"):
        extract_patches(df.drop("fmt"))
