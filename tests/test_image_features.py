"""Image quality features: independent-twin parity on the curation
fixture, grayscale/color semantics, corrupt-payload row contract,
known-value sanity on constructed images."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.functions.image import png_encode
from modlyn_spark.functions.image_features import (
    image_quality_features,
    pixel_features,
)
from modlyn_spark.oracle.pandas_oracle import oracle_image_features

FIX = "tests/fixtures/images_curation_input.parquet"


def test_twin_parity_on_fixture_corpus(spark):
    got = (
        image_quality_features(spark.read.parquet(FIX))
        .toPandas()
        .sort_values(["image_id", "version"])
        .reset_index(drop=True)
    )
    exp = pd.read_parquet("tests/fixtures/image_features_expected.parquet")
    exp = exp.sort_values(["image_id", "version"]).reset_index(drop=True)
    assert (got["decode_ok"] == exp["decode_ok"]).all()
    assert got["decode_ok"].sum() >= 250
    for k in ["brightness", "contrast", "blur_var", "grad_energy",
              "entropy_bits", "colorfulness"]:
        np.testing.assert_allclose(
            got[k].to_numpy(float), exp[k].to_numpy(float),
            rtol=1e-6, atol=6e-5, err_msg=k,  # fixture rounded to 4
        )


def test_known_values_constant_and_checker():
    const = np.full((8, 8), 77, dtype=np.uint8)
    f = pixel_features(const)
    assert f["brightness"] == 77.0
    assert f["contrast"] == 0.0
    assert f["blur_var"] == 0.0
    assert f["grad_energy"] == 0.0
    assert f["entropy_bits"] == 0.0
    assert f["colorfulness"] == 0.0

    checker = np.zeros((8, 8), dtype=np.uint8)
    checker[::2, 1::2] = 255
    checker[1::2, ::2] = 255
    g = pixel_features(checker)
    assert g["entropy_bits"] == pytest.approx(1.0)  # two equal-mass levels
    assert g["grad_energy"] == pytest.approx(2 * 255.0)  # every pair flips
    assert g["blur_var"] > g["grad_energy"]  # laplacian slams on checker
    # the independent twin agrees on both
    for img in (const, checker):
        a, b = pixel_features(img), oracle_image_features(img)
        for k, v in a.items():
            assert v == pytest.approx(b[k]), k


def test_color_vs_gray_colorfulness():
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, :4, 0] = 255  # half red, half black
    f = pixel_features(rgb)
    assert f["colorfulness"] > 100
    assert pixel_features(rgb[:, :, 0])["colorfulness"] == 0.0
    t = oracle_image_features(rgb)
    assert f["colorfulness"] == pytest.approx(t["colorfulness"])


def test_corrupt_payload_becomes_row(spark):
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pdf = pd.DataFrame(
        {
            "image_id": ["ok", "corrupt", "null"],
            "version": [0, 0, 0],
            "bytes": [png_encode(px), b"\x89PNGgarbage", None],
            "fmt": ["png", "png", "png"],
        }
    )
    out = (
        image_quality_features(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("image_id")
    )
    assert bool(out.loc["ok", "decode_ok"])
    assert not bool(out.loc["corrupt", "decode_ok"])
    assert not bool(out.loc["null", "decode_ok"])
    assert np.isnan(out.loc["corrupt", "brightness"])
    assert out.loc["ok", "brightness"] == pytest.approx(31.5)


# ---------------------------------------------------------------------------
# corpus per-channel normalization constants
# ---------------------------------------------------------------------------


def test_channel_stats_twin_parity(spark):
    from modlyn_spark.functions.image_features import channel_stats

    got = (
        channel_stats(spark.read.parquet(FIX))
        .toPandas()
        .sort_values("channel")
        .reset_index(drop=True)
    )
    exp = (
        pd.read_parquet("tests/fixtures/channel_stats_expected.parquet")
        .sort_values("channel")
        .reset_index(drop=True)
    )
    assert list(got["channel"]) == list(exp["channel"])
    assert list(got["n_pixels"]) == list(exp["n_pixels"])
    for c in ("mean", "std"):
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        m = ~(np.isnan(a) & np.isnan(b))
        assert np.allclose(a[m], b[m], atol=1e-6)


def test_channel_stats_partitioning_invariant(spark):
    from modlyn_spark.functions.image_features import channel_stats

    a = channel_stats(spark.read.parquet(FIX).repartition(2)).collect()
    b = channel_stats(spark.read.parquet(FIX).repartition(17)).collect()
    ka = {r["channel"]: (r["n_pixels"], r["mean"], r["std"]) for r in a}
    kb = {r["channel"]: (r["n_pixels"], r["mean"], r["std"]) for r in b}
    assert ka == kb  # round(6) absorbs partial-sum order


def test_channel_stats_grayscale_replicates(spark):
    from modlyn_spark.functions.image import png_encode
    from modlyn_spark.functions.image_features import channel_stats

    # one grayscale image: all three channels identical
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [("g", 0, bytearray(png_encode(px)), "png")],
        "image_id string, version long, bytes binary, fmt string",
    )
    got = {r["channel"]: r for r in channel_stats(df).collect()}
    assert got[0]["mean"] == got[1]["mean"] == got[2]["mean"]
    assert got[0]["n_pixels"] == 64
    assert got[-1]["n_pixels"] == 0


def test_channel_stats_corrupt_counter(spark):
    from modlyn_spark.functions.image_features import channel_stats

    df = spark.createDataFrame(
        [("bad", 0, bytearray(b"not a png"), "png"), ("null", 1, None, "png")],
        "image_id string, version long, bytes binary, fmt string",
    )
    got = {r["channel"]: r for r in channel_stats(df).collect()}
    assert got[-1]["n_pixels"] == 2
    assert got[-1]["mean"] is None
    assert got[0]["n_pixels"] == 0 and got[0]["mean"] is None
