"""ks_2sample: exact KS statistic vs scipy-free brute twins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.drift import ks_2sample


def _brute_ks(xa, xb):
    xs = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), xs, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), xs, side="right") / len(xb)
    return float(np.max(np.abs(fa - fb)))


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 400 + ["b"] * 300 + ["c"] * 50,
            "x": np.concatenate(
                [rng.normal(0, 1, 400), rng.normal(0.5, 1.2, 300),
                 rng.normal(9, 1, 50)]
            ),
            "y": np.concatenate(
                [rng.integers(0, 5, 400), rng.integers(0, 5, 300),
                 rng.integers(0, 5, 50)]
            ).astype("float64"),
        }
    )
    pdf.loc[3, "x"] = None
    return spark.createDataFrame(pdf), pdf


def test_matches_brute(df):
    sdf, pdf = df
    out = {
        r["feature"]: r
        for r in ks_2sample(sdf, ["x", "y"], "grp", "a", "b").collect()
    }
    for c in ("x", "y"):
        xa = pdf[(pdf.grp == "a") & pdf[c].notna()][c].values
        xb = pdf[(pdf.grp == "b") & pdf[c].notna()][c].values
        assert out[c]["d_stat"] == pytest.approx(_brute_ks(xa, xb), abs=1e-12)
        assert out[c]["n_a"] == len(xa) and out[c]["n_b"] == len(xb)


def test_identical_distribution_is_zero(spark):
    pdf = pd.DataFrame(
        {"grp": ["a"] * 50 + ["b"] * 50, "x": list(range(50)) * 2}
    ).astype({"x": "float64"})
    out = ks_2sample(spark.createDataFrame(pdf), "x", "grp", "a", "b")
    assert out.collect()[0]["d_stat"] == 0.0


def test_disjoint_supports_is_one(df):
    sdf, _ = df
    r = ks_2sample(sdf, "x", "grp", "a", "c").collect()[0]
    assert r["d_stat"] == pytest.approx(1.0)


def test_empty_side_yields_null(df):
    sdf, _ = df
    r = ks_2sample(sdf, "x", "grp", "a", "zzz").collect()[0]
    assert r["d_stat"] is None and r["n_b"] == 0


def test_missing_column_raises(df):
    sdf, _ = df
    with pytest.raises(ValueError, match="missing"):
        ks_2sample(sdf, "nope", "grp", "a", "b")
