"""Concentration report: independent mean-absolute-difference Gini twin,
closed-form extremes (uniform, single-dominant), tie invariance of the
rank formulation, negative-value raise, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.concentration import concentration_report


def _gini_mad(x: np.ndarray) -> float:
    """Independent formulation: G = sum|xi - xj| / (2 n^2 mean)."""
    n = len(x)
    if x.sum() == 0:
        return 0.0
    diff = np.abs(x[:, None] - x[None, :]).sum()
    return float(diff / (2.0 * n * n * x.mean()))


def _pdf():
    rng = np.random.RandomState(9)
    rows = []
    for g, shape in [("even", None), ("skew", 0.3), ("mid", 1.5)]:
        for i in range(50):
            v = 10.0 if shape is None else float(rng.pareto(shape) + 0.01)
            rows.append({"g": g, "v": v})
    rows += [{"g": "onehot", "v": 0.0}] * 19 + [{"g": "onehot", "v": 7.0}]
    rows += [{"g": "ties", "v": float(x)} for x in [1, 1, 1, 2, 2, 3]]
    rows.append({"g": "even", "v": None})
    return pd.DataFrame(rows)


def test_twin_parity(spark):
    pdf = _pdf()
    got = (
        concentration_report(spark.createDataFrame(pdf), "g", "v", top_k=5)
        .toPandas()
        .set_index("g")
    )
    for g, grp in pdf.dropna().groupby("g"):
        x = grp["v"].to_numpy(float)
        r = got.loc[g]
        assert r["n"] == len(x)
        np.testing.assert_allclose(r["total"], x.sum(), rtol=1e-12)
        np.testing.assert_allclose(r["gini"], _gini_mad(x), rtol=1e-9,
                                   atol=1e-12)
        if x.sum() > 0:
            np.testing.assert_allclose(r["top1_share"], x.max() / x.sum(),
                                       rtol=1e-12)
            topk = np.sort(x)[-5:].sum() if len(x) >= 5 else x.sum()
            np.testing.assert_allclose(r["topk_share"], topk / x.sum(),
                                       rtol=1e-12)
        if (x * x).sum() > 0:
            np.testing.assert_allclose(
                r["n_effective"], x.sum() ** 2 / (x * x).sum(), rtol=1e-12
            )


def test_closed_form_extremes(spark):
    got = (
        concentration_report(spark.createDataFrame(_pdf()), "g", "v")
        .toPandas()
        .set_index("g")
    )
    even = got.loc["even"]
    np.testing.assert_allclose(even["gini"], 0.0, atol=1e-12)
    np.testing.assert_allclose(even["n_effective"], 50.0, rtol=1e-12)
    np.testing.assert_allclose(even["top1_share"], 1.0 / 50, rtol=1e-12)
    one = got.loc["onehot"]
    # one of n=20 holds everything: G = 1 - 1/n
    np.testing.assert_allclose(one["gini"], 1 - 1 / 20, rtol=1e-12)
    np.testing.assert_allclose(one["n_effective"], 1.0, rtol=1e-12)
    np.testing.assert_allclose(one["top1_share"], 1.0, rtol=1e-12)


def test_partition_and_tie_invariance(spark):
    pdf = _pdf()
    outs = []
    for p in (1, 11):
        outs.append(
            concentration_report(
                spark.createDataFrame(pdf).repartition(p), "g", "v"
            )
            .toPandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
    a, b = outs
    for c in ["n", "total", "gini", "top1_share", "topk_share",
              "n_effective"]:
        np.testing.assert_allclose(
            a[c].to_numpy(float), b[c].to_numpy(float),
            rtol=1e-12, equal_nan=True, err_msg=c,
        )


def test_negative_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"g": "x", "v": 1.0}, {"g": "x", "v": -2.0}])
    )
    with pytest.raises(ValueError, match="negative"):
        concentration_report(df, "g", "v")
    with pytest.raises(ValueError, match="top_k"):
        concentration_report(df.where("v > 0"), "g", "v", top_k=0)
