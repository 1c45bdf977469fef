"""Mutual information: crosstab-twin parity, predictive/independent
feature properties, constant feature -> 0, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.selection import mutual_information


def _twin_mi(x: np.ndarray, y: np.ndarray, bins: int) -> float:
    mn, mx = x.min(), x.max()
    w = (mx - mn) / bins if mx > mn else 1.0
    b = np.clip(np.floor((x - mn) / w).astype(int), 0, bins - 1)
    ct = pd.crosstab(b, y).to_numpy().astype(float)
    n = ct.sum()
    pj = ct / n
    pb = pj.sum(axis=1, keepdims=True)
    pl = pj.sum(axis=0, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(pj > 0, pj * np.log(pj / (pb * pl)), 0.0)
    return float(t.sum())


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n = 2000
    y = rng.integers(0, 4, n)
    X = np.empty((n, 4))
    X[:, 0] = y * 10.0 + rng.normal(0, 0.1, n)   # highly predictive
    X[:, 1] = rng.normal(0, 1, n)                 # independent
    X[:, 2] = 3.5                                 # constant
    X[:, 3] = (y >= 2) * 1.0 + rng.normal(0, 0.2, n)  # partially predictive
    return X, y


def _df(spark, X, y):
    pdf = pd.DataFrame(
        {"vec": [r.tolist() for r in X], "label": [int(v) for v in y]}
    )
    return spark.createDataFrame(pdf)


def test_matches_crosstab_twin(spark, data):
    X, y = data
    got = (
        mutual_information(_df(spark, X, y), "vec", "label", bins=8)
        .toPandas()
        .sort_values("pos")
    )
    for pos in range(4):
        exp = _twin_mi(X[:, pos], y, 8)
        np.testing.assert_allclose(got["mi"].iloc[pos], exp, rtol=1e-10, atol=1e-12)


def test_ordering_and_bounds(spark, data):
    X, y = data
    got = (
        mutual_information(_df(spark, X, y), "vec", "label")
        .toPandas()
        .sort_values("pos")["mi"]
        .to_numpy()
    )
    h_label = -sum(
        p * np.log(p) for p in pd.Series(y).value_counts(normalize=True)
    )
    assert got[0] > got[3] > got[1]          # predictive > partial > noise
    assert got[2] == 0.0                      # constant feature
    assert got[1] < 0.02                      # independence ≈ 0 (bias bound)
    assert got[0] <= h_label + 1e-9           # MI <= H(label)


def test_partition_invariance(spark, data):
    X, y = data
    a = mutual_information(
        _df(spark, X, y).coalesce(1), "vec", "label"
    ).toPandas().sort_values("pos")["mi"].to_numpy()
    b = mutual_information(
        _df(spark, X, y).repartition(9), "vec", "label"
    ).toPandas().sort_values("pos")["mi"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_null_rows_excluded_and_validation(spark, data):
    X, y = data
    pdf = pd.DataFrame(
        {"vec": [r.tolist() for r in X], "label": [int(v) for v in y]}
    )
    pdf.loc[:49, "vec"] = None
    pdf.loc[50:99, "label"] = None
    got = mutual_information(
        spark.createDataFrame(pdf), "vec", "label"
    ).toPandas()
    assert (got["n"] == len(pdf) - 100).all()
    with pytest.raises(ValueError, match="bins"):
        mutual_information(_df(spark, X, y), "vec", "label", bins=1)
