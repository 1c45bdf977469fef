"""Quantile normalization: Bolstad twin parity on the equal-size matrix
case (the published algorithm), tie averaging, identical post-norm
distributions across groups, unequal-size interpolation sanity, NULL
passthrough, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.quantile_norm import quantile_normalize


def _bolstad(mat: np.ndarray) -> np.ndarray:
    """Reference implementation for equal-size groups (columns =
    samples): sort each column, average across columns per rank, map
    back through each column's sort order (no ties in this fixture)."""
    idx = np.argsort(mat, axis=0)
    sorted_ = np.sort(mat, axis=0)
    ref = sorted_.mean(axis=1)
    out = np.empty_like(mat, dtype=np.float64)
    for j in range(mat.shape[1]):
        out[idx[:, j], j] = ref
    return out


def test_bolstad_twin_equal_sizes(spark):
    rng = np.random.RandomState(11)
    mat = rng.normal(size=(40, 5)) * np.array([1, 2, 5, 0.5, 3]) + np.array(
        [0, 10, -5, 2, 100]
    )
    rows = [
        {"g": f"s{j}", "i": i, "v": float(mat[i, j])}
        for i in range(40)
        for j in range(5)
    ]
    got = (
        quantile_normalize(
            spark.createDataFrame(pd.DataFrame(rows)), "g", "v"
        )
        .toPandas()
    )
    exp = _bolstad(mat)
    for j in range(5):
        sub = got[got["g"] == f"s{j}"].set_index("i").sort_index()
        np.testing.assert_allclose(
            sub["qnorm"].to_numpy(float), exp[:, j], rtol=1e-12
        )


def test_distributions_identical_after_norm(spark):
    rng = np.random.RandomState(12)
    rows = []
    for j, scale in enumerate([1.0, 10.0, 0.1]):
        for i in range(30):
            rows.append({"g": f"s{j}", "i": i, "v": float(rng.exponential(scale))})
    got = quantile_normalize(
        spark.createDataFrame(pd.DataFrame(rows)), "g", "v"
    ).toPandas()
    sets = [
        np.sort(got[got["g"] == f"s{j}"]["qnorm"].to_numpy(float))
        for j in range(3)
    ]
    np.testing.assert_allclose(sets[0], sets[1], rtol=1e-12)
    np.testing.assert_allclose(sets[0], sets[2], rtol=1e-12)


def test_tie_averaging(spark):
    rows = [
        {"g": "a", "i": 0, "v": 1.0},
        {"g": "a", "i": 1, "v": 1.0},
        {"g": "a", "i": 2, "v": 9.0},
        {"g": "b", "i": 0, "v": 2.0},
        {"g": "b", "i": 1, "v": 4.0},
        {"g": "b", "i": 2, "v": 8.0},
    ]
    got = quantile_normalize(
        spark.createDataFrame(pd.DataFrame(rows)), "g", "v"
    ).toPandas()
    # ref = mean per rank: [(1+2)/2, (1+4)/2, (9+8)/2] = [1.5, 2.5, 8.5]
    a = got[got["g"] == "a"].sort_values("i")["qnorm"].to_numpy(float)
    np.testing.assert_allclose(a[:2], [2.0, 2.0], rtol=1e-12)  # (1.5+2.5)/2
    np.testing.assert_allclose(a[2], 8.5, rtol=1e-12)
    b = got[got["g"] == "b"].sort_values("i")["qnorm"].to_numpy(float)
    np.testing.assert_allclose(b, [1.5, 2.5, 8.5], rtol=1e-12)


def test_unequal_sizes_monotone_and_bounded(spark):
    rng = np.random.RandomState(13)
    rows = [
        {"g": "big", "i": i, "v": float(rng.uniform(0, 100))}
        for i in range(50)
    ] + [
        {"g": "small", "i": i, "v": float(rng.uniform(50, 60))}
        for i in range(7)
    ]
    got = quantile_normalize(
        spark.createDataFrame(pd.DataFrame(rows)), "g", "v"
    ).toPandas()
    for g in ("big", "small"):
        sub = got[got["g"] == g].sort_values("v")
        q = sub["qnorm"].to_numpy(float)
        assert (np.diff(q) >= -1e-12).all(), g  # monotone in value
    # both ends of each group map near the reference ends
    lo = got.groupby("g")["qnorm"].min()
    hi = got.groupby("g")["qnorm"].max()
    np.testing.assert_allclose(lo["big"], lo["small"], rtol=0.2)
    np.testing.assert_allclose(hi["big"], hi["small"], rtol=0.2)


def test_null_passthrough_and_row_count(spark):
    rows = [
        {"g": "a", "i": 0, "v": 1.0},
        {"g": "a", "i": 1, "v": None},
        {"g": "b", "i": 0, "v": 2.0},
        {"g": "b", "i": 1, "v": 3.0},
    ]
    got = quantile_normalize(
        spark.createDataFrame(pd.DataFrame(rows)), "g", "v"
    ).toPandas()
    assert len(got) == 4
    assert got[got["v"].isna()]["qnorm"].isna().all()
    assert got[got["v"].notna()]["qnorm"].notna().all()


def test_partition_invariance(spark):
    rng = np.random.RandomState(14)
    rows = [
        {"g": f"s{j}", "i": i, "v": float(rng.normal())}
        for i in range(25)
        for j in range(4)
    ]
    pdf = pd.DataFrame(rows)
    outs = []
    for p in (1, 9):
        outs.append(
            quantile_normalize(
                spark.createDataFrame(pdf).repartition(p), "g", "v"
            )
            .toPandas()
            .sort_values(["g", "i"])
            .reset_index(drop=True)
        )
    np.testing.assert_allclose(
        outs[0]["qnorm"].to_numpy(float),
        outs[1]["qnorm"].to_numpy(float),
        rtol=1e-12,
    )
