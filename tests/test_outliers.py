"""Mahalanobis outlier scoring: numpy twin parity, the E[d²] = dim
trace identity, affine invariance, planted-outlier ranking, NULLs,
partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.outliers import mahalanobis_scores


def _twin(X, ridge=1e-9):
    X = np.asarray(X, dtype=np.float64)
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    P = np.linalg.inv(cov + ridge * np.eye(X.shape[1]))
    Z = X - mu
    return ((Z @ P) * Z).sum(axis=1)


def _frame(X):
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "v": [r.tolist() for r in np.asarray(X)],
        }
    )


def test_matches_twin_and_trace_identity(spark):
    rng = np.random.default_rng(31)
    # correlated features: the case axis-aligned z-scores get wrong
    A = rng.normal(size=(6, 6))
    X = rng.normal(size=(800, 6)) @ A
    got = (
        mahalanobis_scores(spark.createDataFrame(_frame(X)), "v")
        .orderBy("vec_id")
        .collect()
    )
    exp = _twin(X)
    np.testing.assert_allclose(
        [r["maha_sq"] for r in got], exp, rtol=1e-8
    )
    # E[d^2] = trace(P cov) = dim with population moments, ridge -> 0
    assert np.mean([r["maha_sq"] for r in got]) == pytest.approx(
        6.0, rel=1e-6
    )


def test_affine_invariance(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(500, 4))
    A = rng.normal(size=(4, 4)) + 4 * np.eye(4)  # well-conditioned
    b = rng.normal(size=4)
    s1 = [
        r["maha_sq"]
        for r in mahalanobis_scores(spark.createDataFrame(_frame(X)), "v")
        .orderBy("vec_id")
        .collect()
    ]
    s2 = [
        r["maha_sq"]
        for r in mahalanobis_scores(
            spark.createDataFrame(_frame(X @ A + b)), "v"
        )
        .orderBy("vec_id")
        .collect()
    ]
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_planted_outlier_ranks_first_and_nulls(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(300, 5))
    X[42] = 12.0  # gross outlier
    pdf = _frame(X)
    pdf.loc[len(pdf)] = {"vec_id": 999, "v": None}
    got = mahalanobis_scores(spark.createDataFrame(pdf), "v").collect()
    by_id = {r["vec_id"]: r["maha_sq"] for r in got}
    assert by_id[999] is None
    scored = {k: v for k, v in by_id.items() if v is not None}
    assert max(scored, key=scored.get) == 42


def test_partition_invariance(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 3))
    outs = []
    for parts in (1, 17):
        outs.append(
            [
                r["maha_sq"]
                for r in mahalanobis_scores(
                    spark.createDataFrame(_frame(X)).repartition(parts),
                    "v",
                )
                .orderBy("vec_id")
                .collect()
            ]
        )
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12)


def test_too_few_rows(spark):
    with pytest.raises(ValueError, match=">= 2"):
        mahalanobis_scores(
            spark.createDataFrame(_frame(np.zeros((1, 3)))), "v"
        )
