"""One-pass ridge/OLS: the distributed sufficient-statistics fit must
match the direct single-node closed form on the collected data, at any
parallelism, with textbook OLS t-stats at alpha=0."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.ridge import ridge_fit

N, D = 400, 6


@pytest.fixture(scope="module")
def reg_data(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(N, D))
    beta_true = np.array([2.0, -1.0, 0.5, 0.0, 0.0, 3.0])
    y = 1.5 + X @ beta_true + rng.normal(scale=0.7, size=N)
    pdf = pd.DataFrame(
        {
            "row_id": np.arange(N),
            "features": [x.tolist() for x in X],
            "y": y,
        }
    )
    # plant nulls the fit must skip
    pdf.loc[5, "features"] = None
    pdf.loc[11, "y"] = None
    return spark.createDataFrame(pdf), X, y


def _dense(X, y, drop=(5, 11)):
    keep = np.ones(len(X), bool)
    keep[list(drop)] = False
    return X[keep], y[keep]


def test_ols_matches_closed_form(spark, reg_data):
    df, X, y = reg_data
    Xd, yd = _dense(X, y)
    A = np.hstack([np.ones((len(Xd), 1)), Xd])
    exp_beta = np.linalg.solve(A.T @ A, A.T @ yd)
    resid = yd - A @ exp_beta
    sigma2 = (resid @ resid) / (len(yd) - A.shape[1])
    cov = sigma2 * np.linalg.inv(A.T @ A)
    exp_t = exp_beta / np.sqrt(np.diag(cov))

    res = ridge_fit(df, "features", "y", alpha=0.0)
    assert res.n == len(yd)
    assert np.allclose(res.beta, exp_beta, rtol=1e-8)
    assert np.allclose(res.t_stat, exp_t, rtol=1e-8)
    assert np.allclose(res.sigma2, sigma2, rtol=1e-8)
    # the informative features get big |t|, the dead ones small
    assert abs(res.t_stat[1]) > 10 and abs(res.t_stat[6]) > 10
    assert abs(res.t_stat[4]) < 3


def test_ridge_matches_closed_form(spark, reg_data):
    df, X, y = reg_data
    Xd, yd = _dense(X, y)
    A = np.hstack([np.ones((len(Xd), 1)), Xd])
    alpha = 25.0
    Dm = np.eye(A.shape[1])
    Dm[0, 0] = 0.0
    G = A.T @ A
    exp_beta = np.linalg.solve(G + alpha * Dm, A.T @ yd)

    res = ridge_fit(df, "features", "y", alpha=alpha)
    assert np.allclose(res.beta, exp_beta, rtol=1e-8)
    # ridge shrinks feature coefficients vs OLS
    ols = ridge_fit(df, "features", "y", alpha=0.0)
    assert np.abs(res.beta[1:]).sum() < np.abs(ols.beta[1:]).sum()


def test_parallelism_invariant(spark, reg_data):
    df, _, _ = reg_data
    r1 = ridge_fit(df.repartition(1), "features", "y", alpha=2.0)
    r8 = ridge_fit(df.repartition(8), "features", "y", alpha=2.0)
    assert np.allclose(r1.beta, r8.beta, rtol=1e-10)
    assert np.allclose(r1.t_stat, r8.t_stat, rtol=1e-10)


def test_no_intercept(spark, reg_data):
    df, X, y = reg_data
    Xd, yd = _dense(X, y)
    exp = np.linalg.solve(Xd.T @ Xd, Xd.T @ yd)
    res = ridge_fit(df, "features", "y", alpha=0.0, intercept=False)
    assert np.allclose(res.beta, exp, rtol=1e-8)
    pdf = res.coefficients_df(spark).toPandas().sort_values("pos")
    assert pdf["pos"].tolist() == list(range(D))


def test_coefficients_df_intercept_pos(spark, reg_data):
    df, _, _ = reg_data
    res = ridge_fit(df, "features", "y", alpha=1.0)
    pdf = res.coefficients_df(spark).toPandas().sort_values("pos")
    assert pdf["pos"].tolist() == list(range(-1, D))
    assert np.allclose(np.sort(pdf["beta"].to_numpy()), np.sort(res.beta))


def test_underdetermined_raises(spark):
    pdf = pd.DataFrame(
        {"features": [[1.0, 2.0, 3.0]] * 3, "y": [1.0, 2.0, 3.0]}
    )
    with pytest.raises(ValueError, match="parameters"):
        ridge_fit(spark.createDataFrame(pdf), "features", "y")
