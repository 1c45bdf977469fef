"""Correlation-matrix feature selection: numpy.corrcoef parity, constant
features -> NULL, partition invariance, greedy pruning semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.selection import (
    correlation_matrix,
    feature_variances,
    redundancy_prune,
)


@pytest.fixture(scope="module")
def mat():
    rng = np.random.default_rng(5)
    n, d = 400, 12
    X = rng.normal(0, 1, (n, d))
    X[:, 3] = X[:, 1] * 2.0 + rng.normal(0, 0.01, n)   # near-dup of col 1
    X[:, 7] = -X[:, 2]                                 # exact negative dup
    X[:, 9] = 4.25                                     # constant
    return X


def _df(spark, X):
    pdf = pd.DataFrame({"vid": range(len(X)), "vec": [r.tolist() for r in X]})
    return spark.createDataFrame(pdf)


def test_corr_matches_numpy(spark, mat):
    got = correlation_matrix(_df(spark, mat), "vec").toPandas()
    exp = np.corrcoef(mat, rowvar=False)
    assert len(got) == 12 * 11 // 2
    for f1, f2, c in got.itertuples(index=False):
        e = exp[f1, f2]
        if f1 == 9 or f2 == 9:
            assert pd.isna(c)
        else:
            np.testing.assert_allclose(c, e, rtol=1e-9)


def test_variances(spark, mat):
    got = feature_variances(_df(spark, mat), "vec").toPandas().sort_values("pos")
    np.testing.assert_allclose(got["mean"], mat.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(got["var_pop"], mat.var(axis=0), rtol=1e-9, atol=1e-12)
    assert got["var_pop"].iloc[9] == 0.0


def test_partition_invariance(spark, mat):
    a = correlation_matrix(_df(spark, mat).coalesce(1), "vec").toPandas()
    b = correlation_matrix(_df(spark, mat).repartition(7), "vec").toPandas()
    m = a.merge(b, on=["f1", "f2"])
    ok = m["corr_x"].notna()
    np.testing.assert_allclose(
        m.loc[ok, "corr_x"].astype(float), m.loc[ok, "corr_y"].astype(float),
        rtol=1e-12,
    )


def test_redundancy_prune(spark, mat):
    corr = correlation_matrix(_df(spark, mat), "vec")
    scores = spark.createDataFrame(
        pd.DataFrame({"pos": range(12),
                      "score": [10 - i * 0.5 for i in range(12)]})
    )
    kept = redundancy_prune(corr, scores, threshold=0.95)
    # col 1 outranks its near-copy col 3; col 2 outranks its negative dup 7
    assert 1 in kept and 3 not in kept
    assert 2 in kept and 7 not in kept
    # |corr| uses absolute value: the anti-correlated pair still collapses
    assert kept == sorted(kept)  # equal-spaced scores keep position order
    # constant feature is not blocked by NULL corrs
    assert 9 in kept
    with pytest.raises(ValueError, match="threshold"):
        redundancy_prune(corr, scores, threshold=0.0)


def test_prune_prefers_higher_score(spark, mat):
    corr = correlation_matrix(_df(spark, mat), "vec")
    scores = pd.DataFrame({"pos": range(12), "score": [0.0] * 12})
    scores.loc[3, "score"] = 5.0  # now the near-dup outranks col 1
    kept = redundancy_prune(corr, spark.createDataFrame(scores), threshold=0.95)
    assert 3 in kept and 1 not in kept


# ---------------------------------------------------------------------------
# standardization
# ---------------------------------------------------------------------------


def test_standardize_matches_sklearn_convention(spark, mat):
    from modlyn_spark.scoring.selection import standardize

    out = standardize(_df(spark, mat), "vec").toPandas().sort_values("vid")
    Z = np.stack(out["vec"].to_numpy())
    mu, sd = mat.mean(axis=0), mat.std(axis=0)
    sd_adj = np.where(sd == 0, 1.0, sd)
    np.testing.assert_allclose(Z, (mat - mu) / sd_adj, rtol=1e-9, atol=1e-12)
    # constant column centers to exactly 0 (std->1 convention)
    np.testing.assert_allclose(Z[:, 9], 0.0, atol=1e-12)
    np.testing.assert_allclose(Z.mean(axis=0), 0.0, atol=1e-9)


def test_standardize_jvm_only_plan(spark, mat):
    """The transform must stay inside whole-stage codegen: no Arrow/Python
    eval nodes in the plan."""
    from modlyn_spark.scoring.selection import fit_standardizer, apply_standardizer

    df = _df(spark, mat)
    mean, std = fit_standardizer(df, "vec")
    out = apply_standardizer(df, "vec", mean, std, out_col="z")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_standardizer_serving_reuse(spark, mat):
    """Frozen (mean, std) from a fit applies identically to new data —
    the train-time/serve-time contract."""
    from modlyn_spark.scoring.selection import apply_standardizer, fit_standardizer

    df = _df(spark, mat)
    mean, std = fit_standardizer(df, "vec")
    fresh = mat[:5] * 2.0 + 1.0
    out = apply_standardizer(
        _df(spark, fresh), "vec", mean, std
    ).toPandas().sort_values("vid")
    Z = np.stack(out["vec"].to_numpy())
    sd_adj = np.where(mat.std(axis=0) == 0, 1.0, mat.std(axis=0))
    np.testing.assert_allclose(
        Z, (fresh - mat.mean(axis=0)) / sd_adj, rtol=1e-9, atol=1e-12
    )


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def _psi_twin(R, Q, bins=10, eps=1e-6):
    mn, mx = R.min(axis=0), R.max(axis=0)
    w = np.where(mx > mn, (mx - mn) / bins, 1.0)
    out = np.empty(R.shape[1])
    for j in range(R.shape[1]):
        bp = np.clip(np.floor((R[:, j] - mn[j]) / w[j]).astype(int), 0, bins - 1)
        bq = np.clip(np.floor((Q[:, j] - mn[j]) / w[j]).astype(int), 0, bins - 1)
        p = np.maximum(np.bincount(bp, minlength=bins) / len(R), eps)
        q = np.maximum(np.bincount(bq, minlength=bins) / len(Q), eps)
        out[j] = ((p - q) * np.log(p / q)).sum()
    return out


def test_psi_matches_twin_and_detects_drift(spark):
    from modlyn_spark.scoring.selection import psi_scores

    rng = np.random.default_rng(17)
    n, d = 800, 6
    R = rng.normal(0, 1, (n, d))
    Q = rng.normal(0, 1, (n, d))
    Q[:, 2] += 2.0          # mean shift
    Q[:, 4] *= 3.0          # variance blow-up (mass into clamp bins)
    got = (
        psi_scores(_df(spark, R), _df(spark, Q), "vec")
        .toPandas()
        .sort_values("pos")
    )
    exp = _psi_twin(R, Q)
    np.testing.assert_allclose(got["psi"], exp, rtol=1e-10, atol=1e-12)
    assert (got["n_ref"] == n).all() and (got["n_new"] == n).all()
    stable = [0, 1, 3, 5]
    assert got["psi"].iloc[stable].max() < 0.1      # undrifted features
    assert got["psi"].iloc[2] > 0.25                # shifted feature flags
    assert got["psi"].iloc[4] > 0.25


def test_psi_identical_distributions_near_zero(spark):
    from modlyn_spark.scoring.selection import psi_scores

    rng = np.random.default_rng(23)
    R = rng.normal(0, 1, (1000, 4))
    got = (
        psi_scores(_df(spark, R), _df(spark, R.copy()), "vec")
        .toPandas()["psi"]
    )
    np.testing.assert_allclose(got, 0.0, atol=1e-12)  # same rows: exact 0


def test_psi_partition_invariance(spark):
    from modlyn_spark.scoring.selection import psi_scores

    rng = np.random.default_rng(29)
    R, Q = rng.normal(0, 1, (300, 5)), rng.normal(0.5, 1, (300, 5))
    a = psi_scores(
        _df(spark, R).coalesce(1), _df(spark, Q).coalesce(1), "vec"
    ).toPandas().sort_values("pos")["psi"].to_numpy()
    b = psi_scores(
        _df(spark, R).repartition(8), _df(spark, Q).repartition(3), "vec"
    ).toPandas().sort_values("pos")["psi"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
