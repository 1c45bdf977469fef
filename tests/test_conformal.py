from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.conformal import (
    conformal_accept,
    conformal_thresholds,
    conformal_thresholds_sql,
)


def np_qhat(scores: np.ndarray, alpha: float) -> tuple[int, int, float | None]:
    """Independent twin: k-th smallest with k = ceil((n+1)(1-alpha))."""
    s = np.sort(scores[~np.isnan(scores)])
    n = len(s)
    k = math.ceil((n + 1) * (1.0 - alpha))
    if k > n:
        return n, k, None
    return n, k, float(s[k - 1])


@pytest.fixture(scope="module")
def cal_pdf():
    rng = np.random.default_rng(7)
    n = 2000
    grp = rng.choice(["en", "de", "fr"], size=n, p=[0.6, 0.3, 0.1])
    score = np.round(rng.random(n), 3)  # ties on purpose
    score[rng.random(n) < 0.02] = np.nan
    return pd.DataFrame({"lang": grp, "score": score})


def test_global_matches_numpy_twin(spark, cal_pdf):
    for alpha in (0.05, 0.1, 0.5):
        got = conformal_thresholds(
            spark.createDataFrame(cal_pdf), "score", alphas=[alpha]
        ).collect()
        assert len(got) == 1
        n, k, q = np_qhat(cal_pdf["score"].to_numpy(), alpha)
        r = got[0]
        assert (r["n_cal"], r["k_rank"]) == (n, k)
        assert r["qhat"] == pytest.approx(q)


def test_grouped_matches_numpy_twin(spark, cal_pdf):
    got = (
        conformal_thresholds(
            spark.createDataFrame(cal_pdf),
            "score",
            group_cols="lang",
            alphas=[0.1, 0.25],
        )
        .toPandas()
        .set_index(["lang", "alpha"])
    )
    for lang in ["en", "de", "fr"]:
        sub = cal_pdf.loc[cal_pdf["lang"] == lang, "score"].to_numpy()
        for alpha in (0.1, 0.25):
            n, k, q = np_qhat(sub, alpha)
            r = got.loc[(lang, alpha)]
            assert (r["n_cal"], r["k_rank"]) == (n, k)
            assert r["qhat"] == pytest.approx(q)


def test_duckdb_oracle_parity(spark, cal_pdf):
    got = conformal_thresholds(
        spark.createDataFrame(cal_pdf),
        "score",
        group_cols="lang",
        alphas=[0.1, 0.25],
    ).toPandas()
    con = duckdb.connect()
    con.register("cal", cal_pdf)
    want = con.execute(
        conformal_thresholds_sql(
            "score", "cal", group_exprs=["lang"], alphas=[0.1, 0.25]
        )
    ).df()
    g = got.sort_values(["lang", "alpha"]).reset_index(drop=True)
    w = want.sort_values(["lang", "alpha"]).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(
        g, w.astype(g.dtypes.to_dict()), check_exact=False, rtol=1e-12
    )


def test_coverage_guarantee_holds(spark):
    """Marginal coverage on exchangeable holdout >= 1 - alpha (the whole
    point); checked empirically with a disjoint iid holdout."""
    rng = np.random.default_rng(11)
    cal = pd.DataFrame({"score": rng.standard_normal(4000)})
    hold = rng.standard_normal(20000)
    alpha = 0.1
    q = (
        conformal_thresholds(
            spark.createDataFrame(cal), "score", alphas=[alpha]
        ).collect()[0]["qhat"]
    )
    cov = float((hold <= q).mean())
    assert cov >= 1 - alpha - 0.01  # 3-sigma slack on 20k draws


def test_small_group_unattainable_is_null(spark):
    pdf = pd.DataFrame({"score": [0.1, 0.2, 0.3]})
    r = conformal_thresholds(
        spark.createDataFrame(pdf), "score", alphas=[0.1]
    ).collect()[0]
    # k = ceil(4 * 0.9) = 4 > n = 3 -> no finite threshold
    assert (r["n_cal"], r["k_rank"]) == (3, 4)
    assert r["qhat"] is None


def test_exact_boundary_rank(spark):
    # n=9, alpha=0.1: k = ceil(10*0.9) = 9 -> qhat = max
    pdf = pd.DataFrame({"score": np.arange(9) / 10.0})
    r = conformal_thresholds(
        spark.createDataFrame(pdf), "score", alphas=[0.1]
    ).collect()[0]
    assert (r["k_rank"], r["qhat"]) == (9, pytest.approx(0.8))


def test_ties_count_multiplicity(spark):
    # ranks count ROWS, not distinct values: with scores [0,0,0,1],
    # alpha=0.5 -> k = ceil(5*0.5) = 3 -> qhat = 0 (3rd smallest row)
    pdf = pd.DataFrame({"score": [0.0, 0.0, 0.0, 1.0]})
    r = conformal_thresholds(
        spark.createDataFrame(pdf), "score", alphas=[0.5]
    ).collect()[0]
    assert (r["k_rank"], r["qhat"]) == (3, 0.0)


def test_accept_flag(spark, cal_pdf):
    sdf = spark.createDataFrame(cal_pdf)
    th = conformal_thresholds(sdf, "score", group_cols="lang", alphas=[0.1])
    out = conformal_accept(
        sdf, th, "score", group_cols="lang", alpha=0.1
    ).toPandas()
    q = {
        r["lang"]: r["qhat"]
        for r in th.collect()
    }
    exp = cal_pdf.apply(
        lambda r: None
        if pd.isna(r["score"])
        else bool(r["score"] <= q[r["lang"]]),
        axis=1,
    )
    got = out.set_index(cal_pdf.index)["conformal_accept"]
    for i in cal_pdf.index:
        if pd.isna(cal_pdf.loc[i, "score"]):
            continue  # NULL score: comparison is NULL -> None flag
        assert got[i] == exp[i], i


def test_accept_unknown_group_is_null_and_inf_accepts(spark):
    cal = pd.DataFrame({"g": ["a"] * 30, "score": np.arange(30) / 30.0})
    th = conformal_thresholds(
        spark.createDataFrame(cal), "score", group_cols="g", alphas=[0.1]
    )
    scored = pd.DataFrame({"g": ["a", "zz"], "score": [0.5, 0.0]})
    out = (
        conformal_accept(
            spark.createDataFrame(scored), th, "score", group_cols="g",
            alpha=0.1,
        )
        .toPandas()
        .set_index("g")["conformal_accept"]
    )
    assert out["a"] == True  # noqa: E712
    assert pd.isna(out["zz"])  # no calibration evidence
    # unattainable coverage (qhat NULL = +inf) accepts everything
    tiny = pd.DataFrame({"g": ["a"] * 2, "score": [0.1, 0.9]})
    th2 = conformal_thresholds(
        spark.createDataFrame(tiny), "score", group_cols="g", alphas=[0.01]
    )
    out2 = conformal_accept(
        spark.createDataFrame(scored[scored["g"] == "a"]),
        th2, "score", group_cols="g", alpha=0.01,
    ).collect()
    assert all(r["conformal_accept"] for r in out2)


def test_validation(spark):
    pdf = pd.DataFrame({"score": [0.1]})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="alpha"):
        conformal_thresholds(sdf, "score", alphas=[1.5])
    with pytest.raises(ValueError, match="non-empty"):
        conformal_thresholds(sdf, "score", alphas=[])


def test_partitioning_invariance(spark, cal_pdf):
    a = conformal_thresholds(
        spark.createDataFrame(cal_pdf).repartition(1),
        "score", group_cols="lang", alphas=[0.1],
    ).toPandas()
    b = conformal_thresholds(
        spark.createDataFrame(cal_pdf).repartition(16),
        "score", group_cols="lang", alphas=[0.1],
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["lang"]).reset_index(drop=True),
        b.sort_values(["lang"]).reset_index(drop=True),
    )


def test_accept_requires_alpha_for_multilevel_table(spark):
    cal = pd.DataFrame({"g": ["a"] * 30, "score": np.arange(30) / 30.0})
    th = conformal_thresholds(
        spark.createDataFrame(cal), "score", group_cols="g",
        alphas=[0.1, 0.2],
    )
    scored = spark.createDataFrame(pd.DataFrame({"g": ["a"], "score": [0.5]}))
    with pytest.raises(ValueError, match="multiple alpha"):
        conformal_accept(scored, th, "score", group_cols="g")
    # with a selector it is fine, and no row duplication happens
    out = conformal_accept(scored, th, "score", group_cols="g", alpha=0.2)
    assert out.count() == 1


def test_accept_preserves_caller_ncal_qhat_columns(spark):
    cal = pd.DataFrame({"g": ["a"] * 30, "score": np.arange(30) / 30.0})
    th = conformal_thresholds(
        spark.createDataFrame(cal), "score", group_cols="g", alphas=[0.1]
    )
    scored = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["a"], "score": [0.5], "n_cal": [123], "qhat": [9.9]}
        )
    )
    out = conformal_accept(
        scored, th, "score", group_cols="g", alpha=0.1
    ).collect()[0]
    # the caller's columns survive the join + drop untouched
    assert (out["n_cal"], out["qhat"]) == (123, 9.9)
    assert out["conformal_accept"] == True  # noqa: E712
