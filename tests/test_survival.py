"""Kaplan-Meier: engine vs an explicit single-node product-limit loop and
vs the shared ANSI-SQL twin run in DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.survival import kaplan_meier, kaplan_meier_sql


def km_loop(durations, events):
    """Textbook product-limit loop (independent of both engines)."""
    df = pd.DataFrame({"t": durations, "e": events}).dropna(subset=["t"])
    df["e"] = df["e"].fillna(0).astype(int)
    out = []
    s = 1.0
    gwsum = 0.0
    at_risk = len(df)
    dead = False
    for t in sorted(df["t"].unique()):
        grp = df[df["t"] == t]
        d = int(grp["e"].sum())
        c = len(grp)
        if d == at_risk:
            dead = True
        elif d > 0:
            s *= 1.0 - d / at_risk
            gwsum += d / (at_risk * (at_risk - d))
        out.append(
            {
                "duration": float(t),
                "n_at_risk": at_risk,
                "n_events": d,
                "n_censored": c - d,
                "survival": 0.0 if dead else s,
                "greenwood_se": None if dead else s * np.sqrt(gwsum),
            }
        )
        at_risk -= c
    return pd.DataFrame(out)


@pytest.fixture(scope="module")
def surv_pdf():
    rng = np.random.default_rng(5)
    n = 300
    t = np.round(rng.exponential(scale=50.0, size=n), 1)
    # ties on purpose: quantize a third of the durations hard
    t[: n // 3] = np.round(t[: n // 3], 0)
    e = (rng.random(n) < 0.7).astype(int)
    pdf = pd.DataFrame({"duration": t, "event": e})
    pdf.loc[3, "duration"] = None  # dropped
    pdf.loc[7, "event"] = None  # censored
    return pdf


def test_km_matches_loop(spark, surv_pdf):
    got = (
        kaplan_meier(spark.createDataFrame(surv_pdf), "duration", "event")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = km_loop(surv_pdf["duration"], surv_pdf["event"])
    assert len(got) == len(exp)
    assert np.allclose(got["duration"], exp["duration"])
    assert (got["n_at_risk"] == exp["n_at_risk"]).all()
    assert (got["n_events"] == exp["n_events"]).all()
    assert (got["n_censored"] == exp["n_censored"]).all()
    assert np.allclose(got["survival"], exp["survival"], rtol=1e-10)
    mask = exp["greenwood_se"].notna()
    assert np.allclose(
        got.loc[mask, "greenwood_se"], exp.loc[mask, "greenwood_se"], rtol=1e-10
    )


def test_km_matches_sql_twin(spark, surv_pdf, tmp_path):
    p = str(tmp_path / "surv.parquet")
    surv_pdf.to_parquet(p, index=False)
    got = (
        kaplan_meier(spark.read.parquet(p), "duration", "event")
        .toPandas()
        .reset_index(drop=True)
    )
    sql = kaplan_meier_sql("duration", "event", f"read_parquet('{p}')")
    exp = duckdb.connect().execute(sql).df()
    assert np.allclose(got["survival"], exp["survival"], rtol=1e-12)
    gm = got["greenwood_se"].notna()
    em = exp["greenwood_se"].notna()
    assert (gm == em).all()
    assert np.allclose(got.loc[gm, "greenwood_se"], exp.loc[em, "greenwood_se"])


def test_km_absorbing_zero(spark):
    """Everyone dies at the last time: S hits exactly 0, SE is NULL."""
    pdf = pd.DataFrame(
        {"duration": [1.0, 1.0, 2.0, 3.0, 3.0], "event": [1, 0, 0, 1, 1]}
    )
    got = kaplan_meier(spark.createDataFrame(pdf), "duration", "event").toPandas()
    assert got.iloc[-1]["survival"] == 0.0
    assert pd.isna(got.iloc[-1]["greenwood_se"])
    # S(1) = 1 - 1/5 = 0.8; S(2) unchanged (censor only); S(3) = 0
    assert np.isclose(got.iloc[0]["survival"], 0.8)
    assert np.isclose(got.iloc[1]["survival"], 0.8)


def test_km_all_censored(spark):
    pdf = pd.DataFrame({"duration": [1.0, 2.0, 3.0], "event": [0, 0, 0]})
    got = kaplan_meier(spark.createDataFrame(pdf), "duration", "event").toPandas()
    assert (got["survival"] == 1.0).all()
    assert (got["n_events"] == 0).all()


def test_km_round_to_buckets(spark):
    pdf = pd.DataFrame(
        {"duration": [1.04, 1.01, 2.49, 2.51], "event": [1, 1, 1, 0]}
    )
    got = kaplan_meier(
        spark.createDataFrame(pdf), "duration", "event", round_to=0
    ).toPandas()
    assert got["duration"].tolist() == [1.0, 2.0, 3.0]
    assert got["n_events"].tolist() == [2, 1, 0]


def test_km_empty_is_empty(spark):
    # lazy-builder contract: no job runs at build time, so an all-null
    # duration input yields an empty curve rather than an eager raise
    pdf = pd.DataFrame({"duration": [None], "event": [1]}).astype(
        {"duration": "float64"}
    )
    got = kaplan_meier(spark.createDataFrame(pdf), "duration", "event")
    assert got.count() == 0
