"""Categorical scorers: numpy contingency twin parity, full-grid
(zero-cell) handling, WOE/IV smoothing arithmetic, NULL semantics,
single melted shuffle for many features."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.categorical import chi2_scores, woe_iv

SF = "/root/testdata/sf0.001"


def _np_chi2(pdf: pd.DataFrame, feat: str, label: str) -> tuple:
    d = pd.DataFrame(
        {"f": pdf[feat], "y": pdf[label]}
    ).dropna()
    ct = pd.crosstab(d["f"], d["y"])  # full grid incl. zeros
    o = ct.to_numpy(dtype=float)
    e = np.outer(o.sum(1), o.sum(0)) / o.sum()
    return ((o - e) ** 2 / e).sum(), (o.shape[0] - 1) * (o.shape[1] - 1), int(o.sum())


def test_chi2_matches_numpy_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["feature"]: r
        for r in chi2_scores(docs, ["source", "lang"], "lang").collect()
    }
    pdf = docs.toPandas()
    for feat in ["source", "lang"]:
        chi2, dof, n = _np_chi2(pdf, feat, "lang")
        assert got[feat]["chi2"] == pytest.approx(chi2, rel=1e-9), feat
        assert got[feat]["dof"] == dof
        assert got[feat]["n"] == n
    # lang vs lang is perfectly dependent: chi2 = n * (|langs|-1)
    nl = pdf["lang"].nunique()
    assert got["lang"]["chi2"] == pytest.approx(len(pdf) * (nl - 1))


def test_chi2_zero_cells_contribute_expected(spark):
    # planted: value 'b' never co-occurs with label 'y' -> zero cell
    pdf = pd.DataFrame(
        {
            "f": ["a"] * 4 + ["b"] * 4,
            "y": ["x", "x", "y", "y", "x", "x", "x", "x"],
        }
    )
    got = chi2_scores(spark.createDataFrame(pdf), ["f"], "y").collect()[0]
    chi2, dof, n = _np_chi2(pdf, "f", "y")
    assert got["chi2"] == pytest.approx(chi2)
    assert chi2 > 0  # the zero cell's expected mass is in there


def test_null_semantics(spark):
    pdf = pd.DataFrame(
        {
            "f": ["a", "a", None, "b", "b", "b"],
            "g": ["u", "v", "u", "v", "u", "v"],
            "y": ["x", "y", "x", "y", None, "x"],
        }
    )
    got = {
        r["feature"]: r
        for r in chi2_scores(spark.createDataFrame(pdf), ["f", "g"], "y").collect()
    }
    # null label dropped globally; null f dropped only for f
    assert got["f"]["n"] == 4
    assert got["g"]["n"] == 5


def test_woe_iv_matches_hand_arithmetic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pos = docs.select("lang").groupBy("lang").count().orderBy(
        "count", ascending=False
    ).first()["lang"]
    woe, iv = woe_iv(docs, ["source"], "lang", positive=pos, alpha=0.5)
    wrows = {r["value"]: r for r in woe.collect()}
    pdf = docs.toPandas().dropna(subset=["source", "lang"])
    grp = pdf.groupby("source")["lang"].agg(
        n_pos=lambda s: (s == pos).sum(), n_neg=lambda s: (s != pos).sum()
    )
    nv, tp, tn = len(grp), grp["n_pos"].sum(), grp["n_neg"].sum()
    ivs = 0.0
    for v, row in grp.iterrows():
        p = (row["n_pos"] + 0.5) / (tp + 0.5 * nv)
        q = (row["n_neg"] + 0.5) / (tn + 0.5 * nv)
        w = np.log(p / q)
        assert wrows[v]["woe"] == pytest.approx(w), v
        assert wrows[v]["n_pos"] == row["n_pos"]
        ivs += (p - q) * w
    assert iv.collect()[0]["iv"] == pytest.approx(ivs)


def test_woe_zero_event_category_finite(spark):
    pdf = pd.DataFrame(
        {"f": ["a"] * 5 + ["b"] * 5, "y": ["p"] * 5 + ["n"] * 5}
    )
    woe, iv = woe_iv(spark.createDataFrame(pdf), ["f"], "y", positive="p")
    vals = [r["woe"] for r in woe.collect()]
    assert all(np.isfinite(v) for v in vals)  # smoothing keeps ln finite
    with pytest.raises(ValueError):
        woe_iv(spark.createDataFrame(pdf), ["f"], "y", positive="p", alpha=0)


def test_single_shuffle_for_many_features(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = chi2_scores(
        docs, ["source", "lang"], "lang"
    )._jdf.queryExecution().executedPlan().toString()
    # the melted data pass appears once: exactly one scan of the table
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2
