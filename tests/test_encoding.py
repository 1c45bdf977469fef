"""Out-of-fold target encoding: pandas-twin parity, the no-leakage
property (a row's own fold's labels cannot move its encoding), unseen
categories -> prior, null handling, partitioning invariance."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.encoding import count_encode, fold_column, target_encode


def _unit(key: str, salt: str) -> float:
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8], 16) / 2**32


def _twin(pdf: pd.DataFrame, cat: str, tgt: str, key: str, k: int, m: float,
          salt: str = "") -> pd.DataFrame:
    out = pdf.copy()
    out["fold"] = [int(_unit(str(v), salt) * k) for v in out[key]]
    a = (
        out.groupby([cat, "fold"], dropna=False)[tgt]
        .agg(s="sum", c="count")
        .reset_index()
    )
    ct = a.groupby(cat, dropna=False).agg(st=("s", "sum"), ctn=("c", "sum"))
    ft = a.groupby("fold").agg(sf=("s", "sum"), cf=("c", "sum"))
    sg, cg = a["s"].sum(), a["c"].sum()
    enc = {}
    for _, r in a.iterrows():
        st, ctn = ct.loc[r[cat]] if not pd.isna(r[cat]) else ct.loc[np.nan]
        sf, cf = ft.loc[r["fold"]]
        prior = (sg - sf) / (cg - cf) if cg - cf > 0 else np.nan
        den = (ctn - r["c"]) + m
        enc[(r[cat], r["fold"])] = ((st - r["s"]) + m * prior) / den if den > 0 else np.nan
    out[cat + "_te"] = [
        enc[(r[cat], r["fold"])] for _, r in out.iterrows()
    ]
    return out


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(11)
    n = 600
    return pd.DataFrame(
        {
            "rid": [f"r{i:04d}" for i in range(n)],
            "cat": rng.choice(["a", "b", "c", "d", "hot"], size=n,
                              p=[0.1, 0.1, 0.1, 0.1, 0.6]),
            "y": np.where(rng.random(n) < 0.05, np.nan, rng.normal(0, 1, n)),
        }
    )


def test_matches_twin(spark, pdf):
    got = (
        target_encode(
            spark.createDataFrame(pdf), ["cat"], "y", ["rid"],
            n_folds=4, smoothing=10.0,
        )
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = _twin(pdf, "cat", "y", "rid", 4, 10.0).sort_values("rid").reset_index(drop=True)
    assert (got["fold"] == exp["fold"]).all()
    np.testing.assert_allclose(got["cat_te"], exp["cat_te"], rtol=1e-12)


def test_no_leakage(spark, pdf):
    """Perturbing every target in fold 0 must not move fold-0 encodings."""
    base = target_encode(
        spark.createDataFrame(pdf), ["cat"], "y", ["rid"], n_folds=4
    ).toPandas().set_index("rid")
    poisoned_pdf = pdf.copy()
    fold0 = base.loc[pdf["rid"], "fold"].values == 0
    poisoned_pdf.loc[fold0, "y"] = 1e9
    poisoned = target_encode(
        spark.createDataFrame(poisoned_pdf), ["cat"], "y", ["rid"], n_folds=4
    ).toPandas().set_index("rid")
    f0 = base[base["fold"] == 0].index
    np.testing.assert_allclose(
        base.loc[f0, "cat_te"], poisoned.loc[f0, "cat_te"], rtol=0, atol=0
    )
    # ...while other folds (which see fold 0's labels) DID move
    f1 = base[base["fold"] == 1].index
    assert not np.allclose(base.loc[f1, "cat_te"], poisoned.loc[f1, "cat_te"])


def test_unseen_category_encodes_to_prior(spark):
    pdf = pd.DataFrame(
        {
            "rid": [f"r{i}" for i in range(40)],
            "cat": ["common"] * 39 + ["lonely"],
            "y": [1.0] * 39 + [100.0],
        }
    )
    out = target_encode(
        spark.createDataFrame(pdf), ["cat"], "y", ["rid"],
        n_folds=4, smoothing=7.0,
    ).toPandas().set_index("rid")
    lonely = out.loc["r39"]
    sf = out[out["fold"] == lonely["fold"]]["y"].sum()
    cf = (out["fold"] == lonely["fold"]).sum()
    prior = (out["y"].sum() - sf) / (len(out) - cf)
    np.testing.assert_allclose(lonely["cat_te"], prior, rtol=1e-12)


def test_null_category_and_null_target(spark):
    pdf = pd.DataFrame(
        {
            "rid": [f"r{i}" for i in range(30)],
            "cat": [None if i % 5 == 0 else "x" for i in range(30)],
            "y": [np.nan if i % 7 == 0 else float(i) for i in range(30)],
        }
    )
    out = target_encode(
        spark.createDataFrame(pdf), ["cat"], "y", ["rid"], n_folds=3
    ).toPandas()
    assert len(out) == 30
    # null category rows got a (null-group) encoding, not dropped
    assert out[out["cat"].isna()]["cat_te"].notna().all()


def test_partitioning_invariance(spark, pdf):
    df = spark.createDataFrame(pdf)
    a = target_encode(df.coalesce(1), ["cat"], "y", ["rid"]).toPandas()
    b = target_encode(df.repartition(7, "cat"), ["cat"], "y", ["rid"]).toPandas()
    a = a.sort_values("rid").reset_index(drop=True)
    b = b.sort_values("rid").reset_index(drop=True)
    assert (a["fold"] == b["fold"]).all()
    np.testing.assert_allclose(a["cat_te"], b["cat_te"], rtol=1e-12)


def test_count_encode(spark, pdf):
    out = count_encode(
        spark.createDataFrame(pdf), ["cat"], normalize=True
    ).toPandas()
    exp = pdf["cat"].map(pdf["cat"].value_counts(normalize=True))
    got = out.sort_values("rid")["cat_count"].reset_index(drop=True)
    np.testing.assert_allclose(
        got, exp.loc[pdf.sort_values("rid").index].reset_index(drop=True),
        rtol=1e-12,
    )


def test_validation(spark, pdf):
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="n_folds"):
        fold_column(df, ["rid"], 1)
    with pytest.raises(ValueError, match="missing column"):
        target_encode(df, ["nope"], "y", ["rid"])
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, ["cat"], "y", ["rid"], smoothing=-1)
