"""Trend features: numpy polyfit twin parity, rebase identity
(epoch-scale timestamps keep precision), degenerate-entity contracts
(n=1, constant value, constant time), NTZ timestamp input, partition
invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.trends import trend_features

SF = "/root/testdata/sf0.001"


def _pdf():
    rng = np.random.RandomState(3)
    rows = []
    base = 1.7e9  # epoch-seconds scale: the precision trap the rebase fixes
    for e in range(8):
        n = 2 + e * 3
        ts = np.sort(rng.uniform(0, 86400.0, size=n)) + base
        v = 0.5 * e * (ts - base) / 3600.0 + rng.normal(0, 1 + e, size=n)
        for t, x in zip(ts, v):
            rows.append({"e": f"e{e}", "ts": float(t), "v": float(x)})
    rows.append({"e": "single", "ts": base, "v": 42.0})
    rows += [{"e": "flat", "ts": base + i, "v": 7.0} for i in range(5)]
    rows += [{"e": "same_t", "ts": base, "v": float(i)} for i in range(4)]
    rows.append({"e": "e0", "ts": None, "v": 1.0})
    rows.append({"e": "e0", "ts": base, "v": None})
    return pd.DataFrame(rows)


def test_twin_parity(spark):
    pdf = _pdf()
    got = (
        trend_features(spark.createDataFrame(pdf), "e", "ts", "v")
        .toPandas()
        .set_index("e")
    )
    d = pdf.dropna()
    for e, g in d.groupby("e"):
        r = got.loc[e]
        assert r["n"] == len(g)
        if e == "single" or e == "same_t":
            assert pd.isna(r["slope_per_s"]) and pd.isna(r["r2"])
            continue
        t = g["ts"].to_numpy() - g["ts"].min()
        v = g["v"].to_numpy()
        slope, intercept = np.polyfit(t, v, 1)
        # one-pass centered sums vs polyfit's pre-centered solve: agree
        # to ~1e-9 absolute; near-zero slopes make pure-relative checks
        # meaningless
        np.testing.assert_allclose(r["slope_per_s"], slope, rtol=1e-5,
                                   atol=1e-8)
        np.testing.assert_allclose(r["intercept"], intercept, rtol=1e-5,
                                   atol=1e-6)
        if e == "flat":
            assert r["slope_per_s"] == 0.0 and pd.isna(r["r2"])
        else:
            c = np.corrcoef(t, v)[0, 1]
            np.testing.assert_allclose(r["r2"], c * c, rtol=1e-6)
        np.testing.assert_allclose(r["v_mean"], v.mean(), rtol=1e-12)
        np.testing.assert_allclose(r["v_std"], v.std(), rtol=1e-6)
        np.testing.assert_allclose(r["t_span_s"], t.max(), rtol=1e-12)


def test_real_ntz_events(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = trend_features(ev, "user_id", "ts", "value").toPandas()
    assert len(out) > 5
    assert out["n"].sum() > 0
    assert out["slope_per_s"].notna().any()


def test_partition_invariance(spark):
    pdf = _pdf()
    a = (
        trend_features(spark.createDataFrame(pdf).repartition(1), "e", "ts", "v")
        .toPandas()
        .sort_values("e")
        .reset_index(drop=True)
    )
    b = (
        trend_features(spark.createDataFrame(pdf).repartition(7), "e", "ts", "v")
        .toPandas()
        .sort_values("e")
        .reset_index(drop=True)
    )
    for c in ["n", "t_span_s", "v_mean", "v_std"]:
        np.testing.assert_allclose(
            a[c].to_numpy(float), b[c].to_numpy(float), rtol=1e-9,
            err_msg=c,
        )
    # slope/r2 float sums may differ in the last ulps across partition
    # orders; they must agree to ~1e-9 relative
    for c in ["slope_per_s", "intercept", "r2"]:
        av, bv = a[c].to_numpy(float), b[c].to_numpy(float)
        mask = ~np.isnan(av)
        assert (mask == ~np.isnan(bv)).all()
        np.testing.assert_allclose(av[mask], bv[mask], rtol=1e-9, err_msg=c)


def test_single_exchange_plan(spark):
    # the min window and the classed-sums groupBy share the entity key:
    # the optimized plan must carry ONE hash exchange on it (AQE may
    # add none beyond that), proving the groupBy reuses the window's
    # partitioning
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        trend_features(ev, "user_id", "ts", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 1, f"expected 1 hash exchange, got {n_exchange}"
    assert "Join" not in plan
