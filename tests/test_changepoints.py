"""CUSUM changepoints: the window closed form vs the sequential
recurrence (independent twin), shift detection, NULL/baseline
handling, and the first-alarm rollup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.changepoints import changepoints, cusum_scores


def twin_cusum(xs, mu0, k):
    """The textbook recurrence, run sequentially."""
    cp, cn, out = 0.0, 0.0, []
    for x in xs:
        d = 0.0 if x is None else x - mu0
        cp = max(0.0, cp + d - k)
        cn = max(0.0, cn - d - k)
        out.append((cp, cn))
    return out


def _series_pdf():
    rng = np.random.default_rng(7)
    rows = []
    for e in range(6):
        n = 60
        for i in range(n):
            # entity 3 shifts up by +3 after i=30; entity 4 shifts down
            x = float(rng.normal(0, 1))
            if e == 3 and i >= 30:
                x += 3.0
            if e == 4 and i >= 40:
                x -= 3.0
            if e == 5 and i % 7 == 0:
                x = None
            rows.append({"k": f"e{e}", "i": i, "v": x})
    return pd.DataFrame(rows)


def test_closed_form_equals_recurrence(spark):
    pdf = _series_pdf()
    got = (
        cusum_scores(spark.createDataFrame(pdf), "k", "i", "v",
                     target=0.0, slack=0.5, threshold=5.0)
        .orderBy("k", "i")
        .toPandas()
    )
    for k, grp in got.groupby("k"):
        xs = [None if pd.isna(x) else x for x in grp.sort_values("i")["v"]]
        twin = twin_cusum(xs, 0.0, 0.5)
        g = grp.sort_values("i")
        for (cp, cn), gp, gn in zip(twin, g["cusum_pos"], g["cusum_neg"]):
            assert gp == pytest.approx(cp, abs=1e-9), k
            assert gn == pytest.approx(cn, abs=1e-9), k


def test_shift_detected_and_sides(spark):
    pdf = _series_pdf()
    # h=8, k=0.75: twin-verified to keep all in-control entities quiet
    # for this seed while both planted shifts trip (h=5/k=0.5 false-
    # alarms e0/e4 on the noise — CUSUM's ARL at those settings is
    # shorter than the 60-sample series)
    cps = (
        changepoints(spark.createDataFrame(pdf), "k", "i", "v",
                     target=0.0, slack=0.75, threshold=8.0)
        .toPandas()
    )
    by = {(r["k"], r["side"]): r for _, r in cps.iterrows()}
    assert ("e3", "up") in by and by[("e3", "up")]["alarm_at"] > 30
    assert ("e4", "down") in by and by[("e4", "down")]["alarm_at"] > 40
    # in-control entities never alarm
    assert not any(k in ("e0", "e1", "e2") for k, _ in by)


def test_first_alarm_is_earliest(spark):
    pdf = _series_pdf()
    scored = cusum_scores(
        spark.createDataFrame(pdf), "k", "i", "v",
        target=0.0, slack=0.5, threshold=5.0,
    ).toPandas()
    cps = changepoints(
        spark.createDataFrame(pdf), "k", "i", "v",
        target=0.0, slack=0.5, threshold=5.0,
    ).toPandas()
    e3 = scored[(scored["k"] == "e3") & (scored["cusum_pos"] > 5.0)
                & scored["v"].notna()]
    want = e3["i"].min()
    got = cps[(cps["k"] == "e3") & (cps["side"] == "up")]["alarm_at"].iloc[0]
    assert got == want


def test_nulls_never_alarm(spark):
    pdf = pd.DataFrame(
        [{"k": "a", "i": i, "v": None if i == 5 else 10.0}
         for i in range(8)]
    )
    got = (
        cusum_scores(spark.createDataFrame(pdf), "k", "i", "v",
                     target=0.0, slack=0.5, threshold=3.0)
        .orderBy("i")
        .toPandas()
    )
    assert not got.loc[got["v"].isna(), "is_alarm"].any()
    assert got.loc[got["v"].notna(), "is_alarm"].iloc[-1]


def test_per_entity_baseline(spark):
    pdf = pd.DataFrame(
        [{"k": k, "i": i, "v": base + 0.0}
         for k, base in [("a", 100.0), ("b", -50.0)] for i in range(20)]
    )
    baseline = pd.DataFrame(
        [{"k": "a", "mu0": 100.0}, {"k": "b", "mu0": -50.0}]
    )
    got = cusum_scores(
        spark.createDataFrame(pdf), "k", "i", "v",
        target=spark.createDataFrame(baseline), slack=0.1, threshold=1.0,
    ).toPandas()
    # perfectly on-target series never drift
    assert (got["cusum_pos"] == 0.0).all()
    assert (got["cusum_neg"] == 0.0).all()
    assert not got["is_alarm"].any()
    assert "mu0" not in got.columns


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame([{"k": "a", "i": 0, "v": 1.0}]))
    with pytest.raises(ValueError):
        cusum_scores(df, "k", "i", "v", slack=-1.0)
    with pytest.raises(ValueError):
        cusum_scores(df, "k", "i", "v", threshold=0.0)
    bad = spark.createDataFrame(pd.DataFrame([{"k": "a", "m": 1.0}]))
    with pytest.raises(ValueError):
        cusum_scores(df, "k", "i", "v", target=bad)


def test_single_window_stage(spark):
    """The scores plan carries exactly ONE exchange (the entity
    partition) — prefix sums and running extrema share it."""
    pdf = _series_pdf()
    plan = cusum_scores(
        spark.createDataFrame(pdf), "k", "i", "v",
        target=0.0, slack=0.5, threshold=5.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
