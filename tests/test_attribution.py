"""Multi-touch attribution: pandas twin over all five models, the
credits-sum-to-one invariant, window boundaries (strict upper, inclusive
lower), zero-touch conversions, validation, and DuckDB parity on the
real NTZ events parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.attribution import (
    attribute_conversions,
    channel_report,
)

LOOK = 100.0


def _mk(seed=13, n_t=400, n_c=80):
    rng = np.random.default_rng(seed)
    touches = pd.DataFrame(
        {
            "u": rng.integers(0, 8, n_t),
            "tid": np.arange(n_t, dtype=np.int64),
            "t": np.round(rng.random(n_t) * 1000, 3),
            "ch": [rng.choice(["ad", "email", "social"]) for _ in range(n_t)],
        }
    )
    convs = pd.DataFrame(
        {
            "u": rng.integers(0, 10, n_c),  # users 8,9: no touches at all
            "cid": np.arange(n_c, dtype=np.int64),
            "ct": np.round(rng.random(n_c) * 1000, 3),
        }
    )
    return touches, convs


def _twin(touches, convs, model, hl=None):
    out = {}
    for c in convs.itertuples(index=False):
        q = touches[
            (touches["u"] == c.u)
            & (touches["t"] >= c.ct - LOOK)
            & (touches["t"] < c.ct)
        ].sort_values(["t", "tid"], ascending=False).reset_index(drop=True)
        n = len(q)
        if n == 0:
            continue
        for i, r in q.iterrows():
            pos = i + 1  # 1 = most recent
            pa = n - i
            if model == "last_touch":
                cr = 1.0 if pos == 1 else 0.0
            elif model == "first_touch":
                cr = 1.0 if pa == 1 else 0.0
            elif model == "linear":
                cr = 1.0 / n
            elif model == "position_based":
                if n == 1:
                    cr = 1.0
                elif n == 2:
                    cr = 0.5
                elif pa == 1 or pos == 1:
                    cr = 0.4
                else:
                    cr = 0.2 / (n - 2)
            else:
                w = 0.5 ** ((c.ct - q["t"]) / hl)
                cr = (0.5 ** ((c.ct - r["t"]) / hl)) / w.sum()
            out[(c.cid, int(r["tid"]))] = (pos, n, round(cr, 9))
    return out


@pytest.mark.parametrize(
    "model,hl",
    [
        ("last_touch", None),
        ("first_touch", None),
        ("linear", None),
        ("position_based", None),
        ("time_decay", 25.0),
    ],
)
def test_matches_twin_all_models(spark, model, hl):
    touches, convs = _mk()
    out = attribute_conversions(
        spark.createDataFrame(touches),
        spark.createDataFrame(convs),
        "u",
        touch_id="tid",
        conv_id="cid",
        touch_ts="t",
        conv_ts="ct",
        lookback_s=LOOK,
        model=model,
        half_life_s=hl,
    )
    got = {
        (r["cid"], r["tid"]): (r["pos"], r["n_touches"], round(r["credit"], 9))
        for r in out.collect()
    }
    exp = _twin(touches, convs, model, hl)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][:2] == exp[key][:2], key
        if model == "time_decay":
            # normalization sums accumulate in different orders between
            # the window aggregate and the pandas twin: 1-ulp drift
            assert abs(got[key][2] - exp[key][2]) < 1e-9, key
        else:
            assert got[key][2] == exp[key][2], key
    # credits per conversion sum to exactly 1
    sums = (
        out.groupBy("cid")
        .agg(F.round(F.sum("credit"), 9).alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # users 8/9 have no touches: their conversions are absent
    assert not any(cid for (cid, _) in got
                   if convs.loc[convs.cid == cid, "u"].iloc[0] >= 8)


def test_boundaries_strict_upper_inclusive_lower(spark):
    touches = pd.DataFrame(
        {"u": [1, 1, 1], "tid": [0, 1, 2],
         "t": [0.0, 50.0, 100.0], "ch": ["a", "b", "c"]}
    )
    convs = pd.DataFrame({"u": [1], "cid": [0], "ct": [100.0]})
    out = attribute_conversions(
        spark.createDataFrame(touches),
        spark.createDataFrame(convs),
        "u",
        touch_id="tid",
        conv_id="cid",
        touch_ts="t",
        conv_ts="ct",
        lookback_s=LOOK,
        model="linear",
    ).collect()
    # t=100 (the conversion instant) excluded; t=0 (== ct - lookback) kept
    assert sorted(r["tid"] for r in out) == [0, 1]
    rep = channel_report(
        attribute_conversions(
            spark.createDataFrame(touches),
            spark.createDataFrame(convs),
            "u",
            touch_id="tid",
            conv_id="cid",
            touch_ts="t",
            conv_ts="ct",
            lookback_s=LOOK,
            model="last_touch",
        ),
        "ch",
    ).collect()
    got = {r["ch"]: (round(r["credited"], 9), r["touches"]) for r in rep}
    assert got == {"a": (0.0, 1), "b": (1.0, 1)}


def test_validation(spark):
    t, c = _mk(n_t=5, n_c=2)
    td, cd = spark.createDataFrame(t), spark.createDataFrame(c)
    kw = dict(touch_id="tid", conv_id="cid", touch_ts="t", conv_ts="ct")
    with pytest.raises(ValueError, match="unknown model"):
        attribute_conversions(td, cd, "u", lookback_s=10, model="shapley", **kw)
    with pytest.raises(ValueError, match="half_life_s"):
        attribute_conversions(td, cd, "u", lookback_s=10, model="time_decay", **kw)
    with pytest.raises(ValueError, match="lookback_s"):
        attribute_conversions(td, cd, "u", lookback_s=0, **kw)


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_id").alias("tid"), "ts", "event_type"
    )
    convs = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    out = attribute_conversions(
        touches,
        convs,
        "user_id",
        touch_id="tid",
        conv_id="cid",
        touch_ts="ts",
        conv_ts="cts",
        lookback_s=86400.0,
        model="position_based",
    )
    got = sorted(
        (r["cid"], r["tid"], r["pos"], r["n_touches"], round(r["credit"], 6))
        for r in out.collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = sorted(
        tuple(r)
        for r in con.sql(
            """
            WITH t AS (SELECT user_id, event_id AS tid,
                              epoch(ts) AS tt, event_type FROM events
                       WHERE event_type IN ('click', 'view')),
            c AS (SELECT user_id, event_id AS cid, epoch(ts) AS ct
                  FROM events WHERE event_type = 'purchase'),
            p AS (SELECT c.cid, t.tid, t.tt, c.ct,
                         row_number() OVER (PARTITION BY c.cid
                             ORDER BY t.tt DESC, t.tid DESC) AS pos,
                         row_number() OVER (PARTITION BY c.cid
                             ORDER BY t.tt ASC, t.tid ASC) AS pa,
                         count(*) OVER (PARTITION BY c.cid) AS n
                  FROM c JOIN t ON c.user_id = t.user_id
                     AND t.tt >= c.ct - 86400 AND t.tt < c.ct)
            SELECT cid, tid, CAST(pos AS BIGINT), CAST(n AS BIGINT),
                   round(CASE WHEN n = 1 THEN 1.0
                              WHEN n = 2 THEN 0.5
                              WHEN pa = 1 THEN 0.4
                              WHEN pos = 1 THEN 0.4
                              ELSE 0.2 / (n - 2) END, 6) AS credit
            FROM p
            """
        ).fetchall()
    )
    assert got == exp
