"""Funnel analysis: python chained-min twin on random streams, horizon
semantics, out-of-order arrival, report arithmetic, real-parquet drive
vs a DuckDB chained-min oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.funnels import funnel_levels, funnel_report


def _twin_level(times_by_step, horizon=None):
    """Chained-min reference: t_{k+1} = earliest step-(k+1) event
    strictly after t_k (within horizon of t1)."""
    t_prev, t1, level = None, None, 0
    for k, ts in enumerate(times_by_step):
        cand = [
            t
            for t in ts
            if (k == 0 or (t_prev is not None and t > t_prev))
            and (horizon is None or k == 0 or t <= t1 + horizon)
        ]
        if not cand:
            break
        t_prev = min(cand)
        if k == 0:
            t1 = t_prev
        level = k + 1
    return level, t1


def _twin(pdf, steps, horizon=None):
    out = {}
    for u, g in pdf.groupby("user_id"):
        times = [
            sorted(g.loc[g["event_type"] == s, "t"].tolist()) for s in steps
        ]
        if not any(times):
            continue
        out[u] = _twin_level(times, horizon)
    return out


def _rand_events(seed=3, n=4000, users=40):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n),
            "t": np.round(rng.random(n) * 1e4, 3),
            "event_type": rng.choice(
                ["view", "click", "purchase", "noise"], n,
                p=[0.4, 0.25, 0.1, 0.25],
            ),
        }
    )


@pytest.mark.parametrize("horizon", [None, 500.0])
def test_matches_chained_min_twin(spark, horizon):
    pdf = _rand_events()
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: (r["level"], r["t1"])
        for r in funnel_levels(
            spark.createDataFrame(pdf),
            "user_id",
            "t",
            "event_type",
            steps,
            horizon_s=horizon,
        ).collect()
    }
    exp = _twin(pdf, steps, horizon)
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0], u
        assert got[u][1] == (
            pytest.approx(exp[u][1]) if exp[u][1] is not None else None
        )
    assert max(v[0] for v in got.values()) == 3  # someone converts
    # horizon strictly tightens
    if horizon is not None:
        loose = _twin(pdf, steps, None)
        assert all(exp[u][0] <= loose[u][0] for u in exp)
        assert any(exp[u][0] < loose[u][0] for u in exp)


def test_order_and_horizon_cases(spark):
    steps = ["a", "b"]
    rows = [
        # u1: b before a only -> level 1 (b not after a)
        (1, 10.0, "b"), (1, 20.0, "a"),
        # u2: a then b -> 2
        (2, 10.0, "a"), (2, 11.0, "b"),
        # u3: simultaneous a and b -> strict 'after' rejects b
        (3, 10.0, "a"), (3, 10.0, "b"),
        # u4: b beyond horizon of FIRST a (greedy anchors at t=10)
        (4, 10.0, "a"), (4, 100.0, "a"), (4, 140.0, "b"),
        # u5: only noise -> absent entirely
        (5, 10.0, "noise"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "t", "event_type"])
    got = {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            spark.createDataFrame(pdf), "user_id", "t", "event_type",
            steps, horizon_s=50.0,
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}
    # report arithmetic: cumulative >= counts with step names
    levels = funnel_levels(
        spark.createDataFrame(pdf), "user_id", "t", "event_type", steps,
        horizon_s=50.0,
    )
    rep = funnel_report(levels, steps).collect()
    assert [(r["step_idx"], r["step"], r["users"]) for r in rep] == [
        (1, "a", 4),
        (2, "b", 1),
    ]


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            ev, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], horizon_s=86400.0,
        ).collect()
    }
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH e AS (SELECT user_id, epoch(ts) AS t, event_type
                   FROM '{sf}/events.parquet'
                   WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        s1 AS (SELECT user_id, min(t) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND t > t1
                 AND t <= t1 + 86400.0 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
               JOIN s1 USING (user_id)
               WHERE event_type = 'purchase' AND t > t2
                 AND t <= t1 + 86400.0 GROUP BY 1),
        base AS (SELECT DISTINCT user_id FROM e
                 WHERE event_type IN ('view', 'click', 'purchase'))
        SELECT base.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    WHEN s1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS level
        FROM base LEFT JOIN s1 USING (user_id)
                  LEFT JOIN s2 USING (user_id)
                  LEFT JOIN s3 USING (user_id)
        """
    ).df()
    exp_map = dict(zip(exp["user_id"], exp["level"]))
    assert got == exp_map and len(got) > 5
