"""Interval (range) join: brute-force twin over all closed modes,
bucket-width invariance, left mode, NULL/inverted intervals, the
intervalize == as-of equivalence property on the REAL events parquet
(NTZ timestamps), and the no-nested-loop plan assertion."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.ranges import interval_join, intervalize


def _mk(spark, seed=5, n_pts=300, n_iv=80):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts, dtype=np.int64),
            "k": rng.integers(0, 4, n_pts),
            "x": np.round(rng.random(n_pts) * 100, 3),
        }
    )
    lo = np.round(rng.random(n_iv) * 95, 3)
    length = np.round(rng.exponential(4, n_iv), 3)
    iv = pd.DataFrame(
        {
            "iid": np.arange(n_iv, dtype=np.int64),
            "k": rng.integers(0, 4, n_iv),
            "lo": lo,
            "hi": np.round(lo + length, 3),
            "tag": [f"t{i}" for i in range(n_iv)],
        }
    )
    return pts, iv


def _twin(pts, iv, closed, keyed=True):
    out = []
    for p in pts.itertuples(index=False):
        for r in iv.itertuples(index=False):
            if keyed and p.k != r.k:
                continue
            lo_ok = p.x > r.lo if closed in ("right", "neither") else p.x >= r.lo
            hi_ok = p.x < r.hi if closed in ("left", "neither") else p.x <= r.hi
            if lo_ok and hi_ok:
                out.append((p.pid, r.iid))
    return sorted(out)


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_matches_brute_force_all_modes(spark, closed):
    pts, iv = _mk(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            point_col="x",
            lo_col="lo",
            hi_col="hi",
            on="k",
            closed=closed,
        ).collect()
    )
    assert got == _twin(pts, iv, closed)
    assert len(got) > 0


def test_bucket_width_invariance_and_unkeyed(spark):
    pts, iv = _mk(spark, seed=9)
    exp = _twin(pts, iv, "both", keyed=False)
    for w in (0.5, 3.0, 50.0, None):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                spark.createDataFrame(pts.drop(columns=["k"])),
                spark.createDataFrame(iv.drop(columns=["k"])),
                point_col="x",
                lo_col="lo",
                hi_col="hi",
                bucket_width=w,
            ).collect()
        )
        assert got == exp


def test_left_mode_and_null_inverted_intervals(spark):
    pts = pd.DataFrame(
        {"pid": [1, 2, 3], "x": [5.0, 50.0, None]}
    )
    iv = pd.DataFrame(
        {
            "iid": [10, 11, 12],
            "lo": [4.0, 60.0, 8.0],
            "hi": [6.0, None, 2.0],  # 11: NULL bound; 12: inverted
            "tag": ["a", "b", "c"],
        }
    )
    rows = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point_col="x",
        lo_col="lo",
        hi_col="hi",
        how="left",
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r)
    assert [r["iid"] for r in by_pid[1]] == [10]
    assert [r["iid"] for r in by_pid[2]] == [None]  # 11 dropped (NULL hi)
    assert [r["iid"] for r in by_pid[3]] == [None]  # NULL point unmatched
    assert len(rows) == 3


def test_intervalize_equals_asof_on_real_events(spark):
    # validity-interval join over the SCD2 construction == as-of join:
    # each order matches its user's latest state at order time
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").where(
        F.col("ts").isNotNull()
    )
    history = (
        ev.where(F.col("event_id") % 2 == 0)
        .select("user_id", "ts", F.col("value").alias("state_value"))
        .dropDuplicates(["user_id", "ts"])
    )
    pts = ev.where(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", F.col("ts").alias("pt_ts")
    )
    cap = history.agg(F.max("ts")).collect()[0][0]
    iv = intervalize(history, "user_id", "ts", end_cap=cap)
    got = interval_join(
        pts,
        iv,
        point_col="pt_ts",
        lo_col="valid_from",
        hi_col="valid_to",
        on="user_id",
        closed="left",
    ).select("event_id", "state_value")
    # twin: pandas merge_asof per user; allow_exact_matches + strictly
    # earlier successor matches closed='left' on [ts_i, ts_{i+1})
    ep = history.toPandas().sort_values("ts")
    op = pts.toPandas().sort_values("pt_ts")
    exp = pd.merge_asof(
        op,
        ep.rename(columns={"ts": "pt_ts"}),
        on="pt_ts",
        by="user_id",
    )
    # the validity cap: points at/after the last state's ts fall outside
    # its [ts, cap) interval only when pt_ts >= cap
    exp = exp[exp["pt_ts"] < cap]
    gp = got.toPandas()
    merged = exp.merge(
        gp, on="event_id", how="outer", suffixes=("_exp", "_got")
    )
    both = merged.dropna(subset=["state_value_exp", "state_value_got"])
    assert len(both) > 200
    assert (both["state_value_exp"] == both["state_value_got"]).all()
    # inner-join misses are exactly the no-prior-state points
    only_exp = merged[merged["state_value_got"].isna()]
    assert only_exp["state_value_exp"].isna().all()


def test_zero_length_intervals_epoch_scale_width(spark):
    """All-zero-length intervals (instantaneous states) at epoch-seconds
    magnitude: the auto bucket width must scale to the DATA span, not a
    1e-9 epsilon (whose floor(t/1e-9) ids are ~1e18 — long-overflow
    territory and degenerate bucketing). Exact point-on-point matches
    still join."""
    base = 1_755_000_000.0  # epoch-seconds magnitude
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": [0, 1, 2],
                "lo": [base, base + 1000.0, base + 5000.0],
                "hi": [base, base + 1000.0, base + 5000.0],
            }
        )
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [10, 11, 12],
                "x": [base, base + 1000.0, base + 999.0],
            }
        )
    )
    out = interval_join(
        pts, iv, point_col="x", lo_col="lo", hi_col="hi"
    ).select("pid", "iid")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(10, 0), (11, 1)]


def test_no_nested_loop_in_plan(spark):
    pts, iv = _mk(spark)
    out = interval_join(
        spark.createDataFrame(pts.drop(columns=["k"])),
        spark.createDataFrame(iv.drop(columns=["k"])),
        point_col="x",
        lo_col="lo",
        hi_col="hi",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "__bucket" in plan  # the equi key carrying the join


def test_validation(spark):
    pts, iv = _mk(spark)
    p, i = spark.createDataFrame(pts), spark.createDataFrame(iv)
    with pytest.raises(ValueError, match="clash"):
        interval_join(
            p.withColumnRenamed("x", "lo"), i,
            point_col="lo", lo_col="lo", hi_col="hi",
        )
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(
            p, i, point_col="x", lo_col="lo", hi_col="hi", on="k",
            bucket_width=0,
        )
    with pytest.raises(ValueError, match="end_cap"):
        intervalize(i, "k", "lo")