"""Last-N point-in-time history features: pandas twin over random bursty
streams, timestamp-tie semantics, strict (label-safe) mode, NULL value
retention, empty histories, explode_history alignment, and DuckDB parity
on the real NTZ events parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.history import explode_history, history_features


def _twin(probes, events, n, exact=True):
    out = {}
    for p in probes.itertuples(index=False):
        ev = events[events["k"] == p.k]
        ev = ev[ev["t"] <= p.t] if exact else ev[ev["t"] < p.t]
        ev = ev.sort_values(["t", "seq"], ascending=False).head(n)
        out[p.pid] = [
            None if pd.isna(v) else round(float(v), 6)
            for v in ev["v"].tolist()
        ]
    return out


def _mk(seed=11, n_ev=400, n_pr=120):
    rng = np.random.default_rng(seed)
    ev = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_ev),
            # coarse grid -> plenty of exact timestamp ties
            "t": rng.integers(0, 60, n_ev).astype("float64"),
            "seq": np.arange(n_ev, dtype=np.int64),
            "v": np.round(rng.random(n_ev), 4),
        }
    )
    # NULLs are real positions (object dtype so Spark gets NULL, not NaN)
    ev["v"] = ev["v"].astype(object).where(ev["seq"] % 7 != 0, None)
    pr = pd.DataFrame(
        {
            "pid": np.arange(n_pr, dtype=np.int64),
            "k": rng.integers(0, 6, n_pr),  # key 5: no events at all
            "t": rng.integers(0, 70, n_pr).astype("float64"),
        }
    )
    return ev, pr


def _got(spark, ev, pr, n, **kw):
    out = history_features(
        spark.createDataFrame(pr),
        spark.createDataFrame(ev),
        "k",
        probe_ts="t",
        value_cols=["v"],
        n=n,
        seq_col="seq",
        **kw,
    ).collect()
    return {
        r["pid"]: (
            [None if x is None else round(x, 6) for x in r["hist_v"]],
            r["hist_n"],
        )
        for r in out
    }


def test_matches_twin_with_ties_and_nulls(spark):
    ev, pr = _mk()
    got = _got(spark, ev, pr, 5)
    exp = _twin(pr, ev, 5)
    assert set(got) == set(exp)
    for pid in exp:
        assert got[pid][0] == exp[pid], pid
        assert got[pid][1] == len(exp[pid])
    # entities with no events at all -> empty arrays, count 0
    empties = pr[pr["k"] == 5]["pid"]
    assert len(empties) > 0
    for pid in empties:
        assert got[pid] == ([], 0)


def test_strict_mode_excludes_exact_timestamp(spark):
    ev, pr = _mk(seed=3)
    got = _got(spark, ev, pr, 4, allow_exact_matches=False)
    exp = _twin(pr, ev, 4, exact=False)
    for pid in exp:
        assert got[pid][0] == exp[pid], pid


def test_partition_invariance(spark):
    ev, pr = _mk(seed=8)
    a = _got(spark, ev, pr, 3)
    evs = spark.createDataFrame(ev).repartition(13)
    b = {
        r["pid"]: (
            [None if x is None else round(x, 6) for x in r["hist_v"]],
            r["hist_n"],
        )
        for r in history_features(
            spark.createDataFrame(pr).repartition(7),
            evs,
            "k",
            probe_ts="t",
            value_cols=["v"],
            n=3,
            seq_col="seq",
        ).collect()
    }
    assert a == b


def test_multi_value_columns_stay_aligned_and_explode(spark):
    ev, pr = _mk(seed=5, n_ev=200, n_pr=40)
    ev["w"] = ev["seq"].astype("float64")  # second payload, never null
    out = history_features(
        spark.createDataFrame(pr),
        spark.createDataFrame(ev),
        "k",
        probe_ts="t",
        value_cols=["v", "w"],
        n=4,
        seq_col="seq",
    )
    rows = out.collect()
    wmap = dict(zip(ev["seq"].astype(int), ev["v"]))
    for r in rows:
        assert len(r["hist_v"]) == len(r["hist_w"]) == r["hist_n"]
        for v, w in zip(r["hist_v"], r["hist_w"]):
            # w encodes the seq -> v must be THAT event's value (positional
            # alignment across columns, including NULL v positions)
            exp_v = wmap[int(w)]
            if pd.isna(exp_v):
                assert v is None
            else:
                assert round(v, 6) == round(float(exp_v), 6)
    flat = explode_history(
        out, ["hist_v", "hist_w"], keep_cols=["pid"]
    ).collect()
    assert all(fr["pos"] >= 1 for fr in flat)
    nn = {(r["pid"], i + 1): (v, w)
          for r in rows
          for i, (v, w) in enumerate(zip(r["hist_v"], r["hist_w"]))}
    got = {(fr["pid"], fr["pos"]): (fr["hist_v"], fr["hist_w"]) for fr in flat}
    assert got == nn


def test_validation(spark):
    ev, pr = _mk(seed=2, n_ev=20, n_pr=5)
    with pytest.raises(ValueError, match="n must be"):
        history_features(
            spark.createDataFrame(pr), spark.createDataFrame(ev), "k",
            probe_ts="t", value_cols="v", n=0,
        )
    with pytest.raises(ValueError, match="missing columns"):
        history_features(
            spark.createDataFrame(pr), spark.createDataFrame(ev), "k",
            probe_ts="t", value_cols="nope", n=3,
        )


def test_duckdb_parity_on_real_ntz_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    probes = ev.where("event_id % 10 = 3").select(
        "event_id", "user_id", F.col("ts").alias("fts")
    )
    out = history_features(
        probes,
        ev.select("user_id", "ts", "event_id", "value"),
        "user_id",
        probe_ts="fts",
        event_ts="ts",
        value_cols=["value"],
        n=5,
        seq_col="event_id",
    )
    flat = explode_history(
        out, ["hist_value"], keep_cols=["event_id"]
    )
    got = sorted(
        (
            r["event_id"],
            r["pos"],
            None if r["hist_value"] is None else round(r["hist_value"], 6),
        )
        for r in flat.collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = sorted(
        (r[0], r[1], None if r[2] is None else round(r[2], 6))
        for r in con.sql(
            """
            WITH pr AS (SELECT event_id, user_id, ts FROM events
                        WHERE event_id % 10 = 3),
            m AS (SELECT p.event_id, e.value,
                         row_number() OVER (
                             PARTITION BY p.event_id
                             ORDER BY e.ts DESC, e.event_id DESC) AS pos
                  FROM pr p JOIN events e
                    ON p.user_id = e.user_id AND e.ts <= p.ts)
            SELECT event_id, CAST(pos AS BIGINT) AS pos, value
            FROM m WHERE pos <= 5
            """
        ).fetchall()
    )
    assert got == exp
