"""Resampling: pandas twin (dense grid + fills), gap materialization,
per-column fill policies, span containment, DuckDB parity on real NTZ
events."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.resample import resample


def _twin(pdf, every):
    out = {}
    for k, g in pdf.groupby("k"):
        b = (g["t"] // every).astype(int)
        agg = g.groupby(b)["v"].agg(["mean", "size"])
        lo, hi = b.min(), b.max()
        rows = []
        last = None
        for i in range(lo, hi + 1):
            if i in agg.index:
                m, n = agg.loc[i, "mean"], int(agg.loc[i, "size"])
                last = m
            else:
                m, n = last, 0  # ffill mean, zero-fill count
            rows.append((i * every, m, n))
        out[k] = rows
    return out


def test_matches_twin_with_gaps(spark):
    rng = np.random.default_rng(23)
    n = 500
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n),
            # clumpy times -> real gaps in the bucket grid
            "t": np.round(rng.choice([0, 3, 9, 20], n) * 100
                          + rng.random(n) * 80, 3),
            "v": np.round(rng.random(n), 4),
        }
    )
    got = {}
    rows = resample(
        spark.createDataFrame(pdf),
        "k",
        "t",
        {"v_avg": F.avg("v"), "n": F.count(F.lit(1))},
        every_s=100.0,
        fill={"v_avg": "ffill", "n": "zero"},
    ).collect()
    for r in rows:
        got.setdefault(r["k"], []).append(
            (r["bucket_ts"], r["v_avg"], r["n"])
        )
    exp = _twin(pdf, 100)
    assert set(got) == set(exp)
    for k in exp:
        gs = sorted(got[k])
        assert len(gs) == len(exp[k])
        for (gb, gm, gn), (eb, em, en) in zip(gs, exp[k]):
            assert gb == pytest.approx(eb) and gn == en
            assert gm == pytest.approx(em) if em is not None else gm is None
    # gaps were actually materialized (zero-count rows exist)
    assert any(n == 0 for rs in got.values() for _, _, n in rs)
    # grid stays within each key's own span (no fabricated history)
    for k, g in pdf.groupby("k"):
        b = (g["t"] // 100).astype(int)
        assert min(x for x, _, _ in got[k]) == b.min() * 100
        assert max(x for x, _, _ in got[k]) == b.max() * 100


def test_fill_modes_and_validation(spark):
    pdf = pd.DataFrame(
        {"k": [1, 1], "t": [0.0, 250.0], "v": [2.0, 4.0]}
    )
    df = spark.createDataFrame(pdf)
    rows = {
        r["bucket_ts"]: (r["a"], r["z"], r["nn"])
        for r in resample(
            df,
            "k",
            "t",
            {"a": F.avg("v"), "z": F.avg("v"), "nn": F.avg("v")},
            every_s=100.0,
            fill={"a": "ffill", "z": "zero", "nn": "none"},
        ).collect()
    }
    assert rows[100.0] == (2.0, 0.0, None)  # the gap bucket
    assert rows[0.0] == (2.0, 2.0, 2.0)
    assert rows[200.0] == (4.0, 4.0, 4.0)
    with pytest.raises(ValueError, match="non-empty"):
        resample(df, "k", "t", {}, every_s=100.0)
    with pytest.raises(ValueError, match="bad fill"):
        resample(
            df, "k", "t", {"a": F.avg("v")}, every_s=100.0, fill="bogus"
        )
    with pytest.raises(ValueError, match="every_s"):
        resample(df, "k", "t", {"a": F.avg("v")}, every_s=0)


def test_grid_guard_raises_on_wide_span_key(spark):
    """One long-lived sparse key (two events 5000 buckets apart) trips
    the dense-grid guard with the offending key in the message; the
    explicit None opt-out and a sufficient cap both still compute."""
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "t": [0.0, 5000.0, 10.0],
            "v": [1.0, 2.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    aggs = {"a": F.avg("v")}
    with pytest.raises(Exception, match="max_buckets_per_key"):
        resample(
            df, "k", "t", aggs, every_s=1.0, max_buckets_per_key=1000
        ).collect()
    # the guard message names the widest key
    with pytest.raises(Exception, match=r"key \(1\) spans 5001 buckets"):
        resample(
            df, "k", "t", aggs, every_s=1.0, max_buckets_per_key=1000
        ).collect()
    for kwargs in ({"max_buckets_per_key": None},
                   {"max_buckets_per_key": 6000}, {}):
        n = resample(df, "k", "t", aggs, every_s=1.0, **kwargs).count()
        assert n == 5001 + 1  # key 1 dense span + key 2 single bucket


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(
        (
            r["user_id"],
            round(r["bucket_ts"], 6),
            round(r["v_avg"], 6) if r["v_avg"] is not None else None,
            r["n"],
        )
        for r in resample(
            ev,
            "user_id",
            "ts",
            {"v_avg": F.avg("value"), "n": F.count(F.lit(1))},
            every_s=86400.0,
            fill={"v_avg": "ffill", "n": "zero"},
        ).collect()
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH e AS (SELECT user_id,
                          CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS b,
                          value
                   FROM '{sf}/events.parquet'
                   WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        per AS (SELECT user_id, b, avg(value) AS v, count(*) AS n
                FROM e GROUP BY 1, 2),
        span AS (SELECT user_id, min(b) AS lo, max(b) AS hi
                 FROM per GROUP BY 1),
        grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS b
                 FROM span),
        j AS (SELECT g.user_id, g.b, per.v, per.n
              FROM grid g LEFT JOIN per USING (user_id, b))
        SELECT user_id, b * 86400.0 AS bucket_ts,
               round(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY b
                   ROWS UNBOUNDED PRECEDING), 6) AS v_avg,
               coalesce(n, 0) AS n
        FROM j
        """
    ).df()
    exp_rows = sorted(
        (
            int(r.user_id),
            float(r.bucket_ts),
            float(r.v_avg) if pd.notna(r.v_avg) else None,
            int(r.n),
        )
        for r in exp.itertuples(index=False)
    )
    assert got == exp_rows and len(got) > 20
