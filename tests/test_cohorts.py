"""Cohort retention: pandas twin on random streams, offset-0 identity,
max_offset truncation, real-parquet drive vs a DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.cohorts import cohort_retention


def _twin(pdf, period_s):
    p = (pdf["t"] // period_s).astype(int)
    d = pd.DataFrame({"user": pdf["user_id"], "period": p}).drop_duplicates()
    first = d.groupby("user")["period"].min().rename("cohort")
    d = d.join(first, on="user")
    d["offset"] = d["period"] - d["cohort"]
    tri = (
        d.groupby(["cohort", "offset"])
        .size()
        .rename("users")
        .reset_index()
    )
    sizes = tri[tri["offset"] == 0].set_index("cohort")["users"]
    tri["cohort_size"] = tri["cohort"].map(sizes)
    tri["retention"] = tri["users"] / tri["cohort_size"]
    return {
        (r.cohort, r.offset): (r.users, r.cohort_size, round(r.retention, 10))
        for r in tri.itertuples(index=False)
    }


def test_matches_pandas_twin(spark):
    rng = np.random.default_rng(19)
    n = 6000
    users = rng.integers(0, 80, n)
    # staggered arrivals so cohorts actually differ (uniform activity
    # would put every user in cohort 0)
    start = rng.random(80) * 30 * 86400
    span = rng.random(80) * 20 * 86400
    u = rng.random(n)
    pdf = pd.DataFrame(
        {
            "user_id": users,
            "t": np.round(start[users] + u * span[users], 3),
        }
    )
    got = {
        (r["cohort"], r["offset"]): (
            r["users"],
            r["cohort_size"],
            round(r["retention"], 10),
        )
        for r in cohort_retention(
            spark.createDataFrame(pdf), "user_id", "t",
            period_s=7 * 86400.0,
        ).collect()
    }
    assert got == _twin(pdf, 7 * 86400.0)
    # offset 0 rows are the identity diagonal
    for (c, o), (u, cs, r) in got.items():
        if o == 0:
            assert u == cs and r == 1.0
    assert len({c for c, _ in got}) >= 5  # several cohorts exist


def test_max_offset_and_validation(spark):
    pdf = pd.DataFrame(
        {"user_id": [1, 1, 1, 2], "t": [0.0, 100.0, 200.0, 100.0]}
    )
    rows = cohort_retention(
        spark.createDataFrame(pdf), "user_id", "t", period_s=100.0,
        max_offset=1,
    ).collect()
    assert max(r["offset"] for r in rows) == 1
    with pytest.raises(ValueError, match="period_s"):
        cohort_retention(
            spark.createDataFrame(pdf), "user_id", "t", period_s=0
        )


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(
        (
            r["cohort"],
            r["offset"],
            r["users"],
            r["cohort_size"],
            round(r["retention"], 6),
        )
        for r in cohort_retention(
            ev, "user_id", "ts", period_s=7 * 86400.0
        ).collect()
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH up AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS period
          FROM '{sf}/events.parquet'
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        f AS (SELECT user_id, min(period) AS cohort FROM up GROUP BY 1),
        tri AS (SELECT f.cohort, up.period - f.cohort AS "offset",
                       count(*) AS users
                FROM up JOIN f USING (user_id) GROUP BY 1, 2),
        sz AS (SELECT cohort, users AS cohort_size FROM tri
               WHERE "offset" = 0)
        SELECT tri.cohort, tri."offset", tri.users, sz.cohort_size,
               round(tri.users * 1.0 / sz.cohort_size, 6) AS retention
        FROM tri JOIN sz USING (cohort)
        """
    ).df()
    exp_rows = sorted(
        (
            int(r.cohort),
            int(r.offset),
            int(r.users),
            int(r.cohort_size),
            float(r.retention),
        )
        for r in exp.itertuples(index=False)
    )
    assert got == exp_rows and len(got) > 3
