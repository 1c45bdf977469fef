"""Welch A/B test: numpy twin (textbook formulae), null-metric
exclusion, degenerate guards, A/A sanity, DuckDB parity on real
events."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.abtest import welch_ab_test


def _twin(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, df


def test_matches_textbook_twin_and_aa(spark):
    rng = np.random.default_rng(29)
    n = 2000
    g = rng.choice(["control", "t1", "t2"], n)
    x = rng.normal(0, 1, n) + 0.2 * (g == "t1") + 0.5 * (g == "t2")
    y = rng.exponential(2, n) * (1 + 0.3 * (g == "t1"))
    pdf = pd.DataFrame({"g": g, "x": x, "y": y})
    rows = welch_ab_test(
        spark.createDataFrame(pdf), "g", ["x", "y"], control="control"
    ).collect()
    assert len(rows) == 4  # 2 groups x 2 metrics
    for r in rows:
        a = pdf.loc[pdf["g"] == r["group"], r["metric"]]
        b = pdf.loc[pdf["g"] == "control", r["metric"]]
        t, df = _twin(a, b)
        assert r["t"] == pytest.approx(t, rel=1e-10)
        assert r["df"] == pytest.approx(df, rel=1e-10)
        assert r["n_t"] == len(a) and r["n_c"] == len(b)
        assert r["mean_t"] == pytest.approx(a.mean())
        assert r["lift"] == pytest.approx(
            (a.mean() - b.mean()) / b.mean()
        )
    # planted effects are detected with the right signs
    by = {(r["group"], r["metric"]): r["t"] for r in rows}
    assert by[("t2", "x")] > by[("t1", "x")] > 2
    assert by[("t1", "y")] > 2
    # A/A: split control randomly -> |t| small almost surely
    pdf2 = pdf[pdf["g"] == "control"].copy()
    pdf2["g"] = np.where(rng.random(len(pdf2)) < 0.5, "a", "control")
    r2 = welch_ab_test(
        spark.createDataFrame(pdf2), "g", "x", control="control"
    ).collect()[0]
    assert abs(r2["t"]) < 3


def test_nulls_and_degenerate_groups(spark):
    pdf = pd.DataFrame(
        {
            "g": ["c", "c", "c", "t", "t", "t", "solo"],
            "x": [1.0, 2.0, None, 4.0, 5.0, 6.0, 1.0],
        }
    )
    rows = {
        r["group"]: r
        for r in welch_ab_test(
            spark.createDataFrame(pdf), "g", "x", control="c"
        ).collect()
    }
    # NULL metric excluded from n/mean
    assert rows["t"]["n_c"] == 2 and rows["t"]["mean_c"] == pytest.approx(1.5)
    t, df = _twin([4.0, 5.0, 6.0], [1.0, 2.0])
    assert rows["t"]["t"] == pytest.approx(t)
    assert rows["t"]["df"] == pytest.approx(df)
    # single-row group -> NULL t/df, row still present
    assert rows["solo"]["t"] is None and rows["solo"]["df"] is None
    with pytest.raises(ValueError, match="non-empty"):
        welch_ab_test(spark.createDataFrame(pdf), "g", [], control="c")


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(
        (r["group"], round(r["t"], 8), round(r["df"], 6), r["n_t"])
        for r in welch_ab_test(
            ev, "event_type", "value", control="view"
        ).collect()
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH per AS (
          SELECT event_type AS g, count(value) AS n, avg(value) AS m,
                 var_samp(value) AS v
          FROM '{sf}/events.parquet'
          WHERE event_type IS NOT NULL GROUP BY 1),
        c AS (SELECT n AS nc, m AS mc, v AS vc FROM per
              WHERE g = 'view')
        SELECT per.g,
               round((per.m - c.mc)
                     / sqrt(per.v / per.n + c.vc / c.nc), 8) AS t,
               round(pow(per.v / per.n + c.vc / c.nc, 2)
                     / (pow(per.v / per.n, 2) / (per.n - 1)
                        + pow(c.vc / c.nc, 2) / (c.nc - 1)), 6) AS df,
               per.n
        FROM per, c WHERE per.g <> 'view'
        """
    ).df()
    exp_rows = sorted(
        (r.g, float(r.t), float(r.df), int(r.n))
        for r in exp.itertuples(index=False)
    )
    assert got == exp_rows and len(got) == 4


# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------


def _u_hash(key: str) -> float:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2 ** 32


def _poisson_w(u: float) -> int:
    from modlyn_spark.scoring.abtest import _POISSON1_CDF

    for k, c in enumerate(_POISSON1_CDF):
        if u < c:
            return k
    return len(_POISSON1_CDF)


def test_bootstrap_ci_matches_hash_twin(spark):
    """Replicate means (hence the CI endpoints) equal the single-node
    hashlib twin exactly — the draw is a pure function, not an RNG."""
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.abtest import bootstrap_ci

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "id": np.arange(500),
            "g": np.where(np.arange(500) % 2 == 0, "a", "b"),
            "v": rng.normal(10, 2, 500).round(3),
        }
    )
    df = spark.createDataFrame(pdf)
    B = 64
    got = {
        r["g"]: (r["mean"], r["ci_lo"], r["ci_hi"])
        for r in bootstrap_ci(df, "v", "g", "id", b=B, seed=1).collect()
    }

    for g, sub in pdf.groupby("g"):
        mbs = []
        for r in range(B):
            ws = np.array(
                [_poisson_w(_u_hash(f"{i}|{r}|1")) for i in sub["id"]],
                dtype=float,
            )
            mbs.append(
                (ws * sub["v"].to_numpy()).sum() / ws.sum()
                if ws.sum() > 0 else np.nan
            )
        mbs = np.array(mbs)
        lo, hi = np.quantile(mbs, [0.025, 0.975])  # type-7, like both engines
        assert got[g][0] == pytest.approx(round(sub["v"].mean(), 6), abs=1e-9)
        assert got[g][1] == pytest.approx(lo, abs=1e-6)
        assert got[g][2] == pytest.approx(hi, abs=1e-6)
        # sanity: the CI brackets the point estimate
        assert got[g][1] <= got[g][0] <= got[g][2]


def test_bootstrap_ci_duckdb_parity_on_real_events(spark):
    import duckdb

    from modlyn_spark.scoring.abtest import bootstrap_ci, duckdb_bootstrap_sql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        bootstrap_ci(ev, "value", "event_type", "event_id", b=50, seed=2)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    want = (
        con.sql(
            duckdb_bootstrap_sql(
                "events", "value", ["event_type"],
                "CAST(event_id AS VARCHAR)", b=50, seed=2,
            )
        )
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("mean", "ci_lo", "ci_hi"):
        assert got[c].to_numpy() == pytest.approx(
            want[c].to_numpy(), abs=1e-9
        ), c


def test_bootstrap_ci_partitioning_invariant_and_validation(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.abtest import bootstrap_ci

    pdf = pd.DataFrame(
        {"id": np.arange(100), "g": "x", "v": np.arange(100, dtype=float)}
    )
    a = sorted(map(tuple, bootstrap_ci(
        spark.createDataFrame(pdf).repartition(1), "v", "g", "id", b=32
    ).collect()))
    c = sorted(map(tuple, bootstrap_ci(
        spark.createDataFrame(pdf).repartition(11), "v", "g", "id", b=32
    ).collect()))
    assert a == c
    with pytest.raises(ValueError):
        bootstrap_ci(spark.createDataFrame(pdf), "v", "g", "id", b=1)
    with pytest.raises(ValueError):
        bootstrap_ci(spark.createDataFrame(pdf), "v", "g", "id", alpha=0.0)


def test_bootstrap_lift_ci_duckdb_parity_and_semantics(spark):
    import duckdb
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.abtest import (
        bootstrap_lift_ci,
        duckdb_lift_sql,
    )

    rng = np.random.default_rng(9)
    n = 900
    g = rng.choice(["control", "t1", "t2"], n)
    v = rng.normal(10, 2, n)
    v[g == "t1"] += 1.0   # real lift
    pdf = pd.DataFrame({"id": np.arange(n), "g": g, "v": v.round(3)})
    df = spark.createDataFrame(pdf)
    got = (
        bootstrap_lift_ci(df, "v", "g", "id", control="control", b=64,
                          seed=4)
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = (
        con.sql(
            duckdb_lift_sql("t", "v", "g", "CAST(id AS VARCHAR)",
                            control="control", b=64, seed=4)
        )
        .df()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(got["g"]) == list(want["g"]) == ["t1", "t2"]
    for c in ("lift", "lift_lo", "lift_hi", "rel_lift", "rel_lo", "rel_hi"):
        assert got[c].to_numpy() == pytest.approx(
            want[c].to_numpy(), abs=1e-9
        ), c
    # semantics: the planted +1 lift is detected (CI excludes 0), the
    # null group's CI straddles 0, and intervals bracket the point
    r = got.set_index("g")
    assert r.loc["t1", "lift_lo"] > 0
    assert r.loc["t2", "lift_lo"] < 0 < r.loc["t2", "lift_hi"]
    for gg in ("t1", "t2"):
        assert r.loc[gg, "lift_lo"] <= r.loc[gg, "lift"] <= r.loc[gg, "lift_hi"]
