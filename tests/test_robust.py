"""MAD outliers: numpy twin parity (np.median is type-7 at q=0.5),
planted-outlier recall, zero-MAD contracts, NULL handling, partition
invariance, DuckDB quantile_cont parity of the medians."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.robust import MAD_SIGMA, mad_outliers


def _pdf():
    rng = np.random.RandomState(4)
    rows = []
    for g in range(4):
        vals = rng.normal(10 * g, 1 + g, size=40)
        for x in vals:
            rows.append({"g": f"g{g}", "v": float(x)})
        rows.append({"g": f"g{g}", "v": float(10 * g + 50.0)})  # planted
    rows += [{"g": "const", "v": 5.0}] * 9 + [{"g": "const", "v": 99.0}]
    rows.append({"g": "g0", "v": None})
    return pd.DataFrame(rows)


def test_twin_parity_and_planted_recall(spark):
    pdf = _pdf()
    got = mad_outliers(spark.createDataFrame(pdf), "g", "v").toPandas()
    for g, grp in pdf.dropna().groupby("g"):
        x = grp["v"].to_numpy()
        med = np.median(x)
        mad = np.median(np.abs(x - med))
        sub = got[(got["g"] == g) & got["v"].notna()]
        if mad > 0:
            z = (sub["v"].to_numpy() - med) / (mad * MAD_SIGMA)
            np.testing.assert_allclose(
                sub["robust_z"].to_numpy(float), z, rtol=1e-9
            )
            assert (sub["is_outlier"] == (np.abs(z) > 3.5)).all()
    # every planted point flagged
    for g in range(4):
        planted = got[(got["g"] == f"g{g}") & (got["v"] == 10 * g + 50.0)]
        assert planted["is_outlier"].all()
    # gaussian bulk mostly unflagged
    bulk = got[got["g"].str.startswith("g") & got["v"].notna()]
    assert bulk["is_outlier"].mean() < 0.1


def test_zero_mad_contract(spark):
    pdf = _pdf()
    df = spark.createDataFrame(pdf)
    got = mad_outliers(df, "g", "v").toPandas()
    const = got[got["g"] == "const"]
    # median 5, MAD 0: the 99.0 row deviates -> flagged, score NULL
    assert const[const["v"] == 99.0]["is_outlier"].all()
    assert const[const["v"] == 5.0]["is_outlier"].eq(False).all()
    assert const["robust_z"].isna().all()
    off = mad_outliers(df, "g", "v", flag_zero_mad=False).toPandas()
    assert off[off["g"] == "const"]["is_outlier"].eq(False).all()


def test_null_values(spark):
    got = mad_outliers(spark.createDataFrame(_pdf()), "g", "v").toPandas()
    nul = got[got["v"].isna()]
    assert len(nul) == 1
    assert nul["robust_z"].isna().all()
    assert nul["is_outlier"].eq(False).all()


def test_partition_invariance(spark):
    pdf = _pdf()
    outs = []
    for p in (1, 7):
        outs.append(
            mad_outliers(spark.createDataFrame(pdf).repartition(p), "g", "v")
            .toPandas()
            .sort_values(["g", "v"])
            .reset_index(drop=True)
        )
    a, b = outs
    assert (a["is_outlier"] == b["is_outlier"]).all()
    np.testing.assert_allclose(
        a["robust_z"].to_numpy(float), b["robust_z"].to_numpy(float),
        rtol=1e-12, equal_nan=True,
    )


def test_duckdb_median_parity(spark):
    import duckdb

    pdf = _pdf().dropna()
    got = (
        mad_outliers(spark.createDataFrame(pdf), "g", "v")
        .select("g", "robust_z", "v")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql("""
        WITH med AS (SELECT g, quantile_cont(v, 0.5) AS m FROM t GROUP BY 1),
        mad AS (SELECT t.g, quantile_cont(abs(v - m), 0.5) AS d
                FROM t JOIN med USING (g) GROUP BY 1)
        SELECT t.g, t.v, (t.v - m) / (d * 1.4826022185056018) AS z
        FROM t JOIN med USING (g) JOIN mad USING (g) WHERE d > 0
    """).df()
    g = got[got["robust_z"].notna()].sort_values(["g", "v"]).reset_index(drop=True)
    w = want.sort_values(["g", "v"]).reset_index(drop=True)
    assert len(g) == len(w)
    np.testing.assert_allclose(
        g["robust_z"].to_numpy(float), w["z"].to_numpy(float), rtol=1e-12
    )


def test_validation(spark):
    df = spark.createDataFrame(_pdf())
    with pytest.raises(ValueError, match="k must be"):
        mad_outliers(df, "g", "v", k=0)
