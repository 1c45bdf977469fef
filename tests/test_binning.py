"""Exact equal-frequency binning/quantiles: DuckDB arithmetic parity,
tie coherence, near-equal bin mass, numpy type-1 quantile parity,
partitioning independence, the float-precision contract."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from modlyn_spark.operators.binning import (
    exact_quantiles,
    quantile_bin_summary,
    quantile_bins,
    robust_scale,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_bins_match_duckdb_arithmetic(spark):
    k = 8
    got = {
        r["o_orderkey"]: r["o_totalprice_bin"]
        for r in quantile_bins(
            _orders(spark), "o_totalprice", k, precision=2
        )
        .select("o_orderkey", "o_totalprice_bin")
        .collect()
    }
    exp = dict(
        duckdb.sql(
            f"""
            WITH t AS (SELECT o_orderkey, round(o_totalprice, 2) AS v
                       FROM '{SF}/orders.parquet'),
            h AS (SELECT v, count(*) AS c FROM t WHERE v IS NOT NULL GROUP BY v),
            w AS (SELECT v, sum(c) OVER (ORDER BY v) - c AS a,
                         sum(c) OVER () AS n FROM h)
            SELECT t.o_orderkey, (w.a * {k}) // w.n
            FROM t JOIN w USING (v)
            """
        ).fetchall()
    )
    assert got == exp and len(got) > 100


def test_ties_never_straddle_and_mass_near_equal(spark):
    k = 5
    out = quantile_bins(
        _orders(spark), "o_custkey", k, out_col="b"
    )  # heavily tied int column
    rows = out.groupBy("o_custkey", "b").count().collect()
    seen = {}
    for r in rows:
        seen.setdefault(r["o_custkey"], set()).add(r["b"])
    assert all(len(s) == 1 for s in seen.values())  # tie-coherent

    cont = quantile_bins(_orders(spark), "o_totalprice", k, precision=2)
    counts = [
        r["count"]
        for r in cont.groupBy("o_totalprice_bin").count().collect()
    ]
    n = sum(counts)
    assert len(counts) == k
    assert max(counts) - min(counts) <= 0.05 * n / k + 2  # near-equal mass


def test_bin_summary_consistent(spark):
    k = 6
    s = {
        r["bin"]: r
        for r in quantile_bin_summary(
            _orders(spark), "o_totalprice", k, precision=2
        ).collect()
    }
    assert set(s) == set(range(k))
    # contiguous, ordered, disjoint ranges; row counts sum to n
    n = _orders(spark).count()
    assert sum(r["n_rows"] for r in s.values()) == n
    for b in range(k - 1):
        assert s[b]["hi"] < s[b + 1]["lo"]


def test_exact_quantiles_match_numpy_type1(spark):
    vals = np.array(
        [
            r["o_totalprice"]
            for r in _orders(spark).select("o_totalprice").collect()
        ]
    ).round(2)
    got = {
        r["p"]: r["q"]
        for r in exact_quantiles(
            _orders(spark), "o_totalprice", [0.0, 0.25, 0.5, 0.75, 0.99],
            precision=2,
        ).collect()
    }
    for p, q in got.items():
        exp = np.quantile(vals, p, method="inverted_cdf")
        assert q == pytest.approx(float(exp)), p


def test_robust_scale_and_zero_iqr(spark):
    out = robust_scale(_orders(spark), "o_totalprice", precision=2)
    pdf = out.select("o_totalprice", "o_totalprice_robust").toPandas()
    med = np.quantile(
        pdf["o_totalprice"].round(2), 0.5, method="inverted_cdf"
    )
    iqr = np.quantile(
        pdf["o_totalprice"].round(2), 0.75, method="inverted_cdf"
    ) - np.quantile(pdf["o_totalprice"].round(2), 0.25, method="inverted_cdf")
    np.testing.assert_allclose(
        pdf["o_totalprice_robust"], (pdf["o_totalprice"] - med) / iqr
    )
    # constant column -> NULL, not a blow-up
    const = _orders(spark).selectExpr("o_orderkey", "1.5 AS c")
    r = robust_scale(const, "c", precision=2)
    assert r.where("c_robust IS NOT NULL").count() == 0


def test_partitioning_independence_and_float_contract(spark):
    o = _orders(spark)
    a = {
        r["o_orderkey"]: r["o_totalprice_bin"]
        for r in quantile_bins(o.repartition(13), "o_totalprice", 4, precision=2)
        .select("o_orderkey", "o_totalprice_bin").collect()
    }
    b = {
        r["o_orderkey"]: r["o_totalprice_bin"]
        for r in quantile_bins(o.coalesce(1), "o_totalprice", 4, precision=2)
        .select("o_orderkey", "o_totalprice_bin").collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="precision"):
        quantile_bins(o, "o_totalprice", 4)  # double without precision
    with pytest.raises(ValueError):
        quantile_bins(o, "o_totalprice", 1, precision=2)
