"""OLAP reports: pandas twin over all grouping sets, gid bit-order parity
with DuckDB GROUPING() (tested, not assumed), real-NULL vs rolled-up-NULL
disambiguation, single-Expand plan, real-parquet DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.olap import (
    cube_report,
    grouping_sets_report,
    rollup_report,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", None], 300, p=[0.5, 0.4, 0.1]),
            "b": rng.choice(["p", "q"], 300),
            "v": rng.integers(0, 100, 300).astype("int64"),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _twin(pdf, sets, dims):
    """Expected {(dim values with None for aggregated, gid): (n, sum)}."""
    out = {}
    n = len(dims)
    for s in sets:
        gid = sum(1 << (n - 1 - k) for k, d in enumerate(dims) if d not in s)
        if s:
            g = pdf.groupby(list(s), dropna=False)
            items = [
                (k if isinstance(k, tuple) else (k,), sub)
                for k, sub in g
            ]
        else:
            items = [((), pdf)]
        for key, sub in items:
            by = dict(zip(s, key))
            full = tuple(
                (None if pd.isna(by[d]) else by[d]) if d in s else None
                for d in dims
            )
            out[full + (gid,)] = (len(sub), int(sub["v"].sum()))
    return out


def _got(df):
    return {
        (r["a"], r["b"], r["gid"]): (r["n"], r["sv"])
        for r in df.collect()
    }


AGGS = lambda: {"n": F.count(F.lit(1)), "sv": F.sum("v")}  # noqa: E731


def test_rollup_matches_twin(frame):
    df, pdf = frame
    got = _got(rollup_report(df, ["a", "b"], AGGS()))
    want = _twin(pdf, [["a", "b"], ["a"], []], ["a", "b"])
    assert got == want


def test_cube_matches_twin(frame):
    df, pdf = frame
    got = _got(cube_report(df, ["a", "b"], AGGS()))
    want = _twin(pdf, [["a", "b"], ["a"], ["b"], []], ["a", "b"])
    assert got == want


def test_grouping_sets_matches_twin(frame):
    df, pdf = frame
    sets = [["a"], ["b"], []]
    got = _got(grouping_sets_report(df, ["a", "b"], sets, AGGS()))
    want = _twin(pdf, sets, ["a", "b"])
    assert got == want
    with pytest.raises(ValueError):
        grouping_sets_report(df, ["a", "b"], [["zz"]], AGGS())


def test_real_null_vs_rollup_null_disambiguated(frame):
    df, pdf = frame
    rows = rollup_report(df, ["a", "b"], AGGS()).collect()
    # a=None rows exist BOTH as real leaf groups (gid bit clear) and as
    # rolled-up subtotals (gid bit set) — gid separates them
    real = [r for r in rows if r["a"] is None and r["gid"] == 0]
    rolled = [r for r in rows if r["a"] is None and r["gid"] == 3]
    assert real and rolled
    n_null = int((pdf["a"].isna()).sum())
    assert sum(r["n"] for r in real) == n_null
    assert rolled[0]["n"] == len(pdf)
    # level counts the aggregated-away dims
    assert {r["level"] for r in rows} == {0, 1, 2}
    for r in rows:
        assert r["level"] == bin(r["gid"]).count("1")


def test_gid_matches_duckdb_grouping(frame):
    df, pdf = frame
    got = (
        rollup_report(df, ["a", "b"], AGGS())
        .toPandas()
        .sort_values(["gid", "a", "b"], na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql("""
        SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS gid,
               count(*) AS n, CAST(sum(v) AS BIGINT) AS sv
        FROM t GROUP BY ROLLUP(a, b)
        ORDER BY gid, a NULLS FIRST, b NULLS FIRST
    """).df()
    assert len(got) == len(want)
    for c in ("gid", "n", "sv"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_single_expand_single_scan_plan(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        rollup_report(
            df, ["source", "lang"], {"n": F.count(F.lit(1)),
                                     "chars": F.sum("n_chars")}
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") <= 1 or plan.count("Scan parquet") <= 1
    assert "Join" not in plan


def test_duckdb_parity_on_documents(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = (
        rollup_report(
            df, ["source", "lang"],
            {"n": F.count(F.lit(1)), "chars": F.sum("n_chars")},
        )
        .toPandas()
        .sort_values(["gid", "source", "lang"], na_position="first")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
               count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM '{SF_DIR}/documents.parquet'
        GROUP BY ROLLUP(source, lang)
        ORDER BY gid, source NULLS FIRST, lang NULLS FIRST
    """).df()
    assert len(got) == len(want)
    for c in ("gid", "n", "chars"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["source"].fillna("_") == want["source"].fillna("_")).all()
