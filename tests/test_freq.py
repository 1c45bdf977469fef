"""Misra-Gries heavy hitters: exactness vs the naive grouped count under
aggressive pruning, the no-false-negative guarantee across partitionings,
grouped mode, capacity validation, DuckDB parity on real document tokens."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.freq import _mg_shrink, heavy_hitters

SF_DIR = "/root/testdata/sf0.001"


def _naive(pdf, col, threshold, groups=()):
    s = pdf.dropna(subset=[col])
    if groups:
        tot = s.groupby(list(groups)).size().rename("total")
        c = s.groupby([*groups, col]).size().rename("count").reset_index()
        c = c.join(tot, on=list(groups))
    else:
        c = s.groupby(col).size().rename("count").reset_index()
        c["total"] = len(s)
    c = c[c["count"] * 1.0 >= threshold * c["total"]]
    return {
        tuple(r[g] for g in groups) + (r[col],): (r["count"], r["total"])
        for _, r in c.iterrows()
    }


@pytest.fixture(scope="module")
def zipf(spark):
    """Zipf-ish stream: a few genuinely heavy values over a long tail of
    ~8k distinct values (far above the sketch capacity used in tests)."""
    rng = np.random.default_rng(7)
    heavy = rng.choice(50, size=60_000, p=np.ones(50) / 50)
    tail = rng.integers(1000, 9000, size=60_000)
    vals = np.where(rng.random(60_000) < 0.5, heavy, tail).astype(np.int64)
    pdf = pd.DataFrame(
        {"v": vals, "g": np.where(vals % 2 == 0, "even", "odd")}
    )
    return spark.createDataFrame(pdf), pdf


def test_mg_shrink_bound():
    s = pd.Series(np.arange(1, 101, dtype=np.int64),
                  index=[f"v{i}" for i in range(100)])
    out = _mg_shrink(s, 10)
    assert len(out) <= 10
    # every surviving weight dropped by exactly the k-th smallest weight
    assert (out == s.loc[out.index] - 90).all()


def test_exact_vs_naive_while_pruning(zipf):
    df, pdf = zipf
    # capacity 256 << 8k distinct: the sketch genuinely prunes
    got = {
        (r["v"],): (r["count"], r["total"])
        for r in heavy_hitters(
            df, "v", threshold=0.0078125, capacity=256
        ).collect()
    }
    want = _naive(pdf, "v", 0.0078125)
    assert got == want and len(want) > 5


def test_no_false_negatives_any_partitioning(zipf):
    df, pdf = zipf
    want = set(_naive(pdf, "v", 0.0078125))
    for p in (1, 4, 13, 64):
        got = {
            (r["v"],)
            for r in heavy_hitters(
                df.repartition(p), "v", threshold=0.0078125, capacity=256
            ).collect()
        }
        assert got == want, p


def test_grouped_mode(zipf):
    df, pdf = zipf
    got = {
        (r["g"], r["v"]): (r["count"], r["total"])
        for r in heavy_hitters(
            df, "v", threshold=0.0078125, group_by=["g"], capacity=256
        ).collect()
    }
    assert got == _naive(pdf, "v", 0.0078125, groups=("g",))


def test_nulls_excluded(spark):
    pdf = pd.DataFrame({"v": ["a"] * 8 + [None] * 90 + ["b"] * 2})
    df = spark.createDataFrame(pdf)
    got = {r["v"]: (r["count"], r["total"], r["frac"])
           for r in heavy_hitters(df, "v", threshold=0.5).collect()}
    assert got == {"a": (8, 10, 0.8)}


def test_capacity_guard():
    with pytest.raises(ValueError):
        heavy_hitters(None, "v", threshold=0.01, capacity=10)
    with pytest.raises(ValueError):
        heavy_hitters(None, "v", threshold=0.0)


def test_duckdb_parity_on_document_tokens(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    got = (
        heavy_hitters(toks, "token", threshold=0.00390625)
        .toPandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(rf"""
        WITH w AS (
          SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
          FROM '{SF_DIR}/documents.parquet'
        ), f AS (SELECT token FROM w WHERE token <> ''),
        tot AS (SELECT count(*) AS total FROM f)
        SELECT token, count(*) AS count, (SELECT total FROM tot) AS total,
               round(count(*) * 1.0 / (SELECT total FROM tot), 6) AS frac
        FROM f GROUP BY token
        HAVING count(*) * 1.0 >= 0.00390625 * (SELECT total FROM tot)
        ORDER BY token
    """).df()
    assert len(got) == len(want) and len(want) > 0
    assert (got["token"].to_numpy() == want["token"].to_numpy()).all()
    assert (got["count"].to_numpy() == want["count"].to_numpy()).all()
    assert got["frac"].to_numpy() == pytest.approx(want["frac"].to_numpy())


def test_broadcast_recount_plan(zipf):
    """The only shuffle-side join is the broadcast semi-prune: candidates
    never hash-shuffle the input."""
    df, _ = zipf
    plan = (
        heavy_hitters(df, "v", threshold=0.0078125, capacity=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
