"""Table profiling + expectation checks: pandas twin on a mixed-type
frame, NULL semantics, generated-DuckDB-oracle parity on the real
documents parquet, single-aggregate-pass plan assert."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.profile import (
    check_expectations,
    duckdb_expectations_sql,
    duckdb_profile_sql,
    profile_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mixed(spark):
    pdf = pd.DataFrame(
        {
            "id": np.arange(40, dtype=np.int64),
            "x": [float(i) if i % 5 else np.nan for i in range(40)],
            "name": [None if i % 7 == 0 else f"n_{i % 9}" for i in range(40)],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_profile_matches_pandas_twin(mixed):
    df, pdf = mixed
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert set(got) == {"id", "x", "name"}

    # id: dense ints, no nulls
    assert got["id"]["n_rows"] == 40
    assert got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 40
    assert got["id"]["min_num"] == 0.0 and got["id"]["max_num"] == 39.0
    assert got["id"]["mean"] == round(pdf["id"].mean(), 6)
    assert got["id"]["stddev"] == round(pdf["id"].std(ddof=1), 6)
    assert got["id"]["min_len"] is None

    # x: NaN arrives as NULL through createDataFrame
    assert got["x"]["n_null"] == 8
    assert got["x"]["n_distinct"] == 32
    assert got["x"]["mean"] == round(pdf["x"].mean(), 6)

    # name: string stats, numeric stats NULL
    assert got["name"]["n_null"] == 6
    assert got["name"]["n_distinct"] == pdf["name"].nunique()
    assert got["name"]["min_len"] == 3 and got["name"]["max_len"] == 3
    assert got["name"]["mean"] is None


def test_profile_empty_and_subset(spark, mixed):
    df, _ = mixed
    sub = profile_table(df, columns=["x"]).collect()
    assert len(sub) == 1 and sub[0]["column"] == "x"
    empty = profile_table(df.where("id < 0"), columns=["x", "name"]).collect()
    assert {r["column"] for r in empty} == {"x", "name"}
    for r in empty:
        assert r["n_rows"] == 0 and r["n_distinct"] == 0
        assert r["min_num"] is None and r["min_len"] is None


def test_profile_approx_mode_runs(mixed):
    df, _ = mixed
    got = {r["column"]: r for r in
           profile_table(df, exact_distinct=False).collect()}
    # HLL++ is exact at these cardinalities by construction
    assert abs(got["id"]["n_distinct"] - 40) <= 2


def test_profile_duckdb_parity_on_documents(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = profile_table(df).toPandas().set_index("column")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    sql = duckdb_profile_sql(
        "documents",
        columns=sorted(c for c in df.columns),
        numeric=["doc_id", "n_chars"],
        strings=["text", "lang", "source"],
    )
    want = con.sql(sql).df().set_index("column")
    assert list(got.index) == list(want.index)
    for col in got.index:
        for field in got.columns:
            g, w = got.loc[col, field], want.loc[col, field]
            if pd.isna(g) and pd.isna(w):
                continue
            assert g == pytest.approx(w, abs=1e-9), (col, field, g, w)


EXPECTATIONS = [
    {"type": "row_count", "min": 10},
    {"type": "not_null", "column": "id"},
    {"type": "unique", "column": "id"},
    {"type": "not_null", "column": "name", "min_fraction": 0.8},
    {"type": "in_set", "column": "name",
     "values": [f"n_{i}" for i in range(9)], "min_fraction": 0.8},
    {"type": "in_range", "column": "x", "min": 0.0, "max": 39.0,
     "min_fraction": 0.75},
    {"type": "matches", "column": "name", "pattern": r"^n_\d$",
     "min_fraction": 0.8},
    {"type": "unique", "column": "name"},  # should FAIL (9 values, 34 rows)
]


def test_expectations_semantics(mixed):
    df, pdf = mixed
    got = {r["idx"]: r.asDict() for r in
           check_expectations(df, EXPECTATIONS).collect()}
    assert len(got) == len(EXPECTATIONS)
    assert got[0]["passed"] and got[0]["observed"] == 40.0
    assert got[1]["passed"] and got[1]["observed"] == 1.0
    assert got[2]["passed"]
    # 6/40 names are NULL -> observed 0.85
    assert got[3]["observed"] == 0.85 and got[3]["passed"]
    assert got[4]["observed"] == 0.85
    # x: 8 NULLs fail in_range -> 32/40 = 0.8 >= 0.75
    assert got[5]["observed"] == 0.8 and got[5]["passed"]
    assert got[6]["observed"] == 0.85 and got[6]["passed"]
    assert not got[7]["passed"] and got[7]["observed"] < 1.0


def test_expectations_null_fails_predicates(spark):
    pdf = pd.DataFrame({"v": [1.0, None, None, 4.0]})
    df = spark.createDataFrame(pdf)
    got = check_expectations(
        df,
        [
            {"type": "in_range", "column": "v", "min": 0, "max": 10},
            {"type": "not_null", "column": "v", "min_fraction": 0.5},
        ],
    ).collect()
    assert got[0]["observed"] == 0.5 and not got[0]["passed"]
    assert got[1]["observed"] == 0.5 and got[1]["passed"]


def test_expectations_empty_table_vacuous(spark, mixed):
    df, _ = mixed
    got = check_expectations(
        df.where("id < 0"),
        [
            {"type": "not_null", "column": "id"},
            {"type": "row_count", "min": 1},
            {"type": "unique", "column": "id"},
        ],
    ).collect()
    assert got[0]["passed"] and got[0]["observed"] == 1.0
    assert not got[1]["passed"]
    assert got[2]["passed"]


def test_expectations_duckdb_parity_on_documents(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exps = [
        {"type": "row_count", "min": 100},
        {"type": "not_null", "column": "text"},
        {"type": "unique", "column": "doc_id"},
        {"type": "in_set", "column": "lang",
         "values": ["en", "de", "fr"], "min_fraction": 0.25},
        {"type": "in_range", "column": "n_chars", "min": 1, "max": 10 ** 9},
        {"type": "matches", "column": "source", "pattern": r"^[a-z0-9_]+$"},
        {"type": "unique", "column": "text"},
    ]
    got = check_expectations(df, exps).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.sql(duckdb_expectations_sql("documents", exps)).df()
    assert len(got) == len(want)
    for g, w in zip(got.itertuples(index=False), want.itertuples(index=False)):
        assert g.idx == w.idx and g.expectation == w.expectation
        assert g.passed == w.passed, (g, w)
        assert g.observed == pytest.approx(w.observed, abs=1e-9)
        assert g.threshold == pytest.approx(w.threshold, abs=1e-9)


def test_single_pass_plan(spark):
    """The whole expectation suite (minus the 1-row unpivot) compiles to
    ONE aggregate over ONE scan: no join, no repeated FileScan."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = check_expectations(
        df,
        [
            {"type": "not_null", "column": "text"},
            {"type": "in_range", "column": "n_chars", "min": 0},
            {"type": "matches", "column": "lang", "pattern": "^[a-z]+$"},
            {"type": "row_count", "min": 1},
        ],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1 or plan.count("Scan parquet") <= 1
    assert "Join" not in plan


def test_unknown_expectation_raises(mixed):
    df, _ = mixed
    with pytest.raises(ValueError):
        check_expectations(df, [{"type": "bogus", "column": "id"}])
