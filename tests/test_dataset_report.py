"""Dataset report: section-by-section equality with the audited
primitives, gid-based '*' path disambiguation vs real NULL dims, and a
chained DuckDB oracle over the real documents table."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.plans.dataset_report import dataset_report

SF_DIR = "/root/testdata/sf0.001"

EXPS = [
    {"type": "not_null", "column": "text"},
    {"type": "unique", "column": "doc_id"},
    {"type": "row_count", "min": 10},
]


@pytest.fixture(scope="module")
def report(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return dataset_report(
        docs,
        expectations=EXPS,
        rollup_dims=["source", "lang"],
        heavy_hitter_col="source",
        heavy_hitter_threshold=0.03125,
    ).toPandas()


def test_sections_match_primitives(spark, report):
    from modlyn_spark.operators.freq import heavy_hitters
    from modlyn_spark.operators.profile import profile_table

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prof = profile_table(docs).toPandas().set_index("column")
    got_prof = report[report["section"] == "profile"]
    # every non-null primitive cell appears exactly once in the report
    for col in prof.index:
        for m in prof.columns:
            v = prof.loc[col, m]
            sub = got_prof[
                (got_prof["entity"] == col) & (got_prof["metric"] == m)
            ]
            if pd.isna(v):
                assert sub.empty, (col, m)
            else:
                assert len(sub) == 1
                assert sub["value"].iloc[0] == pytest.approx(float(v))

    hh = {
        r["source"]: (r["count"], r["frac"])
        for r in heavy_hitters(
            docs, "source", threshold=0.03125
        ).collect()
    }
    got_hh = report[report["section"] == "heavy_hitter"]
    assert set(got_hh["entity"]) == set(hh)
    for e, (c, f) in hh.items():
        sub = got_hh[got_hh["entity"] == e].set_index("metric")["value"]
        assert sub["count"] == c and sub["frac"] == pytest.approx(f)


def test_rollup_paths_and_expectations(report):
    ro = report[report["section"] == "rollup"]
    # leaf rows, source subtotals, one grand total
    assert (ro["entity"] == "*|*").sum() == 1
    assert (ro["entity"].str.endswith("|*") & (ro["entity"] != "*|*")).any()
    grand = ro[ro["entity"] == "*|*"]["value"].iloc[0]
    leaves = ro[~ro["entity"].str.contains(r"\*")]["value"].sum()
    assert grand == leaves  # mass check: leaves sum to the grand total

    ex = report[report["section"] == "expectation"]
    assert set(ex["metric"]) == {"observed", "threshold", "passed"}
    passed = ex[ex["metric"] == "passed"]
    assert len(passed) == len(EXPS) and (passed["value"] == 1.0).all()


def test_report_duckdb_oracle_chain(spark, report):
    """The whole card is one UNION ALL of the primitives' SQL shapes —
    checked end-to-end on the real table (profile + expectations via the
    generated twins, rollup + heavy hitter inline)."""
    from modlyn_spark.operators.profile import (
        duckdb_expectations_sql,
        duckdb_profile_sql,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    psql = duckdb_profile_sql(
        "documents",
        columns=["doc_id", "lang", "n_chars", "source", "text"],
        numeric=["doc_id", "n_chars"],
        strings=["text", "lang", "source"],
    )
    esql = duckdb_expectations_sql("documents", EXPS)
    want = con.sql(f"""
        WITH p AS ({psql}), e AS ({esql})
        SELECT 'profile' AS section, "column" AS entity, metric,
               CAST(value AS DOUBLE) AS value
        FROM (
          SELECT "column", 'n_rows' AS metric, n_rows AS value FROM p
          UNION ALL SELECT "column", 'n_null', n_null FROM p
          UNION ALL SELECT "column", 'n_distinct', n_distinct FROM p
          UNION ALL SELECT "column", 'mean', mean FROM p
          UNION ALL SELECT "column", 'min_len', min_len FROM p
        ) WHERE value IS NOT NULL
        UNION ALL
        SELECT 'expectation',
               idx || ':' || expectation || ':' || "column",
               'passed', CASE WHEN passed THEN 1.0 ELSE 0.0 END
        FROM e
        UNION ALL
        SELECT 'rollup',
               CASE WHEN GROUPING(source, lang) = 3 THEN '*|*'
                    WHEN GROUPING(source, lang) = 1 THEN source || '|*'
                    ELSE source || '|' || lang END,
               'n', CAST(count(*) AS DOUBLE)
        FROM documents GROUP BY ROLLUP(source, lang)
    """).df()
    got = report[
        report["metric"].isin(
            ["n_rows", "n_null", "n_distinct", "mean", "min_len", "n"]
        )
        | (report["metric"] == "passed")
    ]
    got = got[got["section"].isin(["profile", "expectation", "rollup"])]
    key = lambda d: sorted(  # noqa: E731
        (r.section, r.entity, r.metric, round(r.value, 6))
        for r in d.itertuples(index=False)
    )
    assert key(got) == key(want)
