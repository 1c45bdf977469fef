"""Driver-contract pre-validation: every queries() entry runs, and every
oracle_sql() entry matches it — using the SAME comparator as
scripts/driver_mirror.py (exact post-normalization dtypes included: the
driver's value hash is typed, and a kinder local comparison has already
hidden typed-hash breaks once)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

_spec = importlib.util.spec_from_file_location(
    "driver_mirror",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "driver_mirror.py"),
)
driver_mirror = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_mirror)

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_words_sql_matches_engine_tokenizer_on_any_whitespace():
    """The shared oracle tokenizer (_WORDS_SQL) must split like the
    engine's \\s+ re.split — including tabs, newlines and collapsed runs
    — not just the single 0x20 separators the driver corpus happens to
    contain (ADVICE r3). Pure DuckDB-vs-Python check."""
    import re

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "plain single spaced words",
                "tabs\tbetween\twords and  double  spaces",
                "newlines\nsplit\nwords\r\nand runs \t \n mixed",
                "  leading and trailing  ",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    got = con.execute(
        f"SELECT doc_id, ord, word FROM ({entrymod._WORDS_SQL}) ORDER BY 1, 2"
    ).df()
    ws = re.compile(r"\s+")
    exp = []
    for _, r in docs.iterrows():
        words = [w for w in ws.split(r["text"].lower()) if w]
        exp.extend(
            {"doc_id": r["doc_id"], "ord": i + 1, "word": w}
            for i, w in enumerate(words)
        )
    exp = pd.DataFrame(exp)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(pdf.columns)  # stable schema


def test_contract_shape():
    """The external driver runs at most 50 queries() entries (r02 ran
    exactly the first 50 of 51, silently dropping the flagship). Guard the
    cap, full oracle coverage, and the flagship-first pin."""
    qs = entrymod.queries()
    assert len(qs) <= 50
    assert set(qs) == set(entrymod.oracle_sql())
    assert next(iter(qs)) == "image_pipeline"
    rq = entrymod.retired_queries()
    assert set(rq) == set(entrymod.retired_oracle_sql())
    assert not set(rq) & set(qs)


def _all_queries():
    return {**entrymod.queries(), **entrymod.retired_queries()}


def _all_oracles():
    return {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}


@pytest.mark.parametrize("name", sorted(_all_queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = _all_queries()[name]
    got = q(spark, SF).toPandas()
    sql = _all_oracles().get(name)
    bound = getattr(entrymod, "SF_BOUND_ORACLES", {}).get(name)
    if bound is not None and os.path.realpath(bound) != os.path.realpath(SF):
        # fixture-backed oracle computed from a different sf_dir — the
        # external driver's gate runs at exactly `bound`; here: rows-only
        sql = None
    if sql is None:
        # rows-only check (approximate / iterative / non-SQL ops)
        assert len(got) >= 0
        return
    exp = duck.sql(sql).df()
    problems = driver_mirror.compare(name, got, exp)
    assert not problems, f"{name}: {problems}"
