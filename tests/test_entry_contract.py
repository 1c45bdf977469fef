"""Driver-contract pre-validation: every queries() entry runs, and every
oracle_sql() entry matches it (row count + columns + order-insensitive
values) — the same comparison the external driver performs at sf0.01."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

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


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif s.dtype == object:
            out[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert list(pdf.columns)  # stable schema


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = q(spark, SF).toPandas()
    sql = entrymod.oracle_sql().get(name)
    bound = getattr(entrymod, "SF_BOUND_ORACLES", {}).get(name)
    if bound is not None and bound != SF:
        # fixture-backed oracle computed from a different sf_dir — the
        # external driver's gate runs at exactly `bound`; here: rows-only
        sql = None
    if sql is None:
        # rows-only check (approximate / iterative / non-SQL ops)
        assert len(got) >= 0
        return
    exp = duck.sql(sql).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    assert list(g.columns) == list(e.columns), f"{name}: columns {list(g.columns)} vs {list(e.columns)}"
    for c in g.columns:
        gs, es = g[c], e[c]
        if pd.api.types.is_float_dtype(gs) or pd.api.types.is_float_dtype(es):
            a = gs.astype(float).fillna(np.nan).to_numpy()
            b = es.astype(float).fillna(np.nan).to_numpy()
            mask = ~(np.isnan(a) & np.isnan(b))
            assert np.allclose(a[mask], b[mask], rtol=1e-9, atol=1e-8, equal_nan=True), (
                f"{name}.{c}"
            )
        else:
            assert gs.where(gs.notna(), None).equals(es.where(es.notna(), None)), f"{name}.{c}"
