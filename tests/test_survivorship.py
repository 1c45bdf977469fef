"""Golden-record survivorship: pandas twin over random clustered records
(all six rules, NULL handling, tie determinism), partition invariance,
composition with linkage->components clustering, validation, and DuckDB
parity on the real events parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.survivorship import golden_records


def _mk(seed=19, n=500, k=40):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "cl": rng.integers(0, k, n),
            "ord": rng.integers(0, 50, n),  # coarse -> ties on purpose
            "a": np.round(rng.random(n), 4),
            "name": [
                rng.choice(["al", "albert", "ally", "bo", "beatrice"])
                for _ in range(n)
            ],
            "tag": [rng.choice(["x", "y", "z"]) for _ in range(n)],
        }
    )
    # plant NULLs in every rule column
    pdf["a"] = pdf["a"].astype(object).where(pdf["rid"] % 6 != 0, None)
    pdf["name"] = pdf["name"].where(pdf["rid"] % 7 != 0, None)
    pdf["tag"] = pdf["tag"].where(pdf["rid"] % 5 != 0, None)
    return pdf


def _twin(pdf):
    out = {}
    for cl, g in pdf.groupby("cl"):
        nn_a = g[g["a"].notna()].copy()
        if len(nn_a):
            nn_a = nn_a.sort_values(["ord", "rid"], ascending=False)
            latest_a = nn_a["a"].iloc[0]
        else:
            latest_a = None
        nn_n = g[g["name"].notna()].copy()
        if len(nn_n):
            nn_n["__len"] = nn_n["name"].str.len()
            nn_n = nn_n.sort_values(
                ["__len", "name"], ascending=[False, True]
            )
            longest = nn_n["name"].iloc[0]
        else:
            longest = None
        nn_t = g[g["tag"].notna()]
        if len(nn_t):
            cnt = nn_t.groupby("tag").size().reset_index(name="c")
            cnt = cnt.sort_values(["c", "tag"], ascending=[False, True])
            mode = cnt["tag"].iloc[0]
        else:
            mode = None
        out[cl] = (
            int(g["rid"].min()),
            len(g),
            latest_a,
            longest,
            mode,
            g["ord"].max(),
        )
    return out


def test_matches_twin_all_rules(spark):
    pdf = _mk()
    got = {
        r["cl"]: (
            r["canonical_id"],
            r["n_records"],
            r["a"],
            r["name"],
            r["tag"],
            r["ord"],
        )
        for r in golden_records(
            spark.createDataFrame(pdf),
            "cl",
            "rid",
            {
                "a": "latest",
                "name": "longest",
                "tag": "most_common",
                "ord": "max",
            },
            order_col="ord",
        ).collect()
    }
    exp = _twin(pdf)
    assert set(got) == set(exp)
    for cl in exp:
        g0, g1, ga, gn, gt, go = got[cl]
        e0, e1, ea, en, et, eo = exp[cl]
        assert (g0, g1, gn, gt, go) == (e0, e1, en, et, eo), cl
        assert (ga is None) == (ea is None)
        if ga is not None:
            assert round(ga, 6) == round(float(ea), 6)


def test_partition_invariance_and_first_min(spark):
    pdf = _mk(seed=4)
    kw = dict(
        rules={"a": "first", "ord": "min"},
        order_col="ord",
    )
    a = {
        r["cl"]: (r["a"], r["ord"])
        for r in golden_records(
            spark.createDataFrame(pdf).repartition(3), "cl", "rid", **kw
        ).collect()
    }
    b = {
        r["cl"]: (r["a"], r["ord"])
        for r in golden_records(
            spark.createDataFrame(pdf).repartition(17), "cl", "rid", **kw
        ).collect()
    }
    assert a == b
    # "first" = oldest NON-NULL by (ord, rid)
    for cl, g in pdf.groupby("cl"):
        nn = g[g["a"].notna()].sort_values(["ord", "rid"])
        exp = None if nn.empty else nn["a"].iloc[0]
        if exp is None:
            assert a[cl][0] is None
        else:
            assert round(a[cl][0], 6) == round(float(exp), 6)


def test_composes_with_linkage_components(spark):
    """End-to-end entity resolution: near-dup name pairs -> connected
    components -> one golden record per component."""
    from modlyn_spark.operators.dedup import connected_components

    pdf = pd.DataFrame(
        {
            "rid": [0, 1, 2, 3, 4],
            "name": ["acme corp", "acme corp.", "acme", "zeta", "zeta inc"],
            "rev": [1.0, 5.0, None, 2.0, 9.0],
            "ord": [1, 2, 3, 1, 2],
        }
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id1": [0, 0, 3], "id2": [1, 2, 4]})
    )
    comp = connected_components(pairs, "id1", "id2")
    recs = (
        spark.createDataFrame(pdf)
        .join(comp, on=F.col("rid") == F.col("node"), how="left")
        .withColumn("cl", F.coalesce("component", "rid"))
    )
    out = {
        r["canonical_id"]: (r["n_records"], r["name"], r["rev"])
        for r in golden_records(
            recs,
            "cl",
            "rid",
            {"name": "longest", "rev": "latest"},
            order_col="ord",
        ).collect()
    }
    assert out == {0: (3, "acme corp.", 5.0), 3: (2, "zeta inc", 9.0)}


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"rid": [1], "cl": [1], "a": [1.0]}))
    with pytest.raises(ValueError, match="unknown rule"):
        golden_records(df, "cl", "rid", {"a": "newest"})
    with pytest.raises(ValueError, match="not in records"):
        golden_records(df, "cl", "rid", {"b": "max"})
    with pytest.raises(ValueError, match="needs order_col"):
        golden_records(df, "cl", "rid", {"a": "latest"})


def test_duckdb_parity_on_real_events(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    got = sorted(
        (
            r["user_id"],
            r["canonical_id"],
            r["n_records"],
            round(r["value"], 6) if r["value"] is not None else None,
            r["event_type"],
        )
        for r in golden_records(
            ev,
            "user_id",
            "event_id",
            {"value": "latest", "event_type": "most_common"},
            order_col="ts",
        ).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = sorted(
        (r[0], r[1], r[2], round(r[3], 6) if r[3] is not None else None, r[4])
        for r in con.sql(
            """
            WITH agg AS (SELECT user_id, min(event_id) AS cid,
                                count(*) AS n FROM events GROUP BY 1),
            lat AS (SELECT user_id, value FROM (
                SELECT user_id, value, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY (value IS NULL) ASC, ts DESC, event_id DESC
                ) AS rn FROM events) WHERE rn = 1),
            md AS (SELECT user_id, event_type FROM (
                SELECT user_id, event_type, row_number() OVER (
                    PARTITION BY user_id ORDER BY c DESC, event_type ASC
                ) AS rn FROM (
                    SELECT user_id, event_type, count(*) AS c FROM events
                    WHERE event_type IS NOT NULL GROUP BY 1, 2)) WHERE rn = 1)
            SELECT agg.user_id, cid, n, lat.value, md.event_type
            FROM agg LEFT JOIN lat USING (user_id)
                     LEFT JOIN md USING (user_id)
            """
        ).fetchall()
    )
    assert got == exp
