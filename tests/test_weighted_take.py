"""Weighted sampling without replacement (Efraimidis-Spirakis hash
race): exact hashlib twin parity, shard-prune exactness under extreme
weight skew, partition invariance, weight-validity contract, and the
proportional-selection property across salts."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from modlyn_spark.operators.sampling import weighted_take

U32 = float(1 << 32)


def _es_key(key: str, w: float) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return -math.log((h + 0.5) / U32) / w


def _twin(pdf: pd.DataFrame, wcol: str, n: int, key_cols, salt="", by=None):
    d = pdf[pdf[wcol].notna() & (pdf[wcol] > 0)].copy()
    d["__k"] = [
        _es_key(
            "|".join(str(r[c]) for c in key_cols) + f"|{salt}", float(r[wcol])
        )
        for _, r in d.iterrows()
    ]
    d["__tie"] = [
        "|".join(str(r[c]) for c in key_cols) + f"|{salt}"
        for _, r in d.iterrows()
    ]
    if by is None:
        return d.nsmallest(n, "__k").drop(columns=["__k", "__tie"])
    out = (
        d.sort_values(["__k", "__tie"])
        .groupby(by, group_keys=False)
        .head(n)
        .drop(columns=["__k", "__tie"])
    )
    return out


def _base_pdf():
    rows = []
    for i in range(200):
        rows.append(
            {
                "id": f"r{i:03d}",
                "grp": f"g{i % 4}",
                "w": float((i % 7) + 1),
            }
        )
    return pd.DataFrame(rows)


def test_global_twin_parity(spark):
    pdf = _base_pdf()
    df = spark.createDataFrame(pdf)
    got = weighted_take(df, "w", 25, ["id"], salt="s1").toPandas()
    exp = _twin(pdf, "w", 25, ["id"], salt="s1")
    assert sorted(got["id"]) == sorted(exp["id"])
    assert len(got) == 25


def test_per_group_twin_parity(spark):
    pdf = _base_pdf()
    df = spark.createDataFrame(pdf)
    got = weighted_take(df, "w", 7, ["id"], by="grp", salt="x").toPandas()
    exp = _twin(pdf, "w", 7, ["id"], salt="x", by="grp")
    assert sorted(got["id"]) == sorted(exp["id"])
    assert got.groupby("grp").size().eq(7).all()


def test_shard_prune_is_exact_even_under_extreme_skew(spark):
    # one row holds ~all the weight: a draw-threshold prefilter keyed to
    # total weight would drop the true 2nd..5th picks; the shard prune
    # must not
    rows = [{"id": "heavy", "grp": "g", "w": 1e9}] + [
        {"id": f"t{i}", "grp": "g", "w": 1.0} for i in range(50)
    ]
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    got = (
        weighted_take(df, "w", 5, ["id"], by="grp", shards=8)
        .toPandas()
        .sort_values("id")
    )
    exp = _twin(pdf, "w", 5, ["id"], by="grp").sort_values("id")
    assert list(got["id"]) == list(exp["id"])
    assert "heavy" in set(got["id"])
    one = (
        weighted_take(df, "w", 5, ["id"], by="grp", shards=1)
        .toPandas()
        .sort_values("id")
    )
    assert list(one["id"]) == list(got["id"])


def test_partition_invariance(spark):
    pdf = _base_pdf()
    a = weighted_take(
        spark.createDataFrame(pdf).repartition(1), "w", 10, ["id"], by="grp"
    ).toPandas()
    b = weighted_take(
        spark.createDataFrame(pdf).repartition(13), "w", 10, ["id"], by="grp"
    ).toPandas()
    assert sorted(a["id"]) == sorted(b["id"])


def test_invalid_weights_never_selected(spark):
    pdf = pd.DataFrame(
        [
            {"id": "a", "w": 5.0},
            {"id": "zero", "w": 0.0},
            {"id": "neg", "w": -2.0},
            {"id": "nul", "w": None},
            {"id": "b", "w": 1.0},
        ]
    )
    got = weighted_take(spark.createDataFrame(pdf), "w", 10, ["id"]).toPandas()
    assert sorted(got["id"]) == ["a", "b"]


def test_proportionality_across_salts(spark):
    # w=9 row should be picked much more often than w=1 rows across
    # independent redraws (selection prob ~ w / W for n=1)
    pdf = pd.DataFrame(
        [{"id": "big", "w": 9.0}]
        + [{"id": f"s{i}", "w": 1.0} for i in range(9)]
    )
    df = spark.createDataFrame(pdf)
    wins = 0
    for s in range(20):
        got = weighted_take(df, "w", 1, ["id"], salt=f"e{s}").toPandas()
        wins += int(got["id"].iloc[0] == "big")
    # E[wins] = 10; binomial(20, 0.5) below 4 is ~6e-3
    assert wins >= 4


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame([{"id": "a", "w": 1.0}]))
    with pytest.raises(ValueError, match="n must be"):
        weighted_take(df, "w", 0, ["id"])
    with pytest.raises(ValueError, match="shards"):
        weighted_take(df, "w", 1, ["id"], shards=0)


def test_global_plan_is_take_ordered(spark):
    # the global form must compile to TakeOrderedAndProject (partial
    # per-partition top-n + driver merge), never a full sort exchange
    pdf = _base_pdf()
    plan = (
        weighted_take(spark.createDataFrame(pdf), "w", 5, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan
