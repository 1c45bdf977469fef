"""Skew report: counts/shares/salt against a pandas twin, NULL keys are
real keys, deterministic top-k tie-break, composite keys, arg guards."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from modlyn_spark.operators.skew import skew_report


def _pdf():
    rows = []
    for i in range(500):
        rows.append({"k": "hot", "side": "a" if i % 3 else "b", "v": i})
    for i in range(40):
        rows.append({"k": f"warm{i % 4}", "side": "a", "v": i})
    for i in range(7):
        rows.append({"k": None, "side": "b", "v": i})
    for i in range(10):
        rows.append({"k": f"cold{i}", "side": "a", "v": i})
    return pd.DataFrame(rows)


def test_twin_parity(spark):
    pdf = _pdf()
    got = (
        skew_report(
            spark.createDataFrame(pdf), "k", target_rows_per_task=100, top_k=6
        )
        .toPandas()
        .reset_index(drop=True)
    )
    twin = (
        pdf.groupby("k", dropna=False).size().reset_index(name="n_rows")
    )
    twin["share"] = (twin["n_rows"] / len(pdf)).round(6)
    twin["recommended_salt"] = twin["n_rows"].apply(
        lambda n: math.ceil(n / 100.0)
    )
    twin = twin.sort_values(
        ["n_rows", "k"], ascending=[False, True], na_position="first"
    ).head(6)
    assert list(got["n_rows"]) == list(twin["n_rows"])
    assert list(got["share"]) == pytest.approx(list(twin["share"]))
    assert list(got["recommended_salt"]) == list(twin["recommended_salt"])
    # the hot key needs salting, the warm keys do not
    assert got.iloc[0]["recommended_salt"] == 5
    assert set(got["recommended_salt"][1:]) == {1}


def test_null_key_is_a_key(spark):
    got = skew_report(
        spark.createDataFrame(_pdf()), "k", top_k=50
    ).toPandas()
    nulls = got[got["k"].isna()]
    assert len(nulls) == 1 and int(nulls.iloc[0]["n_rows"]) == 7


def test_composite_key_and_tiebreak(spark):
    got = skew_report(
        spark.createDataFrame(_pdf()), ["k", "side"], top_k=10
    ).toPandas()
    # ("hot","a") 333 rows, ("hot","b") 167 rows lead the board
    assert (got.iloc[0]["k"], got.iloc[0]["side"]) == ("hot", "a")
    assert int(got.iloc[0]["n_rows"]) == 333
    assert int(got.iloc[1]["n_rows"]) == 167
    # equal-count keys (warm0..warm3 at 10, cold* at 1) order by key value
    warm = got[got["k"].astype(str).str.startswith("warm")]
    assert list(warm["k"]) == sorted(warm["k"])


def test_arg_guards(spark):
    df = spark.createDataFrame(_pdf())
    with pytest.raises(ValueError, match="target_rows_per_task"):
        skew_report(df, "k", target_rows_per_task=0)
    with pytest.raises(ValueError, match="top_k"):
        skew_report(df, "k", top_k=0)
