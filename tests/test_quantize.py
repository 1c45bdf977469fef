"""int8 embedding quantization: error bounds, exact twin replication,
degenerate vectors, and the pure-expression (no shuffle/UDF) plan."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.functions.quantize import LEVELS, quantize_embeddings


def twin(vec):
    """Independent elementwise codec: floor(u + 0.5) rounding."""
    v = [float(x) for x in vec]
    mn, mx = min(v), max(v)
    scale = (mx - mn) / LEVELS
    if scale > 0:
        codes = [min(max(int(math.floor((x - mn) / scale + 0.5)), 0), LEVELS)
                 for x in v]
    else:
        codes = [0] * len(v)
    recon = [mn + c * scale for c in codes]
    mse = sum((a - b) ** 2 for a, b in zip(v, recon)) / len(v)
    return codes, mn, scale, mse


def _df(spark, vecs):
    pdf = pd.DataFrame(
        [{"vec_id": i, "embedding": v} for i, v in enumerate(vecs)]
    )
    return spark.createDataFrame(pdf)


def test_matches_twin(spark):
    rng = np.random.default_rng(3)
    vecs = [rng.normal(0, 5, size=16).astype(np.float32).tolist()
            for _ in range(20)]
    got = quantize_embeddings(_df(spark, vecs), "embedding").orderBy(
        "vec_id"
    ).toPandas()
    for i, v in enumerate(vecs):
        codes, mn, scale, mse = twin(v)
        r = got.iloc[i]
        assert list(r["q_codes"]) == codes, i
        assert r["q_min"] == pytest.approx(mn, abs=0)
        assert r["q_scale"] == pytest.approx(scale, abs=0)
        assert r["q_mse"] == pytest.approx(mse, abs=1e-9)


def test_error_bound(spark):
    """Per-element reconstruction error <= scale/2 (+ float slack), so
    mse <= (scale/2)^2."""
    rng = np.random.default_rng(4)
    vecs = [rng.uniform(-100, 100, size=32).astype(np.float32).tolist()
            for _ in range(10)]
    got = quantize_embeddings(_df(spark, vecs), "embedding").toPandas()
    for _, r in got.iterrows():
        bound = (r["q_scale"] / 2) ** 2 * 1.0000001
        assert r["q_mse"] <= bound


def test_constant_vector(spark):
    got = quantize_embeddings(
        _df(spark, [[7.5, 7.5, 7.5]]), "embedding"
    ).collect()[0]
    assert list(got["q_codes"]) == [0, 0, 0]
    assert got["q_scale"] == 0.0
    assert got["q_mse"] == 0.0


def test_null_and_empty(spark):
    pdf = pd.DataFrame(
        [{"vec_id": 0, "embedding": None},
         {"vec_id": 1, "embedding": [1.0, 2.0]}]
    )
    got = (
        quantize_embeddings(spark.createDataFrame(pdf), "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    assert got.iloc[0]["q_codes"] is None
    assert pd.isna(got.iloc[0]["q_mse"])
    assert list(got.iloc[1]["q_codes"]) == [0, LEVELS]


def test_codes_in_range_extremes(spark):
    vecs = [[-1e30, 1e30, 0.0], [1e-20, 2e-20, 3e-20]]
    got = quantize_embeddings(_df(spark, vecs), "embedding").toPandas()
    for _, r in got.iterrows():
        assert all(0 <= c <= LEVELS for c in r["q_codes"])


def test_no_shuffle_no_python(spark):
    df = _df(spark, [[1.0, 2.0, 3.0]] * 5)
    plan = (
        quantize_embeddings(df, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
