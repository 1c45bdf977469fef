from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from modlyn_spark.operators.projection import projection_signs, random_projection


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, vec array<double>"
    )


def test_signs_deterministic_and_hash_exact():
    s = projection_signs(8, 4, seed="s")
    assert len(s) == 4 and all(len(r) == 8 for r in s)
    assert s == projection_signs(8, 4, seed="s")
    for k in range(4):
        for j in range(8):
            h = int(hashlib.md5(f"{j}|{k}|rp|s".encode()).hexdigest()[:8], 16)
            assert s[k][j] == (1 if h % 2 == 0 else -1)
    # a different seed re-deals the matrix
    assert s != projection_signs(8, 4, seed="t")


def test_matches_numpy(spark):
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(30, 16))
    got = {
        r["id"]: r["vec_proj"]
        for r in random_projection(
            _df(spark, [list(map(float, v)) for v in vecs]),
            "vec",
            d_in=16,
            d_out=4,
        ).collect()
    }
    R = np.array(projection_signs(16, 4)) / math.sqrt(4.0)
    for i in range(30):
        want = R @ vecs[i]
        assert np.allclose(got[i], want, rtol=1e-12)


def test_distance_preservation(spark):
    """The JL property on real data: pairwise distance ratios stay in a
    reasonable band at d_out = 16 for 40 gaussian points."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64))
    got = {
        r["id"]: np.array(r["vec_proj"])
        for r in random_projection(
            _df(spark, [list(map(float, v)) for v in vecs]),
            "vec",
            d_in=64,
            d_out=16,
        ).collect()
    }
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            d0 = np.linalg.norm(vecs[i] - vecs[j])
            d1 = np.linalg.norm(got[i] - got[j])
            ratios.append(d1 / d0)
    # E[ratio^2] = 1; at d_out=16 the spread is wide but bounded
    assert 0.4 < min(ratios) and max(ratios) < 1.9
    assert abs(np.mean([r * r for r in ratios]) - 1.0) < 0.35


def test_null_and_size_contracts(spark):
    vecs_df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [1.0, 2.0, 3.0])],
        "id long, vec array<double>",
    )
    got = {
        r["id"]: r["vec_proj"]
        for r in random_projection(
            vecs_df, "vec", d_in=2, d_out=1
        ).collect()
    }
    assert got[0] is not None
    assert got[1] is None and got[2] is None


def test_validation():
    with pytest.raises(ValueError):
        projection_signs(0, 1)
    import modlyn_spark.operators.projection as P

    class Fake:
        pass

    with pytest.raises(ValueError):
        P.random_projection(Fake(), "v", d_in=4, d_out=8)


def test_no_shuffle_no_python(spark):
    df = random_projection(
        _df(spark, [[1.0] * 8]), "vec", d_in=8, d_out=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
