"""Spatial radius join: brute-force haversine twin parity on random
point clouds, boundary-radius recall (no pair lost at cell edges),
antimeridian wrap, invalid-coordinate contract, no-cartesian plan, and
partition invariance."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.spatial import haversine_m, radius_join

R_EARTH = 6371000.0


def _hav(lat1, lon1, lat2, lon2):
    p = math.pi / 180.0
    dlat = (lat2 - lat1) * p / 2
    dlon = (lon2 - lon1) * p / 2
    a = (
        math.sin(dlat) ** 2
        + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin(dlon) ** 2
    )
    return 2 * R_EARTH * math.asin(math.sqrt(min(a, 1.0)))


def _twin_pairs(lpdf, rpdf, radius):
    out = set()
    for _, l in lpdf.iterrows():
        for _, r in rpdf.iterrows():
            if _hav(l["lat"], l["lon"], r["lat"], r["lon"]) <= radius:
                out.add((l["id"], r["id"]))
    return out


def _clouds(seed=0, n=120, lat0=48.0, lon0=11.0, spread=0.05):
    rng = np.random.RandomState(seed)
    mk = lambda k: pd.DataFrame(
        {
            "id": [f"{k}{i}" for i in range(n)],
            "lat": lat0 + rng.uniform(-spread, spread, n),
            "lon": lon0 + rng.uniform(-spread, spread, n),
        }
    )
    return mk("a"), mk("b")


def _got_pairs(spark, lpdf, rpdf, radius, **kw):
    out = radius_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), radius, **kw
    ).toPandas()
    return set(zip(out["id_l"], out["id_r"])), out


def test_twin_parity_random_cloud(spark):
    lpdf, rpdf = _clouds()
    got, out = _got_pairs(spark, lpdf, rpdf, 1500.0)
    exp = _twin_pairs(lpdf, rpdf, 1500.0)
    assert got == exp and len(exp) > 50
    # distances agree with the twin formula
    for _, row in out.head(20).iterrows():
        d = _hav(row["lat_l"], row["lon_l"], row["lat_r"], row["lon_r"])
        np.testing.assert_allclose(row["dist_m"], d, rtol=1e-9)


def test_cell_boundary_recall(spark):
    # pairs straddling cell boundaries at almost exactly the radius:
    # the 3x3 neighborhood must not lose them
    rows_l, rows_r = [], []
    for i in range(40):
        lat = 10.0 + i * 0.013
        rows_l.append({"id": f"l{i}", "lat": lat, "lon": 20.0})
        # ~999m east (at this latitude)
        dlon = 999.0 / (111320.0 * math.cos(math.radians(lat)))
        rows_r.append({"id": f"r{i}", "lat": lat, "lon": 20.0 + dlon})
    lpdf, rpdf = pd.DataFrame(rows_l), pd.DataFrame(rows_r)
    got, _ = _got_pairs(spark, lpdf, rpdf, 1000.0)
    exp = _twin_pairs(lpdf, rpdf, 1000.0)
    assert got == exp
    assert len(got) >= 38  # nearly all planted pairs qualify


def test_antimeridian_wrap(spark):
    lpdf = pd.DataFrame(
        [{"id": "w", "lat": 0.0, "lon": 179.999}]
    )
    rpdf = pd.DataFrame(
        [
            {"id": "e", "lat": 0.0, "lon": -179.999},
            {"id": "far", "lat": 0.0, "lon": -179.0},
        ]
    )
    got, out = _got_pairs(spark, lpdf, rpdf, 500.0)
    # 0.002 deg of longitude at the equator is ~222m: must match across
    # the +-180 seam; 1.001 deg (~111km) must not
    assert got == {("w", "e")}
    assert out["dist_m"].iloc[0] < 300.0


def test_invalid_coordinates_dropped(spark):
    lpdf = pd.DataFrame(
        [
            {"id": "ok", "lat": 1.0, "lon": 1.0},
            {"id": "nul", "lat": None, "lon": 1.0},
            {"id": "pole", "lat": 89.0, "lon": 1.0},
            {"id": "badlon", "lat": 1.0, "lon": 181.0},
        ]
    )
    rpdf = pd.DataFrame([{"id": "r", "lat": 1.0, "lon": 1.0}])
    got, _ = _got_pairs(spark, lpdf, rpdf, 100.0)
    assert got == {("ok", "r")}


def test_no_cartesian_plan(spark):
    lpdf, rpdf = _clouds(n=30)
    plan = (
        radius_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), 1000.0
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partition_invariance(spark):
    lpdf, rpdf = _clouds(seed=5)
    a, _ = _got_pairs(spark, lpdf, rpdf, 1200.0)
    got_b = radius_join(
        spark.createDataFrame(lpdf).repartition(7),
        spark.createDataFrame(rpdf).repartition(3),
        1200.0,
    ).toPandas()
    b = set(zip(got_b["id_l"], got_b["id_r"]))
    assert a == b


def test_validation(spark):
    lpdf, rpdf = _clouds(n=3)
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    with pytest.raises(ValueError, match="radius"):
        radius_join(l, r, 0.0)
    with pytest.raises(ValueError, match="suffixes"):
        radius_join(l, r, 1.0, suffixes=("_x", "_x"))
    with pytest.raises(ValueError, match="max_abs_lat"):
        radius_join(l, r, 1.0, max_abs_lat=95.0)
