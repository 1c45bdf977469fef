"""Geohash encoding: published test vectors, pure-python reference twin
on random points, prefix-containment property, SQL-twin parity via
DuckDB, NULL/out-of-range contract."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.functions.geo import BASE32, geohash_col, geohash_sql


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Independent bisection reference (the textbook formulation — no
    quantize/interleave shared with the engine)."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_rng[0] = mid
            else:
                ch = ch << 1
                lon_rng[1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_rng[0] = mid
            else:
                ch = ch << 1
                lat_rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_published_vectors(spark):
    # Wikipedia / original geohash.org examples
    cases = [
        (57.64911, 10.40744, 11, "u4pruydqqvj"),
        (42.605, -5.603, 5, "ezs42"[:5]),
    ]
    pdf = pd.DataFrame(
        [{"i": i, "lat": a, "lon": o, "p": p, "want": w}
         for i, (a, o, p, w) in enumerate(cases)]
    )
    df = spark.createDataFrame(pdf)
    for i, (a, o, p, w) in enumerate(cases):
        got = (
            df.where(df["i"] == i)
            .select(geohash_col(df["lat"], df["lon"], p).alias("gh"))
            .collect()[0]["gh"]
        )
        assert got == w, (got, w)
        assert _ref_geohash(a, o, p) == w


def test_reference_twin_random(spark):
    rng = np.random.RandomState(21)
    pdf = pd.DataFrame(
        {
            "lat": rng.uniform(-89.9, 89.9, 200),
            "lon": rng.uniform(-179.9, 179.9, 200),
        }
    )
    df = spark.createDataFrame(pdf)
    got = df.select(
        "lat", "lon", geohash_col(df["lat"], df["lon"], 9).alias("gh")
    ).toPandas()
    for _, r in got.iterrows():
        assert r["gh"] == _ref_geohash(r["lat"], r["lon"], 9)


def test_prefix_containment(spark):
    rng = np.random.RandomState(22)
    pdf = pd.DataFrame(
        {
            "lat": rng.uniform(-80, 80, 100),
            "lon": rng.uniform(-170, 170, 100),
        }
    )
    df = spark.createDataFrame(pdf)
    got = df.select(
        geohash_col(df["lat"], df["lon"], 9).alias("g9"),
        geohash_col(df["lat"], df["lon"], 5).alias("g5"),
        geohash_col(df["lat"], df["lon"], 1).alias("g1"),
    ).toPandas()
    assert (got["g9"].str[:5] == got["g5"]).all()
    assert (got["g9"].str[:1] == got["g1"]).all()


def test_sql_twin_parity(spark):
    rng = np.random.RandomState(23)
    pdf = pd.DataFrame(
        {
            "lat": rng.uniform(-90, 90, 300),
            "lon": rng.uniform(-180, 180, 300),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select("lat", "lon",
                  geohash_col(df["lat"], df["lon"], 7).alias("gh"))
        .toPandas()
        .sort_values(["lat", "lon"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        f"SELECT lat, lon, {geohash_sql('lat', 'lon', 7)} AS gh FROM t"
    ).df().sort_values(["lat", "lon"]).reset_index(drop=True)
    assert (got["gh"] == want["gh"]).all()


def test_null_and_range_contract(spark):
    pdf = pd.DataFrame(
        [
            {"lat": 1.0, "lon": 2.0},
            {"lat": None, "lon": 2.0},
            {"lat": 91.0, "lon": 0.0},
            {"lat": 0.0, "lon": -181.0},
        ]
    )
    df = spark.createDataFrame(pdf)
    got = df.select(geohash_col(df["lat"], df["lon"], 6).alias("g")).toPandas()
    assert got["g"].notna().tolist() == [True, False, False, False]


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame([{"lat": 1.0, "lon": 1.0}]))
    with pytest.raises(ValueError, match="precision"):
        geohash_col(df["lat"], df["lon"], 0)
    with pytest.raises(ValueError, match="precision"):
        geohash_sql("lat", "lon", 13)
