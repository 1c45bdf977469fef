"""Spatial radius join: all (left, right) point pairs within R meters.

The geo primitive behind store-visit attribution, POI tagging, sensor
fusion, and geo-dedup: given two point tables with (lat, lon) degrees,
emit every pair whose great-circle (haversine) distance is at or under
``radius_m``. Implemented from the published haversine formula and the
standard grid-blocking technique — not from any codebase.

Physical plan — never a cross join:

1. **Grid bucketing.** Each point maps to an integer cell
   ``(floor(lat / d), floor(lon / d))`` with the cell size ``d`` chosen
   so that ``radius_m`` never spans more than one cell boundary:
   ``d_lat = R / 111320 m-per-degree``; longitude degrees shrink by
   cos(lat), so ``d_lon`` is sized with the WORST (widest) latitude of
   the data, clamped at ±85° (a pole-crossing dataset degenerates to
   per-latitude-band scans and should pre-filter).
2. The LEFT side lands in its own cell; the RIGHT side is EXPLODED to
   its 3x3 cell neighborhood (9 rows), so every true pair meets on
   exactly the left point's cell — one equi-join on (cell_lat,
   cell_lon), shuffle proportional to the streams, compute proportional
   to points-per-cell density (the data's physical clustering, the
   irreducible cost of a radius query).
3. **Exact verify** inside the joined cell: the haversine distance in
   JVM codegen (sin/cos/asin column expressions — no UDF), filtered at
   ``<= radius_m``.

Longitude wrap (±180°) is handled by joining on the wrapped cell index
(``mod`` into [0, 360/d)); latitude needs no wrap (poles clamp).

Equivalent SQL (the oracle form): the brute-force cross join with the
same haversine arithmetic — equality proves both the formula and that
the 3x3 neighborhood loses no pair.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0
_M_PER_DEG_LAT = 111320.0


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (haversine, spherical earth
    R=6371000) as a pure column expression."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    suffixes: tuple[str, str] = ("_l", "_r"),
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All pairs within ``radius_m`` meters. Output columns: every left
    column suffixed ``suffixes[0]``, every right column suffixed
    ``suffixes[1]``, plus ``dist_m``. Rows with NULL or out-of-range
    coordinates (|lat| > max_abs_lat, |lon| > 180) are dropped — the
    caller owns pole handling."""
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    if not 0 < max_abs_lat < 90:
        raise ValueError("max_abs_lat must be in (0, 90)")
    sl, sr = suffixes
    if sl == sr:
        raise ValueError("suffixes must differ")

    d_lat = radius_m / _M_PER_DEG_LAT
    # longitude degrees are shortest (cells widest) at the highest
    # usable latitude; size d_lon there so one cell step always covers
    # the radius
    d_lon = radius_m / (
        _M_PER_DEG_LAT * math.cos(math.radians(max_abs_lat))
    )
    n_lon_cells = max(1, int(math.ceil(360.0 / d_lon)))
    d_lon = 360.0 / n_lon_cells  # exact tiling so the wrap join is clean

    def valid(df: DataFrame) -> DataFrame:
        la, lo = F.col(lat_col), F.col(lon_col)
        return df.where(
            la.isNotNull()
            & lo.isNotNull()
            & (F.abs(la) <= max_abs_lat)
            & (F.abs(lo) <= 180.0)
        )

    def cell_lat(c: Column) -> Column:
        return F.floor(c / d_lat).cast("long")

    def cell_lon(c: Column) -> Column:
        # wrapped into [0, n_lon_cells)
        return (
            F.floor((c + 180.0) / d_lon).cast("long") % n_lon_cells
        )

    lsel = valid(left).select(
        *[F.col(c).alias(c + sl) for c in left.columns],
        cell_lat(F.col(lat_col)).alias("__cla"),
        cell_lon(F.col(lon_col)).alias("__clo"),
    )
    neighbor = F.explode(
        F.array(F.lit(-1), F.lit(0), F.lit(1))
    )
    rsel = (
        valid(right)
        .select(
            *[F.col(c).alias(c + sr) for c in right.columns],
            cell_lat(F.col(lat_col)).alias("__ra"),
            cell_lon(F.col(lon_col)).alias("__ro"),
        )
        .withColumn("__da", neighbor)
        .withColumn("__do", neighbor)
        .select(
            "*",
            (F.col("__ra") + F.col("__da")).alias("__cla"),
            # Spark % keeps the sign: ((x % n) + n) % n wraps -1 -> n-1
            (
                ((F.col("__ro") + F.col("__do")) % n_lon_cells + n_lon_cells)
                % n_lon_cells
            ).alias("__clo"),
        )
        .drop("__ra", "__ro", "__da", "__do")
    )
    dist = haversine_m(
        F.col(lat_col + sl),
        F.col(lon_col + sl),
        F.col(lat_col + sr),
        F.col(lon_col + sr),
    )
    return (
        lsel.join(rsel, ["__cla", "__clo"])
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= radius_m)
        .drop("__cla", "__clo")
    )
