"""Geohash encoding as a pure column expression (no UDF).

Geohash (Niemeyer's public algorithm): quantize longitude/latitude into
2^k cells, interleave the bits MSB-first starting with longitude, and
base32-encode 5 bits per character. The standard spatial bucketing key:
prefix-truncation = spatial containment, so equality joins on a prefix
are cell joins, and sorting by geohash is a space-filling-curve layout
(the spatial sibling of ``functions.layout.zorder_key`` — same
bit-interleave idea, standardized alphabet and axis order).

Implemented from the published algorithm statement. Everything is JVM
codegen (shift/mask/substr chains — the layout.py discipline: shiftleft
needs literal counts, so the expression tree is generated in Python),
zero shuffle, and replicated term-for-term in SQL by
:func:`geohash_sql` for cross-engine oracles.

NULL or out-of-range coordinates yield NULL (never a wrong bucket).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _plan(precision: int):
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return total, lon_bits, lat_bits


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """The geohash string of (lat, lon) at ``precision`` characters."""
    total, lon_bits, lat_bits = _plan(precision)

    def idx(c: Column, lo: float, span: float, nbits: int) -> Column:
        cells = 1 << nbits
        raw = F.floor((c - F.lit(lo)) / F.lit(span) * F.lit(float(cells)))
        return F.least(
            F.greatest(raw.cast("long"), F.lit(0)), F.lit(cells - 1)
        )

    lon_i = idx(lon, -180.0, 360.0, lon_bits)
    lat_i = idx(lat, -90.0, 180.0, lat_bits)
    z = F.lit(0).cast("long")
    for m in range(lon_bits):
        z = z + F.shiftleft(
            F.shiftright(lon_i, lon_bits - 1 - m).bitwiseAND(F.lit(1)),
            total - 1 - 2 * m,
        )
    for m in range(lat_bits):
        z = z + F.shiftleft(
            F.shiftright(lat_i, lat_bits - 1 - m).bitwiseAND(F.lit(1)),
            total - 2 - 2 * m,
        )
    chars = []
    for k in range(precision):
        grp = F.shiftright(z, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
        # Column.substr accepts column positions (F.substring does not)
        chars.append(F.lit(BASE32).substr(grp + F.lit(1), F.lit(1)))
    gh = F.concat(*chars)
    valid = (
        lat.isNotNull()
        & lon.isNotNull()
        & (F.abs(lat) <= 90.0)
        & (F.abs(lon) <= 180.0)
    )
    return F.when(valid, gh)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 8) -> str:
    """The identical encoding as a SQL expression — the cross-engine
    oracle twin of :func:`geohash_col`."""
    total, lon_bits, lat_bits = _plan(precision)

    def idx(e: str, lo: float, span: float, nbits: int) -> str:
        cells = 1 << nbits
        return (
            f"least(greatest(CAST(floor((({e}) - ({lo})) / {span} "
            f"* {float(cells)}) AS BIGINT), 0), {cells - 1})"
        )

    li = idx(lon_expr, -180.0, 360.0, lon_bits)
    la = idx(lat_expr, -90.0, 180.0, lat_bits)
    terms = []
    for m in range(lon_bits):
        terms.append(
            f"((({li} >> {lon_bits - 1 - m}) & 1) << {total - 1 - 2 * m})"
        )
    for m in range(lat_bits):
        terms.append(
            f"((({la} >> {lat_bits - 1 - m}) & 1) << {total - 2 - 2 * m})"
        )
    z = "(" + " + ".join(terms) + ")"
    parts = [
        f"substr('{BASE32}', CAST((({z} >> {5 * (precision - 1 - k)}) & 31) "
        f"AS INT) + 1, 1)"
        for k in range(precision)
    ]
    gh = " || ".join(parts)
    return (
        f"CASE WHEN ({lat_expr}) IS NOT NULL AND ({lon_expr}) IS NOT NULL "
        f"AND abs({lat_expr}) <= 90.0 AND abs({lon_expr}) <= 180.0 "
        f"THEN {gh} END"
    )
