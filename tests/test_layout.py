"""Z-order layout keys: python Morton twin, DuckDB SQL-twin parity,
per-dimension monotonicity, the quantitative locality/data-skipping
property vs a lexicographic layout, NULLs and validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.functions.layout import with_zorder, zorder_key, zorder_sql


def _morton(vals, bits):
    out = 0
    n = len(vals)
    for i, v in enumerate(vals):
        v = max(0, min(int(v), (1 << bits) - 1))
        for b in range(bits):
            out += ((v >> b) & 1) << (b * n + i)
    return out


def test_matches_python_twin_and_sql_twin(spark):
    import duckdb

    rng = np.random.default_rng(37)
    pdf = pd.DataFrame(
        {
            "i": np.arange(300, dtype=np.int64),
            "x": rng.integers(-5, 1 << 12, 300),
            "y": rng.integers(0, 1 << 12, 300),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zorder_key(["x", "y"], bits=12).alias("z")
        ).collect()
    }
    for r in pdf.itertuples(index=False):
        assert got[r.i] == _morton([r.x, r.y], 12)
    con = duckdb.connect()
    con.register("t", pdf)
    sql = zorder_sql(["x", "y"], bits=12)
    exp = con.sql(f"SELECT i, {sql} AS z FROM t").df()
    assert {int(r.i): int(r.z) for r in exp.itertuples(index=False)} == got


def test_monotonic_per_dimension(spark):
    pdf = pd.DataFrame({"x": range(64), "y": [7] * 64})
    keys = [
        r["z"]
        for r in spark.createDataFrame(pdf)
        .select(zorder_key(["x", "y"], bits=6).alias("z"))
        .collect()
    ]
    assert keys == sorted(keys) and len(set(keys)) == 64


def test_locality_beats_lexicographic(spark):
    # 32x32 grid; 16 range-buckets: z-order tiles ~8x8 in BOTH dims,
    # x-major lexicographic gives narrow-x / full-height stripes
    pts = pd.DataFrame(
        [(x, y) for x in range(32) for y in range(32)], columns=["x", "y"]
    )
    df = with_zorder(spark.createDataFrame(pts), ["x", "y"], bits=5)
    from pyspark.sql import Window

    def extents(d, key):
        b = d.withColumn(
            "b", F.ntile(16).over(Window.orderBy(key))
        )
        rows = (
            b.groupBy("b")
            .agg(
                (F.max("x") - F.min("x")).alias("ex"),
                (F.max("y") - F.min("y")).alias("ey"),
            )
            .collect()
        )
        return (
            float(np.mean([r["ex"] for r in rows])),
            float(np.mean([r["ey"] for r in rows])),
        )

    zx, zy = extents(df, "zkey")
    lx, ly = extents(df, F.col("x") * 32 + F.col("y"))
    # z-order: both dims ~ a quarter of the 0..31 domain
    assert zx <= 12 and zy <= 12
    # lexicographic: y stripes span the full domain
    assert ly >= 30 and lx <= 4
    # -> a selective predicate on y prunes z-ordered buckets but not
    #    x-major ones
    assert zy < ly / 2


def test_nulls_constants_and_validation(spark):
    pdf = pd.DataFrame(
        {"x": [1.0, None, 3.0], "y": [2.0, 2.0, 2.0]}
    )
    rows = with_zorder(
        spark.createDataFrame(pdf), ["x", "y"], bits=8
    ).collect()
    by_x = {r["x"]: r["zkey"] for r in rows}
    assert by_x[None] is None  # NULL propagates
    # constant column ranks to 0 everywhere: keys equal interleave(x_rank, 0)
    assert by_x[1.0] == 0 and by_x[3.0] == _morton([255, 0], 8)
    with pytest.raises(ValueError, match="overflow"):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def test_timestamp_columns_rank(spark):
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).where(F.col("ts").isNotNull())
    out = with_zorder(ev, ["user_id", "ts"], bits=10)
    rows = out.select("zkey").collect()
    assert all(r["zkey"] is not None and r["zkey"] >= 0 for r in rows)
    assert len({r["zkey"] for r in rows}) > len(rows) // 2  # real spread
