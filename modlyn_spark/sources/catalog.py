"""Format-pluggable table IO: parquet directories or Iceberg tables.

The north_rule targets "Iceberg tables of image + caption pairs"
(BASELINE.json). This container ships no iceberg-spark-runtime jar, so the
default engine path is parquet directories — but every read/write in the
job layer goes through this seam, and flipping ``format="iceberg"`` (or
setting MODLYN_TABLE_FORMAT=iceberg) routes the same calls through the
Iceberg source with snapshot/time-travel support. Enabling it on a real
cluster is configuration, not code:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=hdfs://.../warehouse \
      ...

after which table identifiers look like ``lake.db.images`` and
``read_table(spark, "lake.db.images", snapshot_id=...)`` reads a pinned
snapshot — the checkpoint manifest layer (sources/checkpoint.py) sits on
top of either format unchanged, persisting lineage alongside each commit.

``pytest tests/test_iceberg.py`` exercises the Iceberg branch end-to-end
and is skip-marked while no Iceberg runtime is on the classpath.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_VALID_FORMATS = ("parquet", "iceberg")


def default_format() -> str:
    """Session-wide default table format (env MODLYN_TABLE_FORMAT)."""
    fmt = os.environ.get("MODLYN_TABLE_FORMAT", "parquet").lower()
    return fmt if fmt in _VALID_FORMATS else "parquet"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    source: str,
    *,
    format: str | None = None,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Read a table: parquet path or Iceberg identifier.

    ``snapshot_id`` / ``as_of_timestamp`` (ms) pin an Iceberg snapshot —
    the reproducibility hook the north_rule's lineage story needs: a
    resumed job re-reads EXACTLY the input commit its manifests describe.
    Both raise on the parquet branch (parquet has no snapshots) rather
    than silently reading newer data.
    """
    fmt = (format or default_format()).lower()
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp)
        return reader.load(source)
    if fmt != "parquet":
        raise ValueError(f"unknown table format {fmt!r}")
    if snapshot_id is not None or as_of_timestamp is not None:
        raise ValueError(
            "snapshot reads need format='iceberg'; parquet directories "
            "have no snapshot lineage"
        )
    return spark.read.parquet(source)


def write_table(
    df: DataFrame,
    target: str,
    *,
    format: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a table: parquet path or Iceberg identifier.

    Iceberg writes are atomic commits (each producing the snapshot the
    lineage manifests reference); parquet keeps the dynamic-partition-
    overwrite semantics the checkpoint layer relies on.
    """
    fmt = (format or default_format()).lower()
    if fmt == "iceberg":
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(f"unsupported iceberg write mode {mode!r}")
        return
    if fmt != "parquet":
        raise ValueError(f"unknown table format {fmt!r}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_by
        )
    writer.parquet(target)


def table_snapshots(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg snapshot history (``<table>.snapshots`` metadata table) —
    the commit log the per-bucket lineage manifests key into."""
    return spark.read.format("iceberg").load(f"{table}.snapshots")
