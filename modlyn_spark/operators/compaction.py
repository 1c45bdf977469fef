"""Small-file compaction planner: bin-pack a file manifest into rewrite
groups from table metadata alone.

The operational counterpart of `functions/layout.py` (z-order): a 100 TB
table that ingests streaming micro-batches accretes millions of sub-MB
parquet files, and scan throughput collapses on per-file open cost long
before data volume matters. Compaction planning is a METADATA job — the
input is the file manifest (one row per file: partition values, file id,
bytes), ~10^6-10^7 rows for a 100 TB table — so the plan is computed in
seconds regardless of data size; only the executor that later rewrites a
group touches the bytes.

Packing policy — start-offset binning: within each table partition,
files are laid out in deterministic ``file_col`` order on a virtual byte
axis (window cumulative sum), and a file joins the group in which its
START offset falls: ``group = floor(start_offset / target_bytes)``.
Every group's byte total lands in [target, target + max_file) except the
partition's tail group — within a file of the target either way, and
unlike first-fit-decreasing the assignment is a pure window expression:
order-stable, engine-portable, and verifiable in SQL. Files already at
or above ``target_bytes`` are excluded up front (they are what
compaction produces, not what it consumes); groups below ``min_files``
files are dropped — rewriting one file buys nothing.

Physical plan: ONE hash exchange on the partition columns. The offset
window sorts within partitions; the per-group stats window is keyed on
(partition, group), whose clustering the existing hash partitioning on
the partition columns already satisfies, so Catalyst inserts no second
exchange — one shuffle over the manifest, total.

Equivalent SQL: the same two windows (SUM ... ROWS UNBOUNDED PRECEDING
TO 1 PRECEDING, then COUNT/SUM over the derived group key).
Reference scope: modlyn reads one AnnData file and has no multi-file
table surface; this operator exists for the engine's own 100 TB
contract, alongside z-order layout and the Iceberg seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    partition_cols: str | list[str],
    file_col: str,
    bytes_col: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> DataFrame:
    """One row per file selected for compaction: the partition columns,
    ``file`` id, ``bytes``, its ``group`` id within the partition, and
    the group's ``group_files`` / ``group_bytes`` totals. Files with
    ``bytes >= target_bytes`` and groups with fewer than ``min_files``
    files are excluded (nothing to gain by rewriting them). NULL bytes
    rows are rejected loudly — a manifest with unknown sizes is a bug
    upstream, not a row to guess at."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    if min_files < 1:
        raise ValueError("min_files must be >= 1")
    parts = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    b = F.col(bytes_col).cast("long")
    # a NULL byte size would silently sort into group 0 and corrupt the
    # offsets of every later file in its partition — refuse the manifest
    # up front (the manifest is metadata-sized; this probe is cheap)
    if manifest.where(b.isNull()).limit(1).count() > 0:
        raise ValueError(
            f"manifest has NULL {bytes_col!r} rows — compaction offsets "
            "require every file's size"
        )
    small = manifest.where(b < F.lit(int(target_bytes))).select(
        *parts, F.col(file_col).alias("file"), b.alias("bytes")
    )
    w = (
        Window.partitionBy(*parts)
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = small.withColumn(
        "group",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0))
            / F.lit(float(target_bytes))
        ).cast("long"),
    )
    gw = Window.partitionBy(*parts, "group")
    out = (
        offs.withColumn("group_files", F.count("*").over(gw))
        .withColumn("group_bytes", F.sum("bytes").over(gw))
        .where(F.col("group_files") >= min_files)
        .select(
            *parts, "file", "bytes", "group", "group_files", "group_bytes"
        )
    )
    return out
