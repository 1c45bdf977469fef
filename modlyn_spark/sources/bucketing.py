"""Bucketed tables: pre-shuffled storage for exchange-free co-located joins.

At 100 TB the single biggest repeated cost of the feature platform is
re-shuffling the same fact tables on the same keys for every join. Spark's
native bucketing pays that shuffle ONCE at write time: both sides stored
bucketed by the join key hash into the same bucket count join with ZERO
Exchange in the plan — each task reads bucket i of both tables. This is
the storage-level dual of the engine's runtime co-partitioning (as-of
merge buckets), and composes with it: a bucketed image-state table makes
every subsequent as-of/enrichment run skip the state-side shuffle.

Bucketed tables are saveAsTable-managed (the bucket metadata lives in the
catalog); ``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    ``sort_cols`` additionally sorts within buckets — for the as-of/window
    workloads, bucketing by entity and sorting by (entity, ts) lets
    downstream sort-merge operators skip BOTH the exchange and the sort.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain path read would lose it)."""
    return spark.table(table)


def join_is_exchange_free(
    left: DataFrame, right: DataFrame, on: list[str]
) -> tuple[bool, str]:
    """Diagnostic: join the two frames on ``on`` and report whether the
    executed plan contains any Exchange (shuffle). For two tables bucketed
    on the join key with equal bucket counts the answer must be True —
    the regression test for the bucketing contract."""
    plan = (
        left.join(right, on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return ("Exchange" not in plan), plan
