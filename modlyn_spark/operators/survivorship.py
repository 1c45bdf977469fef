"""Survivorship: collapse each entity cluster to one golden record.

The step downstream of entity resolution (operators/linkage.py pairs ->
operators/dedup.connected_components clusters): given records carrying a
cluster id, emit ONE canonical record per cluster with each column
resolved by an explicit, deterministic rule — the master-data-management
"golden record" (Talend/Informatica survivorship semantics, implemented
from the problem statement, not any codebase).

Rules (all deterministic under any partitioning):

- ``"min"`` / ``"max"``: plain aggregates.
- ``"latest"`` / ``"first"``: the column value of the newest/oldest
  record whose value is NON-NULL, ordered by (``order_col``, record id)
  — a null never survives over a real value just for being newer.
- ``"longest"``: the longest string; ties -> lexicographically smallest.
- ``"most_common"``: the cluster's modal value; ties -> highest count,
  then smallest value.

Physical plan: every rule except ``most_common`` is a single expression
inside ONE map-side-combinable groupBy (min_by/max_by over a packed
(order, id) struct — no window, no second shuffle). Each ``most_common``
column adds one bounded histogram aggregate (rows = distinct values per
cluster, never record count) joined back on the cluster id. At 10^12
records the cost is the one cluster-keyed shuffle the problem requires,
plus histogram-sized sides.

Canonical identity: ``canonical_id`` = min record id per cluster (the
same smallest-id convention the dedup operators' keep rules use), plus
``n_records`` for lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RULES = ("min", "max", "latest", "first", "longest", "most_common")


def golden_records(
    records: DataFrame,
    cluster_col: str,
    id_col: str,
    rules: dict[str, str],
    *,
    order_col: str | None = None,
    canonical_id_col: str = "canonical_id",
    count_col: str = "n_records",
) -> DataFrame:
    """One row per cluster: (``cluster_col``, ``canonical_id_col``,
    ``count_col``, *resolved rule columns). Records with a NULL cluster
    id are dropped (an unclustered record is its own upstream problem)."""
    for c, rule in rules.items():
        if rule not in _RULES:
            raise ValueError(f"unknown rule {rule!r} for {c!r}")
        if c not in records.columns:
            raise ValueError(f"rule column {c!r} not in records")
        if rule in ("latest", "first") and order_col is None:
            raise ValueError(f"rule {rule!r} for {c!r} needs order_col")

    base = records.where(F.col(cluster_col).isNotNull())

    def nn_key(c: str) -> Column:
        # ordering key only where the value is non-null; id tie-break
        return F.when(
            F.col(c).isNotNull(), F.struct(F.col(order_col), F.col(id_col))
        )

    aggs: list[Column] = [
        F.min(F.col(id_col)).alias(canonical_id_col),
        F.count(F.lit(1)).alias(count_col),
    ]
    mode_cols: list[str] = []
    for c, rule in rules.items():
        if rule == "min":
            aggs.append(F.min(F.col(c)).alias(c))
        elif rule == "max":
            aggs.append(F.max(F.col(c)).alias(c))
        elif rule == "latest":
            aggs.append(F.max_by(F.col(c), nn_key(c)).alias(c))
        elif rule == "first":
            aggs.append(F.min_by(F.col(c), nn_key(c)).alias(c))
        elif rule == "longest":
            aggs.append(
                F.min_by(
                    F.col(c),
                    F.when(
                        F.col(c).isNotNull(),
                        F.struct(-F.length(F.col(c)), F.col(c)),
                    ),
                ).alias(c)
            )
        else:
            mode_cols.append(c)

    out = base.groupBy(cluster_col).agg(*aggs)

    for c in mode_cols:
        hist = (
            base.where(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("__c").desc(), F.col(c).asc()
        )
        winner = (
            hist.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(cluster_col, c)
        )
        out = out.join(winner, on=cluster_col, how="left")

    return out.select(
        cluster_col,
        canonical_id_col,
        count_col,
        *rules.keys(),
    )
