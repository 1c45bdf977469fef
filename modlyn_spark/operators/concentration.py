"""Per-group concentration diagnostics: Gini, top-share, effective count.

The skew report for a data platform: "how concentrated is revenue per
region / traffic per key / tokens per source" — the signal that decides
salting, mix rebalancing, and whether a groupBy needs a skew hint.
Implemented from the standard definitions:

- ``gini`` — from the sorted-cumulative identity
  ``G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n`` (x ascending, i 1-based);
  0 = perfectly even, →1 = one member holds everything. Requires
  non-negative values (validated via one aggregate).
- ``top1_share`` / ``topk_share`` — largest member's / k largest
  members' fraction of the group total.
- ``n_effective`` — inverse Herfindahl ``(Σx)² / Σx²``: "this group
  behaves like N equal members" (the ecology/economics effective
  number).

Physical plan: ONE rank window per group (ascending (value, tiebreak))
feeding ONE grouped aggregate on the same key — the window's hash
partitioning is reused, so the whole report costs one entity-keyed
exchange. Members with NULL value are excluded. Output is group-table
sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concentration_report(
    df: DataFrame,
    by: str | list[str],
    value_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """One row per group: n, total, gini, top1_share, topk_share,
    n_effective. Raises on negative values (Gini is undefined there)."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    keys = [by] if isinstance(by, str) else list(by)
    v = F.col(value_col).cast("double")
    d = df.where(v.isNotNull()).select(*keys, v.alias("__v"))

    neg = d.where(F.col("__v") < 0).limit(1).count()
    if neg:
        raise ValueError(
            f"{value_col} has negative values — Gini/shares are undefined; "
            "shift or clip upstream"
        )

    w = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
    wd = Window.partitionBy(*keys).orderBy(F.col("__v").desc())
    ranked = d.withColumn("__i", F.row_number().over(w)).withColumn(
        "__rd", F.row_number().over(wd)
    )
    n = F.count("*")
    tot = F.sum("__v")
    agg = ranked.groupBy(*keys).agg(
        n.alias("n"),
        tot.alias("total"),
        F.sum(F.col("__i") * F.col("__v")).alias("__swx"),
        F.sum(F.col("__v") * F.col("__v")).alias("__sxx"),
        F.max(F.when(F.col("__rd") == 1, F.col("__v"))).alias("__top1"),
        F.sum(F.when(F.col("__rd") <= top_k, F.col("__v"))).alias("__topk"),
    )
    nn = F.col("n").cast("double")
    total = F.col("total")
    gini = F.when(
        total > 0,
        2.0 * F.col("__swx") / (nn * total) - (nn + 1.0) / nn,
    ).otherwise(F.lit(0.0))
    return agg.select(
        *keys,
        "n",
        "total",
        gini.alias("gini"),
        F.when(total > 0, F.col("__top1") / total).alias("top1_share"),
        F.when(total > 0, F.col("__topk") / total).alias("topk_share"),
        F.when(F.col("__sxx") > 0, total * total / F.col("__sxx")).alias(
            "n_effective"
        ),
    )
