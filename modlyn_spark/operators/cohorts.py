"""Cohort retention analysis over event streams.

The growth-analytics staple: bucket users into cohorts by their FIRST
activity period, then measure what fraction of each cohort is still
active k periods later — the retention triangle.

Periods are epoch-based (floor(epoch_seconds / period_s)) rather than
calendar-based: deterministic, timezone-free, and exactly replayable in
SQL — the documented engine choice (a calendar-week variant is a
different bucketing function, not a different pipeline).

Physical plan — three map-side-combinable aggregates, no row-level
joins beyond one shuffle on the user key:

1. first-activity per user: ``groupBy(user).min(period)`` (partial
   aggregation upstream — the stream never reshuffles raw events);
2. per-user active periods: ``groupBy(user, period)`` distinct-ification
   on the SAME user-keyed shuffle;
3. broadcast-free fuse: both aggregates share the user grouping, so
   they compute from one grouped pass (``min`` window over the
   user-period pairs), then the (cohort, offset) rollup counts users —
   cardinality bounded by cohorts x offsets, tiny.

Output: (cohort, offset, users, cohort_size, retention) with offset 0
always present per cohort (retention 1.0 by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_s: float = 7 * 86400.0,
    max_offset: int | None = None,
) -> DataFrame:
    """Retention triangle: one row per (cohort, offset) with the user
    count still active ``offset`` periods after the cohort's first
    period, the cohort size, and their ratio. ``max_offset`` truncates
    the triangle (None keeps every observed offset). NULL users/
    timestamps are excluded."""
    if period_s <= 0:
        raise ValueError("period_s must be > 0")
    period = F.floor(_epoch(F.col(ts_col)) / F.lit(float(period_s))).cast(
        "long"
    )
    up = (
        events.where(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("user"), period.alias("period"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .drop("__n")
    )
    w = Window.partitionBy("user")
    marked = up.select(
        "user",
        "period",
        (F.col("period") - F.min("period").over(w)).alias("offset"),
        F.min("period").over(w).alias("cohort"),
    )
    if max_offset is not None:
        marked = marked.where(F.col("offset") <= int(max_offset))
    tri = marked.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("users")
    )
    sizes = tri.where(F.col("offset") == 0).select(
        "cohort", F.col("users").alias("cohort_size")
    )
    return (
        tri.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "users",
            "cohort_size",
            (F.col("users") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort", "offset")
    )
