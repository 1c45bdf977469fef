"""Ordered-sequence funnel analysis over event streams.

The event-analytics staple (ClickHouse ``windowFunnel`` shape): how far
does each user progress through an ordered step sequence (view ->
click -> purchase), optionally within a horizon of their FIRST step?

Semantics — greedy-earliest, chosen because it is deterministic and
exactly SQL-replayable: t1 = the user's earliest step-1 event; t_{k+1}
= the earliest step-(k+1) event STRICTLY after t_k (and, with
``horizon_s``, at most horizon seconds after t1). The funnel level is
the longest prefix so completed. Greedy-earliest can under-count
versus a sliding-window optimum when a later start would fit the
horizon — documented engine choice, matched verbatim by the oracle's
chained-min formulation.

Physical design: ONE shuffle. Events pre-filter to the step types
(usually a tiny fraction of the stream), group per user into a sorted
(t, step) array, and the greedy scan runs as a JVM ``aggregate``
higher-order expression over that array — whole-stage codegen, no
Python, state per user = one small struct. Per-user event counts are
bounded by the step-type filter; a user's funnel events at web scale
are thousands, not millions (the groupBy is the same shape as
sessionization's).

``funnel_report`` folds the per-user levels into the classic
conversion table: users reaching >= each step, with step names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch


def funnel_levels(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    horizon_s: float | None = None,
    out_col: str = "level",
) -> DataFrame:
    """Per-user funnel depth: (user, level, t1) with level in [0, len
    (steps)] under greedy-earliest semantics and ``t1`` = epoch seconds
    of the first step-1 event (NULL at level 0). Users with no step-type
    events at all are absent (level-0 rows exist only for users who
    emitted SOME step type but never step 1 — the pre-filter keeps the
    shuffle proportional to funnel events, not the stream)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.where(
        F.col(type_col).isin(list(steps))
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    )
    per = ev.groupBy(F.col(user_col).alias("user")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    _epoch(F.col(ts_col)).alias("t"),
                    F.col(type_col).alias("y"),
                )
            )
        ).alias("__seq")
    )

    init = F.struct(
        F.lit(0).alias("level"),
        F.lit(None).cast("double").alias("last"),
        F.lit(None).cast("double").alias("t1"),
    )

    # closure factory: PySpark infers HOF lambda arity from the Python
    # signature, so the merge fn must take exactly (acc, e)
    def step_fn(acc, e):
        want = F.element_at(steps_arr, acc["level"] + 1)
        ok = (
            (acc["level"] < n)
            & (e["y"] == want)
            & ((acc["level"] == 0) | (e["t"] > acc["last"]))
        )
        if horizon_s is not None:
            ok = ok & (
                (acc["level"] == 0)
                | (e["t"] <= acc["t1"] + F.lit(float(horizon_s)))
            )
        return F.when(
            ok,
            F.struct(
                (acc["level"] + 1).alias("level"),
                e["t"].alias("last"),
                F.when(acc["level"] == 0, e["t"])
                .otherwise(acc["t1"])
                .alias("t1"),
            ),
        ).otherwise(acc)

    res = F.aggregate("__seq", init, step_fn)
    return per.select(
        F.col("user").alias(user_col),
        res["level"].alias(out_col),
        res["t1"].alias("t1"),
    )


def funnel_report(
    levels: DataFrame,
    steps: list[str],
    *,
    level_col: str = "level",
) -> DataFrame:
    """Conversion table from :func:`funnel_levels` output: one row per
    step — (step_idx, step, users) where users = count reaching >= that
    step. One tiny aggregate over the (<= len(steps)+1)-row level
    histogram."""
    n = len(steps)
    hist = levels.groupBy(level_col).agg(F.count(F.lit(1)).alias("c"))
    tiers = levels.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        schema="step_idx INT, step STRING",
    )
    return (
        tiers.join(hist, hist[level_col] >= tiers["step_idx"], "left")
        .groupBy("step_idx", "step")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("users"))
        .orderBy("step_idx")
    )
