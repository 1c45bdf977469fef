"""Per-entity CUSUM changepoint detection as pure window algebra.

The tabular CUSUM (Page 1954; the standard SPC form, implemented from
the published recurrences) tracks per-series drift off a target:

    C+_i = max(0, C+_{i-1} + (x_i − μ0 − κ))      (upward shifts)
    C−_i = max(0, C−_{i-1} − (x_i − μ0 + κ))      (downward shifts)

and alarms when either side exceeds a threshold ``h``. The recurrence
looks inherently sequential — but max(0, ·) running recursions of this
shape have a closed prefix form:

    S_i  = Σ_{j≤i} (x_j − μ0 − κ)                 (plain prefix sum)
    C+_i = S_i − min_{j≤i} S_j                     (running minimum)

(and symmetrically C− from the running MAX of the +κ prefix sum). Both
prefix sum and running extremum are ordinary ordered-window aggregates,
so the whole detector is TWO window expressions per side — no UDF, no
iteration, no recursion, and any SQL engine reproduces it bit-for-bit
(the operands stream through the window in ts order, so even the
float accumulation order is identical across engines).

The reference has no monitoring surface; this is the drift detector a
feature platform runs over every per-entity feature series (the
pointwise companion of the distribution-level ``ks_drift``).

Physical plan: ONE shuffle — the entity-keyed window partition — and
everything else is computed inside that single Window stage (Spark
plans the four running aggregates over the same (partition, order) spec
in one pass). Per-entity state is the window frame, bounded by series
length; at 100 TB the partitioning key is the entity id, the same key
the series is stored by, so with bucketed layout even that one shuffle
disappears.

μ0 (target) and κ/h are explicit parameters: CUSUM is defined against a
KNOWN in-control level (estimating μ0 from the monitored window itself
dilutes the very shift being tested). Pass ``baseline`` as a per-entity
(key, mu0) DataFrame — e.g. computed from a held-out calibration period
— or a global float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cusum_scores(
    df: DataFrame,
    by: str | list[str],
    order_col: str | list[str],
    value_col: str,
    *,
    target: float | DataFrame = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
    pos_col: str = "cusum_pos",
    neg_col: str = "cusum_neg",
    alarm_col: str = "is_alarm",
) -> DataFrame:
    """Input rows + one-sided CUSUM statistics and the alarm flag.

    ``target``: the in-control mean μ0 — a float (global) or a DataFrame
    of (by..., ``mu0``) joined broadcast (per-entity baselines are
    aggregate-sized). ``slack`` is κ (half the shift worth detecting, in
    value units), ``threshold`` is h. NULL values contribute 0 drift
    (they extend the run without moving it) and are never alarms.
    ``order_col`` may be a list — pass a unique tiebreaker (e.g. the
    event id) as its last element so the row order, and therefore every
    prefix sum, is TOTALLY determined; remaining ties are broken by the
    value itself, which leaves the per-row output invariant.
    """
    if slack < 0 or threshold <= 0:
        raise ValueError("slack must be >= 0 and threshold > 0")
    keys = [by] if isinstance(by, str) else list(by)
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    v = F.col(value_col).cast("double")

    if isinstance(target, DataFrame):
        if "mu0" not in target.columns:
            raise ValueError("baseline DataFrame needs a mu0 column")
        out = df.join(F.broadcast(target), keys, "left")
        mu0 = F.coalesce(F.col("mu0").cast("double"), F.lit(0.0))
    else:
        out = df
        mu0 = F.lit(float(target))

    # NULL -> zero deviation: the prefix sums must stay defined past
    # gaps (the statistic decays by the slack through missing samples,
    # the standard treatment)
    dev = F.coalesce(v - mu0, F.lit(0.0))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in ocols], v)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # window functions don't nest: materialize the prefix sums, then the
    # running extrema in a second pass over the SAME (partition, order)
    # spec — Catalyst reuses the one exchange+sort, so still one shuffle
    out = out.withColumn(
        "__s_up", F.sum(dev - F.lit(float(slack))).over(w)
    ).withColumn("__s_dn", F.sum(dev + F.lit(float(slack))).over(w))
    # C+ = S - min(S); the running min includes the virtual S_0 = 0
    # (the recurrence starts at C+_0 = 0), hence least(min, 0)
    c_pos = F.col("__s_up") - F.least(
        F.min("__s_up").over(w), F.lit(0.0)
    )
    c_neg = F.greatest(F.max("__s_dn").over(w), F.lit(0.0)) - F.col(
        "__s_dn"
    )
    out = (
        out.withColumn(pos_col, c_pos)
        .withColumn(neg_col, c_neg)
        .drop("__s_up", "__s_dn")
        .withColumn(
            alarm_col,
            v.isNotNull()
            & (
                (F.col(pos_col) > F.lit(float(threshold)))
                | (F.col(neg_col) > F.lit(float(threshold)))
            ),
        )
    )
    return out.drop("mu0") if isinstance(target, DataFrame) else out


def changepoints(
    df: DataFrame,
    by: str | list[str],
    order_col: str | list[str],
    value_col: str,
    *,
    target: float | DataFrame = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """First alarm per entity and side: (by..., side, ``alarm_at``,
    ``stat``) — the monitoring rollup (one row per tripped detector,
    empty for in-control series). Adds one aggregate-sized groupBy on
    top of :func:`cusum_scores`' single shuffle."""
    keys = [by] if isinstance(by, str) else list(by)
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    scored = cusum_scores(
        df, keys, order_col, value_col,
        target=target, slack=slack, threshold=threshold,
    )
    sides = []
    for side, col in (("up", "cusum_pos"), ("down", "cusum_neg")):
        sides.append(
            scored.where(
                (F.col(col) > F.lit(float(threshold)))
                & F.col(value_col).isNotNull()
            )
            .groupBy(*keys)
            .agg(
                F.min(
                    F.struct(*[F.col(c) for c in ocols], F.col(col))
                ).alias("__f")
            )
            .select(
                *keys,
                F.lit(side).alias("side"),
                F.col("__f")[ocols[0]].alias("alarm_at"),
                F.col(f"__f.{col}").alias("stat"),
            )
        )
    return sides[0].unionByName(sides[1])
