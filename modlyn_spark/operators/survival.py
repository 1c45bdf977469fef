"""Kaplan-Meier survival estimation over (duration, event) tables.

Retention / time-to-event analysis is a standard readout over the same
entity-history tables the as-of/feature engine builds (cohort retention
lives in operators/cohorts.py; this is its continuous-time sibling).
The product-limit estimator:

    S(t_i) = prod_{j <= i} (1 - d_j / n_j)

with d_j = events at time t_j and n_j = subjects still at risk, plus the
Greenwood standard error  se(S_i) = S_i * sqrt(sum_{j<=i} d_j/(n_j(n_j-d_j))).

Physical plan (fully declarative — ONE shuffle, no UDFs):

- groupBy(duration) collapses subjects to one row per DISTINCT time
  (d = sum(event), c = row count) — map-side combinable;
- at-risk counts and the running product come from ordered windows
  over those distinct-time rows: n_i is the REVERSE cumulative sum of c
  (subjects with duration >= t_i — no separate count job, the input is
  scanned once), and the product is exp(cumsum(ln(1 - d/n))) with a
  cummax flag for the S -> 0 absorbing case (d_j = n_j), where ln is
  undefined;
- Greenwood's sum is the same window.

Precision contract (the repo's bounded-distinct-window rule): the
unpartitioned window runs over DISTINCT durations, not subjects. For
continuous durations at corpus scale, pre-bucket with ``round_to`` so
the window is histogram-sized; the estimator is then exact for the
bucketed timeline. Every step is plain SQL — the DuckDB oracle runs the
identical ANSI formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    round_to: int | None = None,
) -> DataFrame:
    """Product-limit survival curve.

    ``duration_col``: numeric time-to-event-or-censor (>= 0);
    ``event_col``: 1 = event observed, 0 = right-censored. NULL duration
    rows are dropped (they cannot be placed on the timeline); NULL event
    is treated as censored. Lazy builder — no job runs here, so an empty
    input yields an empty curve. Returns one row per distinct duration:
    (duration, n_at_risk, n_events, n_censored, survival, greenwood_se),
    ordered by duration. ``round_to`` pre-buckets durations to that many
    decimals, bounding the window by the bucket count (REQUIRED thinking
    at scale; None keeps raw values).
    """
    dur = F.col(duration_col).cast("double")
    if round_to is not None:
        dur = F.round(dur, int(round_to))
    ev = F.coalesce(F.col(event_col).cast("int"), F.lit(0))
    base = df.where(F.col(duration_col).isNotNull()).select(
        dur.alias("duration"), ev.alias("__ev")
    )

    g = base.groupBy("duration").agg(
        F.sum("__ev").alias("n_events"),
        F.count(F.lit(1)).alias("n_total"),
    )
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    # n_at_risk = subjects with duration >= t_i — a reverse cumulative
    # sum over the SAME histogram-sized window partition. (A driver-side
    # N via collect() would scan the input a second time for nothing.)
    w_rev = Window.orderBy("duration").rowsBetween(0, Window.unboundedFollowing)
    g = g.withColumn("n_at_risk", F.sum("n_total").over(w_rev))
    # absorbing zero: once d_j = n_j at some time, S is exactly 0 after it
    g = g.withColumn(
        "__dead", F.max((F.col("n_events") == F.col("n_at_risk")).cast("int")).over(w)
    )
    # ln(1 - d/n) is finite wherever d < n; the __dead flag owns the rest
    term = F.when(
        F.col("n_events") < F.col("n_at_risk"),
        F.log(1.0 - F.col("n_events") / F.col("n_at_risk")),
    ).otherwise(F.lit(0.0))
    gw_term = F.when(
        F.col("n_events") < F.col("n_at_risk"),
        F.col("n_events")
        / (F.col("n_at_risk") * (F.col("n_at_risk") - F.col("n_events"))),
    ).otherwise(F.lit(0.0))
    g = g.withColumn("__logs", F.sum(term).over(w)).withColumn(
        "__gw", F.sum(gw_term).over(w)
    )
    surv = F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("__logs"))
    )
    se = F.when(F.col("__dead") == 1, F.lit(None).cast("double")).otherwise(
        F.exp(F.col("__logs")) * F.sqrt(F.col("__gw"))
    )
    return (
        g.select(
            "duration",
            "n_at_risk",
            "n_events",
            (F.col("n_total") - F.col("n_events")).alias("n_censored"),
            surv.alias("survival"),
            se.alias("greenwood_se"),
        )
        .orderBy("duration")
    )


def kaplan_meier_sql(
    duration_expr: str, event_expr: str, source: str
) -> str:
    """The IDENTICAL estimator as ANSI SQL (DuckDB-ready) — the oracle
    twin, parameterized on the duration/event expressions and source
    relation so entry queries and tests share one formulation."""
    return f"""
        WITH base AS (
          SELECT {duration_expr} AS duration,
                 COALESCE(CAST({event_expr} AS INT), 0) AS ev
          FROM {source}
          WHERE {duration_expr} IS NOT NULL
        ),
        g AS (
          SELECT duration, SUM(ev) AS n_events, COUNT(*) AS n_total
          FROM base GROUP BY duration
        ),
        r AS (
          SELECT *,
                 (SELECT SUM(n_total) FROM g)
                   - SUM(n_total) OVER w + n_total AS n_at_risk
          FROM g
          WINDOW w AS (ORDER BY duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        s AS (
          SELECT *,
                 MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
                     OVER w AS dead,
                 SUM(CASE WHEN n_events < n_at_risk
                          THEN ln(1.0 - n_events * 1.0 / n_at_risk)
                          ELSE 0.0 END) OVER w AS logs,
                 SUM(CASE WHEN n_events < n_at_risk
                          THEN n_events * 1.0
                               / (n_at_risk * (n_at_risk - n_events))
                          ELSE 0.0 END) OVER w AS gw
          FROM r
          WINDOW w AS (ORDER BY duration
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT duration, n_at_risk, n_events,
               n_total - n_events AS n_censored,
               CASE WHEN dead = 1 THEN 0.0 ELSE exp(logs) END AS survival,
               CASE WHEN dead = 1 THEN NULL
                    ELSE exp(logs) * sqrt(gw) END AS greenwood_se
        FROM s
        ORDER BY duration
    """
