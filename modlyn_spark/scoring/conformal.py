"""Split-conformal calibration: finite-sample coverage thresholds.

The engine already produces calibrated probabilities
(scoring/metrics.py isotonic_fit) and raw model scores
(scoring/logreg.py, quality_classifier.py). Conformal prediction is the
distribution-free guarantee layer on top (Vovk 2005; Angelopoulos &
Bates 2021 "A Gentle Introduction to Conformal Prediction", §2 split
conformal): given n exchangeable calibration nonconformity scores, the
threshold

    qhat = the k-th smallest score,  k = ceil((n + 1) * (1 - alpha))

gives marginal coverage >= 1 - alpha for any model and any data
distribution — the only assumption is exchangeability. A training-data
platform uses this per slice (language, source, label) to turn an
arbitrary quality/uncertainty score into sets with a guaranteed error
rate before auto-accepting or auto-rejecting examples.

Physical plan (the repo's exact-order-statistic rule — windows run over
DISTINCT-value histograms, never rows):

- ``groupBy(groups, score).count()`` collapses the calibration set to a
  value histogram (map-side combinable: the shuffle carries at most
  ``partitions x distinct_scores`` rows);
- per group, one ordered window gives the cumulative count; qhat for
  each alpha is the first value whose cumulative count reaches its k —
  an aggregate over the histogram, no row-level global sort anywhere;
- ``k > n`` (tiny groups / extreme alpha) yields qhat = NULL: the honest
  "no finite threshold guarantees this coverage" answer (the standard
  convention qhat = +inf, representable in SQL as NULL), never a
  silently-clamped max.

Every step is plain SQL — the DuckDB oracle runs the identical ANSI
formulation. Applying thresholds back to a scored table is a broadcast
join against the group-cardinality-sized threshold table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_thresholds(
    df: DataFrame,
    score_col: str,
    *,
    group_cols: list[str] | str | None = None,
    alphas: list[float] = (0.1,),
) -> DataFrame:
    """Split-conformal quantile thresholds per group and alpha.

    ``score_col``: calibration NONCONFORMITY scores (higher = worse
    fit; e.g. ``1 - p_true_label``). NULL scores are dropped. Returns
    one row per (group, alpha): ``(group..., alpha, n_cal, k_rank,
    qhat)`` with ``qhat`` = the ``ceil((n+1)(1-alpha))``-th smallest
    score, or NULL when that rank exceeds ``n_cal`` (coverage 1-alpha
    is unattainable with n_cal calibration points — the +inf case).

    Two documented edges (identical in the SQL oracle, deliberately not
    "fixed" one-sided): NaN scores are NOT NULL, so they survive the
    filter, count into n_cal and sort last — a NaN can become qhat
    (accept-everything) rather than being silently dropped; pre-filter
    ``~isnan(score)`` upstream if NaN means "missing". And k_rank uses
    double-arithmetic ceil, which for a handful of (alpha, n) pairs
    (e.g. alpha=0.7, n=9: 10*0.3 -> 3.0000000000000004 -> 4) lands one
    rank above exact rational arithmetic — over-covering, never
    under-covering, and bit-identically in both engines.

    Scale: the window runs over the per-group DISTINCT-score histogram.
    For continuous scores, round upstream (the binning precision
    contract) so the histogram stays bounded; the threshold is then
    exact for the rounded scores and conservative for the raw ones
    (rounding scores UP never under-covers).
    """
    groups = (
        []
        if group_cols is None
        else [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    alphas = [float(a) for a in alphas]
    if not alphas:
        raise ValueError("alphas must be non-empty")
    for a in alphas:
        if not (0.0 < a < 1.0):
            raise ValueError(f"alpha must be in (0, 1), got {a}")

    s = F.col(score_col).cast("double")
    hist = (
        df.where(s.isNotNull())
        .groupBy(*groups, s.alias("__s"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy(*groups)
    ranked = hist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wg)
    )

    # one alpha-plan per requested level over the SAME histogram frame
    # (Catalyst reuses the exchange; alphas is user-facing-small)
    outs = []
    for a in alphas:
        k = F.ceil((F.col("__n") + 1) * F.lit(1.0 - a)).cast("long")
        outs.append(
            ranked.groupBy(*groups)
            .agg(
                F.first("__n").alias("n_cal"),
                F.first(k).alias("k_rank"),
                F.min(F.when(F.col("__cum") >= k, F.col("__s"))).alias(
                    "qhat"
                ),
            )
            .withColumn("alpha", F.lit(a))
            .withColumn(
                "qhat",
                F.when(F.col("k_rank") <= F.col("n_cal"), F.col("qhat")),
            )
            .select(*groups, "alpha", "n_cal", "k_rank", "qhat")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy(*groups, "alpha")


def conformal_accept(
    scored: DataFrame,
    thresholds: DataFrame,
    score_col: str,
    *,
    group_cols: list[str] | str | None = None,
    alpha: float | None = None,
    out_col: str = "conformal_accept",
) -> DataFrame:
    """Apply :func:`conformal_thresholds` back to a scored table.

    Adds ``out_col``: true iff the row's score is <= its group's qhat
    (member of the 1-alpha prediction set). A NULL qhat (+inf case)
    accepts everything in that group; a group absent from the threshold
    table yields NULL (no calibration evidence — surfaced, not guessed).
    The join side is group-cardinality-sized — broadcast by AQE.

    ``alpha`` selects one level when the threshold table carries
    several; required in that case so the flag is unambiguous.
    """
    groups = (
        []
        if group_cols is None
        else [group_cols] if isinstance(group_cols, str) else list(group_cols)
    )
    th = thresholds
    if alpha is not None:
        th = th.where(F.col("alpha") == float(alpha))
    else:
        # a multi-alpha table with no selector would silently duplicate
        # every scored row once per level (and make the flag
        # level-dependent) — enforce the docstring's contract
        n_alpha = th.select("alpha").distinct().limit(2).count()
        if n_alpha > 1:
            raise ValueError(
                "thresholds table carries multiple alpha levels; pass "
                "alpha= to select one"
            )
    # reserved aliases: a scored table that already carries n_cal/qhat
    # columns must not collide with the join side (the trailing drop
    # would otherwise eat the caller's data)
    th = th.select(
        *groups,
        F.col("n_cal").alias("__cal_n"),
        F.col("qhat").alias("__cal_qhat"),
    )
    if groups:
        joined = scored.join(F.broadcast(th), on=groups, how="left")
    else:
        joined = scored.crossJoin(F.broadcast(th))  # one-row threshold
    flag = F.when(
        F.col("__cal_n").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.col("__cal_qhat").isNull()
        | (F.col(score_col).cast("double") <= F.col("__cal_qhat"))
    )
    return joined.withColumn(out_col, flag).drop("__cal_n", "__cal_qhat")


def conformal_thresholds_sql(
    score_expr: str,
    source: str,
    *,
    group_exprs: list[str] | None = None,
    alphas: list[float] = (0.1,),
) -> str:
    """The IDENTICAL estimator as ANSI SQL (DuckDB-ready) — the oracle
    twin, shared by entry queries and tests."""
    groups = list(group_exprs or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = f"GROUP BY {', '.join(groups)}" if groups else ""
    part = f"PARTITION BY {', '.join(groups)}" if groups else ""
    # explicit DOUBLE: a bare VALUES (0.05) types as DECIMAL in DuckDB
    # and the driver's value hash is typed
    alpha_rows = ", ".join(
        f"(CAST({float(a)!r} AS DOUBLE))" for a in alphas
    )
    return f"""
        WITH hist AS (
          SELECT {gsel}CAST({score_expr} AS DOUBLE) AS s,
                 COUNT(*) AS c
          FROM {source}
          WHERE {score_expr} IS NOT NULL
          GROUP BY {gsel}s
        ),
        ranked AS (
          SELECT *,
                 SUM(c) OVER ({part} ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 SUM(c) OVER ({part}) AS n
          FROM hist
        ),
        lv(alpha) AS (VALUES {alpha_rows})
        SELECT {gsel}alpha,
               CAST(ANY_VALUE(n) AS BIGINT) AS n_cal,
               ANY_VALUE(CAST(ceil((n + 1) * (1.0 - alpha)) AS BIGINT))
                 AS k_rank,
               CASE WHEN ANY_VALUE(CAST(ceil((n + 1) * (1.0 - alpha))
                                        AS BIGINT)) <= ANY_VALUE(n)
                    THEN MIN(CASE WHEN cum >= ceil((n + 1) * (1.0 - alpha))
                                  THEN s END)
               END AS qhat
        FROM ranked CROSS JOIN lv
        {gby}{"," if groups else "GROUP BY"} alpha
        ORDER BY {gsel}alpha
    """
