"""Per-entity trend features: closed-form OLS over (t, value) streams.

The time-series feature-engineering staple: for every entity, the
least-squares line through its (timestamp, value) points — slope (units
per second), intercept at the entity's first timestamp, R², plus the
spread stats the fit falls out of. "Is this metric drifting and how
fast" as a FEATURE, computable for 10^9 entities in one pass over the
stream.

Physical plan: ONE entity-keyed exchange. A partition-frame window
computes each entity's min timestamp, the time axis is rebased to
``x = t − min(t)`` BEFORE any squaring, and the classed sums (n, Σx,
Σx², Σv, Σv², Σxv, max x) reduce in a groupBy on the same key — Catalyst
reuses the window's hash partitioning, so the window + aggregate cost
one shuffle total. The rebase must happen before the squares: raw
epoch-seconds give Σt² ≈ n·(1.7e9)², whose float64 ulp is ~6·10³ —
computing the centered moment from raw sums (the textbook identity
Σ(t−m)² = Σt² − 2mΣt + nm²) cancels 10 significant digits and makes the
slope partitioning-dependent at the 10⁻⁵ level. Rebased, x² is bounded
by the entity's own span squared and the sums are stable.

Degenerate entities are explicit: n = 1 or zero time-variance -> NULL
slope/intercept/r2; zero VALUE-variance with nonzero time-variance ->
slope 0, r2 NULL (0/0 in the R² ratio).

Equivalent SQL: the same window + explicit-sum aggregate — the oracle
replicates the arithmetic term for term (regr_slope etc. exist in both
engines but hide their centering, so the explicit form is the one that
matches bit-for-bit up to summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.ranges import _as_num


def trend_features(
    df: DataFrame,
    entity_col: str | list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """One row per entity: n, t_span_s, v_mean, v_std, slope_per_s,
    intercept (value at the entity's FIRST timestamp), r2. Rows with
    NULL ts or value are ignored."""
    keys = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    t = _as_num(df, ts_col)
    v = F.col(value_col).cast("double")
    d = df.where(t.isNotNull() & v.isNotNull()).select(
        *keys, t.alias("__t"), v.alias("__v")
    )
    w = Window.partitionBy(*keys)
    x = F.col("__t") - F.min("__t").over(w)
    d = d.withColumn("__x", x)
    agg = d.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.max("__x").alias("__span"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx_raw"),
        F.sum("__v").alias("__sv"),
        F.sum(F.col("__v") * F.col("__v")).alias("__svv"),
        F.sum(F.col("__x") * F.col("__v")).alias("__sxv"),
    )
    n = F.col("n").cast("double")
    sx, sv = F.col("__sx"), F.col("__sv")
    # centered second moments (x is already span-scale, so these sums
    # do not cancel catastrophically)
    sxx = F.col("__sxx_raw") - sx * sx / n
    sxy = F.col("__sxv") - sx * sv / n
    syy = F.col("__svv") - sv * sv / n
    slope = F.when(sxx > 0, sxy / sxx)
    intercept = F.when(sxx > 0, (sv - (sxy / sxx) * sx) / n)
    r2 = F.when((sxx > 0) & (syy > 0), (sxy * sxy) / (sxx * syy))
    return agg.select(
        *keys,
        "n",
        F.col("__span").alias("t_span_s"),
        (sv / n).alias("v_mean"),
        F.sqrt(F.greatest(syy / n, F.lit(0.0))).alias("v_std"),
        slope.alias("slope_per_s"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
