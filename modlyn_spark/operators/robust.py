"""Robust per-group outlier scoring: median / MAD (Hampel identifier).

Mean/std outlier rules break exactly when you need them — the outliers
inflate the std that is supposed to catch them. The robust standard is
the Hampel identifier: flag x where

    |x − median| / (1.4826 · MAD) > k        (MAD = median |x − median|)

1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to estimate σ under normality; k=3.5
is the conventional cut (both from the published robust-statistics
literature; implemented from the formulas).

Physical plan: exact medians via ``F.percentile(0.5)`` (type-7, the
same interpolation as DuckDB ``quantile_cont`` — parity already pinned
by the bootstrap-CI oracle), computed in TWO grouped aggregates (the
MAD needs |x − med| which needs the first median joined back). Each
aggregate is one entity-keyed exchange; the median state per group is
the group's value list — bounded by group size, the irreducible cost of
an EXACT median (swap in approx_percentile for sketch-sized state at
100 TB when 1e-3 quantile error is acceptable; the flag contract is
the same). Group tables are aggregate-sized; both join back broadcast.

Degenerate contract: MAD = 0 (more than half the group at the median)
-> score is NULL and the row is NOT flagged unless it differs from the
median and ``flag_zero_mad`` (then any deviation is infinite-sigma:
flagged True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SIGMA = 1.4826022185056018  # 1 / qnorm(0.75), float64


def mad_outliers(
    df: DataFrame,
    by: str | list[str],
    value_col: str,
    *,
    k: float = 3.5,
    flag_zero_mad: bool = True,
    score_col: str = "robust_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Input rows + ``score_col`` (|x−med| / (1.4826·MAD), signed) and
    ``flag_col``. NULL values get NULL score and False flag."""
    if k <= 0:
        raise ValueError("k must be positive")
    keys = [by] if isinstance(by, str) else list(by)
    v = F.col(value_col).cast("double")

    med = (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(F.percentile(v, F.lit(0.5)).alias("__med"))
    )
    with_med = df.join(F.broadcast(med), keys, "left")
    mad = (
        with_med.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).alias("__mad")
        )
    )
    out = with_med.join(F.broadcast(mad), keys, "left")
    sigma = F.col("__mad") * MAD_SIGMA
    score = F.when(
        v.isNotNull() & (sigma > 0), (v - F.col("__med")) / sigma
    )
    if flag_zero_mad:
        flag = F.when(v.isNull(), F.lit(False)).otherwise(
            F.when(sigma > 0, F.abs(score) > k).otherwise(
                v != F.col("__med")
            )
        )
    else:
        flag = F.coalesce(F.abs(score) > k, F.lit(False))
    return out.withColumn(score_col, score).withColumn(
        flag_col, flag
    ).drop("__med", "__mad")
