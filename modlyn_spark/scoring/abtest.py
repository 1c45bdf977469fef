"""Welch two-sample tests for experiment (A/B) metric comparison.

The readout step after a hash split (operators/sampling.py) ships
variants: for each metric and each treatment group vs the control,
Welch's unequal-variance t statistic

    t  = (m_t − m_c) / sqrt(v_t/n_t + v_c/n_c)
    df = (v_t/n_t + v_c/n_c)² /
         ((v_t/n_t)²/(n_t−1) + (v_c/n_c)²/(n_c−1))

plus the relative lift. The statistic and degrees of freedom are exact
closed forms over per-group (n, mean, sample variance) — ONE
map-side-combinable ``groupBy(group)`` aggregating every metric in a
single pass; the control row then broadcasts into a tiny group-count x
metric-count frame. No p-value column: the t CDF needs an incomplete
beta that neither Spark SQL nor the no-scipy sandbox provides — consume
t with the caller's preferred tables (|t| > 1.96 at the df this
operator reports is the usual large-sample gate). NULL metric values
are excluded per metric (Spark avg/var semantics, mirrored by the
oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_ab_test(
    df: DataFrame,
    group_col: str,
    metric_cols: list[str] | str,
    *,
    control,
) -> DataFrame:
    """One row per (group, metric) for every group != ``control``:
    (group, metric, n_t, mean_t, n_c, mean_c, lift, t, df). t and df
    are NULL when either side has < 2 rows or both variances are 0."""
    metrics = [metric_cols] if isinstance(metric_cols, str) else list(
        metric_cols
    )
    if not metrics:
        raise ValueError("metric_cols must be non-empty")
    aggs = []
    for m in metrics:
        aggs += [
            F.count(F.col(m)).alias(f"__n_{m}"),
            F.avg(F.col(m)).alias(f"__m_{m}"),
            F.var_samp(F.col(m)).alias(f"__v_{m}"),
        ]
    per = df.where(F.col(group_col).isNotNull()).groupBy(
        F.col(group_col).alias("group")
    ).agg(*aggs)
    ctrl = per.where(F.col("group") == F.lit(control)).select(
        *[
            c
            for m in metrics
            for c in (
                F.col(f"__n_{m}").alias(f"__cn_{m}"),
                F.col(f"__m_{m}").alias(f"__cm_{m}"),
                F.col(f"__v_{m}").alias(f"__cv_{m}"),
            )
        ]
    )
    tr = per.where(F.col("group") != F.lit(control))
    j = tr.crossJoin(F.broadcast(ctrl))

    parts = []
    for m in metrics:
        nt, mt, vt = (
            F.col(f"__n_{m}"),
            F.col(f"__m_{m}"),
            F.col(f"__v_{m}"),
        )
        nc, mc, vc = (
            F.col(f"__cn_{m}"),
            F.col(f"__cm_{m}"),
            F.col(f"__cv_{m}"),
        )
        se2 = vt / nt + vc / nc
        ok = (nt >= 2) & (nc >= 2) & (se2 > 0)
        t = F.when(ok, (mt - mc) / F.sqrt(se2))
        dof = F.when(
            ok,
            (se2 * se2)
            / (
                (vt / nt) * (vt / nt) / (nt - 1)
                + (vc / nc) * (vc / nc) / (nc - 1)
            ),
        )
        lift = F.when(mc != 0, (mt - mc) / mc)
        parts.append(
            j.select(
                "group",
                F.lit(m).alias("metric"),
                nt.alias("n_t"),
                mt.alias("mean_t"),
                nc.alias("n_c"),
                mc.alias("mean_c"),
                lift.alias("lift"),
                t.alias("t"),
                dof.alias("df"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
