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


# exact double CDF of Poisson(1) at k = 0..8 (repr round-trips; DuckDB
# parses the identical literals to the identical doubles — the pii.py
# shared-constant contract). Draws beyond 8 (p ~ 1.1e-6) cap at 9.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)

_U32 = float(1 << 32)




def _replicate_means(df, metric_col, groups, keys, *, b, alpha, seed):
    """(base, means): the NULL-filtered keyed base and the per-(group,
    replicate) Poisson-weighted means — shared by bootstrap_ci and
    bootstrap_lift_ci so both draw the SAME weights per row."""
    if b < 2:
        raise ValueError("b must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    from modlyn_spark.session import ensure_parallelism

    x = F.col(metric_col).cast("double")
    # fan the base out BEFORE the b-way explode: the replicate stage does
    # b x rows md5 draws with no exchange between scan and aggregate, so
    # a small single-row-group source serializes the whole bootstrap onto
    # one core (measured: 5M draws at sf0.1 ran ~4s serial, ~0.3s spread;
    # min_bytes=1 because the explode amplifies work b-fold past the
    # input bytes)
    base = ensure_parallelism(
        df.where(x.isNotNull()).select(
            *groups, x.alias("__x"),
            F.concat_ws(
                "|", *[F.col(k).cast("string") for k in keys]
            ).alias("__k"),
        ),
        min_bytes=1,
    )
    rep = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__r")
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("__k"), F.col("__r").cast("string"),
                    F.lit(str(int(seed))),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long") / F.lit(_U32)
    chain = F.when(u < F.lit(_POISSON1_CDF[0]), F.lit(0))
    for k in range(1, len(_POISSON1_CDF)):
        chain = chain.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k))
    w = chain.otherwise(F.lit(len(_POISSON1_CDF))).cast("double")
    means = (
        rep.select(*groups, "__r", F.col("__x"), w.alias("__w"))
        .groupBy(*groups, "__r")
        .agg(F.sum(F.col("__w") * F.col("__x")).alias("__swx"),
             F.sum("__w").alias("__sw"))
        .select(
            *groups, "__r",
            F.when(F.col("__sw") > 0, F.col("__swx") / F.col("__sw"))
            .alias("__mb"),
        )
    )
    return base, means


def bootstrap_ci(
    df: DataFrame,
    metric_col: str,
    group_cols: list[str] | str,
    key_cols: list[str] | str,
    *,
    b: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for each group's metric
    mean — the scipy-free uncertainty companion to
    :func:`welch_ab_test` (which reports t without a p-value).

    The Poisson bootstrap: resample ``b`` times by giving every row an
    independent Poisson(1) WEIGHT instead of drawing with replacement —
    the classic trick that makes the bootstrap embarrassingly
    distributable (each row's weights are a pure function of
    ``md5(key|replicate|seed)``, no global sampling step, identical on
    any cluster/partitioning/engine). Per replicate the weighted mean
    aggregates map-side; the only shuffle is groups x b partial rows.
    The [alpha/2, 1-alpha/2] percentiles of the b replicate means are
    the CI (exact ``F.percentile``; type-7 interpolation in both
    engines).

    ``key_cols`` must identify rows uniquely (the repo-wide draw-key
    contract); NULL metric values are excluded. Cost is honest: the
    explode puts every row through the aggregate b times (map-side
    combined) — size ``b`` to the budget; 100-500 is the usual range.
    Returns (group..., mean, ci_lo, ci_hi, b).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    base, means = _replicate_means(
        df, metric_col, groups, keys, b=b, alpha=alpha, seed=seed
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = means.groupBy(*groups).agg(
        F.percentile("__mb", F.lit(lo)).alias("__lo"),
        F.percentile("__mb", F.lit(hi)).alias("__hi"),
    )
    point = base.groupBy(*groups).agg(F.avg("__x").alias("__mean"))
    return point.join(ci, groups).select(
        *groups,
        F.round("__mean", 6).alias("mean"),
        F.round("__lo", 6).alias("ci_lo"),
        F.round("__hi", 6).alias("ci_hi"),
        F.lit(b).alias("b"),
    )


def duckdb_bootstrap_sql(
    table: str,
    metric_col: str,
    group_cols: list[str],
    key_expr: str,
    *,
    b: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`bootstrap_ci`, generated from the SAME
    Poisson CDF constants (single source of truth)."""
    g = ", ".join(group_cols)
    case = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    ) + f" ELSE {len(_POISSON1_CDF)} END"
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    return f"""
        WITH base AS (
          SELECT {g}, CAST({metric_col} AS DOUBLE) AS x, {key_expr} AS k
          FROM {table} WHERE {metric_col} IS NOT NULL),
        rep AS (SELECT base.*, unnest(range(0, {int(b)})) AS r FROM base),
        d AS (SELECT *, CAST(('0x' || substr(md5(
                  k || '|' || r || '|{int(seed)}'), 1, 8)) AS BIGINT)
                  / 4294967296.0 AS u
              FROM rep),
        wt AS (SELECT *, CAST({case} AS DOUBLE) AS w FROM d),
        m AS (SELECT {g}, r,
                     CASE WHEN sum(w) > 0 THEN sum(w * x) / sum(w) END AS mb
              FROM wt GROUP BY {g}, r),
        ci AS (SELECT {g}, quantile_cont(mb, {lo!r}) AS lo,
                      quantile_cont(mb, {hi!r}) AS hi
               FROM m GROUP BY {g}),
        pt AS (SELECT {g}, avg(x) AS mean FROM base GROUP BY {g})
        SELECT pt.{group_cols[0]}{"".join(", pt." + c for c in group_cols[1:])},
               round(pt.mean, 6) AS mean,
               round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi,
               {int(b)} AS b
        FROM pt JOIN ci USING ({g})
    """


def bootstrap_lift_ci(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    key_cols: list[str] | str,
    *,
    control,
    b: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> DataFrame:
    """Percentile-bootstrap CI for the LIFT (treatment mean − control
    mean, absolute and relative) of every group against ``control`` —
    the interval an experiment readout actually needs. Within each
    replicate the SAME Poisson weights drive both sides (the difference
    of per-replicate means is the bootstrapped statistic, so
    between-replicate correlation is handled by construction, unlike
    differencing two marginal CIs). Shares :func:`bootstrap_ci`'s draw:
    same (key, replicate, seed) → same weight, either output is
    reproducible against the other. Returns one row per non-control
    group: (group, lift, lift_lo, lift_hi, rel_lift, rel_lo, rel_hi, b);
    relative columns are NULL when a replicate's control mean is 0.
    """
    groups = [group_col]
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    base, means = _replicate_means(
        df, metric_col, groups, keys, b=b, alpha=alpha, seed=seed
    )
    ctrl = means.where(F.col(group_col) == F.lit(control)).select(
        F.col("__r"), F.col("__mb").alias("__mc")
    )
    diffs = (
        means.where(F.col(group_col) != F.lit(control))
        .join(F.broadcast(ctrl), "__r")
        .select(
            group_col,
            "__r",
            (F.col("__mb") - F.col("__mc")).alias("__d"),
            F.when(
                F.col("__mc") != 0,
                (F.col("__mb") - F.col("__mc")) / F.col("__mc"),
            ).alias("__rl"),
        )
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = diffs.groupBy(group_col).agg(
        F.percentile("__d", F.lit(lo)).alias("__dlo"),
        F.percentile("__d", F.lit(hi)).alias("__dhi"),
        F.percentile("__rl", F.lit(lo)).alias("__rlo"),
        F.percentile("__rl", F.lit(hi)).alias("__rhi"),
    )
    pt = base.groupBy(group_col).agg(F.avg("__x").alias("__m"))
    pc = pt.where(F.col(group_col) == F.lit(control)).select(
        F.col("__m").alias("__pmc")
    )
    point = pt.where(F.col(group_col) != F.lit(control)).crossJoin(
        F.broadcast(pc)
    )
    return point.join(ci, group_col).select(
        group_col,
        F.round(F.col("__m") - F.col("__pmc"), 6).alias("lift"),
        F.round("__dlo", 6).alias("lift_lo"),
        F.round("__dhi", 6).alias("lift_hi"),
        F.round(
            F.when(
                F.col("__pmc") != 0,
                (F.col("__m") - F.col("__pmc")) / F.col("__pmc"),
            ),
            6,
        ).alias("rel_lift"),
        F.round("__rlo", 6).alias("rel_lo"),
        F.round("__rhi", 6).alias("rel_hi"),
        F.lit(b).alias("b"),
    )


def duckdb_lift_sql(
    table: str,
    metric_col: str,
    group_col: str,
    key_expr: str,
    *,
    control,
    b: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`bootstrap_lift_ci` (same constants)."""
    case = "CASE " + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    ) + f" ELSE {len(_POISSON1_CDF)} END"
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ctl = f"'{control}'" if isinstance(control, str) else repr(control)
    return f"""
        WITH base AS (
          SELECT {group_col} AS g, CAST({metric_col} AS DOUBLE) AS x,
                 {key_expr} AS k
          FROM {table} WHERE {metric_col} IS NOT NULL),
        rep AS (SELECT base.*, unnest(range(0, {int(b)})) AS r FROM base),
        d AS (SELECT *, CAST(('0x' || substr(md5(
                  k || '|' || r || '|{int(seed)}'), 1, 8)) AS BIGINT)
                  / 4294967296.0 AS u
              FROM rep),
        wt AS (SELECT *, CAST({case} AS DOUBLE) AS w FROM d),
        m AS (SELECT g, r,
                     CASE WHEN sum(w) > 0 THEN sum(w * x) / sum(w) END AS mb
              FROM wt GROUP BY g, r),
        diffs AS (SELECT t.g, t.r, t.mb - c.mb AS dd,
                         CASE WHEN c.mb <> 0 THEN (t.mb - c.mb) / c.mb END
                             AS rl
                  FROM m t JOIN m c ON t.r = c.r AND c.g = {ctl}
                  WHERE t.g <> {ctl}),
        ci AS (SELECT g, quantile_cont(dd, {lo!r}) AS dlo,
                      quantile_cont(dd, {hi!r}) AS dhi,
                      quantile_cont(rl, {lo!r}) AS rlo,
                      quantile_cont(rl, {hi!r}) AS rhi
               FROM diffs GROUP BY g),
        pt AS (SELECT g, avg(x) AS m FROM base GROUP BY g),
        pc AS (SELECT m AS mc FROM pt WHERE g = {ctl})
        SELECT pt.g AS {group_col},
               round(pt.m - pc.mc, 6) AS lift,
               round(ci.dlo, 6) AS lift_lo, round(ci.dhi, 6) AS lift_hi,
               round(CASE WHEN pc.mc <> 0
                          THEN (pt.m - pc.mc) / pc.mc END, 6) AS rel_lift,
               round(ci.rlo, 6) AS rel_lo, round(ci.rhi, 6) AS rel_hi,
               {int(b)} AS b
        FROM pt CROSS JOIN pc JOIN ci ON ci.g = pt.g
        WHERE pt.g <> {ctl}
    """
