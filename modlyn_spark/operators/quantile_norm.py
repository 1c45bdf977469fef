"""Quantile normalization across groups (Bolstad 2003 semantics).

The cross-sample calibration step of expression/omics pipelines
(reference context: modlyn selects features over single-cell expression
matrices; upstream of any such selection, samples are routinely
quantile-normalized so between-sample distribution shifts don't
masquerade as feature signal) — and, generally, the way to force every
group's value distribution onto the shared "average distribution":

1. rank values WITHIN each group (ascending);
2. the reference distribution is the mean value AT EACH RANK across
   groups;
3. each value is replaced by the reference value at its rank.

Implemented from the published method statement (Bolstad et al.,
Bioinformatics 19(2), 2003): ties within a group receive the MEAN of
the reference values their rank range spans (the standard "ties =
average" convention), and when groups have unequal sizes each group's
ranks are mapped onto the reference grid by normalized rank position
with linear interpolation (the common generalization).

Physical plan: one rank window per group (entity-keyed exchange), the
reference distribution is ONE aggregate over (rank -> mean value)
(rank-keyed exchange, output = max-group-size rows), joined back
broadcast. For equal-size groups (the matrix case) everything is exact
closed-form arithmetic — the oracle replicates it in SQL. The
interpolated unequal-size path shares the same joins with one extra
floor/ceil lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    group_col: str | list[str],
    value_col: str,
    *,
    out_col: str = "qnorm",
    tiebreak: str | None = None,
) -> DataFrame:
    """Input rows + ``out_col`` (the quantile-normalized value). NULL
    values pass through as NULL. ``tiebreak`` orders equal values within
    a group deterministically for the RANK assignment; the OUTPUT is
    tie-invariant either way (tied values all receive the mean reference
    value over their rank range — the Bolstad ties convention)."""
    keys = [group_col] if isinstance(group_col, str) else list(group_col)
    v = F.col(value_col).cast("double")
    extra = [tiebreak] if tiebreak and tiebreak not in keys else []
    d = df.where(v.isNotNull()).select(*keys, *extra, v.alias("__v"))

    order = [F.col("__v").asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = d.withColumn("__r", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(Window.partitionBy(*keys))
    )
    # normalized rank position in [0, 1]: (r - 1) / (n - 1); single-row
    # groups sit at 0.5
    pos = F.when(
        F.col("__n") > 1,
        (F.col("__r") - 1.0) / (F.col("__n") - 1.0),
    ).otherwise(F.lit(0.5))
    ranked = ranked.withColumn("__pos", pos)

    # reference grid: mean value at each rank of the LARGEST group size;
    # every group's position maps onto it by interpolation. For
    # equal-size groups this reduces to exact rank-mean lookup.
    max_n = ranked.agg(F.max("__n").alias("m")).collect()[0]["m"]
    if max_n is None:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    grid = F.when(
        F.lit(max_n) > 1, F.col("__pos") * (max_n - 1)
    ).otherwise(F.lit(0.0))
    ranked = ranked.withColumn("__g", grid)
    lo = F.floor(F.col("__g")).cast("long")
    hi = F.ceil(F.col("__g")).cast("long")
    frac = F.col("__g") - lo
    ranked = (
        ranked.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn("__frac", frac)
    )

    # each group's contribution to grid row k: the value at ITS position
    # interpolated — the standard generalization samples each group's
    # empirical quantile function AT the grid positions
    # q_k = k / (max_n - 1), which is again linear interpolation between
    # the group's adjacent ranks. Build it by exploding each group row
    # onto the grid points it brackets is wasteful; instead evaluate the
    # group quantile at each grid point via a self-join on the bracketing
    # rank: grid point k at position p = k/(max_n-1) maps into group g
    # (size n) at fractional rank f = p * (n - 1), bracketed by
    # floor/ceil ranks.
    sizes = ranked.select(*keys, "__n").distinct()
    pts = sizes.crossJoin(
        ranked.sparkSession.range(int(max_n)).select(
            F.col("id").alias("__k")
        )
    )
    p_k = F.when(
        F.lit(max_n) > 1, F.col("__k") / F.lit(float(max_n - 1))
    ).otherwise(F.lit(0.5))
    f_rank = p_k * (F.col("__n") - 1.0)
    pts = (
        pts.withColumn("__fr", f_rank)
        .withColumn("__rlo", (F.floor(F.col("__fr")) + 1).cast("long"))
        .withColumn("__rhi", (F.ceil(F.col("__fr")) + 1).cast("long"))
        .withColumn("__w", F.col("__fr") - F.floor(F.col("__fr")))
    )
    vals = ranked.select(*keys, F.col("__r"), F.col("__v"))
    lo_v = pts.join(
        vals.withColumnRenamed("__r", "__rlo").withColumnRenamed(
            "__v", "__vlo"
        ),
        keys + ["__rlo"],
    )
    both = lo_v.join(
        vals.withColumnRenamed("__r", "__rhi").withColumnRenamed(
            "__v", "__vhi"
        ),
        keys + ["__rhi"],
    )
    sampled = both.select(
        "__k",
        (
            F.col("__vlo")
            + F.col("__w") * (F.col("__vhi") - F.col("__vlo"))
        ).alias("__q"),
    )
    ref = sampled.groupBy("__k").agg(F.avg("__q").alias("__ref"))

    # remap: value -> interpolated reference at its grid position, with
    # Bolstad tie averaging (mean of the remapped values over each tied
    # value range within a group)
    r_lo = ref.select(
        F.col("__k").alias("__lo"), F.col("__ref").alias("__ref_lo")
    )
    r_hi = ref.select(
        F.col("__k").alias("__hi"), F.col("__ref").alias("__ref_hi")
    )
    mapped = (
        ranked.join(F.broadcast(r_lo), "__lo")
        .join(F.broadcast(r_hi), "__hi")
        .withColumn(
            "__qn_raw",
            F.col("__ref_lo")
            + F.col("__frac") * (F.col("__ref_hi") - F.col("__ref_lo")),
        )
    )
    tie_w = Window.partitionBy(*keys, "__v")
    mapped = mapped.withColumn("__qn", F.avg("__qn_raw").over(tie_w))

    # join back on (keys, value): tied rows collapse to the same __qn,
    # so a (keys, value) mapping is exact and multiplicity-safe after
    # dropDuplicates on the mapping side
    mapping = mapped.select(
        *keys, F.col("__v"), F.col("__qn")
    ).dropDuplicates(keys + ["__v"])
    return (
        df.withColumn("__v", v)
        .join(mapping, keys + ["__v"], "left")
        .withColumnRenamed("__qn", out_col)
        .drop("__v")
    )
