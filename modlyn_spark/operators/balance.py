"""Repeat-factor sampling: class-balanced oversampling plans.

Long-tailed label distributions starve rare classes of gradient signal.
The published fix for detection/classification corpora (Gupta et al.,
"LVIS", CVPR 2019, §4 — implemented here from the paper's formulas) is
repeat-factor sampling: per category, a repeat factor

    r_c = max(1, sqrt(t / f_c))        f_c = fraction of rows with c

(t = the frequency threshold below which classes get oversampled); a
multi-label row inherits the MAX over its labels; each epoch the row
appears floor(r) times plus one more with probability frac(r). The
stochastic rounding here is a deterministic hash draw of
(id, epoch, salt) — the same portable md5 family as
operators/sampling.py — so the epoch plan is a pure function of the
data, reproducible bit-for-bit on any engine/cluster.

Reference context: modlyn's DataLoader shuffles but never rebalances
(`/root/reference/modlyn/models/_simple_logreg_datamodule.py:174-202`);
class imbalance is visible in the quickstart's min-class-frequency
filter. This operator is the oversampling step a training pipeline puts
between curation and batching.

Physical plan: the frequency table is ONE aggregate over the (exploded,
for multi-label) label column — aggregate-sized, broadcast back; the
draw is a pure hash column; copies materialize via ``explode(sequence)``
with per-row width r_I ≤ ceil(sqrt(t·n)) (bounded: a singleton class in
an n-row corpus has f_c = 1/n). No data-sized shuffle anywhere — the
output is a map-side expansion of the input, which is exactly what an
oversampling plan must be at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.sampling import _hash_unit


def repeat_factors(
    df: DataFrame,
    label_col: str,
    *,
    threshold: float,
    multi_label: bool = False,
    factor_col: str = "repeat_factor",
) -> DataFrame:
    """Input rows + ``factor_col`` (the real-valued r_I >= 1).

    ``multi_label=True`` treats ``label_col`` as an array column and
    takes the max r_c over the row's labels; rows with NULL (or empty)
    labels get r_I = 1 (never oversampled)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    # f_c denominator is the ROW count (LVIS: fraction of images
    # containing c), not the exploded label count
    n = df.count()
    if n == 0:
        return df.withColumn(factor_col, F.lit(1.0))
    lab = (
        # array_distinct first: a row listing a label twice still
        # contains it once
        F.explode(F.array_distinct(label_col))
        if multi_label
        else F.col(label_col)
    ).alias("__lab")
    freq = (
        df.select(lab)
        .where(F.col("__lab").isNotNull())
        .groupBy("__lab")
        .agg((F.count(F.lit(1)) / F.lit(float(n))).alias("__f"))
        .withColumn(
            "__r",
            F.greatest(
                F.lit(1.0), F.sqrt(F.lit(float(threshold)) / F.col("__f"))
            ),
        )
        .drop("__f")
    )
    if multi_label:
        # r per label ships as a broadcast map LITERAL (label vocabulary
        # contract, same as the label encoders elsewhere) so the per-row
        # max is a pure column expression — zero shuffle, zero join
        rows = freq.collect()
        if len(rows) > 1_000_000:
            raise ValueError(
                f"{len(rows)} distinct labels — the broadcast-map "
                "contract assumes a vocabulary-sized label set"
            )
        if rows:
            rmap = F.create_map(
                *[
                    x
                    for r in rows
                    for x in (F.lit(r["__lab"]), F.lit(float(r["__r"])))
                ]
            )
            per_row = F.array_max(
                F.filter(
                    F.transform(
                        F.array_distinct(label_col),
                        lambda l: F.element_at(rmap, l),
                    ),
                    lambda r: r.isNotNull(),
                )
            )
        else:
            per_row = F.lit(None).cast("double")
        return df.withColumn(
            factor_col, F.coalesce(per_row, F.lit(1.0))
        )
    joined = df.join(
        F.broadcast(freq), F.col(label_col) == F.col("__lab"), "left"
    ).drop("__lab")
    return joined.withColumn(
        factor_col, F.coalesce(F.col("__r"), F.lit(1.0))
    ).drop("__r")


def oversample_plan(
    df: DataFrame,
    id_cols: list[str],
    label_col: str,
    *,
    threshold: float,
    epoch: int = 0,
    salt: str = "",
    multi_label: bool = False,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """The epoch's materialized oversampling plan: each input row
    repeated ``floor(r_I) + Bernoulli(frac(r_I))`` times (deterministic
    hash draw of (id, epoch, salt)), with ``copy_col`` in [0, n_I).
    Every input row appears at least once (r_I >= 1)."""
    if epoch < 0:
        raise ValueError("epoch must be >= 0")
    scored = repeat_factors(
        df, label_col, threshold=threshold, multi_label=multi_label
    )
    u = _hash_unit(id_cols, f"rfs|{epoch}|{salt}")
    n_rep = (
        F.floor("repeat_factor").cast("long")
        + (u < F.col("repeat_factor") - F.floor("repeat_factor"))
        .cast("long")
    )
    return (
        scored.withColumn("__n", n_rep)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def effective_number_weights(
    df: DataFrame,
    label_col: str,
    *,
    beta: float = 0.999,
    ndigits: int = 8,
) -> DataFrame:
    """Class-balanced loss weights by effective number of samples (Cui
    et al., "Class-Balanced Loss Based on Effective Number of Samples",
    CVPR 2019 — implemented from the paper's formulas):

        E_c = (1 - beta^n_c) / (1 - beta)      (effective sample count)
        w_c = (1 - beta) / (1 - beta^n_c)      (inverse), normalized so
                                               sum_c w_c = n_classes.

    beta -> 0 recovers uniform weights, beta -> 1 recovers inverse
    frequency; the paper's beta = (N-1)/N interpolates. Output:
    ``(label, n, weight)``, one row per class, rounded to ``ndigits``
    (the normalizing sum is class-cardinality-sized, so the rounded
    result is engine-identical).

    Physical plan: ONE map-side-combinable count aggregate; the
    normalization is a window over the class-cardinality-sized result
    (never data-sized). NULL labels are excluded."""
    if not 0.0 <= beta < 1.0:
        raise ValueError("beta must be in [0, 1)")
    counts = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    raw = (F.lit(1.0) - F.lit(float(beta))) / (
        F.lit(1.0) - F.pow(F.lit(float(beta)), F.col("n").cast("double"))
    )
    from pyspark.sql import Window as _W

    scored = counts.withColumn("__raw", raw)
    norm = F.sum("__raw").over(_W.partitionBy())
    k = F.count(F.lit(1)).over(_W.partitionBy())
    return scored.withColumn(
        "weight",
        F.round(F.col("__raw") / norm * k.cast("double"), ndigits),
    ).drop("__raw")
