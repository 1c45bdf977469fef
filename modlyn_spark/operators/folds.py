"""Purged temporal cross-validation folds with an embargo.

Random k-fold on time-series training data leaks: rows adjacent in
time share state (the same session, the same entity trajectory), so a
test row's neighbors in the train split carry its answer. The standard
fix (Lopez de Prado's purged k-fold) splits TIME into contiguous fold
ranges and PURGES a buffer of ``embargo`` seconds around each test
range from that fold's train split — the train/test boundary carries a
hole instead of a seam. Pairs with operators/sampling.py hash_split
(entity-disjoint splits) and time_split (single cutoff): this is the
k-fold variant evaluators actually need for backtests.

Physical plan: fold boundaries are the k-1 exact percentiles of the
timestamp — ONE aggregate (the engine's F.percentile == SQL
quantile_cont parity is pinned by the quantile-normalization tests),
collected as k-1 scalars. Role assignment is then a pure column
expression on (ts, fold) over the rows exploded by the constant fold
sequence — no shuffle at all beyond the one aggregate; the explode
multiplies rows by k (the caller's choice of k IS the output size).
At 100 TB nothing sorts: boundaries come from the percentile sketch
aggregate and every row's k roles are stateless arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch


def time_folds(
    df: DataFrame,
    ts_col: str,
    *,
    n_folds: int,
    embargo: float = 0.0,
    fold_col: str = "fold",
    role_col: str = "role",
) -> DataFrame:
    """All input columns x ``n_folds`` rows, plus ``fold_col``
    (0..n_folds-1) and ``role_col`` in {'test', 'purged', 'train'}:
    for fold k, rows with ts in [q_k, q_{k+1}) are test (q = exact
    timestamp percentiles at i/n_folds; the first range is open below,
    the last closed above), rows within ``embargo`` seconds OUTSIDE the
    test range are purged, and everything else is train. Rows with a
    NULL timestamp are dropped (they cannot be placed)."""
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    if embargo < 0:
        raise ValueError("embargo must be >= 0")
    for c in (fold_col, role_col):
        if c in df.columns:
            raise ValueError(f"output column {c!r} clashes with input")
    t = _epoch(F.col(ts_col))
    qs = [i / n_folds for i in range(1, n_folds)]
    row = df.agg(
        *[F.percentile(t, F.lit(q)).alias(f"q{i}") for i, q in enumerate(qs)]
    ).collect()[0]
    bounds = [float(row[f"q{i}"]) for i in range(len(qs))]

    out = df.where(F.col(ts_col).isNotNull()).select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_folds) - 1))
        ).alias(fold_col),
    )
    k = F.col(fold_col)
    neg_inf, pos_inf = float("-inf"), float("inf")

    def lo_of(i: int) -> float:
        return neg_inf if i == 0 else bounds[i - 1]

    def hi_of(i: int) -> float:
        return pos_inf if i == n_folds - 1 else bounds[i]

    lo = F.lit(neg_inf)
    hi = F.lit(pos_inf)
    for i in range(n_folds):
        lo = F.when(k == i, F.lit(lo_of(i))).otherwise(lo)
        hi = F.when(k == i, F.lit(hi_of(i))).otherwise(hi)
    in_test = (t >= lo) & ((t < hi) | (k == n_folds - 1))
    in_purge = (t >= lo - F.lit(float(embargo))) & (
        t < hi + F.lit(float(embargo))
    )
    role = (
        F.when(in_test, F.lit("test"))
        .when(in_purge, F.lit("purged"))
        .otherwise(F.lit("train"))
    )
    return out.withColumn(role_col, role)
