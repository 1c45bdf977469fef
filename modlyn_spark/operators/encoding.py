"""Leakage-free categorical feature encoding.

Target (mean) encoding is the classic high-cardinality categorical
transform for the downstream scorer (modlyn's logreg consumes dense
numeric features; reference modlyn/models/_simple_logreg_model.py trains
on an already-numeric matrix). Done naively it leaks the label: a row's
own target contributes to its encoding. The standard fix — and what this
module implements — is OUT-OF-FOLD encoding: rows are assigned to k folds
and each row's encoding is computed from the OTHER k-1 folds only,

    enc(v, f) = (sum_{¬f}(target | cat=v) + m * prior_{¬f})
                / (count_{¬f}(cat=v) + m)

with ``prior_{¬f}`` the out-of-fold global target mean and ``m`` the
smoothing pseudo-count (an unseen category encodes exactly to the prior).

Everything is engine-grade Spark:

- fold assignment is the same portable md5 hash draw as
  ``operators.sampling`` (pure column function of the row key — identical
  folds on any cluster size, partitioning, or engine, and reproducible in
  plain SQL for the oracle);
- statistics are ONE map-side-combinable ``groupBy(cat, fold)`` over the
  data (|cats| × k output rows), rolled up to per-category / per-fold /
  global totals from that tiny aggregate — the raw data is scanned once
  per categorical column and never shuffled by row;
- the encoding table joins back on (cat, fold); AQE broadcasts it when
  small, hash-joins otherwise — no window over strata, so a skewed
  category value costs nothing beyond its aggregate row.

At 100 TB: the only per-row shuffle is the groupBy's partial-aggregated
exchange of (cat, fold, sum, count) partials — bytes proportional to
|distinct categories|·k per mapper, not to the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.sampling import _hash_unit


def fold_column(
    df: DataFrame,
    key_cols: list[str],
    n_folds: int,
    *,
    salt: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``floor(md5_unit(key) * k)``.

    A pure column function of (key, salt): the same row lands in the same
    fold on any partitioning or engine, and a key can never straddle folds
    (leak-free CV by construction). ``u * k`` is exact in double for
    k < 2^20 so the floor is bit-identical across engines.
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    u = _hash_unit(key_cols, salt)
    return df.withColumn(
        out_col, F.floor(u * F.lit(float(n_folds))).cast("long")
    )


def _encode_one(
    b: DataFrame, cat: str, target_col: str, fold_col: str, smoothing: float,
    n_folds: int,
) -> DataFrame:
    # the only per-row pass: map-side-combinable (cat, fold) partials
    a = b.groupBy(cat, fold_col).agg(
        F.sum(target_col).alias("__s"), F.count(target_col).alias("__c")
    )
    # out-of-fold sums are accumulated DIRECTLY (each aggregate row fans
    # out to the k-1 folds it is out-of-fold for), never as total-minus-own:
    # the subtraction form leaks a float-cancellation residue of the row's
    # own fold into its encoding (and breaks the exact no-leakage property
    # the tests pin). All of this runs over the tiny |cats|*k aggregate.
    all_folds = F.array(*[F.lit(i).cast("long") for i in range(n_folds)])
    fanned = a.select(
        cat, "__s", "__c", F.explode(all_folds).alias("__f2")
    ).where(F.col("__f2") != F.col(fold_col))
    oof = fanned.groupBy(cat, "__f2").agg(
        F.sum("__s").alias("__os"), F.sum("__c").alias("__oc")
    )
    ft = a.groupBy(fold_col).agg(
        F.sum("__s").alias("__s"), F.sum("__c").alias("__c")
    )
    ft_oof = (
        ft.select("__s", "__c", F.explode(all_folds).alias("__f2"))
        .where(F.col("__f2") != F.col(fold_col))
        .groupBy("__f2")
        .agg(F.sum("__s").alias("__psum"), F.sum("__c").alias("__pcnt"))
    )
    m = F.lit(float(smoothing))
    joined = (
        a.select(cat, F.col(fold_col).alias("__f2"))
        .join(oof, [cat, "__f2"], "left")
        .join(F.broadcast(ft_oof), "__f2", "left")
    )
    os_, oc = F.coalesce("__os", F.lit(0.0)), F.coalesce("__oc", F.lit(0))
    prior = F.when(F.col("__pcnt") > 0, F.col("__psum") / F.col("__pcnt"))
    den = oc + m
    enc = F.when(den > 0, (os_ + m * prior) / den)
    return joined.select(
        F.col(cat).alias("__k"),
        F.col("__f2").alias("__f"),
        enc.alias("__enc"),
    )


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    target_col: str,
    key_cols: list[str],
    *,
    n_folds: int = 5,
    smoothing: float = 20.0,
    salt: str = "",
    suffix: str = "_te",
    fold_col: str = "fold",
) -> DataFrame:
    """Out-of-fold smoothed mean-target encoding of ``cat_cols``.

    Returns ``df`` plus ``fold_col`` and one ``<cat><suffix>`` double
    column per categorical. Null targets contribute to neither sums nor
    counts; a null category is its own group (null-safe join back). A
    category seen only inside the row's own fold encodes to the
    out-of-fold prior — no information about the row's own label (or its
    fold-mates') ever reaches its encoding.
    """
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    for c in cat_cols + [target_col]:
        if c not in df.columns:
            raise ValueError(f"missing column {c!r}")
    b = fold_column(df, key_cols, n_folds, salt=salt, out_col=fold_col)
    for cat in cat_cols:
        enc = _encode_one(b, cat, target_col, fold_col, smoothing, n_folds)
        b = b.join(
            enc,
            on=b[cat].eqNullSafe(enc["__k"]) & (b[fold_col] == enc["__f"]),
            how="left",
        ).drop("__k", "__f").withColumnRenamed("__enc", cat + suffix)
    return b


def count_encode(
    df: DataFrame,
    cat_cols: list[str],
    *,
    normalize: bool = False,
    suffix: str = "_count",
) -> DataFrame:
    """Frequency encoding: per-category row count (or fraction of total
    when ``normalize``). One map-side-combinable groupBy per column; the
    tiny count table joins back under AQE."""
    out = df
    for cat in cat_cols:
        counts = df.groupBy(cat).agg(F.count(F.lit(1)).alias("__n"))
        if normalize:
            total = counts.agg(F.sum("__n").alias("__tot"))
            counts = counts.crossJoin(F.broadcast(total)).select(
                F.col(cat).alias("__k"),
                (F.col("__n") / F.col("__tot")).alias("__v"),
            )
        else:
            counts = counts.select(
                F.col(cat).alias("__k"), F.col("__n").alias("__v")
            )
        out = (
            out.join(counts, on=out[cat].eqNullSafe(counts["__k"]), how="left")
            .drop("__k")
            .withColumnRenamed("__v", cat + suffix)
        )
    return out
