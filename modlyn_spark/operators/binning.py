"""Exact equal-frequency binning and quantiles over a distinct-value
histogram.

The usual distributed discretizer reaches for ``approx_percentile`` and
accepts engine-specific sketch error — which makes the result
unverifiable against an independent implementation. This module instead
computes EXACT rank statistics from the value histogram:

1. quantize the value to a declared precision (the contract that bounds
   the distinct set — mandatory for floating columns);
2. ``groupBy(value).count()`` — map-side combinable, shuffle bytes
   proportional to ``|distinct values|``, never to the row count;
3. one cumulative-sum window over the HISTOGRAM (``|V|`` rows, not the
   data) yields every rank boundary exactly;
4. assignment joins the tiny ``value → bin`` table back (AQE broadcasts
   it when small).

All arithmetic is integer (``div``), so any SQL engine replays it
bit-identically — the property the driver's DuckDB oracle gate needs.

At 100 TB: the only per-row shuffle is the histogram groupBy's partial
aggregate; the global window runs over distinct values only (the
``precision`` contract keeps that ≲ millions — a single reducer over a
few million rows, not over the corpus).

Bin semantics (``quantile_bins``): sort rows by value; with 0-based row
positions, a row at position ``p`` belongs to bin ``p * k div n`` — and
every row of a TIED value takes the bin of the value's FIRST position,
so a value never straddles bins (the defining property of discrete
equal-frequency binning; bins are near-equal up to tie mass).

Quantile semantics (``exact_quantiles``): the lower empirical quantile —
the smallest value whose inclusive cumulative count reaches
``ceil(p * n)`` (type-1 in the Hyndman–Fan taxonomy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FLOATING = (T.FloatType, T.DoubleType)


def _quantized(df: DataFrame, col: str, precision: int | None) -> Column:
    dt = df.schema[col].dataType
    if precision is None:
        if isinstance(dt, _FLOATING):
            raise ValueError(
                f"column '{col}' is {dt.simpleString()}: pass precision= "
                "(decimal places) so the distinct-value histogram is "
                "bounded — exact binning over unquantized doubles "
                "degenerates to one histogram row per data row"
            )
        return F.col(col)
    return F.round(F.col(col), precision)


def _histogram(df: DataFrame, col: str, precision: int | None) -> DataFrame:
    """``(__v, __c)`` — count per non-null quantized value."""
    v = _quantized(df, col, precision)
    return (
        df.where(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def _with_ranks(hist: DataFrame) -> DataFrame:
    """Add ``__a`` (exclusive rank of the value's first row, 0-based),
    ``__cum`` (inclusive) and ``__n`` (total). Window input is the
    histogram, not the data."""
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.withColumn("__cum", F.sum("__c").over(w))
        .withColumn("__a", F.col("__cum") - F.col("__c"))
        .withColumn("__n", F.sum("__c").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)))
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    k: int,
    *,
    precision: int | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (quantile) discretization into ``k`` bins.

    Adds ``out_col`` (default ``<col>_bin``) ∈ [0, k): bin of the
    value's first sorted position, ``a * k div n`` — exact integer
    arithmetic, tie-coherent, engine-portable. NULL values get a NULL
    bin. ``a ≤ n-1`` ⇒ ``a*k div n ≤ k-1``, no clamp needed.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    out = out_col or f"{col}_bin"
    ranked = _with_ranks(_histogram(df, col, precision))
    bins = ranked.select(
        "__v",
        F.expr(f"__a * {int(k)} div __n").cast("long").alias(out),
    )
    v = _quantized(df, col, precision)
    return (
        df.withColumn("__v", v)
        .join(bins, on="__v", how="left")
        .drop("__v")
    )


def quantile_bin_summary(
    df: DataFrame, col: str, k: int, *, precision: int | None = None
) -> DataFrame:
    """Per-bin ``(bin, lo, hi, n_rows, n_values)`` — the audit table for
    :func:`quantile_bins` (same arithmetic, aggregated over the
    histogram; no second data pass)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    ranked = _with_ranks(_histogram(df, col, precision))
    return (
        ranked.select(
            F.expr(f"__a * {int(k)} div __n").cast("long").alias("bin"),
            "__v", "__c",
        )
        .groupBy("bin")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.sum("__c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    *,
    precision: int | None = None,
) -> DataFrame:
    """Exact lower empirical quantiles ``(p, q)``: the smallest value
    whose inclusive cumulative count reaches ``ceil(p * n)`` (p = 0 maps
    to the minimum). One histogram pass serves every requested p."""
    if not probs:
        raise ValueError("probs must not be empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob {p} outside [0, 1]")
    ranked = _with_ranks(_histogram(df, col, precision))
    out = None
    for p in probs:
        # ceil(p*n) with p exact-decimal: scale to integer arithmetic so
        # both engines compute the same target rank (p given to <= 6 dp)
        num = int(round(p * 1_000_000))
        target = F.expr(f"CAST(ceil(__n * {num} / 1000000.0) AS BIGINT)")
        q = (
            ranked.where(F.col("__cum") >= F.greatest(target, F.lit(1)))
            .agg(F.min("__v").alias("q"))
            .select(F.lit(float(p)).alias("p"), "q")
        )
        out = q if out is None else out.unionAll(q)
    return out


def robust_scale(
    df: DataFrame,
    col: str,
    *,
    precision: int | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Median/IQR standardization: ``(x - median) / (q75 - q25)`` with
    the exact type-1 quantiles of :func:`exact_quantiles` — the
    outlier-robust companion of z-score ``standardize``. A zero IQR
    (constant-ish column) yields NULL, never a division blow-up."""
    out = out_col or f"{col}_robust"
    q = {
        r["p"]: r["q"]
        for r in exact_quantiles(
            df, col, [0.25, 0.5, 0.75], precision=precision
        ).collect()
    }
    med, iqr = q[0.5], q[0.75] - q[0.25]
    scaled = (
        F.when(F.lit(iqr) != 0.0, (F.col(col) - F.lit(med)) / F.lit(iqr))
    )
    return df.withColumn(out, scaled)
