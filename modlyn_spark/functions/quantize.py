"""Per-vector int8 quantization of embedding columns — pure JVM HOFs.

Serving and ANN systems store embeddings as int8 with a per-vector
affine codec (the standard "scalar quantization" baseline every vector
database documents: code = round((x − min) / scale), scale =
(max − min) / 255). A 4-byte-float → 1-byte-code cut is 4× less
storage/shuffle — at 100 TB of embeddings that is the difference
between a broadcastable index and an impossible one, and the
reconstruction-error column tells you per-vector whether the codec is
safe (PQ in operators/pq.py is the heavier 64× cousin; this is the
cheap first rung).

Everything is `transform`/`aggregate` higher-order functions over the
array column — JVM-side, zero Python, zero shuffle, and every step
(sub, div, mul, add, floor) is an exactly-rounded IEEE-754 op, so any
SQL engine reproduces codes AND error bit-for-bit. Rounding is
`floor(u + 0.5)` explicitly — engines disagree on round()'s half rule
(HALF_UP vs HALF_EVEN vs away-from-zero); floor(+0.5) is the same
everywhere.

Degenerate contract: a constant vector (max = min) has scale 0 — codes
are all 0 and dequantization returns the constant exactly (error 0).
NULL vectors pass through as NULL codes/NULL error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # int8 code range [0, 255] (unsigned convention)


def quantize_vector(vec: Column) -> tuple[Column, Column, Column]:
    """(codes array<int>, min double, scale double) for one embedding
    column. Codes are clamped to [0, LEVELS]."""
    v = F.transform(vec, lambda x: x.cast("double"))
    mn = F.array_min(v)
    mx = F.array_max(v)
    scale = (mx - mn) / F.lit(float(LEVELS))
    code = F.transform(
        v,
        lambda x: F.when(scale > 0, F.floor((x - mn) / scale + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # clamp: float round-up at the top edge can yield LEVELS + 1
    code = F.transform(
        code,
        lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(LEVELS)),
    )
    return code, mn, scale


def dequantize_expr(codes: Column, mn: Column, scale: Column) -> Column:
    """Reconstructed vector: mn + code * scale (array<double>)."""
    return F.transform(
        codes, lambda c: mn + c.cast("double") * scale
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    *,
    out_prefix: str = "q_",
    error_ndigits: int = 10,
) -> DataFrame:
    """Input rows + ``{p}codes`` (array<int>), ``{p}min``, ``{p}scale``
    and ``{p}mse`` (mean squared reconstruction error, rounded at
    ``error_ndigits`` — the only column whose float reduction order
    could differ across engines is this sum, and it runs left-to-right
    inside ONE array in both, so rounding is belt-and-braces)."""
    p = out_prefix
    codes, mn, scale = quantize_vector(F.col(vec_col))
    out = (
        df.withColumn(f"{p}codes", codes)
        .withColumn(f"{p}min", mn)
        .withColumn(f"{p}scale", scale)
    )
    recon = dequantize_expr(F.col(f"{p}codes"), F.col(f"{p}min"), F.col(f"{p}scale"))
    sq = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        recon,
        lambda a, b: (a - b) * (a - b),
    )
    mse = F.when(
        F.size(vec_col) > 0,
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(vec_col).cast("double"),
    )
    return out.withColumn(f"{p}mse", F.round(mse, error_ndigits))
