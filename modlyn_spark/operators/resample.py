"""Time-series resampling to a fixed grid with gap filling.

The feature-engineering step between raw events and windowed models:
aggregate each entity's stream into fixed ``every_s``-second buckets,
then MATERIALIZE the empty buckets (a model consuming "events per day"
needs the zero days, and a forward-filled state column needs rows to
fill into) — the pandas ``resample`` / TimescaleDB ``time_bucket_gapfill``
shape.

Physical plan:

1. one map-side-combinable ``groupBy(keys, bucket)`` computing every
   aggregate in a single pass (bucket = floor(epoch / every_s), a long
   index — buckets are epoch-anchored, timezone-free, SQL-replayable);
2. the per-key [min, max] bucket span (same grouped shuffle,
   re-aggregated — spans are key-count sized);
3. the dense grid via ``sequence`` + ``explode`` on the span — rows
   created ∝ missing buckets, never a cross join;
4. one left join of grid onto aggregates (both sides already hashed by
   (keys, bucket)) and per-column gap fill: ``zero``, ``ffill``
   (last non-null over preceding buckets — one window per key), or
   ``none`` (NULL stays).

A key's grid spans ITS OWN [first, last] activity — resampling does not
fabricate history before an entity existed (the temporal-leakage
stance the as-of/split operators already take). NULL keys/timestamps
are excluded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch

_FILLS = ("none", "zero", "ffill")


def resample(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    aggs: dict[str, Column],
    *,
    every_s: float,
    fill: dict[str, str] | str = "none",
    bucket_col: str = "bucket_ts",
    max_buckets_per_key: int | None = 1_000_000,
) -> DataFrame:
    """One row per (keys, bucket) over each key's dense activity span:
    (keys..., ``bucket_col`` = bucket-start epoch seconds (double),
    *aggs). ``aggs`` maps output names to aggregate Columns (e.g.
    ``{"v": F.avg("value"), "n": F.count(F.lit(1))}``). ``fill`` is one
    policy for all columns or a per-column dict.

    ``max_buckets_per_key`` guards the dense grid: ONE long-lived sparse
    entity (a decade of span at ``every_s=1`` is ~3*10^8 buckets) would
    otherwise build its whole span as a single in-row ``sequence`` array
    before exploding — an executor OOM no partitioning can prevent. The
    span check rides the existing key-count-sized aggregate (no extra
    pass) and raises with the widest key's span so the caller can widen
    ``every_s``, pre-filter the key, or consciously opt out with
    ``max_buckets_per_key=None``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not aggs:
        raise ValueError("aggs must be non-empty")
    if every_s <= 0:
        raise ValueError("every_s must be > 0")
    fills = (
        {name: fill for name in aggs} if isinstance(fill, str) else dict(fill)
    )
    for name in aggs:
        mode = fills.setdefault(name, "none")
        if mode not in _FILLS:
            raise ValueError(f"bad fill {mode!r} for {name!r}")

    bucket = F.floor(_epoch(F.col(ts_col)) / F.lit(float(every_s))).cast(
        "long"
    )
    cond = F.col(ts_col).isNotNull()
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    per = (
        df.where(cond)
        .groupBy(*keys, bucket.alias("__b"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    span = per.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid_lo = F.col("__lo")
    if max_buckets_per_key is not None:
        # enforced INSIDE the plan (F.raise_error in the sequence's lo
        # argument) so the guard costs no extra job and runs wherever the
        # span rows land — the span frame is key-count sized, never
        # data-sized
        span_n = F.col("__hi") - F.col("__lo") + F.lit(1)
        grid_lo = F.when(
            span_n > int(max_buckets_per_key),
            F.raise_error(
                F.concat(
                    F.lit("resample: key ("),
                    F.concat_ws(
                        ", ", *[F.col(k).cast("string") for k in keys]
                    ),
                    F.lit(") spans "),
                    span_n.cast("string"),
                    F.lit(
                        f" buckets at every_s={every_s} (> "
                        f"max_buckets_per_key={int(max_buckets_per_key)}): "
                        "the dense grid would materialize that span as one "
                        "in-row array; widen every_s, pre-filter the key, "
                        "or pass max_buckets_per_key=None"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("__lo"))
    grid = span.select(
        *keys,
        F.explode(F.sequence(grid_lo, F.col("__hi"))).alias("__b"),
    )
    out = grid.join(per, on=keys + ["__b"], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for name in aggs:
        mode = fills[name]
        if mode == "zero":
            out = out.withColumn(
                name, F.coalesce(F.col(name), F.lit(0))
            )
        elif mode == "ffill":
            out = out.withColumn(
                name, F.last(F.col(name), ignorenulls=True).over(w)
            )
    return out.select(
        *keys,
        (F.col("__b") * F.lit(float(every_s))).alias(bucket_col),
        *aggs.keys(),
    )
