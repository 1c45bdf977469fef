"""Multi-touch attribution: distribute conversion credit over the
touchpoints that preceded each conversion inside a lookback window.

The marketing/growth-analytics staple (GA-style models, implemented from
their published definitions): given a touch stream (user, ts, channel)
and a conversion stream (user, ts), every conversion assigns credit 1.0
split across its qualifying touches —

- ``last_touch`` / ``first_touch``: all credit to the newest / oldest
  qualifying touch;
- ``linear``: 1/n each;
- ``position_based``: 40% first, 40% last, the remaining 20% split over
  the middles (U-shape; n=1 -> 1.0, n=2 -> 0.5/0.5);
- ``time_decay``: weight 0.5^((conv_ts - touch_ts)/half_life_s),
  normalized per conversion.

Physical plan: the touch-to-conversion pairing is the interval join
(operators/ranges.py — touches as points, conversions as
[conv_ts - lookback, conv_ts) intervals, bucketized so nothing is ever
quadratic; lookback windows all share one length, so each interval
lands in <= 2 buckets). Credit needs per-conversion rank/count — one
window partitioned by the conversion id (conversion fan-in is bounded
by the touches a user makes inside one lookback window, not by history
length). Credits per conversion sum to exactly 1.0 (pytest-pinned).

Conversions with ZERO qualifying touches produce no rows (there is
nothing to credit; count them upstream via a left interval join if the
unattributed rate is the metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.ranges import _as_num, interval_join

_MODELS = ("last_touch", "first_touch", "linear", "position_based",
           "time_decay")


def attribute_conversions(
    touches: DataFrame,
    conversions: DataFrame,
    on: str | list[str],
    *,
    touch_id: str,
    conv_id: str,
    touch_ts: str = "ts",
    conv_ts: str = "ts",
    lookback_s: float,
    model: str = "linear",
    half_life_s: float | None = None,
    credit_col: str = "credit",
) -> DataFrame:
    """(*touch columns, ``conv_id``, ``pos`` (1 = most recent before the
    conversion), ``n_touches``, ``credit_col``) — one row per qualifying
    (conversion, touch) pair. A touch qualifies when
    ``conv_ts - lookback_s <= touch_ts < conv_ts`` (strict upper bound:
    the conversion instant never credits itself)."""
    if model not in _MODELS:
        raise ValueError(f"unknown model {model!r}; one of {_MODELS}")
    if model == "time_decay" and not half_life_s:
        raise ValueError("time_decay needs half_life_s")
    if lookback_s <= 0:
        raise ValueError("lookback_s must be > 0")
    keys = [on] if isinstance(on, str) else list(on)

    # _as_num only routes TIMESTAMP columns through the epoch cast —
    # numeric time columns pass straight through (the timestamp hop
    # truncates to microseconds, which would skew time_decay weights)
    iv = conversions.select(
        *keys,
        F.col(conv_id),
        (_as_num(conversions, conv_ts) - F.lit(float(lookback_s))).alias("__lo"),
        _as_num(conversions, conv_ts).alias("__hi"),
    )
    pts = touches.withColumn("__t", _as_num(touches, touch_ts))
    paired = interval_join(
        pts,
        iv,
        point_col="__t",
        lo_col="__lo",
        hi_col="__hi",
        on=keys,
        closed="left",
        bucket_width=float(lookback_s),
    )

    w = Window.partitionBy(*keys, conv_id)
    recency = [F.col("__t").desc(), F.col(touch_id).desc()]
    pos = F.row_number().over(w.orderBy(*recency))
    pos_asc = F.row_number().over(
        w.orderBy(F.col("__t").asc(), F.col(touch_id).asc())
    )
    n = F.count(F.lit(1)).over(w)
    paired = (
        paired.withColumn("pos", pos.cast("long"))
        .withColumn("__pa", pos_asc)
        .withColumn("n_touches", n.cast("long"))
    )

    if model == "last_touch":
        credit = F.when(F.col("pos") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "first_touch":
        credit = F.when(F.col("__pa") == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "linear":
        credit = F.lit(1.0) / F.col("n_touches")
    elif model == "position_based":
        mid = F.lit(0.2) / (F.col("n_touches") - F.lit(2))
        credit = (
            F.when(F.col("n_touches") == 1, F.lit(1.0))
            .when(F.col("n_touches") == 2, F.lit(0.5))
            .when(F.col("__pa") == 1, F.lit(0.4))
            .when(F.col("pos") == 1, F.lit(0.4))
            .otherwise(mid)
        )
    else:  # time_decay
        wgt = F.pow(
            F.lit(0.5),
            (F.col("__hi") - F.col("__t")) / F.lit(float(half_life_s)),
        )
        credit = wgt / F.sum(wgt).over(w)

    drop = ["__t", "__lo", "__hi", "__pa"]
    return paired.withColumn(credit_col, credit).drop(*drop)


def channel_report(
    attributed: DataFrame,
    channel_col: str,
    *,
    credit_col: str = "credit",
) -> DataFrame:
    """Roll attributed credit up to channels: (channel, conversions_credited
    = sum of credit, touches = row count). One map-side-combinable
    groupBy."""
    return attributed.groupBy(channel_col).agg(
        F.sum(F.col(credit_col)).alias("credited"),
        F.count(F.lit(1)).alias("touches"),
    )
