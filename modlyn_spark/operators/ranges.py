"""Bucketized interval (range) join — point-in-RANGE enrichment.

The as-of join (operators/asof.py) answers "latest state at or before
t"; its dual over VALIDITY INTERVALS — match each point to the
interval(s) [lo, hi] containing it — is the other join a feature
platform needs: SCD-style dimension validity windows, maintenance /
promotion / outage windows, label horizons. Naively Spark plans
``p BETWEEN lo AND hi`` (no equi key, or a hot key) as a nested-loop
over O(points x intervals); the classic fix (the same idea behind
Databricks' range-join binning) is implemented here natively:

1. pick a bucket width ``w`` (auto: the median interval length from one
   ``percentile_approx`` aggregate, widened so no interval spans more
   than ``max_replication`` buckets);
2. each interval EXPLODES to its covered buckets
   floor(lo/w)..floor(hi/w) — replication ~ len/w ≈ 2x at the median;
3. each point maps to its single bucket floor(p/w);
4. equi-join on (keys..., bucket) + the residual bound predicate —
   every qualifying (point, interval) pair meets on EXACTLY ONE bucket
   (the point's), so no dedup pass is needed.

The shuffle is on (keys, bucket) — time-locality becomes the partition
key, so a hot equi-key (one giant user) still spreads across its time
buckets: bucketization doubles as skew mitigation for the join the
as-of operator handles with explicit salting.

``intervalize`` builds validity intervals from a state-change history
(valid_from = ts, valid_to = next ts per entity — the lead-window
construction every SCD2 pipeline uses), making
``interval_join(points, intervalize(history), closed='left')``
equivalent to the as-of join on the same history (property-tested).

Timestamps (LTZ or NTZ) are normalized to epoch seconds through the
``windows._epoch`` hop; numeric range columns pass through. Intervals
with NULL bounds are dropped (an open-ended validity tail must be
capped by the caller — e.g. intervalize's ``end_cap``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch


def _as_num(df: DataFrame, col: str) -> Column:
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    return _epoch(c) if dt.startswith("timestamp") else c.cast("double")


def intervalize(
    history: DataFrame,
    key,
    ts_col: str,
    *,
    end_cap=None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """State-change history -> validity intervals (SCD2 construction):
    per ``key``, ``valid_from`` = row ts, ``valid_to`` = next row's ts
    (half-open [from, to) when joined with ``closed='left'``). The last
    state per key has no successor: its ``valid_to`` is ``end_cap``
    (required — pass the snapshot/watermark time; rows are NOT silently
    dropped or left unbounded)."""
    if end_cap is None:
        raise ValueError(
            "end_cap is required: the latest state per key has no "
            "successor row; cap its validity at the snapshot time"
        )
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    cap = (
        end_cap
        if isinstance(end_cap, Column)
        # match the ts column's exact type (a python datetime literal
        # would otherwise coalesce LTZ against an NTZ lead and fail)
        else F.lit(end_cap).cast(dict(history.dtypes)[ts_col])
    )
    return history.select(
        *history.columns,
        F.col(ts_col).alias(valid_from),
        F.coalesce(F.lead(ts_col).over(w), cap).alias(valid_to),
    ).drop(ts_col)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | str | None = None,
    how: str = "inner",
    closed: str = "both",
    bucket_width: float | None = None,
    max_replication: int = 1024,
) -> DataFrame:
    """Join each point row to every interval row with
    lo (<|<=) point (<|<=) hi (per ``closed``: 'both', 'left' = [lo,hi),
    'right' = (lo,hi], 'neither'), plus optional equi keys ``on``
    (same-named columns on both sides). ``how``: 'inner' or 'left'
    (unmatched points kept, interval columns NULL).

    ``bucket_width`` (in epoch seconds for temporal columns) defaults to
    the median interval length, widened to ``max_len/max_replication``
    so a pathological long interval cannot explode the build side.
    Interval rows with NULL bounds are dropped; NULL points never match
    (and surface unmatched under 'left')."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed: {closed!r}")
    keys = [on] if isinstance(on, str) else list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"column clash between sides (rename first): {sorted(overlap)}"
        )

    p_num = _as_num(points, point_col)
    lo_num = _as_num(intervals, lo_col)
    hi_num = _as_num(intervals, hi_col)
    # NULL-bounded and inverted (hi < lo) intervals are unmatchable —
    # drop them before the explode (sequence() would walk an inverted
    # pair DESCENDING and replicate garbage buckets)
    iv = intervals.where(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (lo_num <= hi_num)
    )

    if bucket_width is None:
        stats = iv.agg(
            F.percentile_approx(hi_num - lo_num, 0.5).alias("med"),
            F.max(hi_num - lo_num).alias("mx"),
            F.min(lo_num).alias("lo_min"),
            F.max(hi_num).alias("hi_max"),
        ).collect()[0]
        med = stats["med"] or 0.0
        mx = stats["mx"] or 0.0
        w = max(float(med), float(mx) / float(max_replication))
        if w <= 0.0:
            # every interval is zero-length (instantaneous states): no
            # length to derive a width from. A fixed epsilon here would
            # make bucket ids floor(t/1e-9) ~ 1e18 for epoch-seconds data
            # (long-overflow territory under ANSI, and degenerate
            # single-row buckets) — scale to the DATA instead: the whole
            # [min(lo), max(hi)] span sliced into max_replication buckets,
            # floored at 1.0 so ids stay small integers.
            lo_min = float(stats["lo_min"] or 0.0)
            hi_max = float(stats["hi_max"] or 0.0)
            w = max(1.0, (hi_max - lo_min) / float(max_replication))
    else:
        w = float(bucket_width)
        if w <= 0:
            raise ValueError("bucket_width must be > 0")

    b_iv = iv.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo_num / F.lit(w)).cast("long"),
                F.floor(hi_num / F.lit(w)).cast("long"),
            )
        ),
    )
    b_pts = points.withColumn(
        "__bucket", F.floor(p_num / F.lit(w)).cast("long")
    )

    lo_ok = p_num > lo_num if closed in ("right", "neither") else p_num >= lo_num
    hi_ok = p_num < hi_num if closed in ("left", "neither") else p_num <= hi_num
    matched = b_pts.join(
        b_iv, on=keys + ["__bucket"], how="inner"
    ).where(lo_ok & hi_ok)
    matched = matched.drop("__bucket")
    if how == "inner":
        return matched
    # left: append unmatched points with NULL interval columns
    unmatched = b_pts.drop("__bucket").join(
        matched.select(*points.columns).distinct(),
        on=points.columns,
        how="left_anti",
    )
    iv_cols = [c for c in intervals.columns if c not in keys]
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)
