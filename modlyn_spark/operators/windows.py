"""Windowed feature engineering: lag/lead, sessionize, backfill, rolling stats.

These are the distributed analogue of the pre-computed count-matrix statistics
the reference takes as a given input (reference:
modlyn/models/_simple_logreg_datamodule.py:90-106 consumes an already-built
AnnData X). All operators are pure DataFrame window/groupBy expressions —
whole-stage codegen, one shuffle on the entity key each, no Python in the hot
path.

Scale notes: every operator here shuffles once on ``(key)`` (window) or
``(key, session)`` (session stats — map-side combinable). At 10^12 rows the
shuffle is unavoidable for per-entity ordering; what matters is that (a) the
key-partitioned window never materializes unbounded state per row (running
frames are O(1) per row in Tungsten), and (b) chained per-entity features
reuse ONE shuffle: all functions take and preserve the same partitioning, so
Catalyst collapses adjacent windows over the same (partitionBy, orderBy) into
a single exchange+sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _epoch(c: Column) -> Column:
    """Timestamp (LTZ or NTZ) or numeric -> epoch seconds as double.

    TIMESTAMP_NTZ cannot cast straight to numeric in Spark 4; hop through
    timestamp_ltz first (session tz is UTC; gaps/durations are differences,
    so the hop is exact either way). try_cast keeps numeric inputs working.
    """
    return c.cast("timestamp_ltz").cast("double")


def with_lag_lead(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    cols: str | list[str],
    *,
    lag_offsets: tuple[int, ...] = (1,),
    lead_offsets: tuple[int, ...] = (),
    delta: bool = True,
    hamming: bool = False,
) -> DataFrame:
    """Per-entity lag/lead features and deltas.

    For each column ``c`` and offset ``k`` adds ``c_lag{k}`` / ``c_lead{k}``;
    with ``delta=True`` also ``c_delta{k} = c - c_lag{k}`` (numeric cols);
    with ``hamming=True`` also ``c_hamming{k} = bit_count(c ^ c_lag{k})`` —
    the phash bit-distance feature (BASELINE.json north_star "lag/lead phash
    deltas"; reference has no temporal axis at all).
    """
    key = _as_list(key)
    cols = _as_list(cols)
    w = Window.partitionBy(*key).orderBy(ts)
    out = df
    for c in cols:
        for k in lag_offsets:
            lagc = F.lag(c, k).over(w)
            out = out.withColumn(f"{c}_lag{k}", lagc)
            if delta:
                out = out.withColumn(f"{c}_delta{k}", F.col(c) - F.col(f"{c}_lag{k}"))
            if hamming:
                out = out.withColumn(
                    f"{c}_hamming{k}",
                    F.bit_count(
                        F.col(c).cast("long").bitwiseXOR(
                            F.col(f"{c}_lag{k}").cast("long")
                        )
                    ),
                )
        for k in lead_offsets:
            out = out.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return out


def sessionize(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of an entity closer than
    ``gap_seconds`` share a session. ``session_col`` is a per-entity dense
    0-based id in time order.

    The canonical Spark recipe: flag rows whose gap to the previous event
    exceeds the threshold, then a running sum of flags. One shuffle on key.
    (Streaming analogue: ``F.session_window`` — see
    modlyn_spark/streaming/sessions.py.)
    """
    key = _as_list(key)
    w = Window.partitionBy(*key).orderBy(ts)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(ts).over(w)
    gap_flag = F.when(
        prev_ts.isNull()
        | (_epoch(F.col(ts)) - _epoch(prev_ts) > F.lit(float(gap_seconds))),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(session_col, (F.sum(gap_flag).over(run) - F.lit(1)).cast("long"))


def session_stats(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    gap_seconds: int,
    agg_cols: dict[str, Column] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session burst features: event count, start/end, duration seconds,
    plus caller-supplied aggregates. Map-side combinable groupBy after the
    sessionize window (same key partitioning — one shuffle total)."""
    key = _as_list(key)
    sess = sessionize(df, key, ts, gap_seconds, session_col)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(_epoch(F.col(ts))) - F.min(_epoch(F.col(ts)))).alias("duration_sec"),
    ]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    return sess.groupBy(*key, session_col).agg(*aggs)


def backfill(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    cols: str | list[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Per-entity forward fill: carry the last non-null value of each column
    forward in time (``last(c, ignorenulls=True)`` over a running frame).
    North_rule's "backfilled per-entity count-matrix statistics"."""
    key = _as_list(key)
    cols = _as_list(cols)
    w = (
        Window.partitionBy(*key)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def rolling_stats(
    df: DataFrame,
    key: str | list[str],
    ts: str,
    col: str,
    *,
    n_rows: int | None = None,
    range_seconds: int | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Per-entity rolling count/mean/min/max/population-variance over either
    the previous ``n_rows`` rows (inclusive) or a ``range_seconds`` time range.

    Variance is computed from running sum/sumsq so the whole thing stays in
    one codegen'd window (no second pass): var = E[x^2] - E[x]^2, clamped at 0.
    """
    key = _as_list(key)
    if (n_rows is None) == (range_seconds is None):
        raise ValueError("pass exactly one of n_rows or range_seconds")
    p = prefix or f"{col}_roll"
    if n_rows is not None:
        w = (
            Window.partitionBy(*key)
            .orderBy(ts)
            .rowsBetween(-(n_rows - 1), Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*key)
            .orderBy(_epoch(F.col(ts)).cast("long"))
            .rangeBetween(-range_seconds, 0)
        )
    x = F.col(col).cast("double")
    cnt = F.count(col).over(w)
    s = F.sum(x).over(w)
    ss = F.sum(x * x).over(w)
    mean = s / cnt
    var = F.greatest(ss / cnt - mean * mean, F.lit(0.0))
    return (
        df.withColumn(f"{p}_count", cnt)
        .withColumn(f"{p}_mean", mean)
        .withColumn(f"{p}_min", F.min(x).over(w))
        .withColumn(f"{p}_max", F.max(x).over(w))
        .withColumn(f"{p}_var", var)
    )


def compact_history(
    df: DataFrame,
    on: str | list[str],
    ts_col: str,
    *,
    payload_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse an entity-state history to its CHANGE rows: keep each
    key's first row and every row whose payload differs (null-safely)
    from the previous row in ``(ts, tiebreak)`` order.

    Feature-store state tables are typically snapshot dumps where most
    rows repeat the previous state verbatim; as-of joining against the
    compacted table produces identical results (the carried-forward
    payload is unchanged by dropping repeats) while shrinking the state
    side — often by orders of magnitude — before the shuffle.

    Pure window + filter: one shuffle on the key, whole-stage codegen,
    no Python. The payload comparison wraps all columns in ONE struct and
    uses null-safe equality, so a NULL field is "same state" only against
    another NULL.

    Args:
        payload_cols: state columns to compare (default: everything
            except the key(s), ``ts_col`` and ``tiebreak``).
        tiebreak: extra ordering columns for rows sharing (key, ts) —
            supply one whenever (key, ts) can repeat, or the kept set is
            partition-order dependent.
    """
    on = _as_list(on)
    tiebreak = list(tiebreak or [])
    if payload_cols is None:
        drop = set(on) | {ts_col} | set(tiebreak)
        payload_cols = [c for c in df.columns if c not in drop]
    if not payload_cols:
        raise ValueError("payload_cols must not be empty")
    w = Window.partitionBy(*on).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    cur = F.struct(*[F.col(c) for c in payload_cols])
    prev = F.lag(cur).over(w)
    keep = prev.isNull() | ~cur.eqNullSafe(prev)
    return (
        df.withColumn("__keep", keep)
        .where(F.col("__keep"))
        .drop("__keep")
    )
