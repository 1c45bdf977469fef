"""Structured-streaming sessionization.

The batch engine sessionizes with a window-sum of gap flags
(modlyn_spark.operators.windows.sessionize); the streaming analogue is
Spark's built-in ``session_window(ts, gap)`` with a watermark for late
data. Both produce identical session boundaries for the same input — the
test suite asserts batch==streaming on the same events.

The reference is batch-only (SURVEY.md §2.3); this module exists because a
point-in-time feature platform at 10^12 scale ingests continuously: the
same session features must be computable incrementally. State size is
bounded by the watermark; output mode "append" emits a session only once
it can no longer grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_stats(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    *,
    watermark: str = "1 hour",
    agg_cols: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Session aggregation usable on a streaming OR batch DataFrame.

    Returns (key, session_start, session_end, n_events, duration_sec, ...).
    On a stream, add ``.writeStream.outputMode("append")`` downstream; the
    watermark bounds session state.
    """
    # watermarks/session_window require TIMESTAMP (LTZ); NTZ sources coerce
    # (session tz is pinned UTC in get_spark, so this is exact)
    src = events.withColumn(ts, F.col(ts).cast("timestamp_ltz"))
    if events.isStreaming:
        src = src.withWatermark(ts, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("first_event"),
        F.max(ts).alias("last_event"),
    ]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    out = src.groupBy(
        F.col(key), F.session_window(F.col(ts), f"{gap_seconds} seconds")
    ).agg(*aggs)
    return out.select(
        key,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        (
            F.col("last_event").cast("timestamp_ltz").cast("double")
            - F.col("first_event").cast("timestamp_ltz").cast("double")
        ).alias("duration_sec"),
        *[F.col(n) for n in (agg_cols or {})],
    )


def streaming_session_query(
    spark,
    source_dir: str,
    schema,
    key: str,
    ts: str,
    gap_seconds: int,
    *,
    query_name: str = "sessions",
    watermark: str = "1 hour",
):
    """File-source streaming session query writing to an in-memory sink
    (availableNow trigger: drains everything currently in source_dir, then
    stops — deterministic for tests/backfills)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
    )
    sess = stream_session_stats(stream, key, ts, gap_seconds, watermark=watermark)
    return (
        sess.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
