"""Watermark semantics: late-but-within-watermark events still merge into
their session; events later than the watermark are dropped."""

from __future__ import annotations

import pandas as pd

from modlyn_spark.streaming.sessions import stream_session_stats


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def test_late_within_watermark_merges(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    # batch 1: two events for u1 at t0 and t0+10s; sentinel advances time
    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 999],
            "ts": [base, base + pd.Timedelta(seconds=10),
                   base + pd.Timedelta(minutes=30)],
            "value": [1.0, 2.0, 0.0],
        }
    )
    # batch 2: a LATE event for u1 at t0+20s (within the 1h watermark of the
    # 30-min max), then a far-future flush sentinel
    b2 = pd.DataFrame(
        {
            "user_id": [1, 999],
            "ts": [base + pd.Timedelta(seconds=20), pd.Timestamp("2030-01-01")],
            "value": [3.0, 0.0],
        }
    )
    src = str(tmp_path / "src")
    import os

    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    import time

    time.sleep(1.5)  # file source orders by mtime; keep batch order stable
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)

    schema = spark.createDataFrame(b1).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sess = stream_session_stats(stream, "user_id", "ts", gap_seconds=60,
                                watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM late_sessions WHERE user_id = 1"
    ).toPandas()
    # the late t0+20s event merged into the session -> one session, 3 events
    assert len(got) == 1
    assert got["n_events"].iloc[0] == 3
    assert got["duration_sec"].iloc[0] == 20.0
