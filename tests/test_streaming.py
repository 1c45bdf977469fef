"""Streaming sessionization == batch sessionization on the same events."""

from __future__ import annotations

import numpy as np

from modlyn_spark.operators.windows import session_stats
from modlyn_spark.streaming.sessions import (
    stream_session_stats,
    streaming_session_query,
)

GAP = 1800


def test_stream_sessions_match_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "value"
    )
    src = str(tmp_path / "stream_src")
    # sentinel far-future event: advances the watermark past every real
    # session so append mode flushes all of them before the stream drains
    sentinel = spark.sql(
        "SELECT CAST(-1 AS BIGINT) user_id, "
        "timestamp'2030-01-01 00:00:00' ts, CAST(0.0 AS DOUBLE) value"
    )
    ev.unionByName(sentinel.select(ev.columns)).write.parquet(src)

    q = streaming_session_query(
        spark, src, ev.schema, "user_id", "ts", GAP, query_name="sess_test"
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM sess_test")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    if got["session_start"].dt.tz is not None:  # LTZ -> naive UTC for compare
        got["session_start"] = got["session_start"].dt.tz_localize(None)
    got = got[got["user_id"] >= 0].reset_index(drop=True)  # drop sentinel

    exp = (
        session_stats(ev, "user_id", "ts", GAP)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["user_id"].values == exp["user_id"].values).all()
    assert (got["n_events"].values == exp["n_events"].values).all()
    # session first-event times agree (session_window.start == min event ts)
    assert (got["session_start"].values == exp["session_start"].values).all()
    assert np.allclose(got["duration_sec"].values, exp["duration_sec"].values)


def test_stream_session_stats_works_on_batch_df(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = stream_session_stats(ev, "user_id", "ts", GAP).toPandas()
    assert len(out) > 0 and (out["n_events"] >= 1).all()
