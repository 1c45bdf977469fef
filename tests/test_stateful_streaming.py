"""Custom stateful streaming operator: final streamed state equals the batch
latest-state computation on the same events."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from modlyn_spark.streaming.stateful import streaming_last_state


def test_streaming_last_state_matches_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "value"
    )
    src_dir = str(tmp_path / "src")
    # two files + maxFilesPerTrigger=1 -> state folds across >1 micro-batch
    ev.repartition(2).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_last_state(stream, "user_id", "ts", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("last_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT key, last_value, n_updates FROM last_state"
    ).toPandas()
    # update mode re-emits a key per micro-batch; the LAST emission per key
    # (max n_updates) is the final state
    got = got.sort_values("n_updates").groupby("key").last().reset_index()

    exp_state = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "value")).alias("s"), F.count("*").alias("n"))
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.col("s.value").alias("last_value"),
            F.col("n").alias("n_updates"),
        )
        .toPandas()
    )
    m = got.merge(exp_state, on="key", suffixes=("", "_exp"))
    assert len(m) == len(exp_state)
    assert (m["n_updates"] == m["n_updates_exp"]).all()
    a = m["last_value"].astype(float)
    b = m["last_value_exp"].astype(float)
    mask = ~(a.isna() & b.isna())
    assert np.allclose(a[mask], b[mask], equal_nan=True)
