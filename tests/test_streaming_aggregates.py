"""Streaming aggregate maintenance: a micro-batched changelog stream
(snapshot diffs S0->S1->S2) must leave the state table EXACTLY equal to a
fresh full aggregate of the final snapshot; replayed batches are
idempotent (read-below-write versioning); pruning never drops the
resume point."""

from __future__ import annotations

import numpy as np
import pandas as pd

from modlyn_spark.operators.cdc import full_agg, snapshot_diff
from modlyn_spark.streaming.aggregates import (
    agg_maintainer,
    prune_agg_versions,
    read_agg_state,
)

SCHEMA = "k bigint, g string, v bigint, old_g string, old_v bigint, op string"


def _snapshots():
    rng = np.random.default_rng(31)
    s0 = pd.DataFrame(
        {
            "k": np.arange(200),
            "g": rng.choice(["a", "b", "c"], 200),
            "v": rng.integers(0, 100, 200),
        }
    )
    s1 = s0[s0["k"] % 6 != 0].copy()          # deletes
    s1.loc[s1["k"] % 5 == 0, "v"] += 11        # value updates
    s1.loc[s1["k"] % 7 == 0, "g"] = "d"        # group moves
    s2 = pd.concat(
        [s1, pd.DataFrame({"k": np.arange(200, 260), "g": "b", "v": 3})],
        ignore_index=True,
    )
    s2 = s2[s2["k"] % 9 != 1]                  # more deletes
    return s0, s1, s2


def _rows(df):
    return sorted((r["g"], r["n"], r["nn_v"], r["sum_v"]) for r in df.collect())


def test_stream_of_diffs_maintains_exact_state(spark, tmp_path):
    s0, s1, s2 = _snapshots()
    d0 = spark.createDataFrame(s0)
    d1 = spark.createDataFrame(s1)
    d2 = spark.createDataFrame(s2)
    empty = d0.where("1 = 0")

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # three changelog files -> three micro-batches in arrival order
    snapshot_diff(empty, d0, "k", include_old=True).coalesce(1).write.parquet(
        f"{src}/c0"
    )
    snapshot_diff(d0, d1, "k", include_old=True).coalesce(1).write.parquet(
        f"{src}/c1"
    )
    snapshot_diff(d1, d2, "k", include_old=True).coalesce(1).write.parquet(
        f"{src}/c2"
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(agg_maintainer(state, "g", "v"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = read_agg_state(spark, state)
    assert got is not None
    assert _rows(got) == _rows(full_agg(d2, "g", "v"))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    s0, s1, _ = _snapshots()
    d0 = spark.createDataFrame(s0)
    d1 = spark.createDataFrame(s1)
    empty = d0.where("1 = 0")
    state = str(tmp_path / "state")
    step = agg_maintainer(state, "g", "v")

    c0 = snapshot_diff(empty, d0, "k", include_old=True)
    c1 = snapshot_diff(d0, d1, "k", include_old=True)
    step(c0, 0)
    step(c1, 1)
    after_once = _rows(read_agg_state(spark, state))
    # at-least-once delivery: batch 1 re-runs after a "failure" — it must
    # read the state BELOW its own id, not its own output
    step(c1, 1)
    assert _rows(read_agg_state(spark, state)) == after_once
    assert after_once == _rows(full_agg(d1, "g", "v"))


def test_prune_keeps_resume_point(spark, tmp_path):
    s0, s1, s2 = _snapshots()
    d0, d1, d2 = (spark.createDataFrame(s) for s in (s0, s1, s2))
    empty = d0.where("1 = 0")
    state = str(tmp_path / "state")
    step = agg_maintainer(state, "g", "v")
    step(snapshot_diff(empty, d0, "k", include_old=True), 0)
    step(snapshot_diff(d0, d1, "k", include_old=True), 1)
    step(snapshot_diff(d1, d2, "k", include_old=True), 2)

    dropped = prune_agg_versions(spark, state, keep=1)
    assert dropped == [0, 1]
    assert _rows(read_agg_state(spark, state)) == _rows(
        full_agg(d2, "g", "v")
    )
