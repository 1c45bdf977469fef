"""Streaming CUSUM: the stateful fold equals the batch closed form
under ANY micro-batch slicing (state-stub replay), late rows drop and
count, and the wired stream matches the batch operator end-to-end."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.changepoints import cusum_scores
from modlyn_spark.streaming.changepoints import (
    CUSUM_SCHEMA,
    make_cusum_fn,
    stream_cusum,
)


class FakeState:
    """Duck-typed GroupState: exists/get/update — the only surface the
    fold touches."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _series(n=80, seed=9):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 1, n)
    if n > 50:
        vals[50:] += 2.5  # planted up-shift
    vals[[i for i in (7, 23) if i < n]] = np.nan
    return pd.DataFrame(
        {"order_val": np.arange(n, dtype=np.int64), "value": vals}
    )


def _replay(pdf, slices, target=0.0, slack=0.5, threshold=5.0):
    """Run the fold over the given row slices as separate micro-batches."""
    fn = make_cusum_fn(target, slack, threshold)
    state = FakeState()
    outs = []
    for lo, hi in slices:
        batch = pdf.iloc[lo:hi]
        outs.extend(fn(("k1",), [batch], state))
    return (
        pd.concat(outs, ignore_index=True)
        if outs
        else pd.DataFrame(columns=[f.name for f in CUSUM_SCHEMA])
    )


def test_any_slicing_equals_one_batch():
    pdf = _series()
    one = _replay(pdf, [(0, len(pdf))])
    for slices in (
        [(0, 10), (10, 40), (40, 80)],
        [(i, i + 1) for i in range(len(pdf))],  # one row per batch
        [(0, 79), (79, 80)],
    ):
        many = _replay(pdf, slices)
        pd.testing.assert_frame_equal(one, many)


def test_fold_equals_batch_closed_form(spark):
    pdf = _series()
    streamed = _replay(pdf, [(0, 30), (30, 80)])
    batch_in = pdf.rename(columns={"order_val": "i", "value": "v"}).assign(
        k="k1"
    )
    batch = (
        cusum_scores(
            spark.createDataFrame(batch_in), "k", "i", "v",
            target=0.0, slack=0.5, threshold=5.0,
        )
        .orderBy("i")
        .toPandas()
    )
    assert len(streamed) == len(batch)
    for got, want_p, want_n, want_a in zip(
        streamed.itertuples(),
        batch["cusum_pos"], batch["cusum_neg"], batch["is_alarm"],
    ):
        assert got.cusum_pos == pytest.approx(want_p, abs=1e-9)
        assert got.cusum_neg == pytest.approx(want_n, abs=1e-9)
        assert got.is_alarm == want_a
    assert streamed["is_alarm"].any()  # the planted shift trips


def test_late_rows_drop_and_count():
    pdf = _series(20)
    fn = make_cusum_fn(0.0, 0.5, 5.0)
    state = FakeState()
    out = list(fn(("k1",), [pdf.iloc[10:20]], state))  # rows 10..19 first
    late = pdf.iloc[0:10]  # all older than the high-water mark
    out2 = list(fn(("k1",), [late], state))
    assert not out2  # every row dropped
    # a fresh in-order row still processes, and carries the late count
    nxt = pd.DataFrame({"order_val": [25], "value": [1.0]})
    out3 = list(fn(("k1",), [nxt], state))
    assert out3 and out3[0]["n_late"].iloc[0] == 10
    assert len(out[0]) == 10


def test_param_validation():
    with pytest.raises(ValueError):
        make_cusum_fn(0.0, -1.0, 5.0)
    with pytest.raises(ValueError):
        make_cusum_fn(0.0, 0.5, 0.0)


def test_stream_matches_batch_operator(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "value"
    )
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)  # one file: in-order per trigger
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
    )
    out = stream_cusum(
        stream, "user_id", "event_id", "value",
        target=50.0, slack=10.0, threshold=300.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT key, order_val, cusum_pos, cusum_neg, is_alarm "
        "FROM cusum_stream"
    ).toPandas()
    want = (
        cusum_scores(
            ev, "user_id", ["event_id"], "value",
            target=50.0, slack=10.0, threshold=300.0,
        )
        .select("user_id", "event_id", "cusum_pos", "cusum_neg", "is_alarm")
        .toPandas()
    )
    assert len(got) == len(want)
    g = got.sort_values(["key", "order_val"]).reset_index(drop=True)
    w = (
        want.assign(key=want["user_id"].astype(str))
        .sort_values(["key", "event_id"])
        .reset_index(drop=True)
    )
    assert (g["key"].to_numpy() == w["key"].to_numpy()).all()
    assert np.allclose(g["cusum_pos"], w["cusum_pos"], atol=1e-9)
    assert np.allclose(g["cusum_neg"], w["cusum_neg"], atol=1e-9)
    assert (g["is_alarm"].to_numpy() == w["is_alarm"].to_numpy()).all()
