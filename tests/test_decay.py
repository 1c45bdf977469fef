"""decayed_features: bucket-discretized exponential decay vs a brute
Python twin of the SAME contract, plus the leak-safety / NULL edges."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.decay import decayed_features

HL = 100.0  # seconds


def _brute(events, key, t, *, hl=HL, bw=None, window=20):
    """Sum v * 0.5**((t - te)/hl) over events in the `window` complete
    buckets strictly before t's bucket — the documented contract."""
    bw = bw or hl
    pb = math.floor(t / bw)
    s = n = 0.0
    for k, te, v in events:
        if k != key:
            continue
        b = math.floor(te / bw)
        if pb - window <= b <= pb - 1:
            w = 0.5 ** ((t - te) / hl)
            n += w
            if v is not None:
                s += v * w
    return s, n


EVENTS = [
    ("a", 10.0, 2.0),
    ("a", 95.0, 4.0),
    ("a", 150.0, 8.0),
    ("a", 210.0, None),  # counts in decay_n, not in the sum
    ("a", 930.0, 16.0),
    ("b", 40.0, 100.0),
    ("b", 905.0, 7.0),
]
PROBES = [
    ("a", 1000.0),  # sees all complete buckets 0..9
    ("a", 215.0),  # own bucket (2) excluded -> only events in 0..1
    ("a", 95.0),  # same bucket as its own event -> that event unseen
    ("b", 999.5),
    ("c", 500.0),  # no events at all
    ("a", None),  # NULL ts -> NULL outputs
]


@pytest.fixture(scope="module")
def frames(spark):
    ev = spark.createDataFrame(
        pd.DataFrame(EVENTS, columns=["key", "te", "value"])
    )
    pr = spark.createDataFrame(
        pd.DataFrame(PROBES, columns=["key", "tp"]).astype({"tp": "float64"})
    )
    return pr, ev


def test_matches_brute_twin(frames):
    pr, ev = frames
    out = (
        decayed_features(
            pr,
            ev,
            "key",
            probe_ts="tp",
            event_ts="te",
            value_cols=["value"],
            half_life=HL,
        )
        .orderBy("key", "tp")
        .collect()
    )
    got = {(r["key"], r["tp"]): (r["decay_value"], r["decay_n"]) for r in out}
    assert len(out) == len(PROBES)
    for key, t in PROBES:
        if t is None:
            assert got[(key, None)] == (None, None)
            continue
        s, n = _brute(EVENTS, key, t)
        gs, gn = got[(key, t)]
        assert gs == pytest.approx(s, abs=1e-9), (key, t)
        assert gn == pytest.approx(n, abs=1e-9), (key, t)


def test_own_bucket_excluded_is_leak_safe(frames):
    pr, ev = frames
    out = decayed_features(
        pr,
        ev,
        "key",
        probe_ts="tp",
        event_ts="te",
        value_cols=["value"],
        half_life=HL,
    )
    row = out.where("key = 'a' AND tp = 95.0").collect()[0]
    # probe at 95 shares bucket 0 with events at 10 and 95: both unseen
    assert row["decay_value"] == 0.0 and row["decay_n"] == 0.0


def test_no_events_entity_gets_zero(frames):
    pr, ev = frames
    row = (
        decayed_features(
            pr, ev, "key", probe_ts="tp", event_ts="te", half_life=HL
        )
        .where("key = 'c'")
        .collect()[0]
    )
    assert row["decay_n"] == 0.0


def test_window_cutoff_drops_old_buckets(spark):
    ev = spark.createDataFrame(
        pd.DataFrame([("a", 10.0, 5.0)], columns=["key", "te", "value"])
    )
    pr = spark.createDataFrame(
        pd.DataFrame([("a", 250.0)], columns=["key", "tp"])
    )
    out = decayed_features(
        pr,
        ev,
        "key",
        probe_ts="tp",
        event_ts="te",
        value_cols=["value"],
        half_life=HL,
        window_buckets=1,
    ).collect()[0]
    # event bucket 0, probe bucket 2, window 1 -> only bucket 1 visible
    assert out["decay_value"] == 0.0 and out["decay_n"] == 0.0


def test_custom_bucket_width(frames):
    pr, ev = frames
    out = (
        decayed_features(
            pr,
            ev,
            "key",
            probe_ts="tp",
            event_ts="te",
            value_cols=["value"],
            half_life=HL,
            bucket=50.0,
            window_buckets=40,
        )
        .where("key = 'a' AND tp = 1000.0")
        .collect()[0]
    )
    s, n = _brute(EVENTS, "a", 1000.0, bw=50.0, window=40)
    assert out["decay_value"] == pytest.approx(s, abs=1e-9)
    assert out["decay_n"] == pytest.approx(n, abs=1e-9)


def test_timestamp_columns_and_plan_shape(spark, events_pdf):
    ev = spark.createDataFrame(events_pdf)
    pr = ev.select("key", F.col("ts").alias("fts")).limit(200)
    out = decayed_features(
        pr,
        ev,
        "key",
        probe_ts="fts",
        event_ts="ts",
        value_cols=["value"],
        half_life=3600.0,
    )
    assert out.columns == ["key", "fts", "decay_n", "decay_value"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert len(rows) == 200
    assert all(
        r["decay_n"] is None or r["decay_n"] >= 0.0 for r in rows
    )


def test_validation_errors(frames):
    pr, ev = frames
    with pytest.raises(ValueError, match="half_life"):
        decayed_features(pr, ev, "key", probe_ts="tp", half_life=0.0)
    with pytest.raises(ValueError, match="missing"):
        decayed_features(
            pr, ev, "key", probe_ts="tp", value_cols=["nope"], half_life=1.0
        )
    with pytest.raises(ValueError, match="window_buckets"):
        decayed_features(
            pr, ev, "key", probe_ts="tp", half_life=1.0, window_buckets=0
        )
