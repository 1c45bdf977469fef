"""future_labels: future-window label generation vs brute twins,
leak-safety at the probe instant, gap/closed semantics, fill values."""

from __future__ import annotations

import pandas as pd
import pytest

from modlyn_spark.operators.targets import future_labels

EVENTS = [
    ("a", 10.0, 2.0),
    ("a", 20.0, 4.0),
    ("a", 30.0, None),
    ("a", 100.0, 8.0),
    ("b", 15.0, 1.0),
]
PROBES = [("a", 10.0), ("a", 25.0), ("b", 15.0), ("c", 5.0), ("a", None)]


@pytest.fixture(scope="module")
def frames(spark):
    ev = spark.createDataFrame(
        pd.DataFrame(EVENTS, columns=["key", "te", "value"])
    )
    pr = spark.createDataFrame(
        pd.DataFrame(PROBES, columns=["key", "tp"]).astype({"tp": "float64"})
    )
    return pr, ev


def _brute(key, t, lo_excl, hi_incl):
    return [
        (te, v)
        for k, te, v in EVENTS
        if k == key and t is not None and lo_excl < te <= hi_incl
    ]


def test_counts_and_sums_match_brute(frames):
    pr, ev = frames
    out = future_labels(
        pr,
        ev,
        "key",
        probe_ts="tp",
        event_ts="te",
        horizon=20.0,
        aggs={
            "n_ev": ("count", None),
            "sum_v": ("sum", "value"),
            "max_v": ("max", "value"),
            "hit": ("any", None),
        },
    ).collect()
    assert len(out) == len(PROBES)
    for r in out:
        win = _brute(r["key"], r["tp"], r["tp"] or 0, (r["tp"] or 0) + 20.0)
        vals = [v for _, v in win if v is not None]
        assert r["n_ev"] == len(win)
        assert r["hit"] == (len(win) > 0)
        if vals:
            assert r["sum_v"] == pytest.approx(sum(vals))
            assert r["max_v"] == pytest.approx(max(vals))
        else:
            assert r["sum_v"] is None and r["max_v"] is None


def test_probe_instant_excluded_by_default(frames):
    pr, ev = frames
    out = future_labels(
        pr, ev, "key", probe_ts="tp", event_ts="te", horizon=5.0
    )
    row = {(r["key"], r["tp"]): r["label_n"] for r in out.collect()}
    # probe (a, 10): the event AT t=10 is not a future label
    assert row[("a", 10.0)] == 0
    # probe (b, 15): own event excluded too
    assert row[("b", 15.0)] == 0


def test_gap_purges_near_future(frames):
    pr, ev = frames
    out = future_labels(
        pr, ev, "key", probe_ts="tp", event_ts="te", horizon=10.0, gap=7.0
    )
    row = {(r["key"], r["tp"]): r["label_n"] for r in out.collect()}
    # probe (a, 10): window (17, 27] -> only the event at 20
    assert row[("a", 10.0)] == 1
    # probe (a, 25): window (32, 42] -> nothing
    assert row[("a", 25.0)] == 0


def test_no_event_and_null_probe_fill(frames):
    pr, ev = frames
    out = future_labels(
        pr,
        ev,
        "key",
        probe_ts="tp",
        event_ts="te",
        horizon=100.0,
        aggs={"n": ("count", None), "u": ("nunique", "value")},
    )
    rows = {(r["key"], r["tp"]): r for r in out.collect()}
    assert rows[("c", 5.0)]["n"] == 0 and rows[("c", 5.0)]["u"] == 0
    assert rows[("a", None)]["n"] == 0


def test_duplicate_probes_keep_cardinality(spark, frames):
    _, ev = frames
    pr = spark.createDataFrame(
        pd.DataFrame(
            [("a", 10.0), ("a", 10.0)], columns=["key", "tp"]
        )
    )
    out = future_labels(
        pr, ev, "key", probe_ts="tp", event_ts="te", horizon=20.0
    ).collect()
    assert len(out) == 2 and all(r["label_n"] == 2 for r in out)


def test_validation(frames):
    pr, ev = frames
    with pytest.raises(ValueError, match="horizon"):
        future_labels(pr, ev, "key", probe_ts="tp", horizon=0.0)
    with pytest.raises(ValueError, match="unsupported"):
        future_labels(
            pr, ev, "key", probe_ts="tp", horizon=1.0,
            aggs={"x": ("median", "value")},
        )
    with pytest.raises(ValueError, match="not found"):
        future_labels(
            pr, ev, "key", probe_ts="tp", horizon=1.0,
            aggs={"x": ("sum", "nope")},
        )
    with pytest.raises(ValueError, match="clashes"):
        future_labels(
            pr, ev, "key", probe_ts="tp", horizon=1.0,
            aggs={"tp": ("count", None)},
        )
