"""Compaction planner: pandas twin of the start-offset binning, oversized
files excluded, singleton groups dropped, NULL-bytes refusal, one-exchange
plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from modlyn_spark.operators.compaction import compaction_plan


def _manifest():
    rows = []
    # partition p0: eight 30-byte files -> offsets 0..210, target 100
    # groups: [0,30,60,90]->g0? start offsets 0,30,60,90 -> g0; 120,150,
    # 180,210 -> g1,g1,g1,g2
    for i in range(8):
        rows.append({"part": "p0", "file": f"f{i:02d}", "bytes": 30})
    # partition p1: an oversized file plus two smalls that pack together
    rows.append({"part": "p1", "file": "big", "bytes": 500})
    rows.append({"part": "p1", "file": "s1", "bytes": 40})
    rows.append({"part": "p1", "file": "s2", "bytes": 40})
    # partition p2: a single small file -> singleton group, dropped
    rows.append({"part": "p2", "file": "only", "bytes": 10})
    return pd.DataFrame(rows)


def _twin(pdf, target=100, min_files=2):
    small = pdf[pdf["bytes"] < target].sort_values(["part", "file"])
    out = []
    for part, g in small.groupby("part"):
        start = g["bytes"].cumsum().shift(fill_value=0)
        grp = (start // target).astype(int)
        gg = g.assign(group=grp.values)
        sizes = gg.groupby("group")["file"].transform("size")
        tot = gg.groupby("group")["bytes"].transform("sum")
        gg = gg.assign(group_files=sizes, group_bytes=tot)
        out.append(gg[gg["group_files"] >= min_files])
    return (
        pd.concat(out)
        .sort_values(["part", "file"])
        .reset_index(drop=True)[
            ["part", "file", "bytes", "group", "group_files", "group_bytes"]
        ]
    )


def test_twin_parity(spark):
    pdf = _manifest()
    got = (
        compaction_plan(
            spark.createDataFrame(pdf), "part", "file", "bytes",
            target_bytes=100,
        )
        .orderBy("part", "file")
        .toPandas()
    )
    twin = _twin(pdf)
    assert list(got["file"]) == list(twin["file"])
    assert list(got["group"]) == list(twin["group"])
    assert list(got["group_files"]) == list(twin["group_files"])
    assert list(got["group_bytes"]) == list(twin["group_bytes"])
    # the oversized file and the singleton partition never appear
    assert "big" not in set(got["file"]) and "only" not in set(got["file"])
    # p1's two small files pack into one group despite the big neighbor
    p1 = got[got["part"] == "p1"]
    assert list(p1["file"]) == ["s1", "s2"] and set(p1["group"]) == {0}


def test_singleton_tail_dropped(spark):
    got = compaction_plan(
        spark.createDataFrame(_manifest()), "part", "file", "bytes",
        target_bytes=100,
    ).toPandas()
    p0 = got[got["part"] == "p0"]
    # 8 files, last one starts at offset 210 alone in group 2 -> dropped
    assert len(p0) == 7 and set(p0["group"]) == {0, 1}


def test_null_bytes_refused(spark):
    pdf = _manifest()
    pdf.loc[len(pdf)] = {"part": "p0", "file": "fx", "bytes": None}
    with pytest.raises(ValueError, match="NULL"):
        compaction_plan(
            spark.createDataFrame(pdf), "part", "file", "bytes"
        )


def test_arg_guards(spark):
    df = spark.createDataFrame(_manifest())
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, "part", "file", "bytes", target_bytes=0)
    with pytest.raises(ValueError, match="min_files"):
        compaction_plan(df, "part", "file", "bytes", min_files=0)


def test_one_exchange_plan(spark):
    df = spark.createDataFrame(_manifest())
    plan = compaction_plan(
        df, "part", "file", "bytes", target_bytes=100
    )._jdf.queryExecution().executedPlan().toString()
    # the (part, group) stats window must reuse the hash partitioning on
    # part — exactly one exchange over the manifest
    assert plan.count("Exchange hashpartitioning") == 1
