from __future__ import annotations

import math

import numpy as np
import pytest

from modlyn_spark.operators.curriculum import (
    competence_schedule,
    curriculum_plan,
    data_diet,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, score long")


def test_schedule_formula():
    sched = competence_schedule(10, 0.1)
    assert len(sched) == 10
    assert sched[-1] == 1.0
    for t, c in enumerate(sched, start=1):
        assert c == pytest.approx(
            min(1.0, math.sqrt((1 - 0.01) * t / 10 + 0.01))
        )
    assert sched == sorted(sched)
    with pytest.raises(ValueError):
        competence_schedule(0, 0.1)
    with pytest.raises(ValueError):
        competence_schedule(5, 1.5)


def test_entry_epoch_matches_numpy(spark):
    rng = np.random.default_rng(5)
    scores = rng.integers(0, 1000, size=400)
    rows = [(i, int(s)) for i, s in enumerate(scores)]
    epochs, c0 = 8, 0.1
    got = {
        r["id"]: r
        for r in curriculum_plan(
            _df(spark, rows), "score", epochs=epochs, c0=c0
        ).collect()
    }
    sched = competence_schedule(epochs, c0)
    order = np.sort(scores)
    n = len(scores)
    for i, s in enumerate(scores):
        pct = np.searchsorted(order, s, side="left") / n
        assert got[i]["difficulty_pct"] == pytest.approx(pct, abs=1e-12)
        entry = 1 + sum(1 for c in sched if c <= pct)
        assert got[i]["entry_epoch"] == entry
    # the final epoch admits everything
    assert all(r["entry_epoch"] <= epochs for r in got.values())


def test_ties_are_coherent(spark):
    rows = [(i, 5) for i in range(10)] + [(10 + i, 9) for i in range(10)]
    got = curriculum_plan(_df(spark, rows), "score", epochs=4).collect()
    by_score = {}
    for r in got:
        by_score.setdefault(
            5 if r["id"] < 10 else 9, set()
        ).add((r["difficulty_pct"], r["entry_epoch"]))
    assert len(by_score[5]) == 1 and len(by_score[9]) == 1
    assert next(iter(by_score[5]))[0] == 0.0  # easiest group: pct 0
    assert next(iter(by_score[9]))[0] == 0.5


def test_null_scores_unscheduled(spark):
    rows = [(0, 1), (1, None), (2, 3)]
    got = {
        r["id"]: r
        for r in curriculum_plan(_df(spark, rows), "score", epochs=3).collect()
    }
    assert got[1]["entry_epoch"] is None
    assert got[0]["entry_epoch"] is not None


def test_float_scores_need_precision(spark):
    df = spark.createDataFrame([(0, 0.5)], "id long, score double")
    with pytest.raises(ValueError):
        curriculum_plan(df, "score", epochs=3)
    got = curriculum_plan(df, "score", epochs=3, precision=6).collect()
    assert got[0]["entry_epoch"] == 1


# ---------------------------------------------------------------------------
# data diet
# ---------------------------------------------------------------------------


def _cls_df(spark, rows):
    return spark.createDataFrame(rows, "id long, label string, score long")


def test_data_diet_per_class_exact(spark):
    rows = []
    i = 0
    for lab, n in [("a", 100), ("b", 40)]:
        for j in range(n):
            rows.append((i, lab, j))  # distinct scores 0..n-1
            i += 1
    kept = data_diet(
        _cls_df(spark, rows), "score", keep_fraction=0.25, by="label"
    ).collect()
    by_lab = {}
    for r in kept:
        by_lab.setdefault(r["label"], []).append(r["score"])
    # hardest 25% of each class by score
    assert sorted(by_lab["a"]) == list(range(75, 100))
    assert sorted(by_lab["b"]) == list(range(30, 40))


def test_data_diet_tie_group_rule(spark):
    # 10 rows all score 7: the tie group starts at rank 0 < quota, so
    # ALL are kept even at keep_fraction=0.3 (documented all-in rule)
    rows = [(i, "a", 7) for i in range(10)]
    kept = data_diet(
        _cls_df(spark, rows), "score", keep_fraction=0.3, by="label"
    ).collect()
    assert len(kept) == 10


def test_data_diet_easiest_and_global(spark):
    rows = [(i, "a", i) for i in range(20)]
    kept = data_diet(
        _cls_df(spark, rows), "score", keep_fraction=0.5, hardest=False
    ).collect()
    assert sorted(r["score"] for r in kept) == list(range(10))


def test_data_diet_nulls_dropped_and_validation(spark):
    rows = [(0, "a", 1), (1, None, 2), (2, "a", None)]
    kept = data_diet(
        _cls_df(spark, rows), "score", keep_fraction=1.0, by="label"
    ).collect()
    assert {r["id"] for r in kept} == {0}
    with pytest.raises(ValueError):
        data_diet(_cls_df(spark, rows), "score", keep_fraction=0.0)


def test_histogram_sized_shuffle(spark):
    """The rank windows run over the HISTOGRAM: the executed plan's
    window operators must sit above the aggregate, not the raw data
    (regression guard for the scale claim)."""
    rows = [(i, "a", i % 13) for i in range(100)]
    df = data_diet(
        _cls_df(spark, rows), "score", keep_fraction=0.5, by="label"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # tree prints root-first: the Window node must appear ABOVE (before)
    # the Aggregate feeding it — i.e. the windows run over histogram
    # rows, never over the raw data (which has no Aggregate above it)
    assert "Window" in plan and "Aggregate" in plan
    assert plan.index("Window") < plan.index("Aggregate")
