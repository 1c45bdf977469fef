from __future__ import annotations

import math

import numpy as np
import pytest

from modlyn_spark.scoring.dynamics import acquisition_scores, dataset_cartography


def _probs_df(spark, rows):
    return spark.createDataFrame(rows, "id int, probs array<double>, y int")


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.default_rng(11)
    raw = rng.random((40, 5))
    probs = raw / raw.sum(axis=1, keepdims=True)
    labels = rng.integers(0, 5, size=40)
    rows = [
        (i, [float(v) for v in probs[i]], int(labels[i])) for i in range(40)
    ]
    df = acquisition_scores(_probs_df(spark, rows), "probs", "y")
    return probs, labels, {r["id"]: r for r in df.collect()}


def test_unsupervised_scores_match_numpy(scored):
    probs, _, got = scored
    for i in range(len(probs)):
        p = probs[i]
        ent = -(p * np.log(p)).sum()
        assert got[i]["entropy"] == pytest.approx(ent, rel=1e-12)
        assert got[i]["least_confidence"] == pytest.approx(
            1.0 - p.max(), rel=1e-12
        )
        s = np.sort(p)[::-1]
        assert got[i]["margin_top2"] == pytest.approx(s[0] - s[1], rel=1e-12)


def test_supervised_scores_match_numpy(scored):
    probs, labels, got = scored
    for i in range(len(probs)):
        p, y = probs[i], labels[i]
        onehot = np.zeros_like(p)
        onehot[y] = 1.0
        assert got[i]["p_true"] == pytest.approx(p[y], rel=1e-12)
        assert got[i]["el2n"] == pytest.approx(
            math.sqrt(((p - onehot) ** 2).sum()), rel=1e-9
        )
        others = np.delete(p, y)
        assert got[i]["margin_true"] == pytest.approx(
            p[y] - others.max(), rel=1e-9
        )
        assert got[i]["is_correct"] == (int(np.argmax(p)) == y)


def test_tie_policy_first_index(spark):
    # duplicate max: argmax is the FIRST occurrence (index 0 here), so
    # the row is correct only for y=0; for y=2 (also at the max) the
    # others-max equals the max itself -> margin_true == 0.0
    rows = [(0, [0.4, 0.2, 0.4], 0), (1, [0.4, 0.2, 0.4], 2)]
    got = {
        r["id"]: r
        for r in acquisition_scores(
            _probs_df(spark, rows), "probs", "y"
        ).collect()
    }
    assert got[0]["is_correct"] is True
    assert got[1]["is_correct"] is False
    assert got[1]["margin_true"] == pytest.approx(0.0)
    assert got[0]["margin_true"] == pytest.approx(0.0)


def test_null_contracts(spark):
    rows = [
        (0, None, 1),  # NULL vector -> all scores NULL
        (1, [0.5, 0.5], None),  # NULL label -> supervised scores NULL
        (2, [0.5, 0.5], 7),  # out-of-range label -> supervised NULL
        (3, [1.0], 0),  # single class: margins need >= 2 entries
    ]
    got = {
        r["id"]: r
        for r in acquisition_scores(
            _probs_df(spark, rows), "probs", "y"
        ).collect()
    }
    assert got[0]["entropy"] is None and got[0]["el2n"] is None
    assert got[1]["entropy"] is not None and got[1]["p_true"] is None
    assert got[2]["el2n"] is None and got[2]["is_correct"] is None
    assert got[3]["p_true"] == pytest.approx(1.0)
    assert got[3]["margin_top2"] is None and got[3]["margin_true"] is None
    assert got[3]["el2n"] == pytest.approx(0.0)


def test_acquisition_no_shuffle_no_python(spark):
    df = acquisition_scores(
        _probs_df(spark, [(0, [0.5, 0.5], 0)]), "probs", "y"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# dataset cartography
# ---------------------------------------------------------------------------


def _dyn_df(spark, rows):
    return spark.createDataFrame(
        rows, "id int, epoch int, p_true double, correct boolean"
    )


def test_cartography_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows, want = [], {}
    for ex in range(25):
        ps = rng.random(6)
        cs = rng.random(6) > 0.4
        for e in range(6):
            rows.append((ex, e, float(ps[e]), bool(cs[e])))
        want[ex] = (
            ps.mean(),
            float(np.sqrt(np.maximum(0.0, (ps**2).mean() - ps.mean() ** 2))),
            cs.mean(),
        )
    got = {
        r["id"]: r
        for r in dataset_cartography(
            _dyn_df(spark, rows), "id", "p_true", "correct"
        ).collect()
    }
    for ex, (conf, var, corr) in want.items():
        assert got[ex]["n_epochs"] == 6
        assert got[ex]["confidence"] == pytest.approx(conf, rel=1e-12)
        assert got[ex]["variability"] == pytest.approx(var, rel=1e-9)
        assert got[ex]["correctness"] == pytest.approx(corr, rel=1e-12)


def test_cartography_regions(spark):
    rows = [
        # constant high confidence -> easy
        *[(0, e, 0.9, True) for e in range(4)],
        # constant low confidence -> hard
        *[(1, e, 0.1, False) for e in range(4)],
        # swinging -> ambiguous (std of {0.1, 0.9} = 0.4 >= 0.2)
        *[(2, e, 0.1 if e % 2 else 0.9, True) for e in range(4)],
        # middling, stable -> mid
        *[(3, e, 0.5, True) for e in range(4)],
    ]
    got = {
        r["id"]: r["region"]
        for r in dataset_cartography(
            _dyn_df(spark, rows), "id", "p_true", "correct"
        ).collect()
    }
    assert got == {0: "easy", 1: "hard", 2: "ambiguous", 3: "mid"}


def test_cartography_null_epochs(spark):
    rows = [
        (0, 0, None, True),
        (0, 1, 0.8, None),
        (0, 2, 0.6, False),
    ]
    got = dataset_cartography(
        _dyn_df(spark, rows), "id", "p_true", "correct"
    ).collect()[0]
    # NULL p_true excluded from moments; NULL correct from correctness
    assert got["n_epochs"] == 2
    assert got["confidence"] == pytest.approx(0.7)
    assert got["correctness"] == pytest.approx(0.5)


def test_cartography_single_exchange(spark):
    df = dataset_cartography(
        _dyn_df(spark, [(0, 0, 0.5, True)]), "id", "p_true", "correct"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
