from __future__ import annotations

import numpy as np
import pytest

from modlyn_spark.scoring.labelerrors import (
    class_thresholds,
    confident_joint,
    confident_predictions,
    label_error_candidates,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, y int, probs array<double>")


WORKED = [
    # class 0: self-confidences 0.9, 0.7 -> t0 = 0.8
    (0, 0, [0.9, 0.05, 0.05]),
    (1, 0, [0.7, 0.2, 0.1]),
    # class 1: self-confidences 0.6, 0.1 -> t1 = 0.35
    (2, 1, [0.3, 0.6, 0.1]),
    # class 2: self-confidences 0.2, 0.1 -> t2 = 0.15; only class 2
    # passes its threshold here -> confidently predicted 2 (own class)
    (3, 2, [0.75, 0.05, 0.2]),
    # given 1 but only p0=0.85 >= t0 -> predicted 0: candidate
    (4, 1, [0.85, 0.1, 0.05]),
    # given 2 but only p1=0.4 >= t1 -> predicted 1: candidate
    (5, 2, [0.5, 0.4, 0.1]),
]


def test_thresholds_worked_example(spark):
    t = {
        r["class_idx"]: (r["threshold"], r["n_class"])
        for r in class_thresholds(_df(spark, WORKED), "y", "probs").collect()
    }
    assert t[0] == (pytest.approx(0.8), 2)
    assert t[1] == (pytest.approx(0.35), 2)  # (0.6 + 0.1) / 2
    assert t[2] == (pytest.approx(0.15), 2)  # (0.2 + 0.1) / 2


def test_confident_predictions_worked_example(spark):
    got = {
        r["id"]: r
        for r in confident_predictions(
            _df(spark, WORKED), "y", "probs", n_classes=3
        ).collect()
    }
    assert got[0]["predicted_idx"] == 0
    # id 1: p = [.7, .2, .1] clears NO threshold -> unconfident
    assert got[1]["predicted_idx"] is None
    assert got[2]["predicted_idx"] == 1
    # id 3: p = [.75, .05, .2]; t = [.8, .35, .15] -> only class 2 passes
    assert got[3]["predicted_idx"] == 2
    # id 4: p = [.85, .1, .05] -> only class 0 passes; given was 1
    assert got[4]["predicted_idx"] == 0
    # id 5: p = [.5, .4, .1]; t = [.8, .35, .15] -> class 1 passes (0.4)
    assert got[5]["predicted_idx"] == 1
    assert got[4]["self_conf"] == pytest.approx(0.1)


def test_candidates_and_joint(spark):
    joint = {
        (r["given_idx"], r["predicted_idx"]): r["n"]
        for r in confident_joint(
            _df(spark, WORKED), "y", "probs", n_classes=3
        ).collect()
    }
    assert joint[(0, 0)] == 1 and joint[(1, 1)] == 1 and joint[(2, 2)] == 1
    assert joint[(1, 0)] == 1 and joint[(2, 1)] == 1
    cands = {
        r["id"]: r
        for r in label_error_candidates(
            _df(spark, WORKED), "id", "y", "probs", n_classes=3
        ).collect()
    }
    assert set(cands) == {4, 5}
    assert cands[4]["margin"] == pytest.approx(0.85 - 0.1)


def test_restricted_argmax_tie_first_index(spark):
    # both classes pass their thresholds with the SAME masked value:
    # first index wins
    rows = [(0, 0, [0.5, 0.5]), (1, 1, [0.5, 0.5])]
    got = {
        r["id"]: r["predicted_idx"]
        for r in confident_predictions(
            _df(spark, rows), "y", "probs", n_classes=2
        ).collect()
    }
    assert got[0] == 0 and got[1] == 0


def test_null_and_size_contracts(spark):
    rows = [
        (0, None, [0.9, 0.1]),  # no given label: scored but never a candidate
        (1, 0, None),  # no probs: NULL prediction
        (2, 0, [0.9, 0.05, 0.05]),  # wrong vector size: NULL prediction
        (3, 0, [0.9, 0.1]),
    ]
    got = {
        r["id"]: r
        for r in confident_predictions(
            _df(spark, rows), "y", "probs", n_classes=2
        ).collect()
    }
    assert got[1]["predicted_idx"] is None
    assert got[2]["predicted_idx"] is None
    assert got[0]["predicted_idx"] == 0 and got[0]["self_conf"] is None
    cands = label_error_candidates(
        _df(spark, rows), "id", "y", "probs", n_classes=2
    ).collect()
    assert cands == []  # id 0 has no label; id 3 agrees with itself


def test_planted_noise_recall(spark):
    """Corrupt 10% of labels on peaked probability vectors: confident
    learning should flag most corrupted rows and few clean ones."""
    rng = np.random.default_rng(17)
    n, k = 400, 4
    true = rng.integers(0, k, size=n)
    flipped = rng.random(n) < 0.1
    given = np.where(flipped, (true + 1) % k, true)
    rows = []
    for i in range(n):
        p = rng.random(k) * 0.05
        p[true[i]] += 1.5
        p = p / p.sum()
        rows.append((i, int(given[i]), [float(v) for v in p]))
    cands = {
        r["id"]
        for r in label_error_candidates(
            _df(spark, rows), "id", "y", "probs", n_classes=k
        ).collect()
    }
    bad = {i for i in range(n) if flipped[i]}
    recall = len(cands & bad) / max(1, len(bad))
    false_rate = len(cands - bad) / (n - len(bad))
    assert recall >= 0.9
    assert false_rate <= 0.05


def test_scoring_pass_no_shuffle_no_python(spark):
    df = confident_predictions(
        _df(spark, WORKED), "y", "probs", n_classes=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
