"""Distributed evaluation metrics: tie-corrected ROC-AUC vs a
trapezoidal twin, reliability/ECE arithmetic, degenerate inputs."""

from __future__ import annotations

import pytest

# --- ROC-AUC / calibration --------------------------------------------------


def _np_auc(scores, labels):
    """Independent twin: trapezoidal integration over the exact ROC."""
    import numpy as np

    s = np.asarray(scores, float)
    y = np.asarray(labels, int)
    order = np.argsort(-s, kind="mergesort")
    s, y = s[order], y[order]
    # group ties
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    last = np.r_[np.diff(s) != 0, True]
    tps, fps = tps[last], fps[last]
    tpr = np.r_[0, tps] / tps[-1]
    fpr = np.r_[0, fps] / fps[-1]
    return float(np.trapz(tpr, fpr))


def test_roc_auc_matches_trapezoid_twin(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import roc_auc

    rng = np.random.default_rng(7)
    n = 4000
    y = rng.integers(0, 2, n)
    # informative but noisy scores, quantized -> heavy ties
    s = np.round(0.35 * y + 0.65 * rng.random(n), 2)
    pdf = pd.DataFrame({"score": s, "y": y})
    got = roc_auc(
        spark.createDataFrame(pdf), "score", "y", precision=2
    ).collect()[0]
    assert got["auc"] == pytest.approx(_np_auc(s, y), abs=1e-12)
    assert got["n_pos"] == int(y.sum()) and got["n_neg"] == int(n - y.sum())
    # perfect and inverted separations
    p2 = pd.DataFrame({"score": [0.1, 0.2, 0.8, 0.9], "y": [0, 0, 1, 1]})
    assert roc_auc(spark.createDataFrame(p2), "score", "y").collect()[0][
        "auc"
    ] == pytest.approx(1.0)
    p3 = pd.DataFrame({"score": [0.9, 0.8, 0.2, 0.1], "y": [0, 0, 1, 1]})
    assert roc_auc(spark.createDataFrame(p3), "score", "y").collect()[0][
        "auc"
    ] == pytest.approx(0.0)
    # single-class -> NULL auc, not a crash
    p4 = pd.DataFrame({"score": [0.5, 0.6], "y": [1, 1]})
    assert roc_auc(spark.createDataFrame(p4), "score", "y").collect()[0][
        "auc"
    ] is None


def _np_ap(scores, labels):
    """Independent twin: sklearn ``average_precision_score`` semantics —
    AP = Σ_k (R_k − R_{k−1}) · P_k over score-descending distinct
    thresholds, tie blocks entering whole."""
    import numpy as np

    s = np.asarray(scores, float)
    y = np.asarray(labels, int)
    order = np.argsort(-s, kind="mergesort")
    s, y = s[order], y[order]
    tp = np.cumsum(y)
    k = np.arange(1, len(y) + 1)
    last = np.r_[np.diff(s) != 0, True]  # end of each tie block
    tp, k = tp[last], k[last]
    npos = int(y.sum())
    rec = np.r_[0, tp] / npos
    prec = tp / k
    return float(np.sum(np.diff(rec) * prec))


def test_average_precision_matches_step_twin(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import average_precision

    rng = np.random.default_rng(13)
    n = 4000
    y = rng.integers(0, 2, n)
    # informative but noisy scores, quantized -> heavy ties
    s = np.round(0.35 * y + 0.65 * rng.random(n), 2)
    pdf = pd.DataFrame({"score": s, "y": y})
    got = average_precision(
        spark.createDataFrame(pdf), "score", "y", precision=2
    ).collect()[0]
    assert got["ap"] == pytest.approx(_np_ap(s, y), abs=1e-12)
    assert got["n_pos"] == int(y.sum()) and got["n_neg"] == int(n - y.sum())
    # perfect separation -> AP 1.0
    p2 = pd.DataFrame({"score": [0.1, 0.2, 0.8, 0.9], "y": [0, 0, 1, 1]})
    assert average_precision(
        spark.createDataFrame(p2), "score", "y"
    ).collect()[0]["ap"] == pytest.approx(1.0)
    # inverted separation -> AP = generalized harmonic ratio, twin agrees
    p3 = pd.DataFrame({"score": [0.9, 0.8, 0.2, 0.1], "y": [0, 0, 1, 1]})
    assert average_precision(
        spark.createDataFrame(p3), "score", "y"
    ).collect()[0]["ap"] == pytest.approx(
        _np_ap([0.9, 0.8, 0.2, 0.1], [0, 0, 1, 1])
    )
    # all-ties block: single threshold, P = prevalence
    p4 = pd.DataFrame({"score": [0.5] * 6, "y": [1, 0, 1, 0, 0, 0]})
    assert average_precision(
        spark.createDataFrame(p4), "score", "y"
    ).collect()[0]["ap"] == pytest.approx(2 / 6)
    # no positives -> NULL ap, not a crash
    p5 = pd.DataFrame({"score": [0.5, 0.6], "y": [0, 0]})
    r5 = average_precision(spark.createDataFrame(p5), "score", "y").collect()[
        0
    ]
    assert r5["ap"] is None and r5["n_pos"] == 0 and r5["n_neg"] == 2


def test_calibration_report_and_ece(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import calibration_report

    rng = np.random.default_rng(11)
    n = 5000
    p = rng.random(n)
    y = (rng.random(n) < p).astype(int)  # calibrated by construction
    pdf = pd.DataFrame({"p": p, "y": y})
    rows = calibration_report(
        spark.createDataFrame(pdf), "p", "y", bins=10
    ).collect()
    assert len(rows) == 10
    eces = {round(r["ece"], 12) for r in rows}
    assert len(eces) == 1  # shared column
    # numpy twin
    b = np.minimum(np.floor(p * 10).astype(int), 9)
    ece = 0.0
    for k in range(10):
        m = b == k
        r = next(x for x in rows if x["bin"] == k)
        assert r["n"] == int(m.sum())
        assert r["conf"] == pytest.approx(p[m].mean())
        assert r["acc"] == pytest.approx(y[m].mean())
        ece += m.sum() / n * abs(y[m].mean() - p[m].mean())
    assert rows[0]["ece"] == pytest.approx(ece)
    assert rows[0]["ece"] < 0.05  # calibrated input -> small ECE
    # p = 1.0 folds into the last bin
    p5 = pd.DataFrame({"p": [1.0, 0.95], "y": [1, 1]})
    r5 = calibration_report(spark.createDataFrame(p5), "p", "y", bins=10)
    assert [x["bin"] for x in r5.collect()] == [9]


# --- isotonic calibration ---------------------------------------------------


def _brute_pav(y, w):
    """O(B^2) reference PAV: repeatedly pool the first adjacent violator
    until monotone. The isotonic solution is unique, so any pooling
    order agrees with the engine's stack formulation."""
    blocks = [[i, i, float(y[i]), float(w[i])] for i in range(len(y))]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][2] > blocks[i + 1][2]:
                lo, _, v1, w1 = blocks[i]
                _, hi, v2, w2 = blocks[i + 1]
                blocks[i : i + 2] = [
                    [lo, hi, (v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2]
                ]
                changed = True
                break
    return blocks


def test_isotonic_fit_matches_brute_pav(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import isotonic_fit

    rng = np.random.default_rng(17)
    n = 3000
    s = np.round(rng.random(n), 2)
    # non-monotone miscalibrated truth so PAV has real pooling to do
    y = (rng.random(n) < 0.2 + 0.6 * np.abs(np.sin(3 * s))).astype(int)
    pdf = pd.DataFrame({"score": s, "y": y})
    got = isotonic_fit(
        spark.createDataFrame(pdf), "score", "y", precision=2
    )
    # brute twin over the same histogram
    h = (
        pdf.groupby("score")
        .agg(n=("y", "size"), p=("y", "mean"))
        .reset_index()
        .sort_values("score")
    )
    exp = _brute_pav(h["p"].to_numpy(), h["n"].to_numpy())
    assert len(got) == len(exp)
    sc = h["score"].to_numpy()
    for row, (lo, hi, v, w) in zip(got.itertuples(index=False), exp):
        assert row.score_lo == sc[lo] and row.score_hi == sc[hi]
        assert row.p_cal == pytest.approx(v, abs=1e-12)
        assert row.n == int(w)
    # monotone, and pooling preserves the base rate
    assert list(got["p_cal"]) == sorted(got["p_cal"])
    assert (got["p_cal"] * got["n"]).sum() / got["n"].sum() == pytest.approx(
        y.mean()
    )
    # hand case: one violator pools to the weighted mean
    p2 = pd.DataFrame({"score": [1.0, 2.0, 2.0], "y": [1, 0, 0]})
    m2 = isotonic_fit(spark.createDataFrame(p2), "score", "y")
    assert len(m2) == 1 and m2["p_cal"].iloc[0] == pytest.approx(1 / 3)


def test_calibrate_scores_stepwise_clamp_and_nulls(spark):
    import pandas as pd

    from modlyn_spark.scoring.metrics import calibrate_scores, isotonic_fit

    train = pd.DataFrame(
        {
            "score": [0.1, 0.1, 0.3, 0.3, 0.7, 0.7, 0.9, 0.9],
            "y": [0, 0, 0, 1, 1, 0, 1, 1],
        }
    )
    model = isotonic_fit(spark.createDataFrame(train), "score", "y")
    apply_pdf = pd.DataFrame(
        {
            "i": [0, 1, 2, 3, 4],
            "score": [0.05, 0.2, 0.5, 0.95, None],
        }
    )
    got = {
        r["i"]: r["p_cal"]
        for r in calibrate_scores(
            spark.createDataFrame(apply_pdf), model, "score"
        ).collect()
    }
    first, last = model["p_cal"].iloc[0], model["p_cal"].iloc[-1]
    assert got[0] == pytest.approx(first)  # below range -> clip
    assert got[3] == pytest.approx(last)  # above range -> clip
    # gaps take the block to the LEFT (stepwise-constant)
    lo = model["score_lo"].to_numpy()
    import numpy as np

    for i, sv in ((1, 0.2), (2, 0.5)):
        blk = int(np.searchsorted(lo, sv, side="right")) - 1
        assert got[i] == pytest.approx(model["p_cal"].iloc[blk])
    assert got[4] is None  # NULL passthrough


def test_isotonic_improves_ece(spark):
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import (
        calibrate_scores,
        calibration_report,
        isotonic_fit,
    )

    rng = np.random.default_rng(23)
    n = 5000
    true_p = rng.random(n)
    y = (rng.random(n) < true_p).astype(int)
    # overconfident raw scores: push toward the extremes
    raw = np.clip(true_p + 0.35 * np.sign(true_p - 0.5), 0, 1)
    pdf = pd.DataFrame({"raw": np.round(raw, 3), "y": y})
    df = spark.createDataFrame(pdf)
    model = isotonic_fit(df, "raw", "y", precision=3)
    cal = calibrate_scores(df, model, "raw", precision=3)
    ece_raw = calibration_report(df, "raw", "y").collect()[0]["ece"]
    ece_cal = calibration_report(cal, "p_cal", "y").collect()[0]["ece"]
    assert ece_cal < ece_raw / 3


def test_ovr_roc_auc_matches_sklearn_style_twin(spark):
    """Per-class OvR AUC == the binary tie-corrected twin run per class;
    macro average == average of the per-class values."""
    import numpy as np
    import pandas as pd

    from modlyn_spark.scoring.metrics import ovr_roc_auc, roc_auc

    rng = np.random.default_rng(17)
    n, k = 600, 4
    truth = rng.integers(0, k, n)
    scores = rng.random((n, k)).round(2)  # heavy ties
    scores[np.arange(n), truth] += 0.15   # some signal
    long = pd.DataFrame(
        {
            "i": np.repeat(np.arange(n), k),
            "cls": np.tile(np.arange(k), n),
            "score": scores.ravel(),
            "truth": np.repeat(truth, k),
        }
    )
    df = spark.createDataFrame(long)
    got = {
        r["cls"]: (r["auc"], r["n_pos"], r["n_neg"])
        for r in ovr_roc_auc(df, "cls", "score", "truth").collect()
    }
    assert set(got) == set(range(k))
    for c in range(k):
        sub = spark.createDataFrame(
            pd.DataFrame(
                {"score": scores[:, c], "y": (truth == c).astype(int)}
            )
        )
        want = roc_auc(sub, "score", "y").collect()[0]
        assert got[c][0] == pytest.approx(want["auc"], abs=1e-12)
        assert got[c][1] == want["n_pos"] and got[c][2] == want["n_neg"]
        assert got[c][0] > 0.5  # the planted signal is visible


def test_ovr_roc_auc_degenerate_class_null(spark):
    import pandas as pd

    from modlyn_spark.scoring.metrics import ovr_roc_auc

    # class 1 has no positives anywhere -> NULL auc for it
    long = pd.DataFrame(
        {
            "cls": [0, 1, 0, 1],
            "score": [0.9, 0.1, 0.2, 0.8],
            "truth": [0, 0, 0, 0],
        }
    )
    got = {
        r["cls"]: r["auc"]
        for r in ovr_roc_auc(
            spark.createDataFrame(long), "cls", "score", "truth"
        ).collect()
    }
    assert got[1] is None and got[0] is None  # 0 has no negatives either
