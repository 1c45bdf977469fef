"""Classification metrics from a distributed confusion matrix.

The reference accumulates torchmetrics Accuracy/macro-F1 streaming per epoch
(modlyn/models/_simple_logreg_model.py:49-56,81-82) and prints a sklearn
classification_report (:225-255). Distributed equivalent: ONE tiny shuffle —
``groupBy(true, pred).count()`` — then exact precision/recall/F1 arithmetic
on the driver over the (k x k)-bounded confusion matrix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, true_col: str = "label_idx", pred_col: str = "pred_idx"
) -> pd.DataFrame:
    """(true, pred, count) long-form confusion matrix, collected (k*k rows)."""
    return (
        df.groupBy(F.col(true_col).alias("true"), F.col(pred_col).alias("pred"))
        .count()
        .toPandas()
    )


def classification_report_df(
    df: DataFrame,
    true_col: str = "label_idx",
    pred_col: str = "pred_idx",
) -> DataFrame:
    """DataFrame-native classification report (reference M4/M5,
    modlyn/models/_simple_logreg_model.py:225-255): one row per class with
    (label, precision, recall, f1, support), plus three summary rows —
    '__accuracy__' (precision=recall=f1=accuracy, support=total),
    '__macro__' (unweighted means) and '__weighted__' (support-weighted
    means, support=total). sklearn classification_report parity.

    Distributed shape: ONE data-sized pass (the map-side-combinable
    groupBy(true, pred).count() — k x k result rows), then per-class
    arithmetic as joins over the k-row label set. The confusion matrix is
    eagerly localCheckpoint()ed: it is referenced by five downstream
    branches (labels/tp/pred-n/true-n/totals), and without truncation
    Catalyst would re-evaluate the whole upstream subtree — including any
    prediction UDF over the full table — once per branch (measured: the
    un-truncated report plan held 33 Exchanges and ~10 copies of the
    predict stage; with the checkpoint it is one scan + small-data joins).
    """
    cm = (
        df.groupBy(
            F.col(true_col).cast("string").alias("t"),
            F.col(pred_col).cast("string").alias("p"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # k*k rows; truncates the data-sized subtree
    )
    labs = (
        cm.select(F.col("t").alias("label"))
        .union(cm.select(F.col("p").alias("label")))
        .distinct()
    )
    tp = cm.where(F.col("t") == F.col("p")).select(
        F.col("t").alias("label"), F.col("n").alias("tp")
    )
    pred_n = cm.groupBy(F.col("p").alias("label")).agg(F.sum("n").alias("pred_n"))
    true_n = cm.groupBy(F.col("t").alias("label")).agg(F.sum("n").alias("true_n"))
    per = (
        labs.join(tp, "label", "left")
        .join(pred_n, "label", "left")
        .join(true_n, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
            F.coalesce("true_n", F.lit(0)).alias("true_n"),
        )
        .select(
            "label",
            F.when(F.col("pred_n") > 0, F.col("tp") * 1.0 / F.col("pred_n"))
            .otherwise(0.0)
            .alias("precision"),
            F.when(F.col("true_n") > 0, F.col("tp") * 1.0 / F.col("true_n"))
            .otherwise(0.0)
            .alias("recall"),
            F.col("tp"),
            F.col("true_n"),
        )
        .select(
            "label",
            "precision",
            "recall",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2.0 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            )
            .otherwise(0.0)
            .alias("f1"),
            F.col("true_n").cast("long").alias("support"),
            F.col("tp"),
        )
    ).localCheckpoint()  # k rows, referenced by the output + 3 summary rows
    summary = per.agg(
        (F.sum("tp") * 1.0 / F.sum("support")).alias("accuracy"),
        F.avg("precision").alias("m_p"),
        F.avg("recall").alias("m_r"),
        F.avg("f1").alias("m_f"),
        (F.sum(F.col("precision") * F.col("support")) / F.sum("support")).alias("w_p"),
        (F.sum(F.col("recall") * F.col("support")) / F.sum("support")).alias("w_r"),
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("w_f"),
        F.sum("support").cast("long").alias("total"),
    )
    acc = summary.select(
        F.lit("__accuracy__").alias("label"),
        F.col("accuracy").alias("precision"),
        F.col("accuracy").alias("recall"),
        F.col("accuracy").alias("f1"),
        F.col("total").alias("support"),
    )
    macro = summary.select(
        F.lit("__macro__").alias("label"),
        F.col("m_p").alias("precision"),
        F.col("m_r").alias("recall"),
        F.col("m_f").alias("f1"),
        F.col("total").alias("support"),
    )
    weighted = summary.select(
        F.lit("__weighted__").alias("label"),
        F.col("w_p").alias("precision"),
        F.col("w_r").alias("recall"),
        F.col("w_f").alias("f1"),
        F.col("total").alias("support"),
    )
    return per.drop("tp").unionByName(acc).unionByName(macro).unionByName(weighted)


def classification_report(
    df: DataFrame,
    true_col: str = "label_idx",
    pred_col: str = "pred_idx",
    classes: list | None = None,
) -> dict:
    """sklearn-parity report: per-class precision/recall/F1/support, plus
    accuracy, macro-F1 and weighted-F1 (reference M4/M5)."""
    cm = confusion_matrix(df, true_col, pred_col)
    labels = sorted(set(cm["true"]) | set(cm["pred"]))
    tp = {c: 0 for c in labels}
    fp = {c: 0 for c in labels}
    fn = {c: 0 for c in labels}
    total = int(cm["count"].sum())
    correct = 0
    for _, r in cm.iterrows():
        t, p, n = r["true"], r["pred"], int(r["count"])
        if t == p:
            tp[t] += n
            correct += n
        else:
            fp[p] += n
            fn[t] += n
    report: dict = {}
    f1s, weights = [], []
    for c in labels:
        prec = tp[c] / (tp[c] + fp[c]) if tp[c] + fp[c] else 0.0
        rec = tp[c] / (tp[c] + fn[c]) if tp[c] + fn[c] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        support = tp[c] + fn[c]
        name = classes[c] if classes is not None else c
        report[name] = {
            "precision": prec,
            "recall": rec,
            "f1-score": f1,
            "support": support,
        }
        f1s.append(f1)
        weights.append(support)
    report["accuracy"] = correct / total if total else 0.0
    report["macro_f1"] = sum(f1s) / len(f1s) if f1s else 0.0
    report["weighted_f1"] = (
        sum(f * w for f, w in zip(f1s, weights)) / sum(weights) if sum(weights) else 0.0
    )
    return report


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    positive=1,
    precision: int | None = None,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC via the Mann-Whitney rank form:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    where R⁺ is the sum of AVERAGE ranks of the positives (a tied block
    of c scores starting after cum_before rows has average rank
    ``cum_before + (c+1)/2`` — the standard tie correction, identical to
    sklearn's trapezoidal ``roc_auc_score``).

    Distributed as a distinct-SCORE histogram (the
    ``operators.binning`` pattern): one map-side-combinable
    ``groupBy(score)`` with per-class partial counts, then the rank
    window runs over DISTINCT scores only, never the rows. Pass
    ``precision`` to quantize continuous scores and bound that set
    (same contract as ``quantile_bins``); calibrated probabilities at
    precision 6 cost at most 1e6+1 histogram rows. NULL scores/labels
    are excluded. Returns one row: (auc, n_pos, n_neg).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    if precision is not None:
        s = F.round(s, precision)
    is_pos = (F.col(label_col) == F.lit(positive)).cast("long")
    h = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(is_pos).alias("__cp"),
            F.sum(1 - is_pos).alias("__cn"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = h.select(
        "__cp",
        "__cn",
        (
            F.sum(F.col("__cp") + F.col("__cn")).over(w)
            - (F.col("__cp") + F.col("__cn"))
        ).alias("__before"),
        (F.col("__cp") + F.col("__cn")).alias("__c"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("__cp")
            * (F.col("__before") + (F.col("__c") + 1) / 2.0)
        ).alias("rpos"),
        F.sum("__cp").alias("np"),
        F.sum("__cn").alias("nn"),
    )
    return agg.select(
        F.when(
            (F.col("np") > 0) & (F.col("nn") > 0),
            (F.col("rpos") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np") * F.col("nn")),
        ).alias("auc"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
    )


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    positive=1,
    bins: int = 10,
) -> DataFrame:
    """Reliability table + expected calibration error over equal-WIDTH
    probability bins (the standard ECE binning): per bin
    ``(bin, n, conf, acc)`` with ``conf`` = mean predicted probability,
    ``acc`` = empirical positive rate, plus the shared ``ece`` column

        ECE = Σ_b (n_b / N) · |acc_b − conf_b|.

    Bin = ``min(floor(p · bins), bins − 1)`` (p = 1.0 folds into the
    last bin). One map-side-combinable groupBy; the ECE is a window over
    the ≤``bins`` aggregate rows. Inputs must be probabilities in
    [0, 1]: a p < 0 surfaces as a negative bin row rather than being
    silently folded. NULL probabilities/labels are excluded.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    from pyspark.sql import Window

    p = F.col(prob_col)
    is_pos = (F.col(label_col) == F.lit(positive)).cast("double")
    b = F.least(F.floor(p * bins), F.lit(bins - 1)).cast("long")
    per = (
        df.where(p.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(p).alias("conf"),
            F.avg(is_pos).alias("acc"),
        )
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.withColumn(
        "ece",
        F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf"))).over(w)
        / F.sum("n").over(w),
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    positive=1,
    precision: int | None = None,
) -> pd.DataFrame:
    """Fit isotonic (monotone non-decreasing) calibration by weighted
    pool-adjacent-violators over the distinct-score histogram.

    Distributed part: the same bounded map-side-combinable
    ``groupBy(score)`` histogram as :func:`roc_auc` (``precision``
    bounds the distinct-score set for continuous scores — calibrated
    probabilities at precision 3 cost <= 1001 rows). PAV itself is
    inherently sequential, so it runs on the DRIVER over that bounded
    histogram — the same driver-holds-the-model contract as the logreg
    weights / k-means centroids / PCA eigendecomposition: the collected
    state is O(distinct scores), never O(rows).

    Returns a pandas model table (block, score_lo, score_hi, p_cal, n):
    maximal constant blocks in ascending score order, ``p_cal``
    non-decreasing, each block's value the weighted positive rate of its
    pooled scores (sklearn ``IsotonicRegression`` block semantics).
    Apply with :func:`calibrate_scores`.
    """
    import numpy as np

    s = F.col(score_col)
    if precision is not None:
        s = F.round(s, precision)
    is_pos = (F.col(label_col) == F.lit(positive)).cast("long")
    h = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(is_pos).alias("__p"),
        )
        .orderBy("__s")
        .toPandas()
    )
    if h.empty:
        return pd.DataFrame(
            columns=["block", "score_lo", "score_hi", "p_cal", "n"]
        )
    scores = h["__s"].to_numpy(dtype=np.float64)
    n = h["__n"].to_numpy(dtype=np.float64)
    p = h["__p"].to_numpy(dtype=np.float64) / n
    # weighted PAV, stack formulation: O(distinct scores)
    vals: list[float] = []
    wts: list[float] = []
    hi_idx: list[int] = []  # last histogram bin folded into this block
    for i in range(len(scores)):
        vals.append(float(p[i]))
        wts.append(float(n[i]))
        hi_idx.append(i)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            merged = (
                vals[-1] * wts[-1] + vals[-2] * wts[-2]
            ) / (wts[-1] + wts[-2])
            w2 = wts[-1] + wts[-2]
            vals.pop()
            wts.pop()
            hi = hi_idx.pop()
            vals[-1] = merged
            wts[-1] = w2
            hi_idx[-1] = hi
    lo_idx = [0] + [h + 1 for h in hi_idx[:-1]]
    return pd.DataFrame(
        {
            "block": np.arange(len(vals), dtype=np.int64),
            "score_lo": scores[lo_idx],
            "score_hi": scores[hi_idx],
            "p_cal": vals,
            "n": np.asarray(wts, dtype=np.int64),
        }
    )


def calibrate_scores(
    df: DataFrame,
    model: pd.DataFrame,
    score_col: str,
    *,
    out_col: str = "p_cal",
    precision: int | None = None,
) -> DataFrame:
    """Apply an :func:`isotonic_fit` model: stepwise-constant lookup —
    a score maps to the LAST block whose ``score_lo`` is <= score,
    clamped to the first/last block outside the fitted range (sklearn
    ``out_of_bounds='clip'`` semantics, stepwise rather than
    interpolated — documented engine choice). NULL scores stay NULL.

    The model is block-sized (<= distinct scores), so it BROADCASTS
    into a range join against half-open block intervals
    [score_lo_i, score_lo_{i+1}) — one scan, no shuffle of ``df``.
    Pass the same ``precision`` used at fit time so raw scores quantize
    onto the fitted grid before lookup."""
    import numpy as np

    spark = df.sparkSession
    if model.empty:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    lo = model["score_lo"].to_numpy(dtype=np.float64)
    edges = np.r_[-np.inf, lo[1:]]
    uppers = np.r_[lo[1:], np.inf]
    blocks = spark.createDataFrame(
        pd.DataFrame(
            {
                "__lo": edges,
                "__hi": uppers,
                "__p": model["p_cal"].to_numpy(dtype=np.float64),
            }
        )
    )
    s = F.col(score_col)
    if precision is not None:
        s = F.round(s, precision)
    joined = df.join(
        F.broadcast(blocks),
        on=[s >= F.col("__lo"), s < F.col("__hi")],
        how="left",
    )
    return joined.withColumn(out_col, F.col("__p")).drop(
        "__lo", "__hi", "__p"
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    positive=1,
    precision: int | None = None,
) -> DataFrame:
    """Exact average precision (PR-AUC, sklearn ``average_precision_score``
    semantics): AP = Σ_k (R_k − R_{k−1}) · P_k over score-DESCENDING
    thresholds, one threshold per distinct score — ties enter as one
    block, exactly like sklearn.

    Same distinct-score histogram shape as :func:`roc_auc`: the
    threshold sweep is a cumulative window over distinct scores, never
    rows (``precision`` bounds that set for continuous scores). Returns
    one row (ap, n_pos, n_neg); AP is NULL when there are no positives.
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    if precision is not None:
        s = F.round(s, precision)
    is_pos = (F.col(label_col) == F.lit(positive)).cast("long")
    h = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(is_pos).alias("__cp"),
            F.sum(1 - is_pos).alias("__cn"),
        )
    )
    wd = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = h.select(
        "__cp",
        F.sum("__cp").over(wd).alias("__tp"),
        F.sum(F.col("__cp") + F.col("__cn")).over(wd).alias("__k"),
        F.sum("__cp").over(wa).alias("__np"),
        F.sum("__cn").over(wa).alias("__nn"),
    )
    agg = ranked.agg(
        F.sum(
            F.when(
                F.col("__np") > 0,
                (F.col("__cp") / F.col("__np"))
                * (F.col("__tp") / F.col("__k")),
            )
        ).alias("ap"),
        F.max("__np").alias("np"),
        F.max("__nn").alias("nn"),
    )
    return agg.select(
        F.col("ap"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
    )


def ovr_roc_auc(
    df: DataFrame,
    class_col: str,
    score_col: str,
    truth_col: str,
    *,
    precision: int | None = None,
) -> DataFrame:
    """Per-class one-vs-rest ROC-AUC over a LONG-form score table — the
    multi-class companion of :func:`roc_auc` (macro-AUC is the plain
    average of the output, micro/weighted variants are one aggregate
    away).

    ``df`` carries one row per (instance, class): the class's score and
    the instance's true label (``truth_col``); a row is positive for its
    class iff ``truth == class``. Same distributed shape as the binary
    form — a distinct-(class, score) histogram with map-side partial
    counts — but every window is PARTITIONED BY class, so the rank scan
    parallelizes across classes instead of serializing on one global
    ordering. Single-class degenerate inputs yield NULL auc (same
    guard). Returns (class, auc, n_pos, n_neg) — one row per class.
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    if precision is not None:
        s = F.round(s, precision)
    is_pos = (F.col(truth_col) == F.col(class_col)).cast("long")
    h = (
        df.where(
            s.isNotNull()
            & F.col(truth_col).isNotNull()
            & F.col(class_col).isNotNull()
        )
        .groupBy(F.col(class_col).alias("__k"), s.alias("__s"))
        .agg(
            F.sum(is_pos).alias("__cp"),
            F.sum(1 - is_pos).alias("__cn"),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = h.select(
        "__k",
        "__cp",
        "__cn",
        (
            F.sum(F.col("__cp") + F.col("__cn")).over(w)
            - (F.col("__cp") + F.col("__cn"))
        ).alias("__before"),
        (F.col("__cp") + F.col("__cn")).alias("__c"),
    )
    agg = ranked.groupBy("__k").agg(
        F.sum(
            F.col("__cp") * (F.col("__before") + (F.col("__c") + 1) / 2.0)
        ).alias("rpos"),
        F.sum("__cp").alias("np"),
        F.sum("__cn").alias("nn"),
    )
    return agg.select(
        F.col("__k").alias(class_col),
        F.when(
            (F.col("np") > 0) & (F.col("nn") > 0),
            (F.col("rpos") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np") * F.col("nn")),
        ).alias("auc"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
    )
