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
