"""Scoring layer vs numpy oracle: class stats, F-statistic, logreg, metrics.

Fixture mirrors the reference's own unit fixture: seeded synthetic float32
matrix with string classes (reference: tests/test_dataset_type_alias.py:42-45
— 64x8, rng(0), 3 classes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.oracle.pandas_oracle import (
    oracle_class_feature_stats,
    oracle_f_statistic,
    oracle_logreg,
)
from modlyn_spark.scoring.logreg import (
    DistributedLogReg,
    assign_batches,
    assign_batches_pandas,
)
from modlyn_spark.scoring.metrics import classification_report
from modlyn_spark.scoring.stats import class_feature_stats, f_statistic, label_encode

N, D, K = 256, 8, 3


@pytest.fixture(scope="module")
def matrix_pdf():
    rng = np.random.default_rng(0)
    X = rng.random((N, D)).astype(np.float32)
    labels = pd.Series(rng.choice([f"class_{i}" for i in range(K)], size=N))
    # make features informative: shift some features per class
    for i in range(K):
        X[labels.values == f"class_{i}", i] += 0.5 * (i + 1)
    return pd.DataFrame(
        {
            "row_id": np.arange(N),
            "features": [x.tolist() for x in X],
            "label": labels,
        }
    ), X, labels


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("strategy", ["partial", "explode"])
def test_class_feature_stats(spark, matrix_pdf, strategy):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    got = (
        class_feature_stats(df, "label", "features", strategy=strategy)
        .toPandas()
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    exp = oracle_class_feature_stats(X, labels).sort_values(["label", "pos"]).reset_index(drop=True)
    assert (got["label"].values == exp["label"].values).all()
    assert (got["n"].values == exp["n"].values).all()
    assert np.allclose(got["mean"], exp["mean"])
    assert np.allclose(got["var_pop"], exp["var_pop"], atol=1e-9)


def test_f_statistic(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    stats = class_feature_stats(df, "label", "features", strategy="partial")
    got = f_statistic(stats).toPandas().sort_values("pos").reset_index(drop=True)
    exp = oracle_f_statistic(X, labels)
    assert np.allclose(got["f_stat"], exp["f_stat"])
    # shifted features must dominate: top-K by F are exactly 0..K-1
    top = set(got.nlargest(K, "f_stat")["pos"])
    assert top == set(range(K))


def test_label_encode_sklearn_parity(spark, matrix_pdf):
    pdf, _, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    assert classes == sorted(labels.unique())  # LabelEncoder sorts ascending
    got = enc.select("label", "label_idx").distinct().toPandas()
    lut = dict(zip(got["label"], got["label_idx"]))
    assert lut == {c: i for i, c in enumerate(classes)}


def test_batch_assignment_parity(spark, matrix_pdf):
    pdf, _, _ = matrix_pdf
    df = _spark_df(spark, pdf)
    got = (
        assign_batches(df, ["row_id"], 7)
        .select("row_id", "batch_id")
        .toPandas()
        .sort_values("row_id")
    )
    exp = assign_batches_pandas(pdf.sort_values("row_id"), ["row_id"], 7)
    assert (got["batch_id"].values == exp).all()


def test_logreg_allclose_vs_oracle(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    n_batches = 4
    enc = assign_batches(enc, ["row_id"], n_batches)

    model = DistributedLogReg(D, classes, learning_rate=1e-2, weight_decay=1e-2)
    model.fit(enc, max_steps=12, max_epochs=3, n_batches=n_batches)

    order = pdf.sort_values("row_id")
    bids = assign_batches_pandas(order, ["row_id"], n_batches)
    exp_w, exp_losses = oracle_logreg(
        X, labels, bids, lr=1e-2, weight_decay=1e-2, max_steps=12, n_epochs=3
    )
    exp_W = exp_w.pivot(index="label", columns="pos", values="weight").values
    assert np.allclose(model.W, exp_W, rtol=1e-6, atol=1e-9)
    assert np.allclose(model.losses, exp_losses, rtol=1e-6)


def test_logreg_learns_and_reports(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    enc = assign_batches(enc, ["row_id"], 2)
    model = DistributedLogReg(D, classes, learning_rate=0.5, weight_decay=1e-3)
    model.fit(enc, max_steps=40, max_epochs=20, n_batches=2)
    pred = model.predict_df(enc)
    rep = classification_report(pred, "label_idx", "pred_idx", classes)
    assert rep["accuracy"] > 0.8  # shifted features are easily separable
    assert 0 <= rep["macro_f1"] <= 1
    wdf = model.get_weights()
    assert wdf.shape == (K, D)
    assert wdf.attrs["method_name"] == "modlyn_logreg"
    assert list(wdf.index) == classes


def test_weights_long_roundtrip(spark, matrix_pdf):
    pdf, _, _ = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    enc = assign_batches(enc, ["row_id"], 2)
    model = DistributedLogReg(D, classes).fit(enc, max_steps=2, n_batches=2)
    long = model.weights_long(spark).toPandas()
    assert len(long) == K * D
    wide = long.pivot(index="label", columns="pos", values="weight")
    assert np.allclose(wide.values, model.W)
