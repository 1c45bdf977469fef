"""Reference API-parity tests, mirroring the reference's own unit test
(tests/test_dataset_type_alias.py: seeded synthetic matrix, string classes,
few steps, alias normalization assertion)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.models import SimpleLogReg, normalize_dataset_type


@pytest.fixture(scope="module")
def adata_like(spark):
    # mirrors the reference fixture: 64 x 8 float32, 3 string classes, rng(0)
    rng = np.random.default_rng(0)
    X = rng.random((64, 8)).astype(np.float32)
    labels = rng.choice(["alpha", "beta", "gamma"], size=64)
    pdf = pd.DataFrame(
        {
            "obs_id": np.arange(64),
            "features": [x.tolist() for x in X],
            "cell_type": labels,
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize(
    "alias,expected",
    [
        ("dask", "dask-arrayloader"),
        ("arrayloaders-dasd", "dask-arrayloader"),
        ("in_memory", "in-memory"),
        ("memory", "in-memory"),
        ("something-else", "something-else"),
    ],
)
def test_dataset_type_alias_normalization(alias, expected):
    assert normalize_dataset_type(alias) == expected


def test_fit_with_alias_and_weights_shape(spark, adata_like):
    model = SimpleLogReg(adata_like, label_column="cell_type")
    model.fit(
        adata_like, dataset_type="arrayloaders-dasd",
        batch_size_rows_hint=16, max_steps=5, max_epochs=2,
    )
    assert model.dataset_type == "dask-arrayloader"  # reference's assertion
    assert len(model.losses) == 5

    w = model.get_weights()
    assert w.shape == (3, 8)
    assert list(w.index) == ["alpha", "beta", "gamma"]  # LabelEncoder order
    assert w.attrs["method_name"] == "modlyn_logreg"
    assert list(w.columns) == [f"f{j:04d}" for j in range(8)]


def test_evaluate_report(spark, adata_like):
    model = SimpleLogReg(adata_like, label_column="cell_type", learning_rate=0.5)
    model.fit(adata_like, max_steps=30, max_epochs=10)
    rep = model.evaluate(adata_like)
    assert {"accuracy", "macro_f1", "weighted_f1"} <= set(rep)
    assert 0 <= rep["accuracy"] <= 1
    assert all(
        {"precision", "recall", "f1-score", "support"} <= set(rep[c])
        for c in ["alpha", "beta", "gamma"]
    )
