"""Plotting surface: data-shaping helpers are pure pandas and always
tested; figure construction is matplotlib-gated (skip-marked here — the
container ships no matplotlib) with a clear install hint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.plots import (
    align_weight_frames,
    prepare_classification_bars,
    prepare_jaccard_bars,
)


def _has_mpl() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def test_prepare_jaccard_bars_long_form():
    df = pd.DataFrame(
        {
            "method1": ["a", "a", "a", "a"],
            "method2": ["b", "b", "c", "c"],
            "label": ["x", "y", "x", "y"],
            "n_top": [5, 5, 5, 5],
            "jaccard": [0.2, 0.4, 1.0, 0.0],
        }
    )
    wide = prepare_jaccard_bars(df)
    assert np.isclose(wide.loc[5, "a<->b"], 0.3)
    assert np.isclose(wide.loc[5, "a<->c"], 0.5)


def test_prepare_classification_bars():
    report = {
        "alpha": {"precision": 0.5, "recall": 1.0, "f1-score": 2 / 3, "support": 4},
        "beta": {"precision": 1.0, "recall": 0.25, "f1-score": 0.4, "support": 4},
        "accuracy": 0.625,
        "macro_f1": (2 / 3 + 0.4) / 2,
        "weighted_f1": (2 / 3 + 0.4) / 2,
    }
    bars = prepare_classification_bars(report, ["alpha", "beta"])
    assert bars["class"].tolist() == ["alpha", "beta"]
    assert np.isclose(bars["f1"].iloc[0], 2 / 3)
    assert (bars["random_baseline"] == 0.5).all()


def test_align_weight_frames_shared_scale():
    a = pd.DataFrame([[1.0, -2.0]], index=["c1"], columns=["f2", "f1"])
    a.attrs["method_name"] = "m_a"
    b = pd.DataFrame([[5.0, 0.0]], index=["c1"], columns=["f1", "f2"])
    b.attrs["method_name"] = "m_b"
    dfs, names, vmin, vmax = align_weight_frames([a, b])
    assert names == ["m_a", "m_b"]
    assert list(dfs[0].columns) == ["f1", "f2"]  # sorted
    assert (vmin, vmax) == (-2.0, 5.0)


def test_figures_gated_on_matplotlib():
    from modlyn_spark.plots import plot_losses

    if _has_mpl():
        fig = plot_losses([1.0, 0.5, 0.3], [{"epoch": 0, "val_macro_f1": 0.5,
                                             "val_accuracy": 0.6}])
        assert fig is not None
    else:
        with pytest.raises(ImportError, match="matplotlib"):
            plot_losses([1.0, 0.5])
