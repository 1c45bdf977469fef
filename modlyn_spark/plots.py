"""Reference-parity plotting surface (import-gated on matplotlib).

The reference exposes four plots (modlyn/models/_simple_logreg_model.py:194
plot_losses, :225 plot_classification_report; modlyn/eval/_jaccard.py:84
plot_jaccard_comparison, :145 plot_heatmaps). The engine declares plotting
out of the distributed scope (SURVEY.md §2.3) but keeps the API: each
function here consumes the engine's own artifacts (loss list, report dict,
long-form jaccard results, weight matrices) and returns a matplotlib
Figure — no plt.show() side effects, cluster-friendly.

matplotlib is not installed in this container, so figure construction is
import-gated with a clear error; the data-shaping halves
(prepare_* helpers) are pure pandas/numpy and unit-tested unconditionally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless: never require a display
        import matplotlib.pyplot as plt

        return plt
    except ImportError as ex:  # pragma: no cover - container has no mpl
        raise ImportError(
            "plotting needs matplotlib (`pip install matplotlib`); the "
            "engine's compute surface is fully usable without it"
        ) from ex


# -- data shaping (pure, always available) -------------------------------------


def prepare_jaccard_bars(results_df: pd.DataFrame) -> pd.DataFrame:
    """Mean jaccard per (n_top, method pair), wide — the grouped-bar input
    (reference _jaccard.py:91-99). Accepts either the engine's long form
    (method1/method2 columns) or the reference's method_pair form."""
    df = results_df.copy()
    if "method_pair" not in df.columns:
        df["method_pair"] = df["method1"] + "<->" + df["method2"]
    return df.groupby(["n_top", "method_pair"])["jaccard"].mean().unstack()


def prepare_classification_bars(
    report: dict, classes: list
) -> pd.DataFrame:
    """Per-class precision/recall/F1 plus the 1/k random baseline
    (reference _simple_logreg_model.py:243-255). ``report`` is the flat
    dict from modlyn_spark.scoring.metrics.classification_report (class
    name -> metrics, plus accuracy/macro_f1/weighted_f1 scalars)."""
    rows = []
    for c in classes:
        rec = report.get(str(c), report.get(c, {})) or {}
        rows.append(
            {
                "class": str(c),
                "precision": rec.get("precision", 0.0),
                "recall": rec.get("recall", 0.0),
                "f1": rec.get("f1-score", 0.0),
                "random_baseline": 1.0 / max(len(classes), 1),
            }
        )
    return pd.DataFrame(rows)


def align_weight_frames(
    dataframes: list[pd.DataFrame],
) -> tuple[list[pd.DataFrame], list[str], float, float]:
    """Sort each classes x features frame, collect method names and the
    global color range (reference _jaccard.py:147-156)."""
    sorted_dfs = [df.sort_index().sort_index(axis=1) for df in dataframes]
    names = [df.attrs.get("method_name", f"method_{i}") for i, df in enumerate(dataframes)]
    vmin = float(min(df.min().min() for df in sorted_dfs))
    vmax = float(max(df.max().max() for df in sorted_dfs))
    return sorted_dfs, names, vmin, vmax


# -- figures (matplotlib-gated) -------------------------------------------------


def plot_losses(
    train_losses: list[float],
    val_metrics: list[dict] | None = None,
    figsize: tuple = (15, 6),
):
    """Training loss per step + validation metric per epoch
    (reference _simple_logreg_model.py:194-223)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=figsize)
    if train_losses:
        axes[0].plot(range(len(train_losses)), train_losses, linewidth=1, alpha=0.7)
        axes[0].set_xlabel("Training Steps")
        axes[0].set_ylabel("Training Loss")
        axes[0].set_title("Training Loss Over Steps (Batch Level)")
        axes[0].grid(True, alpha=0.3)
    if val_metrics:
        epochs = [m["epoch"] for m in val_metrics]
        axes[1].plot(epochs, [m["val_macro_f1"] for m in val_metrics], label="macro F1")
        axes[1].plot(epochs, [m["val_accuracy"] for m in val_metrics], label="accuracy")
        axes[1].set_xlabel("Epoch")
        axes[1].set_ylabel("Validation Metric")
        axes[1].set_title("Validation Metrics Per Epoch")
        axes[1].legend()
        axes[1].grid(True, alpha=0.3)
    fig.tight_layout()
    return fig


def plot_classification_report(report: dict, classes: list, figsize: tuple = (12, 6)):
    """Grouped per-class precision/recall/F1 bars with the random baseline
    (reference _simple_logreg_model.py:225-283)."""
    plt = _plt()
    bars = prepare_classification_bars(report, classes)
    x = np.arange(len(bars))
    width = 0.2
    fig, ax = plt.subplots(figsize=figsize)
    for i, metric in enumerate(["precision", "recall", "f1"]):
        ax.bar(x + i * width, bars[metric], width, label=metric, alpha=0.8)
    ax.plot(
        x + width, bars["random_baseline"], "k--", alpha=0.6, label="random baseline"
    )
    ax.set_xticks(x + width)
    ax.set_xticklabels(bars["class"], rotation=45, ha="right")
    ax.set_ylabel("Score")
    ax.set_title(f"Per-class metrics (macro F1 {report['macro_f1']:.3f})")
    ax.legend()
    ax.grid(True, alpha=0.3, axis="y")
    fig.tight_layout()
    return fig


def plot_jaccard_comparison(results_df: pd.DataFrame, figsize: tuple = (12, 6)):
    """Grouped bars of mean jaccard per method pair across n_top values
    (reference _jaccard.py:84-143)."""
    plt = _plt()
    bar_data = prepare_jaccard_bars(results_df)
    n_tops = list(bar_data.index)
    x = np.arange(len(n_tops))
    width = 0.8 / max(len(bar_data.columns), 1)
    fig, ax = plt.subplots(figsize=figsize)
    for i, pair in enumerate(bar_data.columns):
        ax.bar(x + i * width, bar_data[pair].to_numpy(), width, label=str(pair),
               alpha=0.8, edgecolor="black")
    ax.set_xlabel("Number of Top Features (n_top)")
    ax.set_ylabel("Jaccard Index")
    ax.set_title("Jaccard Index vs Top-N Features")
    ax.set_xticks(x + width * (len(bar_data.columns) - 1) / 2)
    ax.set_xticklabels(n_tops)
    ax.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
    ax.grid(True, alpha=0.3, axis="y")
    fig.tight_layout()
    return fig


def plot_heatmaps(dataframes: list[pd.DataFrame], figsize_per: int = 5):
    """Side-by-side score-matrix heatmaps on one shared color scale
    (reference _jaccard.py:145-170; imshow instead of seaborn)."""
    plt = _plt()
    dfs, names, vmin, vmax = align_weight_frames(dataframes)
    fig, axes = plt.subplots(
        1, len(dfs), figsize=(figsize_per * len(dfs), 6), squeeze=False
    )
    for ax, df, name in zip(axes[0], dfs, names):
        im = ax.imshow(df.to_numpy(), cmap="viridis", vmin=vmin, vmax=vmax,
                       aspect="auto")
        ax.set_title(name)
        ax.set_yticks(range(len(df.index)), labels=[str(i) for i in df.index])
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig
