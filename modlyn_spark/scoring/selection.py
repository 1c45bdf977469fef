"""Unsupervised feature-selection companions to the class-wise scorers.

modlyn ranks features by supervised signal (per-class stats, F-statistic,
logreg weights — reference modlyn/models/_simple_logreg_model.py and this
repo's ``scoring.stats``). A production selector also needs the
UNSUPERVISED half: kill near-constant features and collapse correlated
clusters to one representative before training. This module provides it
over the same ``array``-typed feature column:

- :func:`feature_variances` — global mean / population variance per
  feature position;
- :func:`correlation_matrix` — the full Pearson matrix in long form
  (f1 < f2);
- :func:`redundancy_prune` — greedy drop of any feature whose |corr| to
  an already-kept (higher-scored) feature exceeds a threshold: the
  standard correlation filter that pairs with F-stat/logreg rankings.

Scale design: everything derives from ONE distributed pass — the
``(n, Σx, XᵀX)`` sufficient statistics of ``operators.pca.feature_moments``
(per-Arrow-batch GEMM partials, executor-side tree combine; rows never
shuffle, the driver sees ≤64 combined rows). The d×d solve itself is
driver-side numpy: feature selection operates on d ≲ a few thousand
features, so the matrix is ≤ tens of MB while the row count is unbounded.
A zero-variance feature yields NULL correlations (matching SQL ``corr``)
and is never kept by the pruner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from modlyn_spark.operators.pca import feature_moments


def _stats(df: DataFrame, vec_col: str):
    n, s, xtx = feature_moments(df, vec_col)
    if n < 2:
        raise ValueError(f"need at least 2 rows (got {n})")
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)  # population
    var = np.maximum(np.diag(cov).copy(), 0.0)
    return n, mean, cov, var


def feature_variances(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-position global mean and population variance, long form
    ``(pos, n, mean, var_pop)``."""
    spark = SparkSession.getActiveSession()
    n, mean, _, var = _stats(df, vec_col)
    pdf = pd.DataFrame(
        {
            "pos": np.arange(len(mean), dtype=np.int64),
            "n": np.int64(n),
            "mean": mean,
            "var_pop": var,
        }
    )
    return spark.createDataFrame(pdf)


def correlation_matrix(df: DataFrame, vec_col: str) -> DataFrame:
    """Pearson correlation of every feature pair, long form
    ``(f1, f2, corr)`` with ``f1 < f2``. NULL where either feature is
    constant (SQL ``corr`` semantics). The sample/population distinction
    cancels in the ratio, so this matches both ``numpy.corrcoef`` and
    SQL ``corr`` exactly."""
    spark = SparkSession.getActiveSession()
    _, _, cov, var = _stats(df, vec_col)
    d = len(var)
    sd = np.sqrt(var)
    iu, ju = np.triu_indices(d, k=1)
    denom = sd[iu] * sd[ju]
    with np.errstate(invalid="ignore", divide="ignore"):
        c = np.where(denom > 0, cov[iu, ju] / denom, np.nan)
    pdf = pd.DataFrame(
        {
            "f1": iu.astype(np.int64),
            "f2": ju.astype(np.int64),
            # Float64 so NaN -> NULL at the Arrow boundary (a float64 NaN
            # would survive as NaN and sort above every double)
            "corr": pd.array(c, dtype="Float64"),
        }
    )
    return spark.createDataFrame(pdf)


def redundancy_prune(
    corr: DataFrame,
    scores: DataFrame,
    *,
    threshold: float = 0.95,
    score_col: str = "score",
    pos_col: str = "pos",
) -> list[int]:
    """Greedy correlation filter: walk features by descending score
    (ties: lower position first), keep a feature unless its |corr| with an
    already-kept feature exceeds ``threshold``. Returns kept positions in
    score order — feed the kept set to the trainer.

    ``corr`` is the long-form output of :func:`correlation_matrix` (d²/2
    rows — driver-sized for selection-scale d); ``scores`` is any
    per-feature ranking, e.g. ``scoring.stats.f_statistic`` output.
    NULL correlations (constant features) never block a keep, but a
    constant feature also carries no signal — give it -inf score upstream
    or drop it with :func:`feature_variances` first.
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    cp = corr.toPandas()
    sp = scores.select(pos_col, score_col).toPandas()
    cmap: dict[tuple[int, int], float] = {}
    for f1, f2, c in cp.itertuples(index=False):
        if pd.notna(c):
            cmap[(int(f1), int(f2))] = abs(float(c))
    order = sorted(
        sp.itertuples(index=False),
        key=lambda r: (-float(getattr(r, score_col)), int(getattr(r, pos_col))),
    )
    kept: list[int] = []
    for r in order:
        p = int(getattr(r, pos_col))
        blocked = any(
            cmap.get((min(p, k), max(p, k)), 0.0) > threshold for k in kept
        )
        if not blocked:
            kept.append(p)
    return kept
