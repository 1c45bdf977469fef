"""Distributed PCA over embedding columns (covariance-partials + driver eigh).

The curation primitive that precedes ANN / clustering / semantic dedup at
corpus scale: decorrelate or reduce ``array<float>`` embeddings when dim
is modest (d <= ~2000) and n is astronomically large — exactly the regime
where the (d x d) covariance fits on the driver but the data never could.

Physical shape (the same partial-aggregation pattern as scoring/stats.py
and clustering.py):

- one ``mapInPandas`` pass computes per-partition (n, col-sum, X^T X)
  with a single (batch x d)^T @ (batch x d) GEMM per Arrow batch — rows
  NEVER shuffle; d*(d+1) doubles per partition come back;
- partials tree-combine executor-side in ascending-pid order (float64;
  operators/combine.py), so the fitted basis is deterministic at ANY
  parallelism — the same N-vs-4N invariant the logreg trainer and
  k-means keep — and the driver collects ~levels[-1] rows (≈ sqrt-P
  behavior), never one partial per partition: at d=1024 a partial is
  ~8 MB, so a raw collect from a 100 TB scan would ship terabytes;
- eigendecomposition of the (d x d) covariance runs on the driver
  (np.linalg.eigh — symmetric, stable), eigenvectors sign-fixed so each
  component's largest-|loading| entry is positive (basis is unique, not
  just unique-up-to-sign);
- ``pca_transform`` projects with one (batch x d) @ (d x k) GEMM per
  Arrow batch.

Reference context: modlyn selects features on dense matrices in memory;
at engine scale the moment-based two-pass (moments, then project) is the
standard distributed PCA (e.g. Spark MLlib's RowMatrix PCA uses the same
Gramian-on-driver layout) re-expressed over DataFrames + Arrow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from modlyn_spark.operators.combine import collect_partials

_PARTIAL_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),      # column sums (d,)
        StructField("xtx", ArrayType(DoubleType())),    # flattened (d, d)
    ]
)


@dataclass
class PCAModel:
    mean: np.ndarray                 # (d,)
    components: np.ndarray           # (k, d) rows = principal axes
    explained_variance: np.ndarray   # (k,) eigenvalues, descending
    explained_variance_ratio: np.ndarray  # (k,)
    n_rows: int


def feature_moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass over an ``array`` column: returns
    ``(n, column_sums (d,), X^T X (d, d))`` — the sufficient statistics for
    PCA, covariance, correlation, and z-scoring. NULL vectors are excluded
    (a None inside np.stack would otherwise die deep in the executor with
    no row context). Partials are tree-combined executor-side
    (operators/combine.py); deterministic under any partitioning."""
    from modlyn_spark.operators.similarity import _vec_dim

    df = df.where(F.col(vec_col).isNotNull())
    dim = _vec_dim(df, vec_col)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        xtx = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(X)
            s += X.sum(axis=0)
            xtx += X.T @ X
        if n:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [s.tolist()],
                 "xtx": [xtx.ravel().tolist()]}
            )

    # executor-side tree combine: the driver collects at most 64 rows no
    # matter how many partitions the scan produced (a raw collect of
    # d=1024 partials from a 100 TB / 128 MB-split scan would be ~TBs);
    # bit-identical to a plain sorted collect when P <= 64 — see
    # operators/combine.py for the determinism contract
    parts = collect_partials(
        df.select(vec_col).mapInPandas(partials, schema=_PARTIAL_SCHEMA)
    )
    n = 0
    s = np.zeros(dim, dtype=np.float64)
    xtx = np.zeros((dim, dim), dtype=np.float64)
    for r in parts:
        n += int(r["n"])
        s += np.asarray(r["s"], dtype=np.float64)
        xtx += np.asarray(r["xtx"], dtype=np.float64).reshape(dim, dim)
    return n, s, xtx


def pca_fit(df: DataFrame, vec_col: str, n_components: int) -> PCAModel:
    """Fit PCA on an ``array``-typed column via :func:`feature_moments`.
    One data pass; deterministic under any partitioning. Requires at
    least 2 rows."""
    from modlyn_spark.operators.similarity import _vec_dim

    dim = _vec_dim(df.where(F.col(vec_col).isNotNull()), vec_col)
    if not 1 <= n_components <= dim:
        raise ValueError(f"n_components must be in [1, {dim}]")
    n, s, xtx = feature_moments(df, vec_col)
    if n < 2:
        raise ValueError(f"PCA needs at least 2 rows (got {n})")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    evals = np.maximum(evals[order], 0.0)
    # sign fix: largest-|loading| entry of each component is positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.maximum(np.trace(cov), 1e-300))
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=evals,
        explained_variance_ratio=evals / total_var,
        n_rows=n,
    )


def pca_transform(
    df: DataFrame, vec_col: str, model: PCAModel, *, out_col: str = "pca"
) -> DataFrame:
    """Project vectors onto the fitted basis — one (batch x d) @ (d x k)
    GEMM per Arrow batch, appended as ``out_col: array<double>``."""
    mean, W = model.mean, model.components
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf[vec_col].to_numpy()
            valid = np.array([v is not None for v in vals])
            out = pdf.copy()
            if valid.all():
                X = np.stack(vals).astype(np.float64)
                out[out_col] = list((X - mean) @ W.T)
            else:
                # NULL vector -> NULL projection (row preserved)
                proj = np.empty(len(vals), dtype=object)
                if valid.any():
                    X = np.stack(vals[valid]).astype(np.float64)
                    proj[valid] = list((X - mean) @ W.T)
                out[out_col] = proj
            yield out

    return df.mapInPandas(run, schema=schema)
