"""Regularization-path sweep for the reference scoring loop.

modlyn's feature-selection recipe trains ONE logistic regression at one
weight_decay and reads feature scores off the weight matrix
(reference: modlyn/models/_simple_logreg_model.py:35-38 — lr/wd are fixed
ctor args, so sweeping the regularizer means re-running fit() once per
value and re-reading the full dataset each time). At 10^12-row scale the
data pass dominates, so the sweep must amortize it: this module trains L
weight-decay values SIMULTANEOUSLY over the same mini-batch stream.

Physical design (one Spark aggregation per step, like DistributedLogReg):

- the L models' weights stack into one (L*k, d) matrix; each partition
  computes logits for ALL models with ONE GEMM ``X @ W_all.T`` per Arrow
  batch, and all L gradient blocks with ONE GEMM ``P_all.T @ X`` — the
  marginal cost of an extra lambda is FLOPs on data already in cache,
  not another scan of the table;
- per-partition partials (L*k*d gradient, L*k bias gradient, L losses)
  tree-combine exactly like the single-model trainer;
- the driver keeps L independent Adam states (weight decay folds into
  the update there, torch parity), so lambda l's trajectory is
  numerically the SAME sequence of updates a standalone
  ``DistributedLogReg(weight_decay=lambda_l)`` would produce — the sweep
  is a fusion, not an approximation. Tests pin allclose equality per
  lambda against both the standalone trainer and the independent numpy
  twin.

Scale notes: driver<->executor traffic per step is O(L*k*d) — the model
stack, independent of data size; with the reference's 5k x 50 score
matrix and L=8 that is ~16 MB per step, well under broadcast budgets.
The data passes once per epoch regardless of L; a naive per-lambda loop
costs L full passes. Selection-path summaries (features surviving at
each lambda) are pure column expressions over the long-form output.
"""

from __future__ import annotations

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

from modlyn_spark.oracle.pandas_oracle import AdamState

_PATH_PARTIAL_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("gw", ArrayType(DoubleType())),  # flattened (L*k, d)
        StructField("gb", ArrayType(DoubleType())),  # flattened (L, k)
        StructField("loss_sum", ArrayType(DoubleType())),  # per lambda
        StructField("n", LongType()),
    ]
)


class RegPathLogReg:
    """Mini-batch softmax regression at L weight-decay values in one pass.

    Same defaults as the reference optimizer (lr=1e-2,
    modlyn/models/_simple_logreg_model.py:105-108); ``lambdas`` sweeps the
    weight_decay axis the reference hard-codes at 1e-2.
    """

    def __init__(
        self,
        n_features: int,
        classes: list,
        lambdas: list[float],
        learning_rate: float = 1e-2,
    ):
        if not lambdas:
            raise ValueError("lambdas must be non-empty")
        self.d = n_features
        self.classes = list(classes)
        self.k = len(self.classes)
        self.lambdas = [float(x) for x in lambdas]
        self.L = len(self.lambdas)
        self.W = np.zeros((self.L, self.k, self.d))
        self.b = np.zeros((self.L, self.k))
        self._optW = [
            AdamState((self.k, self.d), learning_rate, lam) for lam in self.lambdas
        ]
        self._optb = [
            AdamState((self.k,), learning_rate, lam) for lam in self.lambdas
        ]
        # losses[l] = per-step mean batch loss for lambda l
        self.losses: list[list[float]] = [[] for _ in range(self.L)]

    def fit(
        self,
        df: DataFrame,
        *,
        features_col: str = "features",
        label_idx_col: str = "label_idx",
        batch_col: str = "batch_id",
        n_batches: int | None = None,
        max_steps: int = 3000,
        max_epochs: int = 4,
        cluster_by_batch: bool | None = None,
    ) -> "RegPathLogReg":
        """Train all L models over a cached (features, label_idx, batch_id)
        DataFrame: one mapInPandas aggregation per step computes every
        model's gradient partials from a single traversal of the batch.

        Batch order, caching, and the deterministic sorted-pid driver
        combine mirror DistributedLogReg.fit exactly, so per-lambda
        results are allclose to L standalone fits at the same config.
        """
        data = df.select(features_col, label_idx_col, batch_col)
        if n_batches is None:
            n_batches = data.agg(F.max(batch_col)).collect()[0][0] + 1
        if cluster_by_batch is None:
            cluster_by_batch = n_batches >= 32
        if cluster_by_batch:
            data = data.repartition(n_batches, batch_col)
        data = data.cache()

        fc, lc = features_col, label_idx_col
        k, d, L = self.k, self.d, self.L

        def grad_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            gW = np.zeros((L * k, d))
            gb = np.zeros((L, k))
            loss_sum = np.zeros(L)
            n = 0
            # (L*k, d) weight stack broadcast via closure, like the
            # single-model trainer
            Wf, bf = grad_partials.Wf, grad_partials.bf
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[fc].to_numpy()).astype(np.float64)
                y = pdf[lc].to_numpy(dtype=np.int64)
                m = len(X)
                # ONE GEMM for all L models: (m, L*k)
                logits = (X @ Wf.T + bf).reshape(m, L, k)
                logits -= logits.max(axis=2, keepdims=True)
                e = np.exp(logits)
                p = e / e.sum(axis=2, keepdims=True)  # (m, L, k)
                rows = np.arange(m)
                # advanced indices split by a slice -> (m, L): the true-class
                # probability per row per lambda
                loss_sum += -np.log(
                    np.clip(p[rows, :, y], 1e-30, None)
                ).sum(axis=0)
                p[rows, :, y] -= 1.0
                # ONE GEMM for all L gradient blocks: (L*k, d)
                gW += p.reshape(m, L * k).T @ X
                gb += p.sum(axis=0)
                n += m
            if n:
                yield pd.DataFrame(
                    {
                        "pid": [pid],
                        "gw": [gW.ravel().tolist()],
                        "gb": [gb.ravel().tolist()],
                        "loss_sum": [loss_sum.tolist()],
                        "n": [n],
                    }
                )

        step = 0
        for _epoch in range(max_epochs):
            if step >= max_steps:
                break
            for bid in range(n_batches):
                if step >= max_steps:
                    break
                batch = data.where(F.col(batch_col) == bid)
                grad_partials.Wf = self.W.reshape(L * k, d)
                grad_partials.bf = self.b.reshape(L * k)
                parts = batch.mapInPandas(
                    grad_partials, schema=_PATH_PARTIAL_SCHEMA
                ).collect()
                if not parts:
                    continue
                parts.sort(key=lambda r: r["pid"])  # deterministic combine
                n = sum(r["n"] for r in parts)
                gW = np.zeros((L * k, d))
                gb = np.zeros((L, k))
                loss = np.zeros(L)
                for r in parts:
                    gW += np.asarray(r["gw"]).reshape(L * k, d)
                    gb += np.asarray(r["gb"]).reshape(L, k)
                    loss += np.asarray(r["loss_sum"])
                gW /= n
                gb /= n
                loss /= n
                gW3 = gW.reshape(L, k, d)
                for li in range(L):
                    self.W[li] = self._optW[li].step(self.W[li], gW3[li])
                    self.b[li] = self._optb[li].step(self.b[li], gb[li])
                    self.losses[li].append(float(loss[li]))
                step += 1
        data.unpersist()
        return self

    # -- outputs -------------------------------------------------------------

    def weights_long(self, spark) -> DataFrame:
        """Long-form (lam, label, pos, weight) across the whole path."""
        rows = pd.DataFrame(
            {
                "lam": np.repeat(self.lambdas, self.k * self.d),
                "label": np.tile(
                    np.repeat([str(c) for c in self.classes], self.d), self.L
                ),
                "pos": np.tile(np.arange(self.d, dtype=np.int64), self.L * self.k),
                "weight": self.W.ravel(),
            }
        )
        return spark.createDataFrame(rows)

    def selection_path(self, spark, threshold: float) -> DataFrame:
        """Per (lam, pos): max |weight| over classes + survives flag —
        the feature-entry/exit table a selection consumer reads off the
        path. Pure aggregation over weights_long (SQL-expressible)."""
        w = self.weights_long(spark)
        return (
            w.groupBy("lam", "pos")
            .agg(F.max(F.abs(F.col("weight"))).alias("max_abs_w"))
            .withColumn(
                "selected", (F.col("max_abs_w") >= F.lit(float(threshold)))
            )
        )
