"""Distributed mini-batch logistic regression — the reference scoring loop.

Reproduces modlyn's SimpleLogReg inner loop (reference:
modlyn/models/_simple_logreg_model.py:70-83 training_step,
:105-108 Adam(lr, weight_decay)) as a partition-parallel tree aggregation:

- the training table is cached with a deterministic batch assignment;
- each step broadcasts the current (W, b) to executors, computes per-partition
  gradient partials vectorized over Arrow batches (numpy GEMM — the M1
  forward pass), and tree-combines them (executor partials -> driver final,
  summed in a deterministic sorted order in float64);
- the Adam update (torch parity: L2 weight decay folded into the gradient,
  bias-corrected moments) runs on the driver — the model (k x d) is tiny next
  to the data, the classic parameter-server-on-driver layout.

Determinism: batch composition is a pure function of the row key
(md5-derived, replicable in pandas/DuckDB), partials are float64 and summed
sorted by partition id, so two runs at different parallelism produce
numpy.allclose-identical weights (the N-vs-4N-cluster invariant).

Scale notes: per step the job reads only the current batch (the batch filter
prunes cached in-memory partition stats; optionally pre-cluster by batch_id).
Weights move driver<->executor once per step: O(k*d) bytes, independent of
data size.
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

from modlyn_spark.oracle.pandas_oracle import AdamState, softmax_xent_grad


def assign_batches(
    df: DataFrame, key_cols: list[str], n_batches: int, col: str = "batch_id"
) -> DataFrame:
    """Deterministic batch assignment: md5 of the concatenated key, first 8
    hex chars as an int, mod n_batches. Pure column expression (JVM-side),
    and exactly replicable in pandas (hashlib) and DuckDB (md5) — the oracle
    recomputes it bit-for-bit."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return df.withColumn(col, (bucket % n_batches).cast("int"))


def assign_batches_pandas(
    pdf: pd.DataFrame, key_cols: list[str], n_batches: int
) -> np.ndarray:
    """Pandas twin of assign_batches (oracle parity)."""
    import hashlib

    keys = pdf[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        keys = keys + "|" + pdf[c].astype(str)
    return np.array(
        [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % n_batches for k in keys],
        dtype=np.int64,
    )


_PARTIAL_SCHEMA = StructType(
    [
        StructField("pid", LongType()),
        StructField("gw", ArrayType(DoubleType())),  # flattened (k, d)
        StructField("gb", ArrayType(DoubleType())),
        StructField("loss_sum", DoubleType()),
        StructField("n", LongType()),
    ]
)


class DistributedLogReg:
    """Mini-batch softmax regression over a Spark DataFrame.

    Args mirror the reference defaults (modlyn/models/_simple_logreg_model.py:
    35-38 lr=1e-2 wd=1e-2; :120-123 max_epochs=4 max_steps=3000).
    """

    def __init__(
        self,
        n_features: int,
        classes: list,
        learning_rate: float = 1e-2,
        weight_decay: float = 1e-2,
    ):
        self.d = n_features
        self.classes = list(classes)
        self.k = len(self.classes)
        self.W = np.zeros((self.k, self.d))
        self.b = np.zeros(self.k)
        self._optW = AdamState(self.W.shape, learning_rate, weight_decay)
        self._optb = AdamState(self.b.shape, learning_rate, weight_decay)
        self.losses: list[float] = []

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
        tree_depth: int | None = None,
        cluster_by_batch: bool | None = None,
        epoch_callback=None,
    ) -> "DistributedLogReg":
        """Train over a cached (features, label_idx, batch_id) DataFrame.

        One Spark aggregation per step: gradient partials per partition,
        summed on the driver in sorted-partition order (deterministic),
        then a torch-parity Adam update.

        ``tree_depth``: if set, partials are combined executor-side with
        ``RDD.treeAggregate``-style intermediate combiners before reaching
        the driver — at 1000-executor scale the driver then receives one
        (k x d) gradient instead of one per partition. Tree combination
        reorders float additions, so use the default (sorted driver
        combine) when bit-stable parity across parallelism levels matters;
        both paths are numpy.allclose to the oracle.

        ``cluster_by_batch``: repartition the cached training set by
        batch_id before training, so each step's batch filter prunes whole
        cached partitions (the in-memory columnar cache keeps per-batch
        min/max stats) instead of scanning every partition per step — the
        right layout when n_batches x steps is large relative to cluster
        cores. Adds one up-front shuffle; results are identical. Default
        (None) = auto: cluster when n_batches >= 32, where per-step
        full-cache scans start to dominate.

        ``epoch_callback``: optional ``f(epoch_idx)`` invoked after each
        completed epoch with the model already updated — the hook the
        reference's validation_step/on_validation_epoch_end uses
        (modlyn/models/_simple_logreg_model.py:88-103).

        Defaults (max_steps=3000, max_epochs=4) mirror the reference fit()
        (_simple_logreg_model.py:120-123) so direct engine callers train to
        the same budget as the facade.
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
        k, d = self.k, self.d

        def grad_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            gW = np.zeros((k, d))
            gb = np.zeros(k)
            loss_sum = 0.0
            n = 0
            W, b = grad_partials.W, grad_partials.b
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[fc].to_numpy()).astype(np.float64)
                y = pdf[lc].to_numpy(dtype=np.int64)
                # unnormalized partials: sum-of-gradients, converted to the
                # batch-mean gradient on the driver
                logits = X @ W.T + b
                logits -= logits.max(axis=1, keepdims=True)
                e = np.exp(logits)
                p = e / e.sum(axis=1, keepdims=True)
                loss_sum += -np.log(
                    np.clip(p[np.arange(len(X)), y], 1e-30, None)
                ).sum()
                p[np.arange(len(X)), y] -= 1.0
                gW += p.T @ X
                gb += p.sum(axis=0)
                n += len(X)
            if n:
                yield pd.DataFrame(
                    {
                        "pid": [pid],
                        "gw": [gW.ravel().tolist()],
                        "gb": [gb.tolist()],
                        "loss_sum": [loss_sum],
                        "n": [n],
                    }
                )

        step = 0
        for epoch in range(max_epochs):
            if step >= max_steps:
                break
            for bid in range(n_batches):
                if step >= max_steps:
                    break
                batch = data.where(F.col(batch_col) == bid)
                grad_partials.W = self.W
                grad_partials.b = self.b
                partial_df = batch.mapInPandas(grad_partials, schema=_PARTIAL_SCHEMA)
                if tree_depth is not None:
                    parts = self._tree_combine(partial_df, tree_depth)
                else:
                    parts = partial_df.collect()
                if not parts:
                    continue
                parts.sort(key=lambda r: r["pid"])  # deterministic combine order
                n = sum(r["n"] for r in parts)
                gW = np.zeros((k, d))
                gb = np.zeros(k)
                loss = 0.0
                for r in parts:
                    gW += np.asarray(r["gw"]).reshape(k, d)
                    gb += np.asarray(r["gb"])
                    loss += r["loss_sum"]
                gW /= n
                gb /= n
                loss /= n
                self.W = self._optW.step(self.W, gW)
                self.b = self._optb.step(self.b, gb)
                self.losses.append(loss)
                step += 1
            if epoch_callback is not None:
                epoch_callback(epoch)
        data.unpersist()
        return self

    @staticmethod
    def _tree_combine(partial_df: DataFrame, depth: int) -> list:
        """Executor-side tree combination of gradient partials.

        Level l groups partials by pid % (n_groups) and sums them with a
        vectorized applyInPandas combiner, halving the row count towards the
        driver ``depth`` times — the DataFrame rendering of
        ``RDD.treeAggregate`` (reference inner loop G1, SURVEY.md §2.2):
        the driver finally collects ~sqrt(P) rows instead of P.
        """
        import pandas as pd  # noqa: F811 (executor-side)

        def combine(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            gw = np.sum(np.stack(pdf["gw"].to_numpy()), axis=0)
            gb = np.sum(np.stack(pdf["gb"].to_numpy()), axis=0)
            return pd.DataFrame(
                {
                    "pid": [int(key[0])],
                    "gw": [gw.tolist()],
                    "gb": [gb.tolist()],
                    "loss_sum": [float(pdf["loss_sum"].sum())],
                    "n": [int(pdf["n"].sum())],
                }
            )

        out = partial_df
        for level in range(depth):
            fanout = 4 ** (depth - level - 1)
            if fanout < 1:
                break
            out = (
                out.withColumn("__grp", F.pmod(F.col("pid"), F.lit(max(fanout, 1))))
                .withColumn("pid", F.col("__grp"))
                .drop("__grp")
                .groupBy("pid")
                .applyInPandas(combine, schema=_PARTIAL_SCHEMA)
            )
        return out.collect()

    @classmethod
    def from_weights_long(cls, weights: pd.DataFrame) -> "DistributedLogReg":
        """Rebuild a model from the long-form (label, pos, weight) score
        matrix (the ``weights_long`` sink format). Bias is zero — the
        score-matrix export carries W only, like the reference's
        feature-score sink (modlyn/models/_simple_logreg_model.py:170-192).
        Class axis = sorted labels, matching ``label_encode``. Labels are
        normalized to STRINGS once, before both the class list and the
        pivot index — a numeric label column would otherwise keep its
        dtype in the pivot index and KeyError on the str-coerced class
        lookup; labels therefore order as strings ("10" < "2"), exactly
        like the engine's label_encode."""
        weights = weights.assign(label=weights["label"].astype(str))
        classes = sorted(weights["label"].unique())
        d = int(weights["pos"].max()) + 1
        m = cls(d, classes)
        piv = weights.pivot(index="label", columns="pos", values="weight")
        m.W = piv.loc[classes, list(range(d))].to_numpy(dtype=np.float64)
        return m

    # -- outputs -------------------------------------------------------------

    def get_weights(self, feature_names: list[str] | None = None) -> pd.DataFrame:
        """Score matrix: classes x features, attrs-tagged like the reference
        (modlyn/models/_simple_logreg_model.py:170-192)."""
        cols = feature_names or [f"f{j:04d}" for j in range(self.d)]
        df = pd.DataFrame(self.W, columns=cols, index=self.classes)
        df.attrs["method_name"] = "modlyn_logreg"
        return df

    def weights_long(self, spark) -> DataFrame:
        """Long-form (label, pos, weight) DataFrame for relational consumers."""
        rows = pd.DataFrame(
            {
                "label": np.repeat([str(c) for c in self.classes], self.d),
                "pos": np.tile(np.arange(self.d, dtype=np.int64), self.k),
                "weight": self.W.ravel(),
            }
        )
        return spark.createDataFrame(rows)

    def predict_df(
        self, df: DataFrame, features_col: str = "features", out_col: str = "pred_idx"
    ) -> DataFrame:
        """argmax-class prediction (reference M3) as a vectorized map."""
        W, b = self.W, self.b
        fc = features_col
        schema = StructType(
            df.schema.fields + [StructField(out_col, LongType(), False)]
        )

        def pred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[fc].to_numpy()).astype(np.float64)
                pdf = pdf.copy()
                pdf[out_col] = np.argmax(X @ W.T + b, axis=1)
                yield pdf

        return df.mapInPandas(pred, schema=schema)
