"""SemDeDup — semantic (embedding-space) deduplication by cluster-then-prune.

The scale trick from Abbas et al. 2023 ("SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): an exact
all-pairs cosine sweep over N embeddings is O(N^2); clustering first
(k large, e.g. ~100k at web scale) confines the pairwise work to
within-cluster blocks of expected size N/k, making the total
O(N^2 / k) — and the within-cluster GEMMs are embarrassingly parallel.

Assignment is SPHERICAL: a row goes to the centroid with the highest
cosine similarity (ties to the lowest centroid index). That is the
natural metric for cosine-space dedup (the paper clusters normalized
embeddings), and it is exactly scale-invariant — scaling a vector by a
power of two changes neither its normalized direction nor any cosine
(IEEE scaling by 2^-k commutes with rounding), which is what makes the
operator oracle-able with planted half-scale duplicates. Centroids come
from the existing distributed trainer (clustering.kmeans_fit) or any
upstream index; they are a k x dim driver-side array, tiny at any corpus
scale, broadcast inside the UDF closure.

Plan shape: ONE Arrow-batched assignment map (rows never shuffle for
assignment; one (batch x dim) @ (dim x k) GEMM per Arrow batch), then ONE
shuffle on ``cluster`` into ``applyInPandas`` groups where the pairwise
cosine block runs as a row-blocked GEMM (memory bounded by
``block`` x cluster-size, not cluster-size^2).

Keep rules:
- ``keep="min_id"`` (default): a row is dropped iff some SMALLER-id row in
  its cluster has cosine >= threshold. Deterministic, independent of
  partitioning, and exactly expressible in SQL — the oracle-able rule,
  same family as plans/curation.curate_corpus(near_dup_mode="pairs").
- ``keep="far_from_centroid"``: the paper's rule (§3: within each group of
  mutual duplicates keep the point with the LOWEST cosine similarity to
  its cluster centroid, i.e. the hardest example), realized greedily:
  rows are visited by ascending centroid similarity (ties by id) and a
  row is dropped iff it is >= threshold similar to an already-kept row.
  Pytest-gated; the min_id rule is the driver-gated twin.

Skew: a pathological cluster (one dense topic) serializes one group task.
``shard_fan > 1`` sub-splits every cluster by a deterministic id hash,
bounding task memory/time at the cost of missing cross-shard pairs inside
each cluster (a documented recall trade, same spirit as LSH banding; the
paper's primary knob is choosing k large enough that clusters stay small,
and that remains the recommended fix).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def spherical_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    out_col: str = "cluster",
    sim_col: str = "centroid_sim",
) -> DataFrame:
    """(id, vec, cluster, centroid_sim) — nearest centroid by cosine.

    One GEMM per Arrow batch against the broadcast normalized centroid
    matrix; no shuffle. Ties go to the lowest centroid index (argmax
    picks the first maximum — mirrored by the oracle's
    ``ORDER BY sim DESC, cid``)."""
    C = np.asarray(centroids, dtype=np.float64)
    c_norm = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(vec_col, ArrayType(DoubleType())),
            StructField(out_col, IntegerType()),
            StructField(sim_col, DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ c_norm.T
            a = S.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: list(X),
                    out_col: a.astype(np.int32),
                    sim_col: S[np.arange(len(X)), a],
                }
            )

    from modlyn_spark.session import ensure_parallelism

    # the assignment GEMM is the CPU-bound stage; single-row-group
    # sources would serialize it onto one core (recorded sf1 trap)
    src = ensure_parallelism(df.select(id_col, vec_col))
    return src.mapInPandas(run, schema=schema)


def semdedup_prune(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray | None = None,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    keep: str = "min_id",
    block: int = 2048,
    shard_fan: int = 1,
    target_cluster_size: int = 4096,
    kmeans_iter: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Returns (id, cluster, centroid_sim, kept) — one row per input row.

    ``kept`` is False for rows pruned as semantic duplicates under the
    chosen keep rule. Downstream: ``.where("kept")`` joins back to the
    corpus as a semi-join on ``id_col``.

    ``centroids=None`` auto-sizes the clustering to the CORPUS:
    ``k = max(8, n // target_cluster_size)`` and one kmeans_fit pass. The
    within-cluster pairwise work is O(n^2 / k) = O(n * target_cluster_size)
    — linear in n at a fixed target size — so a caller who doesn't pick k
    inherits the paper's regime (k ~ 100k at web scale ≈ n/target for
    n ~ 10^8-10^9) instead of whatever tiny k a benchmark happened to use.
    Passing explicit ``centroids`` (a precomputed index) skips both jobs.
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"unknown keep rule: {keep!r}")
    if centroids is None:
        from modlyn_spark.operators.clustering import kmeans_fit

        n = df.count()
        if n == 0:
            raise ValueError("semdedup_prune: empty input")
        k = max(8, int(n) // int(target_cluster_size))
        centroids, _ = kmeans_fit(
            df.select(id_col, vec_col),
            vec_col,
            k,
            max_iter=kmeans_iter,
            seed=seed,
            id_col=id_col,
        )

    assigned = spherical_assign(df, vec_col, centroids, id_col=id_col)
    group_cols = ["cluster"]
    if shard_fan > 1:
        assigned = assigned.withColumn(
            "_shard",
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(int(shard_fan))
            ).cast("int"),
        )
        group_cols = ["cluster", "_shard"]

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster", IntegerType()),
            StructField("centroid_sim", DoubleType()),
            StructField("kept", BooleanType()),
        ]
    )
    thr = float(threshold)
    rule = keep

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        cl = np.asarray(pdf["cluster"], dtype=np.int32)
        csim = pdf["centroid_sim"].to_numpy()
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        if rule == "min_id":
            # drop i iff exists j with ids[j] < ids[i] and cos >= thr
            order = np.argsort(ids, kind="stable")
        else:
            # hardest-first greedy: ascending centroid_sim, ties by id
            order = np.lexsort((ids, csim))
        Xo = Xn[order]
        dropped_o = np.zeros(len(order), dtype=bool)
        if rule == "min_id":
            for s in range(0, len(order), block):
                e = min(s + block, len(order))
                S = Xo[s:e] @ Xo[:e].T
                strict_lower = np.arange(e)[None, :] < np.arange(s, e)[:, None]
                dropped_o[s:e] = ((S >= thr) & strict_lower).any(axis=1)
        else:
            kept_rows: list[int] = []
            for r in range(len(order)):
                if kept_rows:
                    if (Xo[kept_rows] @ Xo[r] >= thr).any():
                        dropped_o[r] = True
                        continue
                kept_rows.append(r)
        dropped = np.zeros(len(ids), dtype=bool)
        dropped[order] = dropped_o
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": cl,
                "centroid_sim": csim,
                "kept": ~dropped,
            }
        )

    return assigned.groupBy(*group_cols).applyInPandas(prune, schema=schema)
