"""Approximate-nearest-neighbor similarity search over embedding columns.

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  set against the corpus, per-query top-k with a window. The corpus is
  scanned once, never shuffled; only (query x corpus) score rows reach the
  top-k shuffle, prunable by a score floor.

- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH. Each vector
  gets a b-bit signature per hash table (sign of dot with b fixed seeded
  hyperplanes); candidates must share a (table, signature) bucket
  (equi-join, AQE-skew-safe), then exact cosine re-ranks within buckets.
  Multi-probe via t independent tables raises recall. Sub-quadratic: cost
  ~ sum of bucket sizes squared instead of |Q| x |C|.

- ``ivf_cosine_topk``: inverted-file index — spherical k-means cells.

All vector math is Arrow-batched numpy (one GEMM per batch) — the prior
JVM higher-order-function formulation allocated per-element and baked
dim x tables (resp. dim x centroids) float literals into the Catalyst
plan; signatures/cell scores now live in a pandas UDF closure instead, so
the plan stays O(1) in dim and the arithmetic is vectorized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from modlyn_spark.session import ensure_parallelism
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


@pandas_udf(DoubleType())
def _cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine of two array<double> columns, vectorized per Arrow
    batch (one einsum instead of per-element JVM lambda evaluation).

    NULL array -> NULL result (like the JVM expression it replaced, and
    unlike np.stack which would crash on None); zero-norm vector -> 0.0
    (0/0 would yield NaN, and Spark orders NaN ABOVE all doubles, so a
    zero-norm corpus row would rank FIRST in every top-k window)."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    av, bv = a.to_numpy(), b.to_numpy()
    valid = np.array(
        [x is not None and y is not None for x, y in zip(av, bv)], dtype=bool
    )
    out = pd.array([None] * len(av), dtype="Float64")
    if valid.any():
        A = np.stack(av[valid]).astype(np.float64)
        B = np.stack(bv[valid]).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        out[valid] = np.where(denom > 0, dots / np.maximum(denom, 1e-300), 0.0)
    return pd.Series(out, dtype="Float64")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "qvec",
    corpus_vec: str = "cvec",
    k: int = 10,
    max_probes: int | None = 100_000,
) -> DataFrame:
    """Exact top-k by cosine for each query. Returns
    (query_id, corpus_id, cosine, rank) with rank 1..k, ties broken by
    ascending corpus id (deterministic).

    The query side BROADCASTS into the corpus scan by contract — that is
    what keeps the plan linear in the corpus. ``max_probes`` enforces the
    contract with one query-sized count (raises with guidance instead of
    letting an oversized broadcast OOM the driver mid-join); pass None to
    opt out when the caller already bounds the probe side."""
    if max_probes is not None:
        n_q = queries.count()
        if n_q > max_probes:
            raise ValueError(
                f"cosine_topk got {n_q} queries (> max_probes="
                f"{max_probes}): the query side broadcasts by contract. "
                "Batch the queries, or for a corpus-x-corpus shape use "
                "the bucketed embedding near-dup join "
                "(operators/dedup.embedding_dup_pairs)."
            )
    q = queries.select(
        F.col(query_id),
        F.transform(query_vec, lambda x: x.cast("double")).alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.transform(corpus_vec, lambda x: x.cast("double")).alias("__cv"),
    )
    scored = F.broadcast(q).crossJoin(c).select(
        query_id,
        corpus_id,
        _cosine_udf(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Infer vector dimensionality from the first row (one eager job).
    Raises a clear error on an empty frame or a null leading vector —
    callers that may see either should pass ``dim=`` explicitly."""
    row = df.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer vector dim: {vec_col!r} has no non-null first "
            "row (empty input?) — pass dim= explicitly"
        )
    return len(row[0])


# -- random-hyperplane LSH -----------------------------------------------------


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((bits, dim))


def _stacked_planes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    """(tables*bits, dim) matrix — all tables' hyperplanes, one GEMM."""
    return np.vstack([_hyperplanes(dim, bits, t, seed) for t in range(tables)])


def with_lsh_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    out_vec: str = "__v",
) -> DataFrame:
    """(id, vec_double, tbl, sig): one row per (vector, hash table).

    Signatures for every table come from ONE (batch x dim) @ (dim x
    tables*bits) matrix multiply per Arrow batch; bit i of table t's
    signature is sign(dot(plane_{t,i}, vec)). The hyperplane matrix lives
    in the UDF closure, not the query plan.
    """
    P = _stacked_planes(dim, bits, tables, seed)
    weights = (1 << np.arange(bits, dtype=np.int64))

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField(out_vec, ArrayType(DoubleType())),
            StructField("__sigs", ArrayType(LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits_mat = (X @ P.T) > 0  # (n, tables*bits)
            sigs = (
                bits_mat.reshape(len(X), tables, bits).astype(np.int64) * weights
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    out_vec: list(X),
                    "__sigs": list(sigs),
                }
            )

    # row-wise GEMM stage: guard against single-row-group sources running
    # it on one core (see session.ensure_parallelism; no-op at scale)
    sig_df = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        run, schema=out_schema
    )
    return sig_df.select(
        id_col, out_vec, F.posexplode("__sigs").alias("tbl", "sig")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "qvec",
    corpus_vec: str = "cvec",
    k: int = 10,
    dim: int | None = None,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH approximate top-k.

    Candidates = pairs sharing a (table, signature) bucket in any of
    ``tables`` independent hash tables; exact cosine re-ranks candidates.
    Recall rises with tables, bucket size falls with bits.
    Returns (query_id, corpus_id, cosine, rank)."""
    if dim is None:
        dim = _vec_dim(corpus, corpus_vec)
    qs = with_lsh_signatures(
        queries, query_id, query_vec, dim=dim, bits=bits, tables=tables,
        seed=seed, out_vec="__qv",
    )
    cs = with_lsh_signatures(
        corpus, corpus_id, corpus_vec, dim=dim, bits=bits, tables=tables,
        seed=seed, out_vec="__cv",
    )
    cand = (
        qs.join(cs, ["tbl", "sig"])
        .select(query_id, corpus_id, "__qv", "__cv")
        .dropDuplicates([query_id, corpus_id])
    )
    scored = cand.select(
        query_id,
        corpus_id,
        _cosine_udf(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# -- IVF -----------------------------------------------------------------------


def _spherical_kmeans(X: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Driver-side spherical k-means on a corpus sample (numpy, seeded)."""
    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                v = Xn[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def _with_cells(
    df: DataFrame, id_col: str, vec_col: str, C: np.ndarray, n_cells: int,
    out_vec: str,
) -> DataFrame:
    """(id, vec_double, cells: array<int>) — the ``n_cells`` nearest
    centroid cells per vector, ranked, from one GEMM per Arrow batch."""
    schema = StructType(
        [
            df.schema[id_col],
            StructField(out_vec, ArrayType(DoubleType())),
            StructField("__cells", ArrayType(IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            scores = Xn @ C.T  # (n, n_centroids)
            # ties broken by lower cell id (stable, matches argmax)
            order = np.argsort(-scores, axis=1, kind="stable")[:, :n_cells]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    out_vec: list(X),
                    "__cells": [r.astype(np.int32) for r in order],
                }
            )

    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        run, schema=schema
    )


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "qvec",
    corpus_vec: str = "cvec",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k by cosine.

    Index build: spherical k-means centroids fitted on a driver-side corpus
    sample (seeded, bounded); every corpus vector is assigned to its
    nearest centroid cell — one numpy GEMM per Arrow batch, corpus scanned
    once and bucketed by cell id. Search: each query probes its ``nprobe``
    nearest cells, candidates come from an equi-join on cell id, exact
    cosine re-ranks. Recall rises with nprobe; per-query work falls from
    |corpus| to ~nprobe/|cells| of it.
    Returns (query_id, corpus_id, cosine, rank).
    """
    # UNBIASED deterministic sample: bare limit() takes the first file's
    # prefix, so clustered storage (e.g. sorted by topic) trains centroids
    # on one topic. Ordering by md5(id) is a seeded-shuffle equivalent —
    # stable under any input split/partitioning — and orderBy+limit plans
    # as TakeOrderedAndProject (per-partition top-n, no full sort).
    sample = [
        r[0]
        for r in corpus.orderBy(
            F.md5(F.col(corpus_id).cast("string")), corpus_id
        )
        .limit(train_sample)
        .select(corpus_vec)
        .collect()
    ]
    C = _spherical_kmeans(
        np.asarray(sample, dtype=np.float64), n_centroids, kmeans_iters, seed
    )

    c_assigned = _with_cells(corpus, corpus_id, corpus_vec, C, 1, "__cv").select(
        corpus_id, "__cv", F.col("__cells")[0].alias("cell")
    )
    q_cells = _with_cells(queries, query_id, query_vec, C, nprobe, "__qv").select(
        query_id, "__qv", F.explode("__cells").alias("cell")
    )

    scored = q_cells.join(c_assigned, "cell").select(
        query_id,
        corpus_id,
        _cosine_udf(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hamming_topk(
    probes: DataFrame,
    corpus: DataFrame,
    *,
    probe_id: str = "probe_id",
    corpus_id: str = "corpus_id",
    probe_hash: str = "phash",
    corpus_hash: str = "chash",
    k: int = 10,
    max_probes: int | None = 100_000,
) -> DataFrame:
    """Exact top-k nearest 64-bit hashes by hamming distance per probe —
    the image-retrieval analogue of bm25_topk/cosine_topk: given probe
    images' perceptual hashes (functions/image.compute_phash), find each
    one's visually-closest corpus images.

    Plan: the probe side is query-sized, so it BROADCASTS into the corpus
    scan; distance is one codegen ``bit_count(xor)`` per (probe, corpus)
    pair and the per-probe top-k window runs over probe-partitioned
    candidates. Linear in the corpus, never quadratic — the corpus scans
    once regardless of probe count. For radius-bounded DEDUP (all pairs
    within r) use operators/dedup.hash_hamming_pairs instead: banding
    beats a full scan when both sides are corpus-sized.

    Ranking is deterministic: (distance ASC, corpus_id ASC).
    ``max_probes`` enforces the query-sized-probe contract (one cheap
    count; raise beats a driver OOM); None opts out."""
    if max_probes is not None:
        n_p = probes.count()
        if n_p > max_probes:
            raise ValueError(
                f"hamming_topk got {n_p} probes (> max_probes="
                f"{max_probes}): the probe side broadcasts by contract. "
                "Batch the probes, or for all-pairs-within-radius use "
                "operators/dedup.hash_hamming_pairs (banded, both sides "
                "corpus-sized)."
            )
    p = probes.select(probe_id, probe_hash)
    c = corpus.select(corpus_id, corpus_hash)
    scored = c.join(F.broadcast(p)).select(
        probe_id,
        corpus_id,
        F.bit_count(
            F.col(probe_hash).bitwiseXOR(F.col(corpus_hash))
        ).cast("long").alias("hamming"),
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("hamming").asc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(probe_id, corpus_id, "hamming",
                F.col("rank").cast("long").alias("rank"))
    )
