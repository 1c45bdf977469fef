"""Approximate-nearest-neighbor similarity search over embedding columns.

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  set against the corpus, dot products JVM-side via zip_with/aggregate,
  per-query top-k with a window. The corpus is scanned once, never
  shuffled; only (query x corpus) score rows reach the top-k shuffle,
  prunable by a score floor.

- ``lsh_cosine_topk``: the scale path — random-hyperplane LSH. Each vector
  gets a b-bit signature (sign of dot with b fixed seeded hyperplanes,
  computed JVM-side); candidates must share a signature bucket (equi-join,
  AQE-skew-safe), then exact cosine re-ranks within buckets. Multi-probe
  via t independent tables raises recall. Sub-quadratic: cost ~ sum of
  bucket sizes squared instead of |Q| x |C|.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "qvec",
    corpus_vec: str = "cvec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query. Returns
    (query_id, corpus_id, cosine, rank) with rank 1..k, ties broken by
    ascending corpus id (deterministic)."""
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
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


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
    sample (seeded, tiny); every corpus vector is assigned to its nearest
    centroid cell with a JVM-side argmax over centroid dot products — the
    corpus is scanned once and bucketed by cell id. Search: each query
    probes its ``nprobe`` nearest cells (explode + window), candidates come
    from an equi-join on cell id, exact cosine re-ranks. Recall rises with
    nprobe; per-query work falls from |corpus| to ~nprobe/|cells| of it.
    Returns (query_id, corpus_id, cosine, rank).
    """
    sample = [
        r[0]
        for r in corpus.select(corpus_vec).limit(train_sample).collect()
    ]
    C = _spherical_kmeans(
        np.asarray(sample, dtype=np.float64), n_centroids, kmeans_iters, seed
    )

    def cell_scores(vec_col: Column) -> Column:
        v = F.transform(vec_col, lambda x: x.cast("double"))
        return F.array(
            *[
                _dot(v, F.array(*[F.lit(float(x)) for x in c])) / _norm(v)
                for c in C
            ]
        )

    c_assigned = corpus.select(
        F.col(corpus_id),
        F.transform(corpus_vec, lambda x: x.cast("double")).alias("__cv"),
        cell_scores(F.col(corpus_vec)).alias("__cs"),
    ).select(
        corpus_id,
        "__cv",
        (F.array_position("__cs", F.array_max("__cs")) - 1).cast("int").alias("cell"),
    )

    q_scored = queries.select(
        F.col(query_id),
        F.transform(query_vec, lambda x: x.cast("double")).alias("__qv"),
        F.posexplode(cell_scores(F.col(query_vec))).alias("cell", "cscore"),
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("cscore").desc())
    q_cells = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select(query_id, "__qv", "cell")
    )

    scored = q_cells.join(c_assigned, "cell").select(
        query_id,
        corpus_id,
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((bits, dim))


def _signature(vec_col: Column, planes: np.ndarray) -> Column:
    """b-bit signature as a long: bit i = sign of dot(plane_i, vec).
    JVM-side: each plane's dot is a zip_with/aggregate against a literal
    array; bits packed with shiftleft/bitwise-or."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(F.transform(vec_col, lambda x: x.cast("double")), lit)
        bits.append(F.when(d > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


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
        dim = len(corpus.select(corpus_vec).first()[0])

    def with_sigs(df: DataFrame, id_c: str, vec_c: str, out: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _signature(F.col(vec_c), _hyperplanes(dim, bits, t, seed)).alias(
                        "sig"
                    ),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_c),
            F.transform(vec_c, lambda x: x.cast("double")).alias(out),
            F.explode(sigs).alias("ts"),
        ).select(id_c, out, F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))

    qs = with_sigs(queries, query_id, query_vec, "__qv")
    cs = with_sigs(corpus, corpus_id, corpus_vec, "__cv")
    cand = (
        qs.join(cs, ["tbl", "sig"])
        .select(query_id, corpus_id, "__qv", "__cv")
        .dropDuplicates([query_id, corpus_id])
    )
    scored = cand.select(
        query_id,
        corpus_id,
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
