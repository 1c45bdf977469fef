"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale design notes (the 100 TB story):

- exact: one map-side-combinable groupBy on a 128-bit content fingerprint —
  the minimum possible: no row ever compares against another directly.
- n-gram Jaccard: EXACT Jaccard without a cross join, via an inverted
  shingle index: explode distinct shingles, self-join on shingle (pairs
  only share work where they share content), count common shingles c,
  jaccard = c / (|A| + |B| - c). Skew guard: drop ultra-frequent shingles
  (stop-shingles) before the self-join.
- MinHash+LSH: k-lane signatures (JVM-side), banded bucketing; only
  bucket-colliding pairs are candidates, verified by signature agreement.
  Sub-quadratic: cost ~ sum over buckets of bucket^2, controlled by bands.
- SimHash: 64-bit near-dup with hamming radius; bucketed by 16-bit prefix
  blocks (pigeonhole: radius<=3 means at least one of 4 blocks matches
  exactly) so candidate pairs come from equi-joins, never a cross join.
- embedding cosine: exact threshold pairs via block-nested join only in
  the small case; the scale path is LSH bucketing from
  modlyn_spark.operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    minhash_signature,
    minhash_signature_udf,
    simhash64_udf,
)


def _signatures(
    df: DataFrame, id_col: str, text_col: str, k: int, n: int, impl: str
) -> DataFrame:
    """(did, sig) table via the chosen MinHash implementation: "numpy"
    (vectorized Arrow UDF — the fast path) or "jvm" (pure column
    expressions). Same estimator, different hash family."""
    if impl == "numpy":
        return minhash_signature_udf(
            df.select(F.col(id_col).alias("did"), text_col), text_col, "sig", k=k, n=n
        ).select("did", "sig")
    return df.select(
        F.col(id_col).alias("did"),
        minhash_signature(F.col(text_col), k=k, n=n).alias("sig"),
    )


def dedup_exact(
    df: DataFrame, id_col: str, text_col: str, fingerprint_col: str = "fp"
) -> DataFrame:
    """Keep one representative (min id) per canonical-content fingerprint.
    Returns the deduplicated rows (all original columns)."""
    w = Window.partitionBy(fingerprint_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn(fingerprint_col, doc_fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", fingerprint_col)
    )


def duplicate_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact-duplicate groups: (fingerprint, n_dups, keep_id) for groups with
    more than one member."""
    return (
        df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact character-n-gram Jaccard similar pairs via inverted index.

    Returns (id1, id2, jaccard) with id1 < id2 and jaccard >= threshold.
    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the self-join (skew guard; exactness then becomes a lower
    bound — leave None for exact semantics).
    """
    sh = df.select(
        F.col(id_col).alias("did"),
        char_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    sizes = sh.select("did", "sz")
    inv = sh.select("did", F.explode("sh").alias("s"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("s").count().where(F.col("count") <= max_shingle_freq)
        inv = inv.join(F.broadcast(freq.select("s")), "s")
    a = inv.select(F.col("did").alias("id1"), "s")
    b = inv.select(F.col("did").alias("id2"), "s")
    common = (
        a.join(b, "s")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("did").alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("did").alias("id2"), F.col("sz").alias("sz2"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            (
                F.col("c") / (F.col("sz1") + F.col("sz2") - F.col("c"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.7,
    impl: str = "numpy",
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs.

    Banding: k/bands lanes hashed per band; docs colliding in ANY band
    become candidates; candidates are scored by exact signature agreement
    (estimated Jaccard) and filtered at ``threshold``.
    Returns (id1, id2, est_jaccard).
    """
    rows_per_band = k // bands
    sig = _signatures(df, id_col, text_col, k, n, impl).cache()
    banded = sig.select(
        "did",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig")[i]
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("did", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    a = banded.select(
        F.col("did").alias("id1"), F.col("sig").alias("sig1"), "band", "bh"
    )
    b = banded.select(
        F.col("did").alias("id2"), F.col("sig").alias("sig2"), "band", "bh"
    )
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sig1", "sig2")
        .dropDuplicates(["id1", "id2"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig1", "sig2", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(len(range(k))))
    return cand.select("id1", "id2", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


def minhash_dedup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 32,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.9,
    impl: str = "numpy",
) -> DataFrame:
    """Scalable near-duplicate GROUPING via MinHash-LSH star edges.

    ``minhash_lsh_pairs`` enumerates every colliding pair — O(bucket^2)
    inside a cluster of mutually-similar documents, which explodes on
    template-heavy corpora. For deduplication you only need one keeper per
    group: here every doc links only to its bucket's min-id representative
    (O(n x bands) edges total), links are verified by signature agreement at
    ``threshold``, and each doc keeps its smallest verified representative.

    Returns (doc_id, keep_id, est_jaccard): one row per document that is a
    near-duplicate of a smaller-id representative (keep_id < doc_id).
    Transitive chains collapse to the chain's bucket-level minimum; like all
    LSH dedup this is approximate — recall rises with ``bands``.
    """
    from pyspark.sql import Window

    rows_per_band = k // bands
    sig = _signatures(df, id_col, text_col, k, n, impl).cache()
    banded = sig.select(
        "did",
        "sig",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col("sig")[i]
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    )
    w = Window.partitionBy("bh")
    edges = (
        banded.withColumn("rep", F.min("did").over(w))
        .where(F.col("did") > F.col("rep"))
        .select("did", "rep", "sig")
        .dropDuplicates(["did", "rep"])
    )
    rep_sig = sig.select(F.col("did").alias("rep"), F.col("sig").alias("rep_sig"))
    est = F.size(
        F.filter(F.zip_with("sig", "rep_sig", lambda x, y: x == y), lambda eq: eq)
    ) / F.lit(float(k))
    verified = (
        edges.join(rep_sig, "rep")
        .select("did", "rep", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )
    w2 = Window.partitionBy("did").orderBy(F.col("rep").asc())
    return (
        verified.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") == 1)
        .select(
            F.col("did").alias("doc_id"),
            F.col("rep").alias("keep_id"),
            "est_jaccard",
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs within a hamming radius (<= 3 by
    default). Pigeonhole bucketing: the 64-bit hash splits into 4 16-bit
    blocks; two hashes within radius 3 must agree exactly on at least one
    block, so candidates come from 4 equi-joins on (block_idx, block_value).
    Returns (id1, id2, hamming)."""
    sh = simhash64_udf(
        df.select(F.col(id_col).alias("did"), text_col), text_col, "sh"
    ).select("did", "sh")
    blocks = sh.select(
        "did",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("sh"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("did", "sh", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv"))
    a = blocks.select(F.col("did").alias("id1"), F.col("sh").alias("sh1"), "blk", "bv")
    b = blocks.select(F.col("did").alias("id2"), F.col("sh").alias("sh2"), "blk", "bv")
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))).alias("hamming"),
        )
        .dropDuplicates(["id1", "id2"])
        .where(F.col("hamming") <= max_hamming)
    )


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    return dot / (na * nb)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, JVM-side
    zip_with/aggregate arithmetic. Exact (block-nested self-join) — use the
    LSH variant in operators.similarity for the scale path. Returns
    (id1, id2, cosine)."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    cos = _cosine(
        F.transform("v1", lambda x: x.cast("double")),
        F.transform("v2", lambda x: x.cast("double")),
    )
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
