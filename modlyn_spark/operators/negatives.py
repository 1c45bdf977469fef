"""Deterministic negative sampling for contrastive training pairs.

Contrastive objectives (CLIP-style image-caption alignment, retrieval
bi-encoders) need, for every anchor, ``k`` negatives drawn from the
item pool EXCLUDING the anchor's true positives. At 10^12 pairs the
draw must be (a) a pure function of (anchor, draw index, seed) — so
re-runs, resumed jobs, and different cluster sizes produce the same
training set — and (b) join-shaped, never a per-anchor loop:

1. the pool gets a dense index once (``row_number`` over the item id —
   deterministic) and its size N is the only driver-side state;
2. each anchor explodes to ``k * oversample`` draw slots; slot j maps
   to pool index ``md5(anchor|j|seed) mod N`` — the house portable
   hash, replayable in any SQL engine;
3. one equi-join onto the pool, one anti-join against the positives
   table, duplicate drawn items collapse to their earliest slot, and a
   per-anchor window keeps the first ``k`` survivors in slot order.

Oversampling covers rejections (positives, self, collisions):
``P[short] <= C(m, m-k+1) * (p_reject)^(m-k+1)`` for m slots — with the
default 3x oversample and positives a tiny fraction of the pool, a
short anchor is astronomically rare; short anchors keep whatever
survived (documented; raise ``oversample`` for dense-positive data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _portable_mod(key, n: int):
    """md5(key) -> 60-bit int -> mod n (the cross-engine hash)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast(
        "long"
    ) % F.lit(int(n))


def sample_negatives(
    positives: DataFrame,
    pool: DataFrame,
    *,
    anchor_col: str,
    item_col: str,
    k: int,
    oversample: int = 3,
    seed: int = 0,
    exclude_self: bool = True,
) -> DataFrame:
    """(anchor, item, slot) negatives: per distinct anchor in
    ``positives``, ``k`` pool items that are not among that anchor's
    positives (nor the anchor itself when ``exclude_self`` and the id
    spaces coincide), chosen by the deterministic slot hash. ``slot``
    is the draw index that produced the item (stable tie-break /
    provenance)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    n_pool = pool.select(item_col).distinct().count()
    if n_pool == 0:
        raise ValueError("empty pool")
    idx = pool.select(item_col).distinct().select(
        F.col(item_col).alias("__item"),
        (
            F.row_number().over(Window.orderBy(item_col)) - 1
        ).alias("__idx"),
    )
    anchors = positives.select(
        F.col(anchor_col).alias("__anchor")
    ).distinct()
    m = int(k) * int(oversample)
    draws = anchors.select(
        "__anchor",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__slot"),
    ).withColumn(
        "__idx",
        _portable_mod(
            F.concat_ws(
                "|",
                F.col("__anchor").cast("string"),
                F.col("__slot").cast("string"),
                F.lit(str(seed)),
            ),
            n_pool,
        ),
    )
    cand = draws.join(idx, "__idx").drop("__idx")
    pos = positives.select(
        F.col(anchor_col).alias("__anchor"),
        F.col(item_col).alias("__item"),
    ).distinct()
    cand = cand.join(pos, ["__anchor", "__item"], "left_anti")
    if exclude_self:
        cand = cand.where(
            ~F.col("__item").cast("string").eqNullSafe(
                F.col("__anchor").cast("string")
            )
        )
    # duplicate drawn items collapse to their earliest slot, then the
    # first k survivors in slot order win
    w_dup = Window.partitionBy("__anchor", "__item").orderBy("__slot")
    w_top = Window.partitionBy("__anchor").orderBy("__slot")
    return (
        cand.withColumn("__rd", F.row_number().over(w_dup))
        .where(F.col("__rd") == 1)
        .withColumn("__rk", F.row_number().over(w_top))
        .where(F.col("__rk") <= int(k))
        .select(
            F.col("__anchor").alias(anchor_col),
            F.col("__item").alias(item_col),
            F.col("__slot").cast("long").alias("slot"),
        )
    )
