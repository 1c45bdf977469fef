"""Deterministic negative sampling for contrastive training pairs.

Contrastive objectives (CLIP-style image-caption alignment, retrieval
bi-encoders) need, for every anchor, ``k`` negatives drawn from the
item pool EXCLUDING the anchor's true positives. At 10^12 pairs the
draw must be (a) a pure function of (anchor, draw index, seed) — so
re-runs, resumed jobs, and different cluster sizes produce the same
training set — and (b) join-shaped, never a per-anchor loop:

1. the pool gets a dense index once — SHARDED: rank within
   ``md5(item) mod shards`` plus the shard's cumulative offset, i.e. the
   global rank under the sort key (shard, item). Equally deterministic
   (a pure function of the pool content) but every shard ranks in its
   own window task instead of one global-sort task over the whole pool
   (the packing.py layout discipline; ``shards`` is part of the draw
   spec exactly like pack_sequences' shard count). N is the only
   driver-side state, plus the <= ``shards`` offset rows;
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


def _pool_index(distinct_items: DataFrame, *, shards: int) -> DataFrame:
    """(item, idx): the global rank of each pool item under the sort key
    (md5-shard, item) — a deterministic bijection onto [0, N) computed
    with per-shard windows (each a separate task) + broadcast cumulative
    offsets, never one global sort. SQL twin:
    ``row_number() OVER (ORDER BY shard, item) - 1``."""
    d = distinct_items.select(
        F.col("__item"),
        _portable_mod(F.col("__item").cast("string"), shards).alias("__shard"),
    )
    counts = d.groupBy("__shard").count().collect()  # <= shards rows
    acc = 0
    offsets = {}
    for r in sorted(counts, key=lambda r: r["__shard"]):
        offsets[r["__shard"]] = acc
        acc += r["count"]
    omap = F.create_map(
        *[x for s, o in sorted(offsets.items()) for x in (F.lit(s), F.lit(o))]
    )
    w = Window.partitionBy("__shard").orderBy("__item")
    return d.select(
        "__item",
        (F.row_number().over(w) - 1 + omap[F.col("__shard")]).alias("__idx"),
    )


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
    shards: int = 256,
) -> DataFrame:
    """(anchor, item, slot) negatives: per distinct anchor in
    ``positives``, ``k`` pool items that are not among that anchor's
    positives (nor the anchor itself when ``exclude_self`` and the id
    spaces coincide), chosen by the deterministic slot hash. ``slot``
    is the draw index that produced the item (stable tie-break /
    provenance). ``shards`` shapes the pool-index layout (see module
    docstring) and is part of the draw spec: the same pool indexed with
    a different shard count is a different (equally valid, equally
    deterministic) draw."""
    if k < 1:
        raise ValueError("k must be >= 1")
    n_pool = pool.select(item_col).distinct().count()
    if n_pool == 0:
        raise ValueError("empty pool")
    idx = _pool_index(
        pool.select(F.col(item_col).alias("__item")).distinct(),
        shards=shards,
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
