"""Size-balanced output-shard planning (webdataset-style layout).

Image/multimodal training corpora ship as fixed-size shard archives
(~100 MB-1 GB tar/parquet files) that loaders stream sequentially —
the layout step assigns every sample to a shard so that (a) shard
sizes hug a byte target, (b) the assignment is a deterministic pure
function of the data (reproducible re-layout after any upstream
change), and (c) samples land in a pseudo-random order so each shard
is an unbiased corpus slice (loaders shuffle shards, not samples).

Reference context: modlyn materializes train tensors in one in-memory
block (`/root/reference/modlyn/models/_simple_logreg_datamodule.py`);
sharding is what replaces that block at cluster scale. Sibling:
``operators/packing.py`` packs TOKENS into fixed-length sequences
(slicing documents); this operator packs whole ATOMIC samples into
byte-budget files — no sample is split.

Physical plan (scale-first): a global first-fit/FFD bin packing is a
sequential algorithm — at 100 TB it cannot be a single ordered stream.
Instead samples hash into ``groups`` independent streams (one exchange
on the group key); within each group a prefix-sum window over the
hash-shuffled order assigns ``local_shard = floor(bytes_before /
target_bytes)`` — next-fit packing whose overshoot is bounded by one
sample, fully parallel across groups, and deterministic at any
parallelism (the in-group order is a pure md5 function of the ids, not
of partitioning). ``groups`` scales with the cluster: 1024 groups give
1024-way parallel layout and 1024 concurrent writers downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.sampling import _hash_unit


def shard_plan(
    df: DataFrame,
    id_cols: str | list[str],
    size_col: str,
    *,
    target_bytes: int,
    groups: int = 64,
    salt: str = "shards",
) -> DataFrame:
    """Assign each sample to ``(shard_group, local_shard)`` with a
    stable position ``seq_in_shard``; adds ``shard_id`` =
    ``'<group>-<local_shard>'`` for single-column consumers.

    Rows with a NULL or negative size are EXCLUDED from the plan — a
    corrupt size must not silently skew a shard, and layout of 10^10
    samples should not abort on one bad manifest row. Pair with
    ``operators/profile.py`` expectations to gate corrupt manifests
    upstream (the exclusion is observable: plan count < input count).

    Determinism: the draw key is the md5 of (ids, salt) — the same
    portable family as ``operators/sampling.py`` — so the plan is
    bit-identical on any engine/cluster/partitioning, and a changed
    ``salt`` re-deals the layout for a new corpus version."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be > 0")
    if groups <= 0:
        raise ValueError("groups must be > 0")
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    u = _hash_unit(ids, salt)
    size = F.col(size_col).cast("long")
    base = (
        df.where(size.isNotNull() & (size >= 0))
        .withColumn("__u", u)
        .withColumn(
            "shard_group", (F.col("__u") * groups).cast("int")
        )
    )
    # in-group order: the hash draw, ids as the total tiebreak
    w = Window.partitionBy("shard_group").orderBy("__u", *ids)
    cum_before = F.coalesce(
        F.sum(size).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    planned = base.withColumn(
        "local_shard",
        F.floor(cum_before / F.lit(int(target_bytes))).cast("int"),
    )
    w2 = Window.partitionBy("shard_group", "local_shard").orderBy(
        "__u", *ids
    )
    return (
        planned.withColumn(
            "seq_in_shard", (F.row_number().over(w2) - 1).cast("int")
        )
        .withColumn(
            "shard_id",
            F.concat_ws(
                "-",
                F.col("shard_group").cast("string"),
                F.col("local_shard").cast("string"),
            ),
        )
        .drop("__u")
    )


def shard_manifest(plan: DataFrame, size_col: str) -> DataFrame:
    """Per-shard rollup of a ``shard_plan`` output: ``(shard_group,
    local_shard, shard_id, n_samples, total_bytes)``. One map-side-
    combinable aggregate, output is shard-count-sized."""
    return plan.groupBy("shard_group", "local_shard", "shard_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col(size_col).cast("long")).alias("total_bytes"),
    )
