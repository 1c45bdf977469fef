"""Sequence packing — the layout step between a curated corpus and a
training run.

LLM training consumes fixed-length token sequences, not documents; the
standard layout (GPT-2 onward) CONCATENATES documents in a deterministic
order and slices the stream at ``seq_len`` boundaries, so no padding is
wasted and a document may straddle two adjacent sequences. This module
computes that layout as METADATA — for each document: which shard/
sequence its tokens start in and at what offset — without materializing
token arrays (the actual tokens are producible downstream from
(doc, offset) spans; the layout is what needs to be deterministic,
auditable and joinable).

Scale shape: a single global concatenation order would be one
running-sum window over the whole corpus — one reducer. Packing is
therefore SHARDED, the way training data is actually laid out: documents
hash deterministically into ``shards`` independent streams (the same
portable md5 family as operators/sampling.py, so ANY engine reproduces
the layout bit-for-bit), each shard concatenates its documents in
ascending id order and slices at ``seq_len``. One shuffle (window
partitionBy shard), every shard a separate task; shard count scales with
the cluster, the layout is a pure function of (ids, token counts, salt,
shards, seq_len) — identical on any cluster/partitioning, and exactly
reproducible in SQL (the correctness oracle).

Reference context: modlyn's DataLoader batches rows
(_simple_logreg_datamodule.py:174-202); sequence packing is the
text-training analogue of that batching step at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    seq_len: int,
    shards: int = 256,
    salt: str = "",
) -> DataFrame:
    """Assign every document its place in the packed-token layout.

    Returns the input ids plus:

    - ``shard``            int    — which of the ``shards`` streams
    - ``start_tok``        long   — exclusive running token count before
                                    this doc within its shard
    - ``seq_id``           long   — shard-local sequence index of the
                                    doc's FIRST token (start_tok // seq_len)
    - ``seq_offset``       long   — offset of the first token inside that
                                    sequence (start_tok % seq_len)
    - ``n_seqs_spanned``   long   — how many seq_len windows the doc's
                                    tokens touch (>= 1; 0-token docs
                                    occupy no window but keep a row with
                                    n_seqs_spanned = 0)

    Documents with NULL token counts are treated as 0 tokens (kept, span
    0). ``seq_len`` and ``shards`` must be positive.

    SIZING ``shards``: each shard's running sum is one window task, so a
    shard should hold roughly 1-10M documents (the default 256 suits
    corpora up to low billions of docs; a 10^12-doc corpus wants ~1e5-1e6
    shards). The shard count is PART OF THE LAYOUT SPEC — the same corpus
    packed with different ``shards`` is a different (equally valid)
    layout — so pick it once per corpus rather than deriving it from
    runtime cluster facts, which would silently change the dataset
    between runs.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if shards <= 0:
        raise ValueError("shards must be positive")
    n = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    key = F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt))
    shard = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
        F.lit(shards),
    ).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.select(F.col(id_col), n.alias("__n"), shard.alias("shard"))
        .withColumn(
            "start_tok",
            F.coalesce(F.sum("__n").over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "seq_id", (F.col("start_tok") / seq_len).cast("long")
        )
        .withColumn(
            "seq_offset", F.pmod(F.col("start_tok"), F.lit(seq_len)).cast("long")
        )
        .withColumn(
            "n_seqs_spanned",
            F.when(F.col("__n") == 0, F.lit(0)).otherwise(
                ((F.col("start_tok") + F.col("__n") - 1) / seq_len).cast("long")
                - F.col("seq_id")
                + 1
            ).cast("long"),
        )
    )
    return out.select(
        id_col, F.col("__n").alias("n_tokens"), "shard", "start_tok",
        "seq_id", "seq_offset", "n_seqs_spanned",
    )


def packing_stats(packed: DataFrame, *, seq_len: int) -> DataFrame:
    """Shard-level audit of a ``pack_sequences`` layout: total tokens,
    document count, number of full sequences produced, and the tail
    remainder that the last (partial) sequence holds — the quantities a
    training job needs to size epochs and drop/pad the tail. One
    map-side-combinable groupBy."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            (F.col("total_tokens") / seq_len).cast("long").alias("n_full_seqs"),
            F.pmod(F.col("total_tokens"), F.lit(seq_len))
            .cast("long")
            .alias("tail_tokens"),
        )
    )
