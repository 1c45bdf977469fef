"""Bloom-sketch incremental dedup — dedup a new batch against a historical
corpus without joining the full history.

The ingestion-time pattern (Dolma/CCNet-style rolling corpus builds): the
history is orders of magnitude larger than each incoming batch, so an
exact anti-join against it per batch rescans ~everything. A Bloom filter
over the history keys answers "definitely new" for the overwhelming
majority of incoming rows; only the (dups + false positives) residue
needs the exact join. The final result is EXACT — the sketch is purely a
join pruner, never a truth source (no false negatives is the Bloom
theorem; false positives are re-checked).

Scale design — the sketch is BUCKETED, never a single driver-side array:

- ``build_bucketed_bloom``: history keys hash to ``n_buckets`` buckets
  (xxhash64); each bucket materializes a ``bits_per_bucket`` filter built
  by one vectorized ``applyInPandas`` pass (bit indices are computed
  JVM-side as k xxhash64 columns — Python only ORs numpy bitmasks). The
  result is a (bucket, bloom bytes) DataFrame: a reusable, writable
  artifact (persist it next to the corpus checkpoint and top it up per
  ingest) totalling n_buckets * bits_per_bucket / 8 bytes spread across
  the cluster — nothing is ever collected.
- ``bloom_prefilter``: incoming keys COGROUP with their bucket's sketch
  (one shuffle of bare (key, idx...) tuples co-partitioned with the
  sketch rows — the sketch bytes are NOT replicated per row, which a
  plain join would do at bits_per_bucket/8 bytes per input row).
- ``incremental_dedup``: prefilter, then the exact anti-join ONLY for
  ``maybe_seen`` keys; payload columns never move until the final
  key semi-join.

Sizing: fp rate ~ (1 - e^(-k*n/m))^k for n keys in m bits with k hashes;
the defaults (10 bits/key at k=7) give ~0.8% — i.e. the exact-join stage
sees ~1% of a fresh batch instead of 100%.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

_BUCKET_SEED = 0xB10C


def _with_indices(
    df: DataFrame, key_col: str, n_buckets: int, bits: int, n_hashes: int
) -> DataFrame:
    """(key, bucket, i0..i{k-1}) — all hashing JVM-side, one map stage."""
    k = F.col(key_col).cast("string")
    cols = [
        F.pmod(F.xxhash64(k, F.lit(_BUCKET_SEED)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket")
    ]
    for i in range(n_hashes):
        cols.append(
            F.pmod(F.xxhash64(k, F.lit(i + 1)), F.lit(bits))
            .cast("long")
            .alias(f"i{i}")
        )
    return df.select(F.col(key_col), *cols)


def build_bucketed_bloom(
    history: DataFrame,
    key_col: str,
    *,
    n_buckets: int = 256,
    bits_per_bucket: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """(bucket: int, bloom: binary) — one Bloom filter per key bucket."""
    idx = _with_indices(history, key_col, n_buckets, bits_per_bucket, n_hashes)
    nb = int(bits_per_bucket)
    kcols = [f"i{i}" for i in range(n_hashes)]
    schema = StructType(
        [StructField("bucket", IntegerType()), StructField("bloom", BinaryType())]
    )

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nb // 8, dtype=np.uint8)
        for c in kcols:
            ix = pdf[c].to_numpy()
            np.bitwise_or.at(bits, ix >> 3, (1 << (ix & 7)).astype(np.uint8))
        return pd.DataFrame({"bucket": [key[0]], "bloom": [bits.tobytes()]})

    return idx.groupBy("bucket").applyInPandas(build, schema=schema)


def bloom_prefilter(
    new_keys: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    n_buckets: int = 256,
    bits_per_bucket: int = 1 << 20,
    n_hashes: int = 7,
) -> DataFrame:
    """(key, maybe_seen) for every distinct incoming key. maybe_seen=False
    is definitive (no false negatives); True needs the exact check."""
    idx = _with_indices(
        new_keys.select(key_col).distinct(), key_col, n_buckets,
        bits_per_bucket, n_hashes,
    )
    kcols = [f"i{i}" for i in range(n_hashes)]
    out_schema = StructType(
        [
            next(f for f in idx.schema.fields if f.name == key_col),
            StructField("maybe_seen", BooleanType()),
        ]
    )

    def check(key: tuple, rows: pd.DataFrame, blooms: pd.DataFrame) -> pd.DataFrame:
        if rows.empty:
            return pd.DataFrame({key_col: [], "maybe_seen": []})
        if blooms.empty:  # bucket absent from history: all definitely new
            return pd.DataFrame(
                {key_col: rows[key_col], "maybe_seen": False}
            )
        bits = np.frombuffer(blooms["bloom"].iloc[0], dtype=np.uint8)
        seen = np.ones(len(rows), dtype=bool)
        for c in kcols:
            ix = rows[c].to_numpy()
            seen &= (bits[ix >> 3] & (1 << (ix & 7)).astype(np.uint8)) != 0
        return pd.DataFrame({key_col: rows[key_col], "maybe_seen": seen})

    return (
        idx.groupBy("bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(check, schema=out_schema)
    )


def incremental_dedup(
    new_df: DataFrame,
    history: DataFrame | None,
    key_col: str,
    *,
    n_buckets: int = 256,
    bits_per_bucket: int = 1 << 20,
    n_hashes: int = 7,
    bloom_df: DataFrame | None = None,
    exact: bool = True,
    eager: bool = True,
) -> DataFrame:
    """Rows of ``new_df`` whose key does not occur in ``history`` — exactly
    the anti-join result, with the Bloom sketch pruning the join input.
    Pass a prebuilt ``bloom_df`` (the persisted artifact) to skip the
    build pass.

    ``exact=True`` re-checks every maybe-seen key with an anti-join, which
    still reads the history key column once (exactness has no free
    lunch) — the saving over a plain anti-join is that ~99% of the
    incoming batch never enters the join. ``exact=False`` is the
    sketch-only mode (Dolma-style rolling ingestion): maybe-seen rows
    are DROPPED unverified — with a prebuilt ``bloom_df`` the history is
    not touched at all, at the price of losing ~fp-rate (<1% at default
    sizing) genuinely-new rows. ``history`` may be None in that mode.

    ``eager=True`` (default): the prefilter flags feed BOTH the
    definitely-new and the verify branches — without a cache the whole
    sketch-build + cogroup subtree executes twice. The flags are cached,
    the (batch-key-sized) surviving key set materialized via
    localCheckpoint, and the cache unpersisted before returning. At
    corpus scale pass a FINGERPRINT column as ``key_col`` (not raw
    text) so the materialized key set stays small; eager=False composes
    lazily."""
    if bloom_df is None:
        bloom_df = build_bucketed_bloom(
            history, key_col, n_buckets=n_buckets,
            bits_per_bucket=bits_per_bucket, n_hashes=n_hashes,
        )
    flags = bloom_prefilter(
        new_df, bloom_df, key_col, n_buckets=n_buckets,
        bits_per_bucket=bits_per_bucket, n_hashes=n_hashes,
    )
    if not exact:
        fresh = flags.where(~F.col("maybe_seen")).select(key_col)
        return new_df.join(fresh, key_col, "left_semi")
    if history is None:
        raise ValueError("exact=True needs the history frame for the re-check")
    if eager:
        flags = flags.cache()
    fresh = flags.where(~F.col("maybe_seen")).select(key_col)
    verified = (
        flags.where(F.col("maybe_seen"))
        .select(key_col)
        .join(history.select(key_col).distinct(), key_col, "left_anti")
    )
    new_keys = fresh.unionByName(verified)
    if eager:
        new_keys = new_keys.localCheckpoint(eager=True)
        flags.unpersist()
    return new_df.join(new_keys, key_col, "left_semi")
