"""Manifest-based per-partition checkpointing with lineage metrics.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics". Spark has no batch-job checkpointing at this granularity
(Structured Streaming checkpoints don't apply), so the engine provides it
as a library:

- rows are assigned a stable bucket = pmod(xxhash64(key), n_buckets) —
  a pure function of the data, independent of parallelism;
- output parquet is partitioned by bucket (dynamic partition overwrite, so
  re-writing a bucket is idempotent);
- after each bucket's data is durable, a manifest JSON is committed next to
  it recording row count + an order-insensitive content hash
  (sum of per-row xxhash64 over all columns) + wall-clock + lineage note;
- on resume, buckets with a manifest are skipped entirely (the filter prunes
  them before any compute); buckets that crashed between data-write and
  manifest-write are recomputed and overwritten — idempotent either way.

The manifest doubles as the lineage/metrics record the north_rule wants
persisted alongside each commit: ``verify(path)`` re-reads the data and
checks every bucket's count+hash against its manifest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "__ckpt_bucket"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def _bucket_metrics(df: DataFrame, data_cols: list[str]) -> DataFrame:
    """Per-bucket (rows, content_hash): order-insensitive sum of per-row
    xxhash64 over all payload columns (cast to string for type stability)."""
    # sum in decimal(38,0) (no ANSI long-overflow), reduce mod 2^61 -> long
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in data_cols]).cast(
        "decimal(38,0)"
    )
    return df.groupBy(_BUCKET).agg(
        F.count(F.lit(1)).alias("rows"),
        F.pmod(F.sum(row_hash), F.lit(2**61).cast("decimal(38,0)"))
        .cast("long")
        .alias("content_hash"),
    )


def completed_buckets(path: str) -> dict[int, dict]:
    """Read the manifest: bucket -> {rows, content_hash, ...}."""
    mdir = _manifest_dir(path)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for f in os.listdir(mdir):
        if f.startswith("bucket-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                rec = json.load(fh)
            out[int(rec["bucket"])] = rec
    return out


def write_checkpointed(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    *,
    n_buckets: int = 16,
    lineage: str = "",
) -> dict:
    """Write ``df`` to ``path`` bucket-by-bucket with resume support.

    Returns {"computed": [...], "skipped": [...], "rows_written": int}.
    Calling again after a partial failure completes only the missing
    buckets; calling on a complete output is a no-op.
    """
    spark = df.sparkSession
    done = completed_buckets(path)
    bucketed = df.withColumn(
        _BUCKET, F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")
    )
    todo_buckets = [b for b in range(n_buckets) if b not in done]
    result = {"computed": todo_buckets, "skipped": sorted(done), "rows_written": 0}
    if not todo_buckets:
        return result

    todo = bucketed.where(F.col(_BUCKET).isin(todo_buckets))
    # idempotent per-bucket overwrite: only touched partitions are replaced
    (
        todo.repartition(_BUCKET)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BUCKET)
        .parquet(path)
    )
    # data is durable; now commit manifests (metrics read back from disk so
    # the hash covers what was actually written)
    data_cols = [c for c in df.columns]
    written = spark.read.parquet(path).where(F.col(_BUCKET).isin(todo_buckets))
    metrics = _bucket_metrics(written.select(*data_cols, _BUCKET), data_cols).collect()
    os.makedirs(_manifest_dir(path), exist_ok=True)
    now = time.time()
    for r in metrics:
        rec = {
            "bucket": int(r[_BUCKET]),
            "rows": int(r["rows"]),
            "content_hash": int(r["content_hash"]) if r["content_hash"] is not None else 0,
            "committed_at": now,
            "lineage": lineage,
            "key_cols": key_cols,
            "n_buckets": n_buckets,
        }
        tmp = os.path.join(_manifest_dir(path), f".bucket-{rec['bucket']}.tmp")
        dst = os.path.join(_manifest_dir(path), f"bucket-{rec['bucket']}.json")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, dst)  # atomic manifest commit
        result["rows_written"] += rec["rows"]
    # buckets that produced zero rows still need a manifest (else they'd be
    # recomputed forever)
    seen = {int(r[_BUCKET]) for r in metrics}
    for b in todo_buckets:
        if b not in seen:
            rec = {
                "bucket": b,
                "rows": 0,
                "content_hash": 0,
                "committed_at": now,
                "lineage": lineage,
                "key_cols": key_cols,
                "n_buckets": n_buckets,
            }
            tmp = os.path.join(_manifest_dir(path), f".bucket-{b}.tmp")
            with open(tmp, "w") as fh:
                json.dump(rec, fh)
            os.replace(tmp, os.path.join(_manifest_dir(path), f"bucket-{b}.json"))
    return result


def read_checkpointed(spark: SparkSession, path: str) -> DataFrame:
    """Read a checkpointed output (drops the bucket column)."""
    return spark.read.parquet(path).drop(_BUCKET)


def verify(spark: SparkSession, path: str) -> dict:
    """Lineage audit: recompute per-bucket count+hash from the stored data
    and compare with the manifests. Returns {"ok": bool, "bad_buckets": []}."""
    done = completed_buckets(path)
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != _BUCKET]
    got = {
        int(r[_BUCKET]): (int(r["rows"]), int(r["content_hash"]) if r["content_hash"] is not None else 0)
        for r in _bucket_metrics(df, data_cols).collect()
    }
    bad = []
    for b, rec in done.items():
        g = got.get(b, (0, 0))
        if g != (rec["rows"], rec["content_hash"]):
            bad.append(b)
    return {"ok": not bad, "bad_buckets": sorted(bad), "n_buckets": len(done)}
