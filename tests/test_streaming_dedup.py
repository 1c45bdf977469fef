"""Streaming exact dedup: admitted set == batch dedup on the same input,
cross-microbatch duplicates dropped from state, batch-path dual."""

from __future__ import annotations

from pyspark.sql import functions as F

from modlyn_spark.operators.dedup import dedup_exact
from modlyn_spark.streaming.dedup import streaming_exact_dedup

SCHEMA = "doc_id long, ts timestamp, text string"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_streaming_dedup_matches_batch_and_spans_microbatches(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        (0, "2024-01-01 00:00:00", "alpha unique document"),
        (1, "2024-01-01 00:01:00", "duplicate   Body text"),
        (2, "2024-01-01 00:02:00", "duplicate body TEXT"),  # dup of 1 (canon)
        (3, "2024-01-01 00:03:00", "gamma content"),
    ]
    batch2 = [
        (4, "2024-01-01 00:10:00", "Duplicate body text"),  # dup of 1, later file
        (5, "2024-01-01 00:11:00", "delta fresh arrival"),
    ]
    fmt = lambda rows: [  # noqa: E731
        (i, __import__("datetime").datetime.fromisoformat(t), x)
        for i, t, x in rows
    ]
    _rows(spark, fmt(batch1)).coalesce(1).write.parquet(f"{src}/b1")
    _rows(spark, fmt(batch2)).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_exact_dedup(stream, "text", ts_col="ts")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(sink).orderBy("doc_id").collect()
    admitted = [r["doc_id"] for r in got]
    # first arrival wins within AND across microbatches
    assert admitted == [0, 1, 3, 5]

    all_rows = _rows(spark, fmt(batch1 + batch2))
    batch_ids = sorted(
        r["doc_id"] for r in dedup_exact(all_rows, "doc_id", "text").collect()
    )
    assert admitted == batch_ids


def test_batch_path_dual(spark):
    df = _rows(
        spark,
        [
            (0, None, "same text"),
            (1, None, "SAME   text"),
            (2, None, "other"),
        ],
    )
    out = streaming_exact_dedup(df, "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 2]
    assert "fp" in out.columns


def test_watermark_semantics_guaranteed_vs_best_effort(spark, tmp_path):
    """Documents the bounded-state contract: duplicates arriving WITHIN
    the watermark delay of the first occurrence are GUARANTEED dropped;
    duplicates beyond the horizon are best-effort only (state cleanup
    timing is internal — they may be dropped or re-admitted, and any
    re-admission is the batch layer's to re-dedup). Non-duplicates are
    never lost, whatever the state does."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    import datetime as dt

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, dt.datetime.fromisoformat(t), x) for i, t, x in rows], SCHEMA
    )
    mk([
        (0, "2024-01-01 00:00:00", "same doc"),
        (1, "2024-01-01 00:30:00", "same doc"),   # inside horizon: dropped
    ]).coalesce(1).write.parquet(f"{src}/b1")
    mk([
        (2, "2024-01-01 06:00:00", "same doc"),   # far beyond: best effort
        (3, "2024-01-01 06:00:00", "fresh doc"),  # never lost
    ]).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_exact_dedup(stream, "text", ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    admitted = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    )
    assert 0 in admitted and 3 in admitted     # firsts always admitted
    assert 1 not in admitted                   # in-horizon dup: guaranteed
    assert set(admitted) <= {0, 2, 3}          # 2 is best-effort either way


def test_repetition_gate_works_on_a_stream(spark, tmp_path):
    """The Gopher repetition gate is a stateless Arrow map + filter, so it
    composes with streaming ingestion as-is (no state store involved) —
    the full on-ingest curation shape is fingerprint-dedup + quality/
    repetition gates in one continuous query."""
    from modlyn_spark.functions.repetition import (
        gopher_repetition_ok,
        repetition_signals,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    clean = " ".join(f"tok{i} word{(i * 13) % 89}" for i in range(120))
    rows = [
        (0, None, clean),
        (1, None, "buy now best price " * 50),  # fails the repetition caps
        (2, None, clean + " extra tail of words here"),
    ]
    _rows(spark, rows).coalesce(1).write.parquet(f"{src}/b1")

    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/*")
    gated = repetition_signals(stream, "text").where(gopher_repetition_ok())
    q = (
        gated.select("doc_id")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    assert kept == [0, 2]
