"""Streaming deduplication for continuous corpus ingestion.

A 10^12-row training-data platform does not re-run batch dedup over the
full corpus on every delivery; new documents arrive continuously and must
be deduplicated ON INGEST against what was already admitted. Spark's
streaming state store is the right substrate:

- ``streaming_exact_dedup``: canonical-content fingerprint (same
  ``doc_fingerprint`` the batch ``dedup_exact`` keys on, so batch and
  stream admit the SAME representative set) + ``dropDuplicates`` /
  ``dropDuplicatesWithinWatermark`` on the fingerprint. With an event-time
  column + watermark the per-key state is evicted once it can no longer
  match a late arrival, bounding state size — the unbounded-key variant
  (no ts_col) keeps all fingerprints in the state store and is only for
  bounded replays. The contract is asymmetric: duplicates WITHIN the
  watermark delay are guaranteed dropped; beyond it dedup is best-effort
  (cleanup timing is internal), so any re-admitted stragglers are the
  downstream batch dedup's to remove.

State-size story at scale: the fingerprint is 32 hex chars per distinct
document; watermarked mode holds only the fingerprints inside the
lateness horizon — state is proportional to the ingest window, not the
corpus. Near-dup admission on ingest is intentionally NOT offered on a
band key: colliding LSH buckets contain non-duplicates, so keying
dropDuplicates on a band hash would drop legitimate documents — near-dup
dedup stays a (micro-)batch job over admitted documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.functions.text import doc_fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str,
    *,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """First-arrival-wins exact dedup on the canonical-content fingerprint.

    Works on a streaming OR batch DataFrame (the batch path is the
    ``dropDuplicates`` dual, useful for replay backfills through the same
    code path). On a stream with ``ts_col`` set, state is bounded by the
    watermark via ``dropDuplicatesWithinWatermark``.
    """
    out = docs.withColumn(fingerprint_col, doc_fingerprint(F.col(text_col)))
    if docs.isStreaming and ts_col is not None:
        out = out.withColumn(
            ts_col, F.col(ts_col).cast("timestamp_ltz")
        ).withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark([fingerprint_col])
    return out.dropDuplicates([fingerprint_col])
