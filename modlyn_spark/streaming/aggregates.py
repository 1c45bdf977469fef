"""Streaming aggregate maintenance: keep a rollup current from a CDC feed.

The streaming closure of ``operators/cdc.py``'s retraction algebra: a
micro-batched changelog (snapshot diffs, Debezium-shaped upsert/delete
feeds normalized to the ``snapshot_diff(include_old=True)`` layout)
maintains a per-group (count, non-null count, sum) table with work
proportional to each BATCH, never to the maintained table's base data.
Spark's native streaming aggregation cannot do this: a raw
``groupBy().sum()`` over an update stream double-counts updated rows
(no retraction without the old value), and complete-mode output
rewrites the whole result every trigger.

Versioned-state design (``foreachBatch``):

- the state lives as ``<state_dir>/v=<batch_id>`` parquet snapshots,
  written through the same Hadoop FileSystem API as
  ``sources/checkpoint.py`` (works on HDFS/S3 paths);
- batch N reads the LATEST VERSION STRICTLY BELOW N and writes v=N —
  so a replayed batch (foreachBatch retries after failure) reads the
  same input state it read the first time and overwrites its own
  output: exactly-once state maintenance from at-least-once batch
  delivery, the checkpoint.py idempotence contract (pytest-pinned);
- the state is group-cardinality-sized; old versions are retained as
  lineage (``prune_agg_versions`` keeps the newest K — never prune the
  latest, it is the resume point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from modlyn_spark.operators.cdc import incremental_agg
from modlyn_spark.sources.checkpoint import _fs_for


def _versions(spark: SparkSession, state_dir: str) -> list[int]:
    fs, jvm = _fs_for(spark, state_dir)
    jdir = jvm.org.apache.hadoop.fs.Path(state_dir)
    if not fs.exists(jdir):
        return []
    out = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def read_agg_state(
    spark: SparkSession,
    state_dir: str,
    *,
    before: int | None = None,
) -> DataFrame | None:
    """The latest maintained state (optionally the latest version
    strictly below ``before`` — the replay-safe read). None if no
    version exists yet."""
    vs = _versions(spark, state_dir)
    if before is not None:
        vs = [v for v in vs if v < before]
    if not vs:
        return None
    return spark.read.parquet(f"{state_dir}/v={vs[-1]}")


def agg_maintainer(
    state_dir: str,
    group_cols: list[str] | str,
    sum_cols: list[str] | str,
    *,
    count_col: str = "n",
    op_col: str = "op",
):
    """The ``foreachBatch`` callable: wire as
    ``changes.writeStream.foreachBatch(agg_maintainer(...)).start()``.

    Each micro-batch must be a valid changelog of the maintained base
    (the snapshot_diff(include_old=True) layout). The very first batch
    bootstraps from an empty state (a pure-insert changelog — e.g.
    ``snapshot_diff(empty, S0)`` — initializes the rollup to
    ``full_agg(S0)``).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    sums = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)

    def step(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        state = read_agg_state(spark, state_dir, before=int(batch_id))
        if state is None:
            # bootstrap: an empty state with the right schema — built from
            # the batch itself (zero rows), so dtypes line up
            from modlyn_spark.operators.cdc import full_agg

            state = full_agg(
                batch.where("1 = 0").select(*groups, *sums), groups, sums,
                count_col=count_col,
            )
        out = incremental_agg(
            state, batch, groups, sums, count_col=count_col, op_col=op_col
        )
        out.write.mode("overwrite").parquet(f"{state_dir}/v={int(batch_id)}")

    return step


def prune_agg_versions(
    spark: SparkSession, state_dir: str, *, keep: int = 3
) -> list[int]:
    """Delete all but the newest ``keep`` state versions (never the
    latest). Returns the versions removed."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    vs = _versions(spark, state_dir)
    drop = vs[:-keep] if len(vs) > keep else []
    fs, jvm = _fs_for(spark, state_dir)
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v={v}"), True)
    return drop
