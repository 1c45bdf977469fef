"""Event path analysis: transition matrices and top entry paths.

The product-analytics companion to funnels (operators/funnels.py asks
"did the user pass these ordered steps"; this asks "where do users
actually GO"): first-order Markov transition counts/probabilities over
per-entity event streams, and the most common opening paths — the
Sankey-diagram / user-flow primitives.

Physical plan: one window per entity stream (``lead`` over (ts, seq) —
state per task is bounded by an entity's history, the same shape as
sessionization), then a map-side-combinable groupBy on the
(event, next_event) pair; the per-source marginal joins back broadcast
(the event vocabulary is aggregate-sized, never corpus-sized). Top
paths: one ranked window, keep the first ``depth`` events, one groupBy
per entity to assemble the path string, one count groupBy. Nothing
here shuffles more than (entity-keyed stream) + (vocabulary-sized
sides).

Determinism: pass ``seq_col`` to totally order events tied on the
timestamp (same contract as history_features); the terminal event of
each entity emits a transition into ``end_token`` so rows sum to the
per-source visit count (standard absorbing-state bookkeeping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    event_col: str,
    *,
    seq_col: str | None = None,
    end_token: str | None = "__END__",
) -> DataFrame:
    """First-order transition matrix: (event, next_event, n, p) where
    ``p`` = n / total transitions leaving ``event``. ``end_token=None``
    drops terminal transitions instead of absorbing them."""
    order = [F.col(ts_col).asc()] + (
        [F.col(seq_col).asc()] if seq_col else []
    )
    w = Window.partitionBy(entity_col).orderBy(*order)
    nxt = F.lead(F.col(event_col).cast("string")).over(w)
    if end_token is not None:
        nxt = F.coalesce(nxt, F.lit(end_token))
    pairs = (
        df.where(F.col(event_col).isNotNull())
        .select(
            F.col(event_col).cast("string").alias("event"),
            nxt.alias("next_event"),
        )
        .where(F.col("next_event").isNotNull())
        .groupBy("event", "next_event")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("event").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "event")
        .select(
            "event",
            "next_event",
            "n",
            (F.col("n") / F.col("__tot")).alias("p"),
        )
    )


def top_paths(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    event_col: str,
    *,
    depth: int = 3,
    seq_col: str | None = None,
    sep: str = ">",
) -> DataFrame:
    """Count entities by their opening path — the first ``depth`` events
    joined with ``sep`` (shorter histories keep their full path). Output:
    (path, n_entities, path_len), largest first is one orderBy away."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    order = [F.col(ts_col).asc()] + (
        [F.col(seq_col).asc()] if seq_col else []
    )
    w = Window.partitionBy(entity_col).orderBy(*order)
    ranked = (
        df.where(F.col(event_col).isNotNull())
        .select(
            F.col(entity_col).alias("__e"),
            F.col(event_col).cast("string").alias("__ev"),
            F.row_number().over(w).alias("__rn"),
        )
        .where(F.col("__rn") <= depth)
    )
    per_entity = ranked.groupBy("__e").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__rn", "__ev"))
                ),
                lambda s: s["__ev"],
            ),
            sep,
        ).alias("path"),
        F.count("*").alias("path_len"),
    )
    return per_entity.groupBy("path", "path_len").agg(
        F.count("*").alias("n_entities")
    )
