"""Competence-based curriculum scheduling and per-class data-diet
pruning over difficulty scores.

- Curriculum: Platanios et al., "Competence-based Curriculum Learning
  for Neural Machine Translation" (NAACL 2019) — at training time t of
  T, the model only samples from the easiest ``c(t)`` fraction of the
  corpus, with the square-root competence schedule

      c(t) = min(1, sqrt((1 - c0^2) * t / T + c0^2)),

  so each example has an ENTRY EPOCH: the first t whose competence
  covers its difficulty percentile. Emitting the entry epoch (one row
  per example) instead of the epoch x example membership table keeps
  the plan output linear in the corpus, and the trainer's epoch-t
  filter is ``entry_epoch <= t``.
- Data diet: Paul et al. (NeurIPS 2021) prune: keep the hardest
  ``keep_fraction`` of each class by score (per-class, so the prune
  cannot collapse rare classes — the paper's class-balanced protocol).

These consume the difficulty scores of ``scoring/dynamics.py`` (EL2N,
entropy, margins) — together they are the score -> schedule -> prune
chain of a training-data pipeline.

Physical plans (scale-first):

- ``curriculum_plan`` reuses the exact-histogram rank machinery of
  ``operators/binning.py``: ONE map-side-combinable groupBy(score)
  (shuffle bytes bounded by distinct quantized scores, not rows), rank
  windows over the HISTOGRAM (distinct-value-sized), and a value-keyed
  join back (AQE-broadcast for any realistic score vocabulary). The
  T competence levels are literals, so the entry epoch is a pure
  array expression — no per-epoch pass, no global row sort.
- ``data_diet`` runs the same histogram per (class, score): the prune
  threshold comes from a per-class window over the class's histogram
  rows, never a per-row window — the only data-sized shuffles are the
  histogram aggregate and the broadcast-able join back.

Difficulty percentile is the exact tie-coherent ``rank-below / n``
(every row of a tied score gets the same percentile — the fate of a
tie group is all-in or all-out, deterministically), matching plain
SQL ``count(*) FILTER (below) / n`` for the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.binning import _histogram, _with_ranks


def competence_schedule(epochs: int, c0: float) -> list[float]:
    """The T square-root competence levels c(1..T) as plain floats
    (computed driver-side with ``math.sqrt``; both engines compare
    against the same literals)."""
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if not 0.0 <= c0 <= 1.0:
        raise ValueError("c0 must be in [0, 1]")
    return [
        min(1.0, math.sqrt((1.0 - c0 * c0) * t / epochs + c0 * c0))
        for t in range(1, epochs + 1)
    ]


def curriculum_plan(
    df: DataFrame,
    difficulty_col: str,
    *,
    epochs: int,
    c0: float = 0.1,
    precision: int | None = None,
) -> DataFrame:
    """Append ``difficulty_pct`` (exact fraction of rows strictly
    easier, tie-coherent) and ``entry_epoch`` — the first epoch in
    [1, epochs] whose competence exceeds the percentile (the final
    epoch always has c(T) = 1 > pct, so every scored row enters).

    Rows with a NULL difficulty get NULL percentile/entry (they are
    unscheduled — the caller decides their fate). ``precision`` is the
    histogram quantization for float scores (see binning.py): the
    percentile is then exact for the QUANTIZED score, which is the
    documented contract, not an approximation of the raw one."""
    sched = competence_schedule(epochs, c0)
    ranked = _with_ranks(_histogram(df, difficulty_col, precision))
    pct = (F.col("__a").cast("double") / F.col("__n").cast("double"))
    carr = F.array(*[F.lit(c) for c in sched])
    entry = F.lit(1) + F.size(
        F.filter(carr, lambda c: c <= pct)
    )
    bins = ranked.select(
        "__v",
        pct.alias("difficulty_pct"),
        entry.cast("int").alias("entry_epoch"),
    )
    v = (
        F.round(F.col(difficulty_col), precision)
        if precision is not None
        else F.col(difficulty_col)
    )
    return (
        df.withColumn("__v", v)
        .join(bins, on="__v", how="left")
        .drop("__v")
    )


def data_diet(
    df: DataFrame,
    difficulty_col: str,
    *,
    keep_fraction: float,
    by: str | None = None,
    precision: int | None = None,
    hardest: bool = True,
) -> DataFrame:
    """Keep the hardest (``hardest=False``: easiest) ``keep_fraction``
    of rows — per class when ``by`` is given (the class-balanced
    protocol of Paul 2021), globally otherwise.

    Exact and tie-coherent: a score's whole tie group is kept iff the
    group STARTS inside the quota (fraction-of-rows-kept can therefore
    land under the quota when a tie straddles it — never over by more
    than the tie group). Rows with NULL difficulty (or NULL class when
    ``by`` is set) are dropped. Deterministic at any parallelism."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError("keep_fraction must be in (0, 1]")
    keys = [by] if by else []
    v = (
        F.round(F.col(difficulty_col), precision)
        if precision is not None
        else F.col(difficulty_col)
    )
    data = df.withColumn("__v", v).where(F.col("__v").isNotNull())
    if by:
        data = data.where(F.col(by).isNotNull())
    hist = data.groupBy(*keys, F.col("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    order = F.col("__v").desc() if hardest else F.col("__v").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*keys)
    ranked = (
        hist.withColumn("__cum", F.sum("__c").over(w))
        .withColumn("__a", F.col("__cum") - F.col("__c"))
        .withColumn("__n", F.sum("__c").over(wn))
    )
    kept_vals = ranked.where(
        F.col("__a").cast("double")
        < F.lit(float(keep_fraction)) * F.col("__n").cast("double")
    ).select(*keys, "__v")
    return data.join(kept_vals, on=[*keys, "__v"], how="inner").drop("__v")
