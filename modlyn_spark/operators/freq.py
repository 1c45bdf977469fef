"""Heavy hitters: Misra-Gries partition sketches + exact candidate recount.

The naive "top frequent values" plan — ``groupBy(value).count()`` — shuffles
one partial-count row per DISTINCT value per partition. Over web-scale token
/ domain / fingerprint columns the distinct set is billions, so the shuffle
is the bottleneck even though the answer (values above a frequency
threshold) is tiny.

This operator bounds the shuffle by the mathematics of the Misra-Gries
summary instead:

1. **Sketch pass** (Arrow ``mapInPandas``, zero shuffle): each partition
   maintains one MG summary of ``capacity`` counters per group — batch
   variant: merge the batch's exact ``value_counts`` into the summary,
   then if it exceeds capacity subtract the (size-capacity)-th smallest
   weight from every counter and drop the non-positive ones. Classic MG
   accounting: every decrement event lowers >= capacity+1 counters at
   once and total decrements cannot exceed insertions, so each value's
   undercount is <= n_p/(capacity+1) for a partition of n_p rows. A value
   with partition frequency  c_p > n_p/(capacity+1)  therefore SURVIVES
   the partition's summary.
2. **Candidate union**: every partition emits <= capacity rows per group
   (value, weight); the distinct candidate set is <= partitions*capacity
   rows — cluster-sized, not data-sized. Completeness: if a value is
   globally heavy (c >= threshold*n) then by averaging over partitions
   some partition has c_p >= threshold*n_p, and with the default
   ``capacity >= 2/threshold`` that exceeds the survival bound — no
   false negatives, guaranteed, for ANY partitioning of the input.
3. **Exact recount** (the only shuffle): broadcast the candidate set,
   left-semi prune the input, ``groupBy(value).count()`` over survivors
   only — map-side partial aggregation makes the shuffle proportional to
   candidates x partitions, then filter ``count >= threshold * total``.

Because step 3 recounts exactly, the OUTPUT is exact — precisely the
values with frequency >= threshold — so the DuckDB oracle is plain
``GROUP BY ... HAVING`` SQL; the sketch is purely a pruner (same
exact-result-from-approximate-pruning contract as operators/bloom.py).

NULL values are excluded (both engines' ``count(distinct)``/``GROUP BY``
NULL conventions differ; a null token is not a value). Reference context:
modlyn has no frequency surface; this is mandated by the training-data
tier (stop-token discovery, hot-domain routing, skew-key detection for
the salting knobs in operators/dedup.py).
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from modlyn_spark.session import ensure_parallelism


def _mg_shrink(s: pd.Series, capacity: int) -> pd.Series:
    """Batch Misra-Gries decrement: subtract the (size-capacity)-th
    smallest weight from all counters, drop the non-positive."""
    k = len(s) - capacity
    if k <= 0:
        return s
    arr = s.to_numpy()
    d = np.partition(arr, k - 1)[k - 1]
    s = s - d
    return s[s > 0]


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    threshold: float,
    group_by: Optional[Sequence[str]] = None,
    capacity: Optional[int] = None,
) -> DataFrame:
    """Exact set of values of ``col`` with frequency >= ``threshold``
    (fraction of non-null rows), per ``group_by`` group if given.

    Output: ``[*group_by, col, count, total, frac]`` where ``total`` is
    the group's non-null row count and ``frac = round(count/total, 6)``.

    ``capacity`` (default ``max(64, ceil(2/threshold))``) is the MG
    summary size per (partition, group); it must be ``>= 2/threshold``
    for the no-false-negative guarantee (enforced). Grouped mode keeps
    one summary per group per partition — intended for LOW-cardinality
    groups (language, source); for high-cardinality groups use the plain
    grouped count (the sketch would not prune).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    m = capacity if capacity is not None else max(64, math.ceil(2.0 / threshold))
    if m < 2.0 / threshold:
        raise ValueError(
            f"capacity={m} breaks the completeness guarantee; "
            f"need >= 2/threshold = {2.0 / threshold:.1f}"
        )
    groups = list(group_by) if group_by else []
    src = df.select(*groups, col).where(F.col(col).isNotNull())
    src = ensure_parallelism(src)

    in_fields = {f.name: f.dataType for f in src.schema.fields}
    sketch_schema = T.StructType(
        [T.StructField(g, in_fields[g]) for g in groups]
        + [T.StructField(col, in_fields[col]),
           T.StructField("__w", T.LongType())]
    )

    def _sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}
        for pdf in batches:
            if groups:
                it = pdf.groupby(groups, dropna=False, sort=False)[col]
            else:
                it = [((), pdf[col])]
            for key, vals in it:
                key = key if isinstance(key, tuple) else (key,)
                vc = vals.value_counts()  # drops nulls
                if vc.empty:
                    continue
                s = summaries.get(key)
                s = vc if s is None else s.add(vc, fill_value=0)
                summaries[key] = _mg_shrink(s, m)
        for key, s in summaries.items():
            out = pd.DataFrame({col: s.index.to_numpy(),
                                "__w": s.to_numpy().astype(np.int64)})
            for g, v in zip(groups, key):
                out[g] = v
            yield out[[*groups, col, "__w"]]

    candidates = (
        src.mapInPandas(_sketch, schema=sketch_schema)
        .select(*groups, col)
        .distinct()
    )

    counts = (
        src.join(F.broadcast(candidates), on=[*groups, col], how="left_semi")
        .groupBy(*groups, col)
        .count()
    )
    if groups:
        totals = src.groupBy(*groups).agg(F.count(F.lit(1)).alias("total"))
        joined = counts.join(F.broadcast(totals), on=groups)
    else:
        totals = src.agg(F.count(F.lit(1)).alias("total"))
        joined = counts.crossJoin(F.broadcast(totals))
    return (
        joined.where(
            F.col("count").cast("double") >= F.lit(threshold) * F.col("total")
        )
        .select(
            *groups,
            col,
            F.col("count"),
            F.col("total"),
            F.round(F.col("count") / F.col("total"), 6).alias("frac"),
        )
    )
