"""Hierarchical OLAP reports: rollup / cube / grouping sets.

The reporting surface over curation and feature tables — per-source ×
per-language quality rollups with subtotal and grand-total rows, corpus
dashboards, drill-down counts — computed in ONE aggregation pass instead
of L separate ``groupBy`` jobs (Spark plans a single ``Expand`` that
replays each row once per grouping set, then one shuffle; L scans would
read the input L times).

These wrap Spark's native ``rollup`` / ``cube`` / ``groupingSets`` and
pin down the two things the raw API leaves dangerous:

- **gid disambiguation.** A rolled-up dimension is emitted as NULL, which
  is indistinguishable from a REAL NULL dimension value. Every report row
  therefore carries ``gid`` (Spark ``grouping_id()``: dim k of n
  contributes bit ``1 << (n-1-k)`` when aggregated away) plus ``level``
  (how many dims are aggregated away: 0 = leaf, n = grand total).
  ``gid`` is verified bit-identical to DuckDB/ANSI ``GROUPING(a, b, ...)``
  (MSB = first dim in both engines — tested, not assumed), so the same
  report is joinable across engines;
- **aggregate hygiene.** Aggregates are passed as an alias→Column dict —
  every output column is named on both engines, the repo-wide oracle
  contract.

Reference context: the reference's pandas ``groupby`` reports
(modlyn/_scoring semantics) have no subtotal surface; this is the
engine-scale generalization mandated by the tier.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(grouped, dims: Sequence[str], aggs: Dict[str, Column]) -> DataFrame:
    n = len(dims)
    out = grouped.agg(
        F.grouping_id().alias("gid"),
        *[c.alias(a) for a, c in aggs.items()],
    )
    level = sum(
        (F.shiftright(F.col("gid"), n - 1 - k) % 2 for k in range(n)),
        F.lit(0),
    )
    return out.select(
        *dims,
        F.col("gid").cast("long").alias("gid"),
        level.cast("int").alias("level"),
        *aggs.keys(),
    )


def rollup_report(
    df: DataFrame, dims: Sequence[str], aggs: Dict[str, Column]
) -> DataFrame:
    """Hierarchical subtotals along the dim prefix chain: leaf rows, then
    (d1, ..., dk) subtotals for every prefix, then the grand total —
    n+1 grouping sets, one pass. Output ``[*dims, gid, level, *aggs]``."""
    dims = list(dims)
    if not dims:
        raise ValueError("dims must be non-empty")
    return _report(df.rollup(*dims), dims, aggs)


def cube_report(
    df: DataFrame, dims: Sequence[str], aggs: Dict[str, Column]
) -> DataFrame:
    """All 2^n dimension subsets in one pass. Keep n small: the Expand
    replays every input row 2^n times (n <= ~4 at 100 TB; for a single
    hierarchy use :func:`rollup_report`, n+1 replays)."""
    dims = list(dims)
    if not dims:
        raise ValueError("dims must be non-empty")
    return _report(df.cube(*dims), dims, aggs)


def grouping_sets_report(
    df: DataFrame,
    dims: Sequence[str],
    sets: Sequence[Sequence[str]],
    aggs: Dict[str, Column],
) -> DataFrame:
    """Explicit grouping sets (each a subset of ``dims``) — the general
    form when neither the prefix chain nor the full powerset is wanted;
    the Expand replays each row len(sets) times."""
    dims = list(dims)
    sets = [list(s) for s in sets]
    for s in sets:
        unknown = set(s) - set(dims)
        if unknown:
            raise ValueError(f"grouping set {s} has non-dims: {sorted(unknown)}")
    grouped = df.groupingSets([[F.col(c) for c in s] for s in sets],
                              *[F.col(d) for d in dims])
    return _report(grouped, dims, aggs)
