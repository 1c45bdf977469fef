"""Future-window label (training-target) generation.

The label-side complement of the as-of join: features must come from
AT-OR-BEFORE the probe timestamp (as-of / history / decay), and labels
must come from a window STRICTLY AFTER it — "did the user purchase
within 7 days", "error count in the next hour", "max latency over the
following day". Computing both sides from the same event stream with
explicit, auditable cutoffs is what makes a training set leakage-free
in BOTH directions (reference context: modlyn scores features against
labels aligned per observation; reference modlyn/models semantics —
here the label itself is derived from the event stream).

Semantics: for a probe at time t, the label window is
(t + gap, t + gap + horizon] by default (``closed='right'``) — the
probe's own instant is excluded, so a probe drawn from the event
stream never labels itself. ``gap`` > 0 models a deployment delay
(the model can't act for ``gap`` seconds, so events inside the gap
are neither features nor labels — the purged-CV embargo applied at
label time).

Physical plan: probes become fixed-length intervals and the engine's
bucketized interval join (operators/ranges.py) attaches in-window
events — with a uniform horizon every probe explodes to at most
ceil(horizon/width)+1 buckets, so replication is a small constant and
both joins are equi-joins on (keys, bucket). One map-side-combinable
groupBy folds events to one label row per distinct probe, and a final
null-safe equi-join puts labels back on every probe row (count-like
labels fill 0; min/max/sum stay NULL when no events landed in the
window). Never a probe x event range fan-out on hot entities beyond
the window's true contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.ranges import interval_join
from modlyn_spark.operators.windows import _epoch

_FNS = ("count", "sum", "min", "max", "nunique", "any")


def future_labels(
    probes: DataFrame,
    events: DataFrame,
    on: str | list[str],
    *,
    probe_ts: str,
    event_ts: str | None = None,
    horizon: float,
    gap: float = 0.0,
    aggs: dict[str, tuple[str, str | None]] | None = None,
    closed: str = "right",
    bucket_width: float | None = None,
) -> DataFrame:
    """All probe columns + one label column per ``aggs`` entry
    ``out_name: (fn, event_col)`` with fn in count | sum | min | max |
    nunique | any (event_col is None for count/any). Default:
    ``{"label_n": ("count", None)}``. ``horizon``/``gap`` are epoch
    seconds. Duplicate probe rows receive identical labels (the fold is
    per distinct probe row). NULL-key or NULL-timestamp probes get the
    no-event labels."""
    keys = [on] if isinstance(on, str) else list(on)
    ets = event_ts or probe_ts
    if horizon <= 0:
        raise ValueError("horizon must be > 0")
    if gap < 0:
        raise ValueError("gap must be >= 0")
    aggs = dict(aggs or {"label_n": ("count", None)})
    for name, (fn, col) in aggs.items():
        if fn not in _FNS:
            raise ValueError(f"unsupported agg fn {fn!r} for {name!r}")
        if fn in ("count", "any"):
            if col is not None:
                raise ValueError(f"{fn} takes no column ({name!r})")
        elif col is None or col not in events.columns:
            raise ValueError(f"{name!r}: event column {col!r} not found")
        if name in probes.columns:
            raise ValueError(f"label {name!r} clashes with a probe column")
    missing = [c for c in keys + [ets] if c not in events.columns]
    if missing:
        raise ValueError(f"events missing columns: {missing}")

    # events travel light: keys + timestamp + only the referenced value
    # columns, renamed out of the probe namespace
    used = sorted({c for _, (f_, c) in aggs.items() if c is not None})
    ev = events.select(
        *keys,
        _epoch(F.col(ets)).alias("__lab_t"),
        *[F.col(c).alias(f"__lab_v_{c}") for c in used],
    )
    # fold per DISTINCT probe row (duplicates re-expand at the join-back
    # with identical labels — and never double-count window events)
    iv = probes.distinct().select(
        *probes.columns,
        (_epoch(F.col(probe_ts)) + F.lit(float(gap))).alias("__lab_lo"),
        (
            _epoch(F.col(probe_ts)) + F.lit(float(gap) + float(horizon))
        ).alias("__lab_hi"),
    )
    joined = interval_join(
        ev,
        iv,
        point_col="__lab_t",
        lo_col="__lab_lo",
        hi_col="__lab_hi",
        on=keys,
        how="inner",
        closed=closed,
        bucket_width=bucket_width
        if bucket_width is not None
        else float(gap) + float(horizon),
    )

    exprs = []
    fill = {}
    for name, (fn, col) in aggs.items():
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias(name))
            fill[name] = F.lit(0).cast("long")
        elif fn == "any":
            exprs.append(F.lit(True).alias(name))
            fill[name] = F.lit(False)
        elif fn == "nunique":
            exprs.append(F.countDistinct(f"__lab_v_{col}").alias(name))
            fill[name] = F.lit(0).cast("long")
        else:
            exprs.append(getattr(F, fn)(f"__lab_v_{col}").alias(name))
            fill[name] = F.lit(None).cast(dict(joined.dtypes)[f"__lab_v_{col}"])
    folded = joined.groupBy(*probes.columns).agg(*exprs)
    if any(fn == "sum" for fn, _ in aggs.values()):
        # sum widens int types; take fill types from the folded schema
        for name, (fn, col) in aggs.items():
            if fn == "sum":
                fill[name] = F.lit(None).cast(dict(folded.dtypes)[name])

    # rename the folded side's key columns before the join-back: folded
    # derives from probes, so same-named Column references are ambiguous
    # self-join lineage
    folded = folded.select(
        *[F.col(c).alias(f"__lab_g_{i}") for i, c in enumerate(probes.columns)],
        *aggs,
    )
    cond = None
    for i, c in enumerate(probes.columns):
        eq = F.col(c).eqNullSafe(F.col(f"__lab_g_{i}"))
        cond = eq if cond is None else cond & eq
    out = probes.join(folded, on=cond, how="left")
    cols = [F.col(c) for c in probes.columns]
    for name in aggs:
        cols.append(F.coalesce(F.col(name), fill[name]).alias(name))
    return out.select(*cols)
