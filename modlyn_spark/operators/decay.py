"""Point-in-time exponentially-decayed feature counters.

The third leg of the feature-store alignment family (with the as-of
join's "latest state" and history_features' "last-N events"): for every
probe row (entity, feature_ts) attach half-life-decayed sums/counts of
the entity's PAST events — "purchases decayed with a 7-day half-life",
"error rate decayed hourly" — with the same zero-temporal-leakage
contract as the as-of join (reference context: modlyn aligns each
observation to prior state before scoring; reference modlyn/models
semantics — here the aligned state is an exponentially-weighted sum
rather than a single row).

Semantics (bucket-discretized decay — the streaming-counter contract):
time is divided into fixed buckets of width ``bucket`` (default: the
half-life). A probe at time t in bucket p sees every event in the
``window_buckets`` COMPLETE buckets strictly before p, each event
weighted ``0.5 ** ((t - t_e) / half_life)``; events in the probe's own
(incomplete) bucket are excluded — they are "not yet materialized", so
a probe drawn from the event stream can never see its own event (the
label-safe property, analogous to history_features'
allow_exact_matches=False). Events older than the window contribute
weight <= 0.5**window_buckets (~1e-6 at the default 20) and are
excluded by definition rather than approximated.

Physical plan — the factorization that makes this O(events + probes)
instead of O(probes x events):

    sum_e v_e * 0.5^((t - t_e)/hl)
  = 0.5^((t - pB)/hl)                      .. probe-only factor
    * sum_{j=1..W} 0.5^((j-1)B/hl)         .. bucket-offset factor
      * sum_{e in bucket p-j} v_e * 0.5^(((p-j+1)B - t_e)/hl)
                                           .. per-bucket PARTIAL

1. ONE map-side-combinable groupBy over events builds the per-
   (entity, bucket) partials (weights in [0.5^(B/hl), 1) — no overflow
   ever, unlike a global-epoch factorization).
2. The DISTINCT (entity, probe-bucket) pairs — never the probe rows —
   explode x window_buckets and equi-join the partials, then one
   groupBy builds the per-(entity, bucket) decayed STATE.
3. Probes equi-join the state on (entity, bucket) and apply the pure
   probe-only factor. No row ever fans out by event density; a hot
   entity with 10^9 events in a bucket still contributes ONE partial
   row, and every join is an equi-join AQE can plan.

The naive alternative — range-join probes to all in-window events —
replicates hot entities' events per probe and is exactly the shape
that melts at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.operators.windows import _epoch


def decayed_features(
    probes: DataFrame,
    events: DataFrame,
    on: str | list[str],
    *,
    probe_ts: str,
    event_ts: str | None = None,
    value_cols: list[str] | str = (),
    half_life: float,
    bucket: float | None = None,
    window_buckets: int = 20,
    out_prefix: str = "decay_",
    count_col: str = "decay_n",
) -> DataFrame:
    """All probe columns + ``count_col`` (decayed event count: sum of
    weights over in-window past events) + ``<out_prefix><col>`` (decayed
    sum of each value column; NULL values contribute to the count but
    not the sum). Probes whose entity has no in-window events get 0.0;
    probes with a NULL timestamp or key get NULL.

    ``half_life`` and ``bucket`` are in epoch seconds (timestamp
    columns are converted; numeric columns pass through)."""
    keys = [on] if isinstance(on, str) else list(on)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    ets = event_ts or probe_ts
    if half_life <= 0:
        raise ValueError("half_life must be > 0")
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    missing = [c for c in keys + [ets] + vals if c not in events.columns]
    if missing:
        raise ValueError(f"events missing columns: {missing}")
    clash = [c for c in probes.columns if c.startswith("__decay")]
    if clash:
        raise ValueError(f"probe columns clash with internals: {clash}")
    hl = float(half_life)
    bw = float(bucket) if bucket is not None else hl

    # 1. per-(entity, event-bucket) partials; weight anchors at the
    # bucket END so exponents stay in [-bw/hl, 0] regardless of epoch
    te = _epoch(F.col(ets))
    eb = F.floor(te / F.lit(bw))
    w = F.pow(F.lit(0.5), ((eb + 1) * F.lit(bw) - te) / F.lit(hl))
    cond = F.col(ets).isNotNull()
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    aggs = [F.sum(w).alias("__decay_pn")]
    for c in vals:
        aggs.append(
            F.sum(
                F.when(F.col(c).isNotNull(), F.col(c) * w)
            ).alias(f"__decay_p_{c}")
        )
    partials = (
        events.where(cond)
        .groupBy(*keys, eb.cast("long").alias("__decay_b"))
        .agg(*aggs)
    )

    # 2. decayed STATE at each distinct (entity, probe-bucket): explode
    # the window offsets (a constant), equi-join partials, fold with the
    # bucket-offset factor 0.5^((j-1) * bw / hl)
    tp = _epoch(F.col(probe_ts))
    pb = F.floor(tp / F.lit(bw)).cast("long")
    pcond = F.col(probe_ts).isNotNull()
    for k in keys:
        pcond = pcond & F.col(k).isNotNull()
    pkeys = (
        probes.where(pcond)
        .select(*keys, pb.alias("__decay_pb"))
        .distinct()
    )
    offs = F.explode(
        F.sequence(F.lit(1), F.lit(int(window_buckets)))
    ).alias("__decay_j")
    cand = pkeys.select(*keys, "__decay_pb", offs).withColumn(
        "__decay_b", F.col("__decay_pb") - F.col("__decay_j")
    )
    jfac = F.pow(
        F.lit(0.5),
        (F.col("__decay_j") - 1) * F.lit(bw) / F.lit(hl),
    )
    st_aggs = [F.sum(F.col("__decay_pn") * jfac).alias("__decay_sn")]
    for c in vals:
        st_aggs.append(
            F.sum(F.col(f"__decay_p_{c}") * jfac).alias(f"__decay_s_{c}")
        )
    state = (
        cand.join(partials, on=keys + ["__decay_b"], how="inner")
        .groupBy(*keys, "__decay_pb")
        .agg(*st_aggs)
    )

    # 3. one equi-join back to the probes + the pure probe-only factor
    # 0.5^((t - pB) / hl); exponent in [0, bw/hl] — no overflow
    out = probes.withColumn("__decay_pb", pb).join(
        state, on=keys + ["__decay_pb"], how="left"
    )
    pfac = F.pow(
        F.lit(0.5),
        (_epoch(F.col(probe_ts)) - F.col("__decay_pb") * F.lit(bw))
        / F.lit(hl),
    )
    key_ok = F.col(probe_ts).isNotNull()
    for k in keys:
        key_ok = key_ok & F.col(k).isNotNull()
    cols = list(probes.columns)
    cols.append(
        F.when(
            key_ok, F.coalesce(pfac * F.col("__decay_sn"), F.lit(0.0))
        ).alias(count_col)
    )
    for c in vals:
        cols.append(
            F.when(
                key_ok,
                F.coalesce(pfac * F.col(f"__decay_s_{c}"), F.lit(0.0)),
            ).alias(f"{out_prefix}{c}")
        )
    return out.select(*cols)
