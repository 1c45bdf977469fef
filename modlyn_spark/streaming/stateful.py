"""Custom stateful streaming operator: incremental last-state tracking.

The batch as-of join answers "latest state at time T" retrospectively; the
streaming dual maintains each entity's latest state incrementally so
arriving feature requests can be served point-in-time without rescanning
history. Implemented with ``applyInPandasWithState`` (Arrow-batched,
per-key state store, watermark-bounded) — the Structured Streaming
extension point for operators the built-ins can't express.

Each micro-batch: for every entity, merge the batch's rows with the stored
(ts, value) state, keep the row with the max ts, emit (key, ts, value,
n_updates_total). State is one row per entity — O(entities) store size.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LAST_STATE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("last_ts", TimestampType()),
        StructField("last_value", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)

# sentinel for "no timestamp observed yet" — INT64_MIN so even
# pre-epoch (negative-us) timestamps compare above it
_NO_TS = -(2**63)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)


def last_state_fn(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold each micro-batch's rows
    for this key into the single-row latest-state record."""
    if state.exists:
        last_ts_us, last_value, n_updates = state.get
    else:
        last_ts_us, last_value, n_updates = _NO_TS, None, 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        n_updates += len(pdf)
        # NaT rows carry no ordering information — skip them (they still
        # count as updates); without this, NaT -> INT64_MIN would poison
        # argmax and a null-only batch would fabricate a timestamp
        pdf = pdf[pdf["ts"].notna()]
        if pdf.empty:
            continue
        ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
        i = int(ts_us.argmax())
        if int(ts_us[i]) >= last_ts_us:
            last_ts_us = int(ts_us[i])
            v = pdf["value"].iloc[i]
            last_value = None if pd.isna(v) else float(v)
    state.update((last_ts_us, last_value, n_updates))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            # while the sentinel is still in place no real timestamp has
            # been observed: emit null, not 1969-12-31T23:59:59.999999
            "last_ts": [
                pd.Timestamp(last_ts_us, unit="us") if last_ts_us != _NO_TS else pd.NaT
            ],
            "last_value": [last_value],
            "n_updates": [n_updates],
        }
    )


def streaming_last_state(events, key: str, ts: str, value: str):
    """events stream -> per-entity latest state, updated each micro-batch.

    Works on a streaming DataFrame; output mode "update". The caller maps
    columns to (key, ts, value) names.
    """
    from pyspark.sql import functions as F

    src = events.select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).cast("timestamp_ltz").alias("ts"),
        F.col(value).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        last_state_fn,
        outputStructType=LAST_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming point-in-time enrichment ---------------------------------------

ENRICH_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("request_id", LongType()),
        StructField("request_ts", TimestampType()),
        StructField("state_ts", TimestampType()),
        StructField("state_value", DoubleType()),
    ]
)

# per-key retained state history: parallel arrays of (ts_us, value)
from pyspark.sql.types import ArrayType  # noqa: E402

_ENRICH_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _asof_enrich_fn(max_history: int):
    """Factory for the applyInPandasWithState update function of
    ``streaming_asof_enrich`` (closure carries the retention cap)."""
    import numpy as np

    def fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_hist, val_hist = state.get
            ts_hist, val_hist = list(ts_hist), list(val_hist)
        else:
            ts_hist, val_hist = [], []
        requests: list[tuple[int, int]] = []  # (request_id, req_ts_us)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf[pdf["ts"].notna()]
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            is_req = pdf["is_request"].to_numpy()
            vals = pdf["value"].to_numpy()
            rids = pdf["request_id"].to_numpy()
            for i in range(len(pdf)):
                if bool(is_req[i]):
                    requests.append((int(rids[i]), int(ts_us[i])))
                else:
                    ts_hist.append(int(ts_us[i]))
                    val_hist.append(
                        None if pd.isna(vals[i]) else float(vals[i])
                    )
        # sort state history once per batch (stable: later arrival of an
        # equal-ts state wins, matching the batch as-of's max-ts tie rule
        # only when values are deduplicated upstream — document)
        if ts_hist:
            order = np.argsort(np.asarray(ts_hist), kind="stable")
            ts_arr = [ts_hist[i] for i in order]
            val_arr = [val_hist[i] for i in order]
        else:
            ts_arr, val_arr = [], []
        # answer THIS batch's requests against the full merged history;
        # truncate only what is carried forward — evicting before
        # answering would null out a request whose preceding state is
        # still in hand this very micro-batch
        if len(ts_arr) > max_history:
            state.update((ts_arr[-max_history:], val_arr[-max_history:]))
        else:
            state.update((ts_arr, val_arr))
        if requests:
            out = {
                "key": [], "request_id": [], "request_ts": [],
                "state_ts": [], "state_value": [],
            }
            ts_np = np.asarray(ts_arr, dtype=np.int64)
            for rid, rts in requests:
                # latest state with ts <= request ts (binary search)
                pos = int(np.searchsorted(ts_np, rts, side="right")) - 1
                out["key"].append(key[0])
                out["request_id"].append(rid)
                out["request_ts"].append(pd.Timestamp(rts, unit="us"))
                if pos >= 0:
                    out["state_ts"].append(pd.Timestamp(ts_np[pos], unit="us"))
                    out["state_value"].append(val_arr[pos])
                else:
                    out["state_ts"].append(pd.NaT)
                    out["state_value"].append(None)
            yield pd.DataFrame(out)

    return fn


def streaming_asof_enrich(
    events,
    requests,
    *,
    key: str,
    event_ts: str,
    value: str,
    request_ts: str,
    request_id: str,
    max_history: int = 10_000,
):
    """Streaming point-in-time enrichment: each request is answered with
    the entity's latest state at the request timestamp — the streaming
    dual of operators.asof.asof_join, serving arriving feature requests
    without rescanning history (the north_star's serving-side story).

    Built by UNIONING the state stream and the request stream (tagged)
    into one keyed stream and folding both through a single
    applyInPandasWithState: per key the function maintains a ts-sorted
    state history (bounded by ``max_history``, oldest evicted) and
    binary-searches each request. Output: (key, request_id, request_ts,
    state_ts, state_value); state_ts/state_value are null when no state
    precedes the request.

    Semantics: exact point-in-time (== the batch as-of join) whenever a
    request's preceding state rows arrive in the same or an earlier
    micro-batch — guaranteed under trigger(availableNow) over a complete
    history, and for live streams whenever ingestion preserves per-entity
    ordering. A state row arriving in a LATER micro-batch than a request
    it should have served cannot retroactively re-emit that request (the
    answer was already appended) — the inherent streaming-vs-batch gap,
    shared with every low-latency serving layer.
    """
    from pyspark.sql import functions as F

    ev = events.select(
        F.col(key).cast("string").alias("key"),
        F.col(event_ts).cast("timestamp_ltz").alias("ts"),
        F.col(value).cast("double").alias("value"),
        F.lit(False).alias("is_request"),
        F.lit(None).cast("long").alias("request_id"),
    )
    req = requests.select(
        F.col(key).cast("string").alias("key"),
        F.col(request_ts).cast("timestamp_ltz").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(True).alias("is_request"),
        F.col(request_id).cast("long").alias("request_id"),
    )
    return ev.unionByName(req).groupBy("key").applyInPandasWithState(
        _asof_enrich_fn(max_history),
        outputStructType=ENRICH_SCHEMA,
        stateStructType=_ENRICH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
