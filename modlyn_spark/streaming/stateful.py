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
