"""Streaming CUSUM: the batch changepoint detector as incremental state.

The batch operator (operators/changepoints.py) computes Page's CUSUM as
prefix-sum-minus-running-extremum window algebra. Its streaming dual
carries exactly that algebra as per-key state — (S_up, min S_up, S_dn,
max S_dn) — folded over each micro-batch with ``applyInPandasWithState``
(Arrow-batched, per-key state store): four doubles per entity, O(1)
per row, O(entities) store size. Replaying the same rows through any
micro-batch slicing yields bit-identical statistics to the batch
closed form (pytest-pinned), because the fold IS the recurrence.

Ordering contract: CUSUM is order-defined. Rows are processed in
(order_col, value) order WITHIN each micro-batch, and batches are
assumed per-key in-order ACROSS batches (the source's watermark
discipline). A row older than the key's high-water mark would silently
corrupt the statistic, so it is DROPPED and counted in ``n_late`` —
the honest option available without replaying history (the batch
operator is the replay).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("order_val", LongType()),
        StructField("value", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("is_alarm", BooleanType()),
        StructField("n_late", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("s_up", DoubleType()),
        StructField("min_s_up", DoubleType()),
        StructField("s_dn", DoubleType()),
        StructField("max_s_dn", DoubleType()),
        StructField("hwm", LongType()),
        StructField("n_late", LongType()),
    ]
)

_NO_HWM = -(2**63)


def make_cusum_fn(
    target: float, slack: float, threshold: float
):
    """Build the applyInPandasWithState update function for fixed
    detector parameters (they ship in the closure, like the batch
    operator's literals)."""
    if slack < 0 or threshold <= 0:
        raise ValueError("slack must be >= 0 and threshold > 0")
    mu0, k, h = float(target), float(slack), float(threshold)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_up, min_s_up, s_dn, max_s_dn, hwm, n_late = state.get
        else:
            # the virtual S_0 = 0 of the closed form: extrema include 0
            s_up, min_s_up, s_dn, max_s_dn, hwm, n_late = (
                0.0, 0.0, 0.0, 0.0, _NO_HWM, 0
            )
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                ["order_val", "value"], kind="mergesort"
            )
            for ov, val in zip(pdf["order_val"], pdf["value"]):
                ov = int(ov)
                if ov < hwm:
                    n_late += 1
                    continue
                hwm = ov
                dev = 0.0 if pd.isna(val) else float(val) - mu0
                s_up += dev - k
                s_dn += dev + k
                min_s_up = min(min_s_up, s_up)
                max_s_dn = max(max_s_dn, s_dn)
                c_pos = s_up - min_s_up
                c_neg = max_s_dn - s_dn
                out.append(
                    (
                        key[0],
                        ov,
                        None if pd.isna(val) else float(val),
                        c_pos,
                        c_neg,
                        (not pd.isna(val))
                        and (c_pos > h or c_neg > h),
                        n_late,
                    )
                )
        state.update((s_up, min_s_up, s_dn, max_s_dn, hwm, n_late))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in CUSUM_SCHEMA])

    return fn


def stream_cusum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    *,
    target: float = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Wire the stateful CUSUM over a (streaming or batch-replay)
    DataFrame. ``order_col`` must be castable to long (an event id or
    epoch micros); emits one scored row per accepted input row."""
    from pyspark.sql import functions as F

    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).cast("long").alias("order_val"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        make_cusum_fn(target, slack, threshold),
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
