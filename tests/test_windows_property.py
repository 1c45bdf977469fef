"""Property-based window-feature testing: random bursty streams must match
the pandas oracle for sessionize and backfill."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modlyn_spark.operators.windows import backfill, sessionize
from modlyn_spark.oracle.pandas_oracle import oracle_backfill, oracle_sessionize

BASE = pd.Timestamp("2024-06-01")


@st.composite
def bursty(draw):
    n_keys = draw(st.integers(1, 4))
    rows = []
    rid = 0
    for ki in range(n_keys):
        t = 0
        for _ in range(draw(st.integers(1, 15))):
            t += draw(st.sampled_from([1, 2, 3, 100, 5000]))
            rows.append(
                {
                    "key": f"k{ki}",
                    "ts": BASE + pd.Timedelta(seconds=t),
                    "value": draw(
                        st.one_of(st.none(), st.floats(-3, 3, allow_nan=False))
                    ),
                    "rid": rid,
                }
            )
            rid += 1
    return pd.DataFrame(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=bursty(), gap=st.sampled_from([10, 99, 1000]))
def test_sessionize_and_backfill_property(spark, data, gap):
    df = spark.createDataFrame(data)
    got_s = (
        sessionize(df, "key", "ts", gap)
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp_s = (
        oracle_sessionize(data, "key", "ts", gap)
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert (got_s["session_id"].values == exp_s["session_id"].values).all()

    got_b = (
        backfill(df, "key", "ts", "value")
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp_b = (
        oracle_backfill(data, "key", "ts", "value")
        .sort_values("rid")
        .reset_index(drop=True)
    )
    g, e = got_b["value_ffill"], exp_b["value_ffill"]
    assert g.isna().equals(e.isna())
    assert np.allclose(g.dropna().astype(float), e.dropna().astype(float))
