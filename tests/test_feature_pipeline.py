"""Composed training-table pipeline: compaction invariance through the
full composition, age/split/fold columns, twin parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.training_set import FeatureSpec
from modlyn_spark.plans.feature_pipeline import make_training_table


@pytest.fixture(scope="module")
def state(events_pdf):
    s = (
        events_pdf[["key", "ts", "value"]]
        .groupby(["key", "ts"], as_index=False)
        .last()
    )
    # quantize so consecutive-equal states exist for compaction to remove
    s["value"] = s["value"].round(0)
    return s


def _run(spark, probes_pdf, state, compact, **kw):
    specs = [
        FeatureSpec(
            df=spark.createDataFrame(state), ts="ts",
            matched_ts_col="state_ts",
        )
    ]
    return (
        make_training_table(
            spark.createDataFrame(probes_pdf), specs, on="key",
            spine_ts="feature_ts", compact=compact, **kw,
        )
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )


def test_compaction_invariance_end_to_end(spark, probes_pdf, state):
    a = _run(spark, probes_pdf, state, compact=False)
    b = _run(spark, probes_pdf, state, compact=True)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_series_equal(a["value"], b["value"])
    np.testing.assert_allclose(
        a["state_ts_age_sec"].notna(), b["state_ts_age_sec"].notna()
    )
    # ages MAY differ where repeats were dropped (matched row is the
    # earlier change row) — but never by sign, and values never differ
    assert (b["state_ts_age_sec"].dropna() >= 0).all()


def test_split_fold_age_columns(spark, probes_pdf, state):
    mid = probes_pdf["feature_ts"].quantile(0.5)
    out = _run(
        spark, probes_pdf, state, compact=True,
        test_start=F.lit(str(mid)).cast("timestamp"),
        embargo=F.expr("INTERVAL 1 HOUR"),
        n_folds=4, fold_key_cols=["probe_id"],
    )
    assert {"split", "fold", "state_ts_age_sec"} <= set(out.columns)
    assert set(out["split"].unique()) <= {"train", "embargo", "test"}
    assert out["fold"].between(0, 3).all()
    # age is non-negative wherever a state matched (zero temporal leakage)
    assert (out["state_ts_age_sec"].dropna() >= 0).all()
    # split boundaries chronological
    tr = out[out["split"] == "train"]["feature_ts"].max()
    te = out[out["split"] == "test"]["feature_ts"].min()
    assert tr < te
