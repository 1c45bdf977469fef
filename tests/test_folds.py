"""time_folds: purged temporal k-fold — coverage, contiguity, embargo
holes, and the exact-percentile boundary contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.folds import time_folds


@pytest.fixture(scope="module")
def df(spark):
    ts = pd.to_datetime(np.arange(0, 1000) * 60, unit="s")
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(1000), "ts": ts})
    )


def test_shape_and_roles(df):
    out = time_folds(df, "ts", n_folds=5).toPandas()
    assert len(out) == 5000
    assert set(out["role"]) <= {"test", "train", "purged"}
    # every row is test in exactly one fold
    per_row = out[out.role == "test"].groupby("id").size()
    assert (per_row == 1).all() and len(per_row) == 1000


def test_test_ranges_are_contiguous_and_ordered(df):
    out = time_folds(df, "ts", n_folds=4).toPandas()
    t = out[out.role == "test"].groupby("fold")["id"]
    lo, hi = t.min(), t.max()
    # contiguous: each fold's test ids form an unbroken range
    assert ((hi - lo + 1) == t.size()).all()
    # ordered: fold k's range ends before fold k+1's begins
    assert (hi.sort_index().values[:-1] < lo.sort_index().values[1:]).all()


def test_embargo_purges_only_adjacent_rows(df):
    emb = 600.0  # 10 rows at 60s spacing
    out = time_folds(df, "ts", n_folds=5, embargo=emb).toPandas()
    for k, grp in out.groupby("fold"):
        test_ids = set(grp[grp.role == "test"]["id"])
        purged = set(grp[grp.role == "purged"]["id"])
        lo, hi = min(test_ids), max(test_ids)
        expect = {
            i for i in range(lo - 10, hi + 11) if 0 <= i < 1000
        } - test_ids
        assert purged == expect, k
    # no embargo -> no purged rows at all
    none = time_folds(df, "ts", n_folds=5).toPandas()
    assert (none.role != "purged").all()


def test_null_ts_dropped(spark):
    pdf = pd.DataFrame(
        {"id": [0, 1, 2], "t": [1.0, None, 3.0]}
    )
    out = time_folds(
        spark.createDataFrame(pdf), "t", n_folds=2
    ).toPandas()
    assert set(out["id"]) == {0, 2}


def test_validation(df):
    with pytest.raises(ValueError, match="n_folds"):
        time_folds(df, "ts", n_folds=1)
    with pytest.raises(ValueError, match="embargo"):
        time_folds(df, "ts", n_folds=2, embargo=-1.0)
    with pytest.raises(ValueError, match="clashes"):
        time_folds(
            df.withColumnRenamed("id", "fold"), "ts", n_folds=2
        )
