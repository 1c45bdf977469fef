"""Fleiss' kappa: the published 14-rater worked example, an
independent numpy twin on ragged data, and the degenerate contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.agreement import (
    category_marginals,
    fleiss_kappa,
)

# the classic equal-n example table (Fleiss 1971 / standard textbook
# worked example): 10 items x 14 raters x 5 categories
CLASSIC = [
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def _ratings_rows(table):
    rows = []
    for item, counts in enumerate(table):
        for cat, n in enumerate(counts):
            for _ in range(n):
                rows.append({"item": f"it_{item}", "label": f"c{cat}"})
    return pd.DataFrame(rows)


def twin_kappa(table):
    """Explicit formula evaluation on an n_ij count matrix."""
    t = np.asarray(table, dtype=float)
    ni = t.sum(axis=1)
    keep = ni >= 2
    t, ni = t[keep], ni[keep]
    if len(t) == 0:
        return None, None, None
    p_i = ((t * (t - 1)).sum(axis=1)) / (ni * (ni - 1))
    p_bar = p_i.mean()
    p_j = t.sum(axis=0) / ni.sum()
    p_e = (p_j**2).sum()
    if p_e >= 1.0:
        return None, p_bar, p_e
    return (p_bar - p_e) / (1 - p_e), p_bar, p_e


def test_classic_example(spark):
    got = fleiss_kappa(
        spark.createDataFrame(_ratings_rows(CLASSIC)), "item", "label"
    ).collect()[0]
    want_k, want_pbar, want_pe = twin_kappa(CLASSIC)
    assert got["kappa"] == pytest.approx(want_k, abs=1e-7)
    assert got["p_bar"] == pytest.approx(want_pbar, abs=1e-7)
    assert got["p_e"] == pytest.approx(want_pe, abs=1e-7)
    # the published headline value
    assert got["kappa"] == pytest.approx(0.210, abs=5e-4)
    assert got["n_items"] == 10
    assert got["n_ratings"] == 140
    assert got["n_categories"] == 5


def test_ragged_raters_vs_twin(spark):
    rng = np.random.default_rng(11)
    table = []
    for _ in range(40):
        n = int(rng.integers(1, 9))  # includes singletons (excluded)
        counts = rng.multinomial(n, [0.4, 0.3, 0.2, 0.1])
        table.append(counts.tolist())
    got = fleiss_kappa(
        spark.createDataFrame(_ratings_rows(table)), "item", "label"
    ).collect()[0]
    want_k, want_pbar, want_pe = twin_kappa(table)
    assert got["kappa"] == pytest.approx(want_k, abs=1e-7)
    assert got["p_bar"] == pytest.approx(want_pbar, abs=1e-7)


def test_perfect_agreement(spark):
    pdf = pd.DataFrame(
        [{"item": f"i{i}", "label": "yes" if i % 2 else "no"}
         for i in range(10) for _ in range(3)]
    )
    got = fleiss_kappa(spark.createDataFrame(pdf), "item", "label").collect()[0]
    assert got["kappa"] == 1.0
    assert got["p_bar"] == 1.0


def test_single_category_is_null(spark):
    pdf = pd.DataFrame(
        [{"item": f"i{i}", "label": "only"} for i in range(5) for _ in range(3)]
    )
    got = fleiss_kappa(spark.createDataFrame(pdf), "item", "label").collect()[0]
    # p_e = 1: agreement is vacuous, kappa undefined
    assert got["kappa"] is None
    assert got["p_e"] == 1.0


def test_singletons_and_nulls_excluded(spark):
    pdf = pd.DataFrame(
        [
            {"item": "a", "label": "x"}, {"item": "a", "label": "x"},
            {"item": "lone", "label": "x"},          # 1 rating: excluded
            {"item": "b", "label": None},            # null rating: dropped
            {"item": "b", "label": "y"},             # -> singleton: excluded
            {"item": None, "label": "x"},            # null item: dropped
        ]
    )
    got = fleiss_kappa(spark.createDataFrame(pdf), "item", "label").collect()[0]
    assert got["n_items"] == 1
    assert got["n_ratings"] == 2


def test_empty_input(spark):
    pdf = pd.DataFrame([{"item": "lone", "label": "x"}])
    got = fleiss_kappa(spark.createDataFrame(pdf), "item", "label").collect()[0]
    assert got["kappa"] is None
    assert got["n_items"] == 0


def test_category_marginals(spark):
    got = (
        category_marginals(
            spark.createDataFrame(_ratings_rows(CLASSIC)), "item", "label"
        )
        .toPandas()
        .set_index("label")
    )
    t = np.asarray(CLASSIC, dtype=float)
    p_j = t.sum(axis=0) / t.sum()
    for j in range(5):
        assert got.loc[f"c{j}", "p_j"] == pytest.approx(p_j[j])
    assert got["p_j"].sum() == pytest.approx(1.0)
