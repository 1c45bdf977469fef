"""mRMR greedy selection (MI relevance + pairwise-MI redundancy): the
re-scored redundancy must demote near-copies that a pure relevance
ranking would take early, and pairwise MI must match a direct
single-node histogram twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.scoring.selection import (
    correlation_matrix,
    mrmr_select,
    mutual_information,
    pairwise_mutual_information,
)


@pytest.fixture(scope="module")
def mrmr_data(spark):
    rng = np.random.default_rng(17)
    n = 600
    y = rng.integers(0, 2, size=n)
    f0 = y + rng.normal(scale=0.3, size=n)  # strong signal
    f1 = f0 + rng.normal(scale=0.05, size=n)  # near-copy of f0
    f2 = 0.6 * y + rng.normal(scale=0.3, size=n)  # independent weaker signal
    f3 = rng.normal(size=n)  # noise
    X = np.stack([f0, f1, f2, f3], axis=1)
    pdf = pd.DataFrame(
        {
            "features": [x.tolist() for x in X],
            "label": [f"c{v}" for v in y],
        }
    )
    df = spark.createDataFrame(pdf)
    mi = mutual_information(df, "features", "label", bins=8)
    pmi = pairwise_mutual_information(df, "features", bins=8)
    return X, df, mi, pmi


def pmi_twin(X, bins):
    """Direct single-node joint-histogram pairwise MI."""
    n, d = X.shape
    mn, mx = X.min(axis=0), X.max(axis=0)
    w = np.where(mx > mn, (mx - mn) / bins, 1.0)
    B = np.clip(np.floor((X - mn) / w).astype(int), 0, bins - 1)
    out = {}
    for i in range(d):
        for j in range(i + 1, d):
            t = np.zeros((bins, bins))
            for r in range(n):
                t[B[r, i], B[r, j]] += 1
            p = t / n
            pi, pj = p.sum(axis=1), p.sum(axis=0)
            mi = 0.0
            for a in range(bins):
                for b in range(bins):
                    if p[a, b] > 0:
                        mi += p[a, b] * np.log(p[a, b] / (pi[a] * pj[b]))
            out[(i, j)] = max(mi, 0.0)
    return out


def test_pairwise_mi_matches_twin(spark, mrmr_data):
    X, _, _, pmi = mrmr_data
    got = pmi.toPandas().sort_values(["f1", "f2"]).reset_index(drop=True)
    exp = pmi_twin(X, 8)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert np.isclose(
            r["mi"], exp[(int(r["f1"]), int(r["f2"]))], rtol=1e-9
        ), (r["f1"], r["f2"])
    # the near-copy pair dominates every other pair's MI
    top = got.loc[got["mi"].idxmax()]
    assert (int(top["f1"]), int(top["f2"])) == (0, 1)


def test_pairwise_mi_parallelism_invariant(spark, mrmr_data):
    _, df, _, pmi = mrmr_data
    p1 = (
        pairwise_mutual_information(df.repartition(1), "features", bins=8)
        .toPandas()
        .sort_values(["f1", "f2"])["mi"]
        .to_numpy()
    )
    p8 = pmi.toPandas().sort_values(["f1", "f2"])["mi"].to_numpy()
    # integer joint counts -> identical MI at any parallelism
    assert np.allclose(p1, p8, rtol=0, atol=0)


def test_mrmr_demotes_redundant_copy(spark, mrmr_data):
    _, _, mi, pmi = mrmr_data
    out = mrmr_select(mi, pmi, 4)
    order = out["pos"].tolist()
    # relevance alone ranks f0, f1 adjacent; MI-redundancy mRMR takes the
    # independent signal f2 second and the near-copy last among signals
    assert order[0] in (0, 1)
    assert order[1] == 2
    assert set(order) == {0, 1, 2, 3}
    copy = 1 if order[0] == 0 else 0
    # the copy's redundancy when finally taken is large (near its own MI)
    red_copy = float(out.loc[out["pos"] == copy, "redundancy"].iloc[0])
    assert red_copy > 0.3


def test_mrmr_matches_manual_greedy(spark, mrmr_data):
    _, _, mi, pmi = mrmr_data
    out = mrmr_select(mi, pmi, 3)
    mp = mi.toPandas().set_index("pos")["mi"]
    cp = pmi.toPandas()
    d = len(mp)
    cm = np.zeros((d, d))
    for f1, f2, c in cp.itertuples(index=False):
        cm[int(f1), int(f2)] = cm[int(f2), int(f1)] = abs(float(c))
    sel, rem = [], list(range(d))
    for _ in range(3):
        scores = [
            (
                mp[p] - (np.mean([cm[p, s] for s in sel]) if sel else 0.0),
                -p,
                p,
            )
            for p in rem
        ]
        p = max(scores)[2]
        sel.append(p)
        rem.remove(p)
    assert out["pos"].tolist() == sel


def test_mrmr_first_pick_is_max_mi(spark, mrmr_data):
    _, _, mi, pmi = mrmr_data
    out = mrmr_select(mi, pmi, 1)
    mp = mi.toPandas()
    assert int(out.iloc[0]["pos"]) == int(mp.loc[mp["mi"].idxmax(), "pos"])
    assert out.iloc[0]["redundancy"] == 0.0


def test_mrmr_corr_redundancy_mode(spark, mrmr_data):
    """correlation_matrix plugs in via red_col='corr' (abs used)."""
    _, df, mi, _ = mrmr_data
    corr = correlation_matrix(df, "features")
    out = mrmr_select(mi, corr, 4, red_col="corr")
    assert set(out["pos"]) == {0, 1, 2, 3}
    assert (out["redundancy"] >= 0).all()


def test_mrmr_n_select_guard(spark, mrmr_data):
    _, _, mi, pmi = mrmr_data
    with pytest.raises(ValueError):
        mrmr_select(mi, pmi, 0)
    assert len(mrmr_select(mi, pmi, 99)) == 4
