"""Product quantization: numpy Lloyd twin for training, exact-encode
planted centroids, ADC brute-force twin, the duplicate-ranks-first
guarantee, partition invariance, and NULL handling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.pq import (
    codebooks_to_df,
    df_to_codebooks,
    pq_encode,
    pq_topk,
    pq_train,
)


def _data(n=600, dim=16, seed=3):
    """Clustered synthetic vectors (so PQ has structure to learn)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, size=(6, dim))
    X = centers[rng.integers(0, 6, n)] + rng.normal(0, 0.15, size=(n, dim))
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "v": [r.tolist() for r in X]}
    )


def _twin_train(X, ids, m, k, *, max_iter=10, sample=4096, seed=42, tol=1e-6):
    """Single-node twin of pq_train: same md5-ordered pool, same rng
    draw sequence, same distance algebra and stopping rule."""
    X = np.asarray(X, dtype=np.float64)
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    order = np.argsort(np.array(keys), kind="stable")
    pool = X[order[:sample]]
    rng = np.random.default_rng(seed)
    k = min(k, len(pool))
    dim = X.shape[1]
    dsub = dim // m
    C = np.empty((m, k, dsub))
    for j in range(m):
        idx = rng.choice(len(pool), size=k, replace=False)
        C[j] = pool[idx, j * dsub : (j + 1) * dsub]
    Xs = X.reshape(len(X), m, dsub)
    history = []
    for _ in range(max_iter):
        inertia = 0.0
        newC = C.copy()
        for j in range(m):
            d = -2.0 * (Xs[:, j] @ C[j].T) + (C[j] * C[j]).sum(axis=1)[None]
            a = d.argmin(axis=1)
            inertia += float(
                (d[np.arange(len(X)), a] + (Xs[:, j] ** 2).sum(axis=1)).sum()
            )
            for c in range(k):
                msk = a == c
                if msk.any():
                    newC[j, c] = Xs[msk, j].mean(axis=0)
        history.append(inertia)
        move = float(np.abs(newC - C).max())
        C = newC
        if move <= tol:
            break
    return C, history


def test_pq_train_matches_twin(spark):
    pdf = _data()
    df = spark.createDataFrame(pdf).repartition(7)
    C, hist = pq_train(
        df, "v", m=4, codebook_size=8, max_iter=5, id_col="vec_id"
    )
    X = np.stack(pdf["v"].to_numpy())
    C2, hist2 = _twin_train(X, pdf["vec_id"].to_numpy(), 4, 8, max_iter=5)
    assert C.shape == (4, 8, 4)
    np.testing.assert_allclose(C, C2, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(hist, hist2, rtol=1e-9)
    assert hist == sorted(hist, reverse=True)  # Lloyd monotone


def test_pq_train_partition_invariance(spark):
    pdf = _data(n=300)
    a = pq_train(
        spark.createDataFrame(pdf).repartition(2),
        "v",
        m=4,
        codebook_size=4,
        max_iter=3,
        id_col="vec_id",
    )[0]
    b = pq_train(
        spark.createDataFrame(pdf).repartition(23),
        "v",
        m=4,
        codebook_size=4,
        max_iter=3,
        id_col="vec_id",
    )[0]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_pq_encode_planted_centroids_and_nulls(spark):
    # vectors exactly equal to concatenated codebook entries encode to
    # those entries; NULL vectors get NULL codes
    rng = np.random.default_rng(5)
    C = rng.normal(0, 1, size=(2, 4, 3))
    rows = []
    for c1 in range(4):
        for c2 in range(4):
            rows.append(
                {
                    "vec_id": c1 * 4 + c2,
                    "v": np.r_[C[0, c1], C[1, c2]].tolist(),
                }
            )
    rows.append({"vec_id": 99, "v": None})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df, "v", C).select("vec_id", "pq_code").collect()
    }
    for c1 in range(4):
        for c2 in range(4):
            assert got[c1 * 4 + c2] == [c1, c2]
    assert got[99] is None


def test_pq_topk_matches_brute_force_twin(spark):
    pdf = _data(n=400, dim=16)
    df = spark.createDataFrame(pdf).repartition(9)
    C, _ = pq_train(
        df, "v", m=4, codebook_size=8, max_iter=4, id_col="vec_id"
    )
    enc = pq_encode(df, "v", C)
    X = np.stack(pdf["v"].to_numpy())
    probes = [(int(i), X[i]) for i in (0, 57, 123)]
    got = (
        pq_topk(enc, probes, C, id_col="vec_id", k=7)
        .orderBy("probe_id", "rank")
        .collect()
    )
    # twin: encode all rows, full ADC matrix, same rounding + ordering
    dsub = 4
    Xs = X.reshape(len(X), 4, dsub)
    codes = np.empty((len(X), 4), dtype=np.int64)
    for j in range(4):
        d = ((Xs[:, j, None, :] - C[j][None]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    for pid, q in probes:
        qs = np.asarray(q).reshape(4, dsub)
        lut = ((qs[:, None, :] - C) ** 2).sum(axis=2)  # (m, k)
        dist = np.round(
            lut[np.arange(4)[None, :], codes].sum(axis=1), 6
        )
        order = np.lexsort((np.arange(len(X)), dist))[:7]
        mine = [r for r in got if r["probe_id"] == pid]
        assert [r["corpus_id"] for r in mine] == [int(i) for i in order]
        assert [r["dist"] for r in mine] == [float(dist[i]) for i in order]
        assert [r["rank"] for r in mine] == list(range(1, 8))


def test_pq_topk_duplicate_ranks_first(spark):
    # ADC dist to an exact duplicate of the probe is the minimum
    # achievable for that probe -> the duplicate is always rank 1
    # (modulo same-code ties, broken by id: give the dup the lowest id)
    pdf = _data(n=200, dim=16, seed=11)
    probe_vec = list(pdf["v"].iloc[150])
    pdf.at[0, "v"] = probe_vec  # dup at vec_id 0
    df = spark.createDataFrame(pdf)
    C, _ = pq_train(
        df, "v", m=4, codebook_size=8, max_iter=4, id_col="vec_id"
    )
    enc = pq_encode(df, "v", C)
    got = (
        pq_topk(enc, [(777, probe_vec)], C, id_col="vec_id", k=3)
        .orderBy("rank")
        .collect()
    )
    assert got[0]["corpus_id"] == 0 and got[0]["rank"] == 1


def test_pq_topk_partition_invariance(spark):
    pdf = _data(n=250, dim=16, seed=9)
    C, _ = pq_train(
        spark.createDataFrame(pdf), "v", m=4, codebook_size=8, max_iter=3,
        id_col="vec_id",
    )
    probes = [(1, list(pdf["v"].iloc[10])), (2, list(pdf["v"].iloc[200]))]
    outs = []
    for parts in (2, 19):
        enc = pq_encode(
            spark.createDataFrame(pdf).repartition(parts), "v", C
        )
        outs.append(
            [
                tuple(r)
                for r in pq_topk(enc, probes, C, id_col="vec_id", k=5)
                .orderBy("probe_id", "rank")
                .collect()
            ]
        )
    assert outs[0] == outs[1]


def test_codebook_roundtrip():
    rng = np.random.default_rng(1)
    C = rng.normal(size=(3, 5, 2))
    np.testing.assert_array_equal(df_to_codebooks(codebooks_to_df(C)), C)


def test_pq_train_null_vectors_skipped_in_init_pool(spark):
    """A NULL vector among the smallest-md5 init rows must be skipped
    (not turn the pool into a ragged object array): training on a frame
    whose nulls are planted everywhere matches training on the same
    frame pre-filtered."""
    pdf = _data(n=120)
    rows = pdf.to_dict("records")
    for i in range(0, 120, 3):  # a third of ids are NULL vectors
        rows[i] = {"vec_id": rows[i]["vec_id"], "v": None}
    df = spark.createDataFrame(pd.DataFrame(rows))
    C, hist = pq_train(
        df, "v", m=4, codebook_size=4, max_iter=3, id_col="vec_id"
    )
    C2, hist2 = pq_train(
        df.where("v IS NOT NULL"),
        "v",
        m=4,
        codebook_size=4,
        max_iter=3,
        id_col="vec_id",
    )
    np.testing.assert_allclose(C, C2, rtol=1e-12)
    np.testing.assert_allclose(hist, hist2, rtol=1e-12)


def test_pq_topk_probe_contract_guard(spark):
    """The probe list ships in the closure by contract; >100k probes
    raises with guidance instead of building a giant LUT tensor."""
    C = np.zeros((2, 2, 2))
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "pq_code": [[0, 0]]})
    )
    probes = [(i, [0.0] * 4) for i in range(100_001)]
    with pytest.raises(ValueError, match="query-sized"):
        pq_topk(corpus, probes, C)


def test_pq_train_dim_mismatch(spark):
    pdf = _data(n=50, dim=15)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(spark.createDataFrame(pdf), "v", m=4, codebook_size=4)
