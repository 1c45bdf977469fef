from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.semdedup import semdedup_prune, spherical_assign


@pytest.fixture(scope="module")
def emb_pdf():
    """60 base vectors + 15 planted half-scale copies (exact duplicates in
    cosine space) + 5 near-copies with a tiny orthogonal-ish wiggle."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 16))
    rows = [{"vec_id": i, "v": X[i].tolist()} for i in range(60)]
    for j in range(15):  # exact-direction dups: cosine == 1.0
        rows.append({"vec_id": 1000 + j, "v": (X[j] * 0.5).tolist()})
    for j in range(5):  # strong near-dups
        w = X[20 + j] + 0.01 * rng.normal(size=16)
        rows.append({"vec_id": 2000 + j, "v": w.tolist()})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def centroids(emb_pdf):
    return np.stack(emb_pdf[emb_pdf.vec_id < 6]["v"].to_numpy())


def brute_min_id(pdf, C, thr):
    X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    a = (Xn @ Cn.T).argmax(axis=1)
    kept = {}
    for i in np.argsort(ids):
        dup = any(
            a[j] == a[i] and ids[j] < ids[i] and Xn[j] @ Xn[i] >= thr
            for j in range(len(ids))
        )
        kept[ids[i]] = not dup
    return a, kept


def test_min_id_matches_bruteforce(spark, emb_pdf, centroids):
    df = spark.createDataFrame(emb_pdf)
    out = (
        semdedup_prune(df, "v", centroids, threshold=0.95)
        .orderBy("vec_id")
        .toPandas()
    )
    a, kept = brute_min_id(emb_pdf, centroids, 0.95)
    exp = pd.DataFrame(
        {"vec_id": sorted(kept), "kept": [kept[i] for i in sorted(kept)]}
    )
    assert out["vec_id"].tolist() == exp["vec_id"].tolist()
    assert out["kept"].tolist() == exp["kept"].tolist()
    ids = emb_pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    assert out["cluster"].tolist() == [int(a[i]) for i in order]


def test_auto_k_centroids_none(spark, emb_pdf):
    """centroids=None auto-sizes k = max(8, n // target_cluster_size) and
    fits kmeans internally: exact-direction planted copies still prune
    (scale-invariance holds whatever the fitted centroids are), and the
    empty-input case raises instead of fitting k-means on nothing."""
    df = spark.createDataFrame(emb_pdf)
    out = semdedup_prune(df, "v", threshold=0.999).toPandas()
    assert len(out) == len(emb_pdf)
    planted = out[(out.vec_id >= 1000) & (out.vec_id < 2000)]
    assert not planted["kept"].any()
    # n=80, target 4096 -> k floors at 8
    assert out["cluster"].nunique() <= 8
    # a small target raises k (n=80, target 10 -> k=8 exactly); with
    # target 5 -> k=16
    out16 = semdedup_prune(
        df, "v", threshold=0.999, target_cluster_size=5
    ).toPandas()
    assert not out16[(out16.vec_id >= 1000) & (out16.vec_id < 2000)][
        "kept"
    ].any()
    with pytest.raises(ValueError, match="empty input"):
        semdedup_prune(df.where("vec_id < 0"), "v")


def test_planted_copies_are_pruned(spark, emb_pdf, centroids):
    df = spark.createDataFrame(emb_pdf)
    out = semdedup_prune(df, "v", centroids, threshold=0.999).toPandas()
    planted = out[(out.vec_id >= 1000) & (out.vec_id < 2000)]
    assert not planted["kept"].any()  # every exact-direction copy dropped
    # and each copy sits in the SAME cluster as its base (scale invariance)
    by_id = out.set_index("vec_id")["cluster"]
    for j in range(15):
        assert by_id[1000 + j] == by_id[j]


def test_parallelism_independent(spark, emb_pdf, centroids):
    df1 = spark.createDataFrame(emb_pdf).repartition(1)
    df7 = spark.createDataFrame(emb_pdf).repartition(7)
    a = semdedup_prune(df1, "v", centroids).orderBy("vec_id").toPandas()
    b = semdedup_prune(df7, "v", centroids).orderBy("vec_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_far_from_centroid_keeps_hardest(spark, emb_pdf, centroids):
    df = spark.createDataFrame(emb_pdf)
    out = (
        semdedup_prune(df, "v", centroids, threshold=0.999, keep="far_from_centroid")
        .toPandas()
        .set_index("vec_id")
    )
    # base j and copy 1000+j have bit-identical centroid_sim; greedy visits
    # the lower id first on ties, so the BASE is kept, the copy dropped
    for j in range(15):
        assert bool(out.loc[j, "kept"]) and not bool(out.loc[1000 + j, "kept"])
    # kept set under the paper rule is maximal-independent: no two kept
    # rows in one cluster are >= thr similar
    kept = out[out.kept]
    X = {i: np.asarray(emb_pdf[emb_pdf.vec_id == i]["v"].iloc[0]) for i in kept.index}
    for i in kept.index:
        for j in kept.index:
            if i < j and kept.loc[i, "cluster"] == kept.loc[j, "cluster"]:
                a, b = X[i], X[j]
                cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                assert cos < 0.999


def test_shard_fan_only_adds_keeps(spark, emb_pdf, centroids):
    df = spark.createDataFrame(emb_pdf)
    k1 = set(
        semdedup_prune(df, "v", centroids).where("kept").toPandas()["vec_id"]
    )
    k4 = set(
        semdedup_prune(df, "v", centroids, shard_fan=4)
        .where("kept")
        .toPandas()["vec_id"]
    )
    assert k1 <= k4  # sharding can only miss pairs, never invent them


def test_matches_duckdb_oracle(spark, emb_pdf, centroids):
    """The exact SQL twin of the min_id rule (the driver-gate shape)."""
    df = spark.createDataFrame(emb_pdf)
    got = (
        semdedup_prune(df, "v", centroids, threshold=0.95)
        .select("vec_id", "cluster", F.round("centroid_sim", 4).alias("sim"), "kept")
        .orderBy("vec_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("emb", emb_pdf)
    cent = pd.DataFrame(
        {"cid": range(len(centroids)), "cv": [c.tolist() for c in centroids]}
    )
    con.register("cent", cent)
    exp = con.sql(
        """
        WITH asg AS (
          SELECT vec_id, v, cid, sim FROM (
            SELECT e.vec_id, e.v, c.cid,
                   list_cosine_similarity(CAST(e.v AS DOUBLE[]),
                                          CAST(c.cv AS DOUBLE[])) AS sim,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(CAST(e.v AS DOUBLE[]),
                                CAST(c.cv AS DOUBLE[])) DESC, c.cid) AS rn
            FROM emb e CROSS JOIN cent c) WHERE rn = 1),
        dropped AS (
          SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
           WHERE list_cosine_similarity(CAST(a.v AS DOUBLE[]),
                                        CAST(b.v AS DOUBLE[])) >= 0.95)
        SELECT vec_id, CAST(cid AS INTEGER) AS cluster, round(sim, 4) AS sim,
               vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
        FROM asg ORDER BY vec_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_composes_with_trained_kmeans_centroids(spark, emb_pdf):
    """Production path: centroids from the distributed Lloyd trainer
    (clustering.kmeans_fit), not a fixed seed set — planted exact-
    direction copies still co-assign and drop."""
    from pyspark.sql import functions as F

    from modlyn_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(emb_pdf).select(
        "vec_id", F.transform("v", lambda x: x.cast("double")).alias("v")
    )
    C, _ = kmeans_fit(df, "v", k=5, max_iter=5, id_col="vec_id")
    out = semdedup_prune(df, "v", C, threshold=0.999).toPandas()
    by_id = out.set_index("vec_id")
    for j in range(15):
        assert by_id.loc[1000 + j, "cluster"] == by_id.loc[j, "cluster"]
        assert not by_id.loc[1000 + j, "kept"] and by_id.loc[j, "kept"]
