"""Scoring layer vs numpy oracle: class stats, F-statistic, logreg, metrics.

Fixture mirrors the reference's own unit fixture: seeded synthetic float32
matrix with string classes (reference: tests/test_dataset_type_alias.py:42-45
— 64x8, rng(0), 3 classes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.oracle.pandas_oracle import (
    oracle_class_feature_stats,
    oracle_f_statistic,
    oracle_logreg,
)
from modlyn_spark.scoring.logreg import (
    DistributedLogReg,
    assign_batches,
    assign_batches_pandas,
)
from modlyn_spark.scoring.metrics import classification_report
from modlyn_spark.scoring.stats import class_feature_stats, f_statistic, label_encode

N, D, K = 256, 8, 3


@pytest.fixture(scope="module")
def matrix_pdf():
    rng = np.random.default_rng(0)
    X = rng.random((N, D)).astype(np.float32)
    labels = pd.Series(rng.choice([f"class_{i}" for i in range(K)], size=N))
    # make features informative: shift some features per class
    for i in range(K):
        X[labels.values == f"class_{i}", i] += 0.5 * (i + 1)
    return pd.DataFrame(
        {
            "row_id": np.arange(N),
            "features": [x.tolist() for x in X],
            "label": labels,
        }
    ), X, labels


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("strategy", ["partial", "explode"])
def test_class_feature_stats(spark, matrix_pdf, strategy):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    got = (
        class_feature_stats(df, "label", "features", strategy=strategy)
        .toPandas()
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    exp = oracle_class_feature_stats(X, labels).sort_values(["label", "pos"]).reset_index(drop=True)
    assert (got["label"].values == exp["label"].values).all()
    assert (got["n"].values == exp["n"].values).all()
    assert np.allclose(got["mean"], exp["mean"])
    assert np.allclose(got["var_pop"], exp["var_pop"], atol=1e-9)


def test_f_statistic(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    stats = class_feature_stats(df, "label", "features", strategy="partial")
    got = f_statistic(stats).toPandas().sort_values("pos").reset_index(drop=True)
    exp = oracle_f_statistic(X, labels)
    assert np.allclose(got["f_stat"], exp["f_stat"])
    # shifted features must dominate: top-K by F are exactly 0..K-1
    top = set(got.nlargest(K, "f_stat")["pos"])
    assert top == set(range(K))


def test_label_encode_sklearn_parity(spark, matrix_pdf):
    pdf, _, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    assert classes == sorted(labels.unique())  # LabelEncoder sorts ascending
    got = enc.select("label", "label_idx").distinct().toPandas()
    lut = dict(zip(got["label"], got["label_idx"]))
    assert lut == {c: i for i, c in enumerate(classes)}


def test_batch_assignment_parity(spark, matrix_pdf):
    pdf, _, _ = matrix_pdf
    df = _spark_df(spark, pdf)
    got = (
        assign_batches(df, ["row_id"], 7)
        .select("row_id", "batch_id")
        .toPandas()
        .sort_values("row_id")
    )
    exp = assign_batches_pandas(pdf.sort_values("row_id"), ["row_id"], 7)
    assert (got["batch_id"].values == exp).all()


def test_logreg_allclose_vs_oracle(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    n_batches = 4
    enc = assign_batches(enc, ["row_id"], n_batches)

    model = DistributedLogReg(D, classes, learning_rate=1e-2, weight_decay=1e-2)
    model.fit(enc, max_steps=12, max_epochs=3, n_batches=n_batches)

    order = pdf.sort_values("row_id")
    bids = assign_batches_pandas(order, ["row_id"], n_batches)
    exp_w, exp_losses = oracle_logreg(
        X, labels, bids, lr=1e-2, weight_decay=1e-2, max_steps=12, n_epochs=3
    )
    exp_W = exp_w.pivot(index="label", columns="pos", values="weight").values
    assert np.allclose(model.W, exp_W, rtol=1e-6, atol=1e-9)
    assert np.allclose(model.losses, exp_losses, rtol=1e-6)


def test_logreg_learns_and_reports(spark, matrix_pdf):
    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    enc = assign_batches(enc, ["row_id"], 2)
    model = DistributedLogReg(D, classes, learning_rate=0.5, weight_decay=1e-3)
    model.fit(enc, max_steps=40, max_epochs=20, n_batches=2)
    pred = model.predict_df(enc)
    rep = classification_report(pred, "label_idx", "pred_idx", classes)
    assert rep["accuracy"] > 0.8  # shifted features are easily separable
    assert 0 <= rep["macro_f1"] <= 1
    wdf = model.get_weights()
    assert wdf.shape == (K, D)
    assert wdf.attrs["method_name"] == "modlyn_logreg"
    assert list(wdf.index) == classes


def test_weights_long_roundtrip(spark, matrix_pdf):
    pdf, _, _ = matrix_pdf
    df = _spark_df(spark, pdf)
    classes, enc = label_encode(df, "label")
    enc = assign_batches(enc, ["row_id"], 2)
    model = DistributedLogReg(D, classes).fit(enc, max_steps=2, n_batches=2)
    long = model.weights_long(spark).toPandas()
    assert len(long) == K * D
    wide = long.pivot(index="label", columns="pos", values="weight")
    assert np.allclose(wide.values, model.W)


def test_wilcoxon_vs_oracle(spark, matrix_pdf):
    from modlyn_spark.oracle.pandas_oracle import oracle_wilcoxon
    from modlyn_spark.scoring.stats import wilcoxon_scores

    pdf, X, labels = matrix_pdf
    got = (
        wilcoxon_scores(_spark_df(spark, pdf), "label", "features")
        .toPandas()
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    exp = (
        oracle_wilcoxon(X, labels)
        .sort_values(["label", "pos"])
        .reset_index(drop=True)
    )
    assert got["n1"].tolist() == exp["n1"].tolist()
    assert np.allclose(got["rank_sum"].values, exp["rank_sum"].values)
    assert np.allclose(got["z"].values, exp["z"].values, rtol=1e-9, atol=1e-9)
    # the planted shifts must dominate: class_i's own shifted feature i has
    # the largest positive z among its features
    for i in range(K):
        sub = exp[exp["label"] == f"class_{i}"].set_index("pos")["z"]
        assert sub.idxmax() == i


def test_wilcoxon_vs_scipy(spark, matrix_pdf):
    scipy_stats = pytest.importorskip("scipy.stats")
    from modlyn_spark.oracle.pandas_oracle import oracle_wilcoxon

    pdf, X, labels = matrix_pdf
    exp = oracle_wilcoxon(X, labels)
    for c in ["class_0", "class_2"]:
        for j in [0, D - 1]:
            a = X[(labels == c).to_numpy(), j].astype(np.float64)
            b = X[(labels != c).to_numpy(), j].astype(np.float64)
            # mannwhitneyu z (tie-corrected, no continuity): U1 relates to
            # the rank sum via R = U1 + n1(n1+1)/2
            res = scipy_stats.mannwhitneyu(
                a, b, alternative="two-sided", method="asymptotic",
                use_continuity=False,
            )
            n1, n2 = len(a), len(b)
            mu_u = n1 * n2 / 2.0
            z_scipy = float(
                np.sign(res.statistic - mu_u)
                * scipy_stats.norm.isf(res.pvalue / 2.0)
            )
            z_ours = float(
                exp[(exp["label"] == c) & (exp["pos"] == j)]["z"].iloc[0]
            )
            assert np.isclose(z_ours, z_scipy, rtol=1e-6, atol=1e-8)


def test_compare_scores_three_methods(spark, matrix_pdf):
    """CompareScores over logreg + F-stat + wilcoxon (the reference
    quickstart's method set) through topn_jaccard, vs the pandas oracle."""
    from pyspark.sql import functions as F

    from modlyn_spark.eval.jaccard import topn_jaccard
    from modlyn_spark.oracle.pandas_oracle import oracle_jaccard, oracle_wilcoxon
    from modlyn_spark.scoring.stats import wilcoxon_scores

    pdf, X, labels = matrix_pdf
    df = _spark_df(spark, pdf)
    stats = class_feature_stats(df, "label", "features", strategy="partial")
    m_mean = stats.select(
        F.lit("mean").alias("method"), "label", "pos",
        F.col("mean").alias("score"),
    )
    wil = wilcoxon_scores(df, "label", "features")
    m_wil = wil.select(
        F.lit("wilcoxon").alias("method"), "label", "pos",
        F.col("z").alias("score"),
    )
    m_var = stats.select(
        F.lit("meanvar").alias("method"), "label", "pos",
        (F.col("mean") + F.sqrt("var_pop")).alias("score"),
    )
    got = (
        topn_jaccard(
            m_mean.unionByName(m_wil).unionByName(m_var), [5],
            include_random_baseline=False,
        )
        .toPandas()
        .sort_values(["method1", "method2", "label", "n_top"])
        .reset_index(drop=True)
    )
    # three methods -> three unordered method pairs per label
    assert set(zip(got["method1"], got["method2"])) == {
        ("mean", "meanvar"), ("mean", "wilcoxon"), ("meanvar", "wilcoxon"),
    }
    # oracle check for the mean-vs-wilcoxon pair
    from modlyn_spark.oracle.pandas_oracle import oracle_class_feature_stats

    stats_o = oracle_class_feature_stats(X, labels)
    wil_o = oracle_wilcoxon(X, labels)
    for c in sorted(pd.unique(labels)):
        top_mean = set(
            stats_o[stats_o["label"] == c]
            .assign(a=lambda t: t["mean"].abs())
            .nlargest(5, "a")["pos"]
        )
        top_wil = set(
            wil_o[wil_o["label"] == c]
            .assign(a=lambda t: t["z"].abs())
            .nlargest(5, "a")["pos"]
        )
        exp_j = len(top_mean & top_wil) / len(top_mean | top_wil)
        row = got[
            (got["method1"] == "mean") & (got["method2"] == "wilcoxon")
            & (got["label"] == c)
        ]
        assert np.isclose(row["jaccard"].iloc[0], exp_j)


def test_kmeans_matches_numpy_oracle(spark):
    """Distributed Lloyd's == single-node numpy twin: same init, same
    trajectory (allclose centroids per construction), identical final
    assignments on the real embeddings table; deterministic across
    parallelism (partition-sorted partial combine)."""
    from pyspark.sql import functions as F

    from modlyn_spark.operators.clustering import kmeans_assign, kmeans_fit
    from modlyn_spark.oracle.pandas_oracle import oracle_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    X = np.stack(
        df.orderBy("vec_id").toPandas()["v"].to_numpy()
    ).astype(np.float64)

    ids = df.orderBy("vec_id").toPandas()["vec_id"].to_numpy()
    C, hist = kmeans_fit(df, "v", k=4, max_iter=8, id_col="vec_id")
    C_o, a_o, hist_o = oracle_kmeans(X, 4, max_iter=8, ids=ids)
    assert np.allclose(C, C_o, rtol=1e-9, atol=1e-9)
    assert len(hist) == len(hist_o)
    assert np.allclose(hist, hist_o, rtol=1e-9)
    # inertia must be non-increasing (Lloyd's invariant)
    assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:]))

    got = (
        kmeans_assign(df, "v", C)
        .select("vec_id", "cluster")
        .orderBy("vec_id")
        .toPandas()
    )
    assert (got["cluster"].to_numpy() == a_o).all()


def test_classification_report_df_matches_dict_report(spark, matrix_pdf):
    """Distributed DataFrame report == driver-side dict report (which is
    itself sklearn-parity-tested): per-class precision/recall/F1/support
    plus the accuracy/macro/weighted summary rows."""
    from modlyn_spark.scoring.metrics import classification_report_df

    pdf = matrix_pdf[0].copy()
    rng = np.random.default_rng(7)
    pdf["pred"] = rng.permutation(pdf["label"].to_numpy())  # noisy predictions
    df = spark.createDataFrame(pdf[["label", "pred"]])
    rep = classification_report(df, "label", "pred")
    out = {
        r["label"]: r
        for r in classification_report_df(df, "label", "pred").collect()
    }
    labels = [k for k in rep if not str(k).startswith("__") and k not in
              ("accuracy", "macro_f1", "weighted_f1")]
    for c in labels:
        row = out[str(c)]
        assert row["precision"] == pytest.approx(rep[c]["precision"], abs=1e-12)
        assert row["recall"] == pytest.approx(rep[c]["recall"], abs=1e-12)
        assert row["f1"] == pytest.approx(rep[c]["f1-score"], abs=1e-12)
        assert row["support"] == rep[c]["support"]
    assert out["__accuracy__"]["f1"] == pytest.approx(rep["accuracy"], abs=1e-12)
    assert out["__macro__"]["f1"] == pytest.approx(rep["macro_f1"], abs=1e-12)
    assert out["__weighted__"]["f1"] == pytest.approx(rep["weighted_f1"], abs=1e-12)
    assert out["__macro__"]["support"] == len(pdf)


def test_from_weights_long_roundtrip_predicts(spark, matrix_pdf):
    """from_weights_long(weights_long(...)) reproduces W exactly and the
    rebuilt model (bias 0) predicts argmax(X @ W.T) — the M3 gate path."""
    from modlyn_spark.scoring.logreg import DistributedLogReg

    classes = sorted(matrix_pdf[0]["label"].astype(str).unique())
    m = DistributedLogReg(8, classes)
    rng = np.random.default_rng(3)
    m.W = rng.standard_normal(m.W.shape)
    long = m.weights_long(spark).toPandas()
    m2 = DistributedLogReg.from_weights_long(long)
    assert m2.classes == [str(c) for c in classes]
    np.testing.assert_allclose(m2.W, m.W)
    X = rng.standard_normal((40, 8))
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(40), "features": [list(r) for r in X]})
    )
    got = (
        m2.predict_df(df, "features", "pred_idx")
        .orderBy("id")
        .select("pred_idx")
        .toPandas()["pred_idx"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, np.argmax(X @ m.W.T, axis=1))


def test_from_weights_long_numeric_labels():
    """A numeric label column must not KeyError in the pivot lookup:
    labels normalize to strings ONCE (before class list AND pivot), so
    ordering is string order ("10" < "2") like label_encode's."""
    from modlyn_spark.scoring.logreg import DistributedLogReg

    rng = np.random.default_rng(7)
    W = rng.standard_normal((3, 4))
    long = pd.DataFrame(
        {
            "label": np.repeat([2, 10, 1], 4),  # ints, unsorted
            "pos": np.tile(np.arange(4), 3),
            "weight": W.ravel(),
        }
    )
    m = DistributedLogReg.from_weights_long(long)
    assert m.classes == ["1", "10", "2"]  # string order
    np.testing.assert_allclose(m.W, W[[2, 1, 0]])


def test_kmeans_init_unbiased_on_label_sorted_frame(spark):
    """A label-SORTED table with a small init sample must still seed
    centroids from multiple classes: md5(id)-ordered sampling is storage-
    order-independent, where a bare limit() would return only the first
    class's rows."""
    from modlyn_spark.operators.clustering import _init_centroids

    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 0.1, (200, 4))    # class A centered at 0
    b = rng.normal(10.0, 0.1, (200, 4))   # class B centered at 10
    pdf = pd.DataFrame(
        {
            "id": np.arange(400),
            "v": [list(r) for r in np.vstack([a, b])],  # label-sorted: A then B
        }
    )
    df = spark.createDataFrame(pdf).coalesce(1)  # one partition: worst case
    C = _init_centroids(df, "v", k=8, sample=50, seed=42, id_col="id")
    means = C.mean(axis=1)
    assert (means < 5).any() and (means > 5).any(), (
        "md5-ordered init sampled only one class"
    )
    # the old behavior (no id_col -> limit) demonstrates the bias
    C_biased = _init_centroids(df, "v", k=8, sample=50, seed=42)
    assert (C_biased.mean(axis=1) < 5).all()


def test_kmeans_empty_input_raises_clear_error(spark):
    from modlyn_spark.operators.clustering import kmeans_fit

    empty = spark.createDataFrame([], "id bigint, v array<double>")
    with pytest.raises(ValueError, match="no rows to initialize"):
        kmeans_fit(empty, "v", k=3, id_col="id")


def test_cosine_udf_zero_norm_and_null_guards(spark):
    """Zero-norm vectors score 0.0 (NaN would sort ABOVE every double in a
    desc top-k window); NULL vectors yield NULL (dropped), not a crash."""
    from modlyn_spark.operators.similarity import _cosine_udf
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "i": [0, 1, 2],
            "a": [[1.0, 0.0], [0.0, 0.0], None],
            "b": [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]],
        }
    )
    df = spark.createDataFrame(pdf).select(
        "i", _cosine_udf(F.col("a"), F.col("b")).alias("c")
    )
    out = {r["i"]: r["c"] for r in df.collect()}
    assert out[0] == pytest.approx(1.0)
    assert out[1] == 0.0
    assert out[2] is None
