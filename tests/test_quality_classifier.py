from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.quality_classifier import (
    hashed_ngram_features,
    hashed_ngram_slots,
    score_documents,
    train_text_classifier,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # two disjoint vocabularies -> linearly separable by unigrams
    good = [
        "clear concise prose with structure and meaning " * 3,
        "well formed sentences carry information density",
        "structure meaning clarity prose information",
    ]
    bad = [
        "zzq qqz xjw jwx wxj jxq qxj zqz " * 3,
        "xjw zzq wxj qqz jxq",
        "qxj zqz zzq xjw wxj",
    ]
    rows = [
        {"doc_id": i, "text": t, "label": "good" if i < 3 else "bad"}
        for i, t in enumerate(good + bad)
    ]
    rows.append({"doc_id": 6, "text": None, "label": "good"})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_features_match_numpy_twin(spark, corpus):
    from modlyn_spark.oracle.pandas_oracle import oracle_hashed_features

    pdf = corpus.toPandas().sort_values("doc_id")
    got = (
        hashed_ngram_features(corpus, "text", "doc_id", dim=128)
        .orderBy("doc_id")
        .toPandas()
    )
    X = np.stack(got["features"].to_numpy())
    E = oracle_hashed_features(pdf["text"], 128)
    assert np.array_equal(X, E)  # bit-identical, not just close
    assert X[-1].sum() == 0.0  # NULL text -> zero vector


def test_features_partitioning_independent(spark, corpus):
    a = (
        hashed_ngram_features(corpus.repartition(1), "text", "doc_id", dim=64)
        .orderBy("doc_id")
        .toPandas()
    )
    b = (
        hashed_ngram_features(corpus.repartition(5), "text", "doc_id", dim=64)
        .orderBy("doc_id")
        .toPandas()
    )
    assert all(
        np.array_equal(x, y) for x, y in zip(a["features"], b["features"])
    )


def test_slots_long_form_is_the_pivoted_vector(spark, corpus):
    dense = (
        hashed_ngram_features(corpus, "text", "doc_id", dim=64)
        .orderBy("doc_id")
        .toPandas()
    )
    long = hashed_ngram_slots(corpus, "text", "doc_id", dim=64).toPandas()
    for _, r in dense.iterrows():
        v = np.asarray(r["features"])
        sub = long[long.doc_id == r["doc_id"]]
        assert set(sub["slot"]) == set(np.nonzero(v)[0])
        for _, s in sub.iterrows():
            assert v[int(s["slot"])] == s["tf"]


def test_train_and_score_separable(spark, corpus):
    train = corpus.where("doc_id < 6")
    model = train_text_classifier(
        train, "text", "label", "doc_id", dim=64, max_steps=40, lr=0.5
    )
    scored = (
        score_documents(train, "text", "doc_id", model)
        .orderBy("doc_id")
        .toPandas()
    )
    assert scored["pred"].tolist() == ["good"] * 3 + ["bad"] * 3
    assert (scored["confidence"] > 0.5).all()


def test_score_handles_null_text(spark, corpus):
    model = train_text_classifier(
        corpus.where("doc_id < 6"), "text", "label", "doc_id", dim=64,
        max_steps=10,
    )
    out = score_documents(corpus, "text", "doc_id", model).toPandas()
    assert len(out) == 7 and out["pred"].notna().all()
