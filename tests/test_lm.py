"""Unigram LM scorer: python-twin parity, gibberish-scores-lower
property, reference-model scoring of unseen tokens, DuckDB parity on the
real corpus."""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pandas as pd
import pytest

from modlyn_spark.operators.lm import unigram_counts, unigram_doc_logprob

SF = "/root/testdata/sf0.001"


def _twin(texts, alpha=1.0, model_texts=None):
    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())  # noqa: E731
    c = Counter()
    for t in (model_texts if model_texts is not None else texts):
        c.update(tok(t))
    total, vocab = sum(c.values()), len(c)
    out = []
    for t in texts:
        ws = tok(t)
        if not ws:
            out.append((0, None))
            continue
        lps = [
            math.log((c.get(w, 0) + alpha) / (total + alpha * (vocab + 1)))
            for w in ws
        ]
        out.append((len(ws), sum(lps) / len(lps)))
    return out


def test_matches_python_twin_and_flags_gibberish(spark):
    texts = [
        "the cat sat on the mat and the dog sat too",
        "the dog ran to the cat on the mat",
        "zxqv jkwp qqrr zzyy xkcd vvbb",  # gibberish: every token rare
        "",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_doc_logprob(df, "doc_id", "text").collect()
    }
    exp = _twin(texts)
    for i, (n, lp) in enumerate(exp):
        assert got[i][0] == n
        if lp is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(lp, rel=1e-12)
    # the gibberish doc scores strictly below both normal docs
    assert got[2][1] < got[0][1] and got[2][1] < got[1][1]


def test_reference_model_scores_unseen_tokens(spark):
    model = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["aa bb aa cc aa bb"]})
    )
    probe_texts = ["aa bb", "zz zz"]  # zz unseen under the model
    probe = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11], "text": probe_texts})
    )
    counts = unigram_counts(model, "text")
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_doc_logprob(
            probe, "doc_id", "text", counts=counts
        ).collect()
    }
    exp = _twin(probe_texts, model_texts=["aa bb aa cc aa bb"])
    assert got[10] == pytest.approx(exp[0][1], rel=1e-12)
    assert got[11] == pytest.approx(exp[1][1], rel=1e-12)  # unseen mass
    assert got[11] < got[10]


def test_matches_duckdb_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        unigram_doc_logprob(docs, "doc_id", "text")
        .selectExpr("doc_id", "n_tokens", "round(avg_logprob, 6) AS lp")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.sql(
        """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM documents),
        c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                       CAST(count(*) AS DOUBLE) AS vocab FROM c),
        p AS (SELECT doc_id, count(*) AS n_tokens,
                     avg(ln((cnt + 1.0) / (total + 1.0 * (vocab + 1))))
                       AS lp
              FROM tok JOIN c USING (token), tot GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               round(p.lp, 6) AS lp
        FROM documents d LEFT JOIN p USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_alpha_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="alpha"):
        unigram_doc_logprob(df, "doc_id", "text", alpha=0.0)
