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


# --- interpolated bigram scorer -------------------------------------------


def _bigram_twin(texts, lam=0.75, alpha=1.0, model_texts=None):
    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())  # noqa: E731
    src = model_texts if model_texts is not None else texts
    uni, bi = Counter(), Counter()
    for t in src:
        ws = tok(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    total, vocab = sum(uni.values()), len(uni)
    out = []
    for t in texts:
        ws = tok(t)
        if len(ws) < 2:
            out.append((0, None))
            continue
        lps = []
        for w1, w2 in zip(ws, ws[1:]):
            pb = bi.get((w1, w2), 0) / uni[w1] if uni.get(w1, 0) > 0 else 0.0
            pu = (uni.get(w2, 0) + alpha) / (total + alpha * (vocab + 1))
            lps.append(math.log(lam * pb + (1 - lam) * pu))
        out.append((len(lps), sum(lps) / len(lps)))
    return out


def test_bigram_matches_python_twin(spark):
    from modlyn_spark.operators.lm import bigram_doc_logprob

    texts = [
        "the cat sat on the mat and the cat sat again",
        "the cat sat on the mat",
        "mat the on sat cat the",  # same unigrams, scrambled bigrams
        "zxqv jkwp qqrr zzyy",
        "single",
        "",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_doc_logprob(df, "doc_id", "text").collect()
    }
    exp = _bigram_twin(texts)
    for i, (n, lp) in enumerate(exp):
        assert got[i][0] == n
        if lp is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(lp, rel=1e-12)
    # word order matters at order 2: the scrambled doc scores BELOW its
    # in-order twin even though a unigram model cannot tell them apart
    assert got[2][1] < got[1][1]


def test_bigram_reference_model_handles_unseen(spark):
    from modlyn_spark.operators.lm import (
        bigram_counts,
        bigram_doc_logprob,
        unigram_counts,
    )

    model = ["the cat sat on the mat"] * 3
    probe = ["the cat sat", "purple elephants fly quickly"]
    mdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(model)), "text": model})
    )
    pdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(probe)), "text": probe})
    )
    uni = unigram_counts(mdf, "text")
    bi = bigram_counts(mdf, "text")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_doc_logprob(
            pdf, "doc_id", "text", unigram=uni, bigram=bi
        ).collect()
    }
    exp = _bigram_twin(probe, model_texts=model)
    for i, (n, lp) in enumerate(exp):
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lp, rel=1e-12)
    assert got[1][1] < got[0][1]  # fully unseen text scores lower


def test_bigram_matches_duckdb_on_real_corpus(spark):
    from modlyn_spark.operators.lm import bigram_doc_logprob

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        bigram_doc_logprob(docs, "doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        WITH w AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM '{SF}/documents.parquet'),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM w),
        uni AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                       CAST(count(*) AS DOUBLE) AS vocab FROM uni),
        bg AS (SELECT doc_id, p[1] AS w1, p[2] AS w2
               FROM (SELECT doc_id,
                            unnest(list_zip(toks[1:len(toks) - 1],
                                            toks[2:len(toks)])) AS p
                     FROM w WHERE len(toks) >= 2)),
        bc AS (SELECT w1, w2, count(*) AS bcnt FROM bg GROUP BY 1, 2),
        sc AS (SELECT bg.doc_id,
                      ln(0.75 * (bc.bcnt * 1.0 / u1.cnt)
                         + 0.25 * ((u2.cnt + 1.0)
                                   / (total + 1.0 * (vocab + 1)))) AS lp
               FROM bg
               JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
               JOIN uni u1 ON bg.w1 = u1.token
               JOIN uni u2 ON bg.w2 = u2.token, tot),
        p AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS lp
              FROM sc GROUP BY 1)
        SELECT d.doc_id, CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               p.lp AS avg_logprob
        FROM '{SF}/documents.parquet' d LEFT JOIN p USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    assert got["n_bigrams"].tolist() == exp["n_bigrams"].tolist()
    import numpy as np

    assert np.allclose(got["avg_logprob"], exp["avg_logprob"], rtol=1e-9)


def test_bigram_param_validation(spark):
    from modlyn_spark.operators.lm import bigram_doc_logprob

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a b"]}))
    with pytest.raises(ValueError):
        bigram_doc_logprob(df, "doc_id", "text", lam=1.0)
    with pytest.raises(ValueError):
        bigram_doc_logprob(df, "doc_id", "text", alpha=0.0)
