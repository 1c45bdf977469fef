from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.retrieval import bm25_topk, build_index, tfidf_vectors

SF = "/root/testdata/sf0.001"


def _twin_bm25(doc_texts, query_texts, k=10, k1=1.2, b=0.75):
    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())  # noqa: E731
    docs = {i: tok(t) for i, t in enumerate(doc_texts)}
    N = len(docs)
    dl = {i: len(ws) for i, ws in docs.items()}
    avgdl = sum(dl.values()) / N
    df = Counter()
    tf = {}
    for i, ws in docs.items():
        c = Counter(ws)
        tf[i] = c
        df.update(c.keys())
    out = {}
    for qi, qt in enumerate(query_texts):
        scores = Counter()
        for t in set(tok(qt)):
            if t not in df:
                continue
            idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
            for i in docs:
                f = tf[i].get(t, 0)
                if f:
                    scores[i] += (
                        idf * f * (k1 + 1)
                        / (f + k1 * (1 - b + b * dl[i] / avgdl))
                    )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qi] = ranked
    return out


@pytest.fixture(scope="module")
def corpus_texts():
    return [
        "the quick brown fox jumps over the lazy dog",
        "a quick brown cat sits on the warm mat",
        "foxes and dogs are common household animals",
        "completely unrelated text about numerical linear algebra",
        "the dog barks at the quick fox every single day",
    ]


def test_matches_python_twin(spark, corpus_texts):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(corpus_texts)), "text": corpus_texts})
    )
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "qtext": [
            "quick fox", "household animals", "zzz unseen terms only"
        ]}
    )
    p, d, s = build_index(docs)
    got = (
        bm25_topk(spark.createDataFrame(queries), p, d, s, k=3)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    exp = _twin_bm25(corpus_texts, queries["qtext"].tolist(), k=3)
    for qi, ranked in exp.items():
        sub = got[got.query_id == qi].reset_index(drop=True)
        assert sub["doc_id"].tolist() == [i for i, _ in ranked]
        assert np.allclose(
            sub["score"], [sc for _, sc in ranked], rtol=1e-12
        )
    assert (got[got.query_id == 2]).empty  # unseen-only query: no hits


def test_max_df_cap_drops_stop_postings_auditable(spark, corpus_texts):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(corpus_texts)), "text": corpus_texts})
    )
    p, d, s = build_index(docs, max_df_frac=0.5)
    dropped = d.where("dropped").toPandas()["token"].tolist()
    assert "the" in dropped  # appears in 4/5 docs
    assert not p.join(
        d.where("dropped"), "token", "left_semi"
    ).count()  # no dropped token keeps postings


def test_matches_duckdb_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = docs.where("doc_id % 100 = 7").selectExpr(
        "doc_id AS query_id",
        # probe with each doc's first ~6 words
        "array_join(slice(split(lower(text), ' '), 1, 6), ' ') AS qtext",
    )
    p, d, s = build_index(docs)
    got = (
        bm25_topk(queries, p, d, s, k=5)
        .selectExpr("query_id", "doc_id", "round(score, 6) AS score", "rank")
        .orderBy("query_id", "rank")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS token
          FROM '{SF}/documents.parquet'),
        post AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM post GROUP BY 1),
        dfr AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
        st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        q AS (SELECT doc_id AS query_id,
                     array_to_string(
                         (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:6],
                         ' ') AS qtext
              FROM '{SF}/documents.parquet' WHERE doc_id % 100 = 7),
        qt AS (SELECT DISTINCT query_id,
                      unnest(regexp_extract_all(qtext, '[a-z0-9]+')) AS token
               FROM q),
        sc AS (SELECT qt.query_id, post.doc_id,
                      sum(ln(1 + (n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
                          * post.tf * 2.2
                          / (post.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)))
                          AS score
               FROM qt JOIN post USING (token)
                       JOIN dfr USING (token)
                       JOIN dl ON post.doc_id = dl.doc_id, st
               GROUP BY 1, 2)
        SELECT query_id, doc_id, round(score, 6) AS score, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id) AS rank
          FROM sc)
        WHERE rank <= 5 ORDER BY query_id, rank
        """
    ).df()
    # NOTE: the spark probe uses split-on-space for qtext while the SQL
    # tokenizes — both yield the same first-6-words on this corpus (single
    # 0x20 separators); rank/doc sets must agree exactly
    assert got["query_id"].tolist() == exp["query_id"].tolist()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert np.allclose(got["score"], exp["score"], rtol=1e-9)


def test_self_retrieval_sanity(spark, corpus_texts):
    """Each full document used as its own query retrieves itself first."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(corpus_texts)), "text": corpus_texts})
    )
    queries = docs.selectExpr("doc_id AS query_id", "text AS qtext")
    p, d, s = build_index(docs)
    top1 = (
        bm25_topk(queries, p, d, s, k=1).where("rank = 1").toPandas()
    )
    assert (top1["query_id"] == top1["doc_id"]).all()


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def _run_df(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "doc_id", "rank"])
    )


def test_rrf_matches_hand_computation(spark):
    from modlyn_spark.operators.retrieval import rrf_fuse

    r1 = _run_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    r2 = _run_df(spark, [(1, 11, 1), (1, 13, 2)])
    out = (
        rrf_fuse([r1, r2], k0=60.0)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    import numpy as np

    np.testing.assert_allclose(out.loc[10, "rrf"], 1 / 61)
    np.testing.assert_allclose(out.loc[11, "rrf"], 1 / 62 + 1 / 61)
    np.testing.assert_allclose(out.loc[13, "rrf"], 1 / 62)
    # doc in both runs outranks single-run docs at comparable ranks
    assert out.loc[11, "rank"] == 1
    assert list(out.sort_values("rank").index) == [11, 10, 13, 12]


def test_rrf_weights_and_topk(spark):
    from modlyn_spark.operators.retrieval import rrf_fuse

    r1 = _run_df(spark, [(1, 10, 1), (1, 11, 2)])
    r2 = _run_df(spark, [(1, 11, 1), (1, 10, 2)])
    # symmetric ranks, asymmetric weights: run2's winner must win
    out = rrf_fuse([r1, r2], weights=[1.0, 3.0]).toPandas()
    top = out[out["rank"] == 1]["doc_id"].iloc[0]
    assert top == 11
    trunc = rrf_fuse([r1, r2], k=1).toPandas()
    assert len(trunc) == 1
    # equal fused scores (symmetric ranks, equal weights): doc asc wins
    assert trunc["doc_id"].iloc[0] == 10


def test_rrf_validation(spark):
    import pytest as _pytest

    from modlyn_spark.operators.retrieval import rrf_fuse

    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="weights"):
        rrf_fuse([_run_df(spark, [(1, 1, 1)])], weights=[1.0, 2.0])


def test_rrf_hybrid_over_bm25_reformulations(spark):
    """Fusing two query reformulations of the same info need must keep
    the gold doc at rank 1 when both runs retrieve it first."""
    import pandas as pd

    from modlyn_spark.operators.retrieval import bm25_topk, build_index, tfidf_vectors, rrf_fuse

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "sparse retrieval with inverted index structures",
                    "dense vector search embeddings",
                    "cooking pasta with tomato sauce",
                    "index structures for search retrieval",
                ],
            }
        )
    )
    p, d, s = build_index(docs)
    q1 = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "qtext": ["retrieval index"]})
    )
    q2 = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "qtext": ["search index structures"]})
    )
    fused = rrf_fuse(
        [bm25_topk(q1, p, d, s, k=3), bm25_topk(q2, p, d, s, k=3)]
    ).toPandas()
    assert fused[fused["rank"] == 1]["doc_id"].iloc[0] in (0, 3)
    assert set(fused["doc_id"]) <= {0, 1, 3}


# --- TF-IDF -----------------------------------------------------------------


def _sk_tfidf(pdf, min_df=1):
    """Independent sklearn-semantics twin (raw-count tf, smooth idf, l2)."""
    import re
    from collections import Counter

    docs = {r.doc_id: Counter(re.findall(r"[a-z0-9]+", r.text.lower()))
            for r in pdf.itertuples()}
    docs = {k: v for k, v in docs.items() if v}
    n = len(docs)
    df = Counter(t for c in docs.values() for t in c)
    out = {}
    for d, c in docs.items():
        vec = {
            t: tf * (np.log((1 + n) / (1 + df[t])) + 1)
            for t, tf in c.items() if df[t] >= min_df
        }
        norm = np.sqrt(sum(v * v for v in vec.values()))
        out[d] = {t: v / norm for t, v in vec.items()}
    return out


def test_tfidf_matches_twin_and_is_unit_norm(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    got = tfidf_vectors(docs).collect()
    exp = _sk_tfidf(docs.select("doc_id", "text").toPandas())
    assert len(got) == sum(len(v) for v in exp.values())
    for r in got:
        assert r["tfidf"] == pytest.approx(exp[r["doc_id"]][r["token"]]), (
            r["doc_id"], r["token"])
    norms = {}
    for r in got:
        norms[r["doc_id"]] = norms.get(r["doc_id"], 0.0) + r["tfidf"] ** 2
    assert all(abs(v - 1.0) < 1e-9 for v in norms.values())


def test_tfidf_min_df_and_shared_index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    idx = build_index(docs)
    a = tfidf_vectors(index=idx, min_df=3).collect()
    exp = _sk_tfidf(docs.select("doc_id", "text").toPandas(), min_df=3)
    assert len(a) == sum(len(v) for v in exp.values()) > 0
    # rare terms (df < 3) pruned
    seen_tokens = {r["token"] for r in a}
    dfreq = {r["token"]: r["df"] for r in idx[1].collect()}
    assert all(dfreq[t] >= 3 for t in seen_tokens)
    with pytest.raises(ValueError):
        tfidf_vectors()
