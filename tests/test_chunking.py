from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from modlyn_spark.operators.chunking import chunk_documents

SF = "/root/testdata/sf0.001"


def _twin(texts, C, S):
    out = []
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").split() if w]
        if not toks:
            continue
        n = len(toks)
        k = 1 if n <= C else -(-(n - C) // S) + 1
        for c in range(k):
            sl = toks[c * S : c * S + C]
            out.append((i, c, len(sl), " ".join(sl)))
    return out


TEXTS = [
    "one two three four five six seven eight nine ten",
    "a  b\tc\nd",          # whitespace runs normalize
    "short",
    "",
    " ".join(f"w{i}" for i in range(23)),
]


@pytest.mark.parametrize("C,S", [(4, 4), (4, 2), (10, 10), (5, 5), (7, 3)])
def test_matches_python_twin(spark, C, S):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    got = (
        chunk_documents(df, max_tokens=C, stride=S)
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    exp = _twin(TEXTS, C, S)
    assert list(map(tuple, got.to_numpy())) == exp


def test_every_token_covered_and_overlap(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [" ".join(f"t{i}" for i in range(20))]})
    )
    got = chunk_documents(df, max_tokens=8, stride=5).toPandas()
    toks_seen = set()
    prev = None
    for _, r in got.sort_values("chunk_id").iterrows():
        ws = r["chunk"].split()
        toks_seen.update(ws)
        if prev is not None:
            assert prev[-3:] == ws[:3]  # overlap = max_tokens - stride = 3
        prev = ws
    assert toks_seen == {f"t{i}" for i in range(20)}


def test_param_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, stride=0)


def test_matches_duckdb_on_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = (
        chunk_documents(docs, max_tokens=32, stride=24)
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x != '') AS toks
          FROM '{SF}/documents.parquet'),
        c AS (
          SELECT doc_id, i AS chunk_id,
                 toks[CAST(i * 24 + 1 AS BIGINT)
                      : CAST(i * 24 + 32 AS BIGINT)] AS sl
          FROM (SELECT doc_id, toks,
                       unnest(range(0,
                           CASE WHEN len(toks) = 0 THEN 0
                                WHEN len(toks) <= 32 THEN 1
                                ELSE CAST(ceil((len(toks) - 32) / 24.0)
                                          AS BIGINT) + 1 END)) AS i
                FROM w))
        SELECT doc_id, chunk_id, CAST(len(sl) AS BIGINT) AS n_tokens,
               array_to_string(sl, ' ') AS chunk
        FROM c ORDER BY doc_id, chunk_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_plan_has_no_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "InPandas" not in plan
