"""Sequence packing: python-twin parity, invariants (contiguity within a
shard, span arithmetic), partitioning independence, DuckDB oracle parity
on the real corpus, and the stats rollup."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.packing import pack_sequences, packing_stats

SF = "/root/testdata/sf0.001"


def _twin(rows, seq_len, shards, salt=""):
    """Plain-python packing twin: shard by md5 prefix, concat in id
    order, slice at seq_len."""
    out = {}
    by_shard = {}
    for doc_id, n in rows:
        h = hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()
        shard = int(h[:8], 16) % shards
        by_shard.setdefault(shard, []).append((doc_id, n or 0))
    for shard, docs in by_shard.items():
        start = 0
        for doc_id, n in sorted(docs):
            span = 0 if n == 0 else (start + n - 1) // seq_len - start // seq_len + 1
            out[doc_id] = (
                n, shard, start, start // seq_len, start % seq_len, span
            )
            start += n
    return out


def test_pack_matches_python_twin_and_is_partition_independent(spark):
    rows = [(i, (i * 37) % 900) for i in range(300)] + [(1000, 0), (1001, None)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_tokens"])
    df = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["shard"], r["start_tok"], r["seq_id"],
            r["seq_offset"], r["n_seqs_spanned"],
        )
        for r in pack_sequences(
            df.repartition(13), "doc_id", "n_tokens", seq_len=512, shards=8
        ).collect()
    }
    exp = _twin([(i, n) for i, n in rows], 512, 8)
    assert got == exp
    got1 = {
        r["doc_id"]: r["start_tok"]
        for r in pack_sequences(
            df.coalesce(1), "doc_id", "n_tokens", seq_len=512, shards=8
        ).collect()
    }
    assert got1 == {k: v[2] for k, v in exp.items()}


def test_pack_invariants_on_real_corpus(spark):
    """Within every shard: start_tok is the exclusive prefix sum in id
    order (contiguous, no gaps/overlaps), and the span arithmetic is
    consistent with seq_id/seq_offset."""
    from modlyn_spark.functions.text import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", seq_len=256, shards=4)
    pdf = packed.toPandas().sort_values(["shard", "doc_id"])
    for _, g in pdf.groupby("shard"):
        starts = g["start_tok"].to_numpy()
        ns = g["n_tokens"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == (starts[:-1] + ns[:-1])).all()
    assert (pdf["seq_id"] * 256 + pdf["seq_offset"] == pdf["start_tok"]).all()
    nz = pdf[pdf["n_tokens"] > 0]
    last_tok = nz["start_tok"] + nz["n_tokens"] - 1
    assert (
        nz["n_seqs_spanned"] == (last_tok // 256) - nz["seq_id"] + 1
    ).all()


def test_pack_matches_duckdb_on_real_corpus(spark):
    from modlyn_spark.functions.text import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    got = (
        pack_sequences(docs, "doc_id", "n_tokens", seq_len=512, shards=8)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.sql(
        r"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'),
                      1, 8)) AS BIGINT) % 8 AS shard
          FROM documents),
        s AS (
          SELECT doc_id, n_tokens, CAST(shard AS INT) AS shard,
                 CAST(coalesce(sum(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_tok
          FROM t)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard, start_tok,
               start_tok // 512 AS seq_id,
               start_tok % 512 AS seq_offset,
               CASE WHEN n_tokens = 0 THEN 0
                    ELSE (start_tok + n_tokens - 1) // 512
                         - start_tok // 512 + 1 END AS n_seqs_spanned
        FROM s ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_packing_stats(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "n_tokens": [100, 500, 30, 900]}
    )
    df = spark.createDataFrame(pdf)
    packed = pack_sequences(df, "doc_id", "n_tokens", seq_len=256, shards=1)
    s = packing_stats(packed, seq_len=256).collect()
    assert len(s) == 1
    r = s[0]
    assert r["n_docs"] == 4 and r["total_tokens"] == 1530
    assert r["n_full_seqs"] == 5 and r["tail_tokens"] == 1530 - 5 * 256


def test_pack_rejects_bad_params(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "n": [1]}))
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "n", seq_len=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequences(df, "doc_id", "n", seq_len=8, shards=0)
