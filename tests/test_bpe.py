"""Distributed BPE training/encoding: exact merge-table parity with the
single-node twin, partitioning independence, encode semantics, and a
real-corpus run."""

from __future__ import annotations

import pandas as pd
import pytest

from modlyn_spark.operators.bpe import EOW, bpe_encode, bpe_train
from modlyn_spark.oracle.pandas_oracle import oracle_bpe

SF = "/root/testdata/sf0.001"

TEXTS = [
    "low lower lowest low low",
    "new newer newest new new news",
    "the lowest new low is newer than the newest",
]


def _df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_merge_table_matches_twin_exactly(spark):
    df = _df(spark, TEXTS)
    got = bpe_train(df, "text", num_merges=12)
    exp = oracle_bpe(TEXTS, 12)
    pd.testing.assert_frame_equal(got, exp)
    # and is partition-independent (integer counts, deterministic argmax)
    got13 = bpe_train(df.repartition(13), "text", num_merges=12)
    pd.testing.assert_frame_equal(got13, exp)


def test_train_stops_early_when_pairs_exhaust(spark):
    df = _df(spark, ["a a a", "b b"])
    got = bpe_train(df, "text", num_merges=50)
    # single-char words: only (char, EOW) pairs exist -> 2 merges possible
    assert len(got) == 2
    assert set(zip(got["left"], got["right"])) == {("a", EOW), ("b", EOW)}
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(df, "text", num_merges=0)


def test_encode_applies_ranks_greedily(spark):
    df = _df(spark, TEXTS)
    merges = bpe_train(df, "text", num_merges=15)
    out = bpe_encode(
        _df(spark, ["low lowest unseen"]),
        "doc_id",
        "text",
        merges,
        tokens_col="toks",
    ).collect()[0]
    toks = out["toks"]
    assert out["bpe_n_tokens"] == len(toks)
    # reconstruct: concatenating tokens and stripping EOW restores words
    text = "".join(toks).replace(EOW, " ").strip()
    assert text == "low lowest unseen"
    # frequent full words collapse to few symbols; unseen words stay
    # decomposed but still round-trip
    ranks = {(r.left, r.right) for r in merges.itertuples(index=False)}
    # no adjacent pair in the encoded output may still be mergeable
    per_word = []
    cur = []
    for t in toks:
        cur.append(t)
        if t.endswith(EOW):
            per_word.append(cur)
            cur = []
    for w in per_word:
        for i in range(len(w) - 1):
            assert (w[i], w[i + 1]) not in ranks


def test_min_word_count_prunes_hapaxes(spark):
    texts = ["aaa aaa aaa zqx", "aaa aaa"]
    df = _df(spark, texts)
    got = bpe_train(df, "text", num_merges=4, min_word_count=2)
    exp = oracle_bpe(texts, 4, min_word_count=2)
    pd.testing.assert_frame_equal(got, exp)
    # no merge may involve symbols only derivable from the hapax word
    assert not any("z" in l or "q" in l for l in got["left"])


def test_real_corpus_matches_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = bpe_train(docs, "text", num_merges=25)
    texts = [r["text"] for r in docs.select("text").collect()]
    exp = oracle_bpe(texts, 25)
    pd.testing.assert_frame_equal(got, exp)
    enc = bpe_encode(docs.limit(50), "doc_id", "text", got)
    rows = enc.select("bpe_n_tokens").collect()
    assert all(r["bpe_n_tokens"] > 0 for r in rows)
