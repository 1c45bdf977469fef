"""Gopher repetition signals: Spark mapInPandas vs the independent
plain-Python twin (oracle_repetition), DuckDB SQL cross-check for the
word-n-gram signals on the real documents table, hypothesis property
suite, and the threshold gate."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modlyn_spark.functions.repetition import (
    GOPHER_THRESHOLDS,
    SIGNAL_COLS,
    gopher_repetition_ok,
    repetition_signals,
)
from modlyn_spark.oracle.pandas_oracle import oracle_repetition

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _crafted_texts() -> list:
    return [
        # clean prose, no repetition
        "the quick brown fox jumps over a lazy dog near the river bank today",
        # every line duplicated
        "spam line one\nspam line one\nspam line two\nspam line two",
        # duplicated paragraphs (blank-line separated)
        "para one body text\n\npara two body\n\npara one body text",
        # heavy 2-gram repetition: "buy now" spam
        "buy now buy now buy now buy now buy now limited offer",
        # a repeated 6-gram embedded twice in filler
        "alpha beta gamma delta epsilon zeta filler words here "
        "alpha beta gamma delta epsilon zeta trailing tail",
        # degenerate cases
        "",
        None,
        "one",
        "x " * 600,  # single repeated word, long
        "tab\tand  double  spaces\nnewline line\nnewline line",
    ]


def test_signals_match_independent_twin(spark):
    texts = _crafted_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = (
        repetition_signals(df, "text")
        .orderBy("doc_id")
        .toPandas()[list(SIGNAL_COLS)]
    )
    want = oracle_repetition(texts)[list(SIGNAL_COLS)]
    np.testing.assert_allclose(
        got.to_numpy(), want.to_numpy(), rtol=0, atol=1e-12
    )


def test_signal_values_are_what_the_definitions_say(spark):
    df = spark.createDataFrame(
        [
            (0, "a b\na b\nc d"),  # 2 of 3 lines duplicated
            (1, "buy now buy now buy now"),  # top 2-gram "buy now" x3
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_signals(df, "text").collect()
    }
    assert out[0]["dup_line_frac"] == pytest.approx(2 / 3)
    # dup lines "a b" twice = 6 chars of 9 total line chars
    assert out[0]["dup_line_char_frac"] == pytest.approx(6 / 9)
    # words: buy now buy now buy now -> top 2-gram ("buy","now") count 3,
    # gram char mass 6, total word chars 18
    assert out[1]["top_2gram_char_frac"] == pytest.approx(3 * 6 / 18)
    # 5-grams: (buy now buy now buy) and (now buy now buy now) each once
    assert out[1]["dup_5gram_char_frac"] == 0.0


def test_dup_ngram_overlap_counted_once(spark):
    # "a b c d e" repeated 3x back-to-back: every 5-gram occurs >=2 times
    # and the covered positions are the whole doc -> frac exactly 1.0
    t = " ".join(["a b c d e"] * 3)
    df = spark.createDataFrame([(0, t)], "doc_id int, text string")
    row = repetition_signals(df, "text").collect()[0]
    assert row["dup_5gram_char_frac"] == 1.0
    assert row["top_2gram_char_frac"] == pytest.approx(3 * 2 / 15)


def test_ngram_signals_match_duckdb_on_real_corpus(spark, docs):
    """Cross-engine check of top-2-gram coverage on the real documents
    table (space-tokenized corpus), independent SQL formulation."""
    got = (
        repetition_signals(docs.select("doc_id", "text"), "text")
        .select("doc_id", F.round("top_2gram_char_frac", 6).alias("f"))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.execute(
        """
        WITH w AS (
          -- re-rank after dropping empty tokens so grams never span a
          -- removed position (matches the \\s+ tokenizer)
          SELECT doc_id, word,
                 row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS ord
          FROM (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS ord
            FROM documents
          ) WHERE word <> ''
        ),
        tot AS (SELECT doc_id, sum(length(word)) AS total FROM w GROUP BY doc_id),
        g AS (
          SELECT a.doc_id, a.word || ' ' || b.word AS gram,
                 length(a.word) + length(b.word) AS glen
          FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
        ),
        c AS (
          SELECT doc_id, gram, glen, count(*) AS cnt
          FROM g GROUP BY doc_id, gram, glen
        ),
        top AS (
          SELECT doc_id, cnt * glen AS mass
          FROM c
          QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY cnt DESC, gram
          ) = 1
        )
        SELECT t.doc_id,
               round(least(coalesce(mass, 0) / CAST(total AS DOUBLE), 1.0), 6) AS f
        FROM tot t LEFT JOIN top USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \n")),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_signals_bounded_and_twin_equal(texts):
    """All signals in [0,1]; spark-side numpy path == plain-python twin on
    adversarial tiny alphabets (many ties, empty lines, short docs)."""
    from modlyn_spark.functions.repetition import (
        _doc_gram_signals,
        _dup_fracs,
    )
    import re

    want = oracle_repetition(texts)
    assert ((want.to_numpy() >= 0) & (want.to_numpy() <= 1.0 + 1e-12)).all()
    # exercise the numpy kernels directly (no Spark session inside
    # hypothesis): same per-doc computation the UDF performs
    for t, (_, wrow) in zip(texts, want.iterrows()):
        lines = [l for l in t.split("\n") if l.strip()]
        assert _dup_fracs(lines) == pytest.approx(
            (wrow["dup_line_frac"], wrow["dup_line_char_frac"])
        )
        words = [w for w in re.split(r"\s+", t.lower()) if w]
        uniq = sorted(set(words))
        code = {w: i for i, w in enumerate(uniq)}
        codes = np.array([code[w] for w in words], dtype=np.int64)
        wl = np.array([len(w) for w in words], dtype=np.int64)
        got = _doc_gram_signals(codes, wl)
        keys = [f"top_{n}gram_char_frac" for n in (2, 3, 4)] + [
            f"dup_{n}gram_char_frac" for n in (5, 6, 7, 8, 9, 10)
        ]
        assert got == pytest.approx([wrow[k] for k in keys], abs=1e-12)


def test_gopher_gate(spark):
    # Gopher caps target web-length documents: on a 12-word text the top
    # 2-gram alone is >20% of chars structurally. Use a long clean doc.
    clean = " ".join(f"word{i} token{i * 7 % 101}" for i in range(120))
    df = spark.createDataFrame(
        [(0, clean), (1, "buy now " * 40)],
        "doc_id int, text string",
    )
    out = (
        repetition_signals(df, "text")
        .withColumn("ok", gopher_repetition_ok())
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["ok"] is True
    assert out[1]["ok"] is False
    assert set(GOPHER_THRESHOLDS) == set(SIGNAL_COLS)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 100_000))
def test_batch_kernel_equals_per_doc_kernel(seed):
    """_batch_gram_signals (one np.unique per n over the whole batch)
    must reproduce _doc_gram_signals doc by doc, including ties, repeats,
    empty docs and docs shorter than every n."""
    from modlyn_spark.functions.repetition import (
        _batch_gram_signals,
        _doc_gram_signals,
    )

    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(rng.integers(1, 8)):
        m = int(rng.integers(0, 30))
        docs.append([f"w{v}" for v in rng.integers(0, 4, m)])
    flat = [w for d in docs for w in d]
    uniq = sorted(set(flat))
    code = {w: i for i, w in enumerate(uniq)}
    codes = np.array([code[w] for w in flat], dtype=np.int64)
    lens = np.array([len(w) for w in flat], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    got = _batch_gram_signals(codes, lens, offs)
    for i, d in enumerate(docs):
        want = _doc_gram_signals(codes[offs[i]:offs[i+1]], lens[offs[i]:offs[i+1]])
        np.testing.assert_allclose(got[i], np.array(want), atol=1e-12)
