"""Verbatim-span dedup: winnowing guarantee (candidates superset),
alignment robustness, exact-verify precision, brute-force and DuckDB
parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modlyn_spark.operators.spans import span_dup_pairs, _winnow_doc

SF = "/root/testdata/sf0.001"

K = 8


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _wordsoup(seed, n):
    rng = np.random.default_rng(seed)
    return " ".join(f"w{rng.integers(0, 5000)}" for _ in range(n))


def test_planted_spans_found_at_any_alignment(spark):
    span = " ".join(f"s{i}" for i in range(K))  # exactly K tokens
    docs = [
        (0, f"{_wordsoup(1, 30)} {span} {_wordsoup(2, 30)}"),   # middle
        (1, f"{span} {_wordsoup(3, 55)}"),                      # prefix
        (2, f"{_wordsoup(4, 41)} {span}"),                      # suffix
        (3, _wordsoup(5, 60)),                                  # unrelated
        # shares only K-1 tokens of the span -> must NOT pair
        (4, f"{_wordsoup(6, 30)} {' '.join(f's{i}' for i in range(K - 1))} {_wordsoup(7, 30)}"),
    ]
    out = span_dup_pairs(_mk(spark, docs), "doc_id", "text", span_tokens=K)
    pairs = {(r["id1"], r["id2"]) for r in out.collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_long_shared_run_counts_all_grams(spark):
    run = " ".join(f"r{i}" for i in range(K + 5))  # K+5 tokens -> 6 K-grams
    docs = [
        (0, f"{_wordsoup(8, 20)} {run}"),
        (1, f"{run} {_wordsoup(9, 20)}"),
    ]
    out = span_dup_pairs(_mk(spark, docs), "doc_id", "text", span_tokens=K)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_shared_grams"] == 6


def test_winnow_guarantee_brute_force():
    """Property: every pair sharing a K-token run shares a winnowed
    fingerprint (the SIGMOD'03 theorem, exercised on adversarial small
    alphabets where hash ties and repeats are common)."""
    from modlyn_spark.functions.text import _fnv1a64_batch

    k = (K + 1) // 2
    w = K - k + 1
    rng = np.random.default_rng(0)
    for trial in range(200):
        vocab = [f"t{i}" for i in range(rng.integers(2, 8))]
        a = [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(K, 40))]
        b = [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(K, 40))]
        fa = set(_winnow_doc(_fnv1a64_batch([x.encode() for x in a]), k, w))
        fb = set(_winnow_doc(_fnv1a64_batch([x.encode() for x in b]), k, w))
        shares_span = any(
            a[i : i + K] == b[j : j + K]
            for i in range(len(a) - K + 1)
            for j in range(len(b) - K + 1)
        )
        if shares_span:
            assert fa & fb, (a, b)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000))
def test_winnow_density_and_determinism(seed):
    from modlyn_spark.functions.text import _fnv1a64_batch

    rng = np.random.default_rng(seed)
    toks = [f"x{i}" for i in rng.integers(0, 50, 64)]
    th = _fnv1a64_batch([t.encode() for t in toks])
    k, w = 5, 4
    f1 = _winnow_doc(th, k, w)
    f2 = _winnow_doc(th.copy(), k, w)
    assert (f1 == f2).all()
    n_grams = len(toks) - k + 1
    # winnowing selects at most one new fingerprint per window position
    assert 1 <= len(f1) <= n_grams - w + 1


def test_matches_duckdb_on_real_corpus(spark, docs):
    got = (
        span_dup_pairs(docs.select("doc_id", "text"), "doc_id", "text",
                       span_tokens=K)
        .orderBy("id1", "id2")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    leads = " || ' ' || ".join(
        f"lead(word, {i}) OVER win" for i in range(1, K)
    )
    want = con.execute(
        f"""
        WITH w AS (
          SELECT doc_id, word,
                 row_number() OVER (PARTITION BY doc_id ORDER BY o0) AS ord
          FROM (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS o0
            FROM documents
          ) WHERE word <> ''
        ),
        g AS (
          SELECT DISTINCT doc_id, word || ' ' || {leads} AS gram
          FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
        ),
        gg AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(count(DISTINCT a.gram) AS BIGINT) AS n_shared_grams
        FROM gg a JOIN gg b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # the corpus's near-dup copies share long runs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_eager_mode_unpersists_index_caches(spark):
    """span_dup_pairs(eager=True) must not leave the winnowed fingerprint
    or candidate caches persisted after it returns (r3 verdict item 7:
    the index is ~2/(w+1) of all token positions — pinned in
    MEMORY_AND_DISK it crowds executors at corpus scale). Only the
    output-sized localCheckpoint blocks may remain, and eager/lazy
    results must be identical."""
    from modlyn_spark.operators.spans import span_dup_pairs

    jsc = spark.sparkContext._jsc.sc()

    def rdd_ids() -> set:
        # set-of-ids, not a count: the async ContextCleaner may reclaim
        # OTHER tests' dropped cache blocks between two samples, which
        # makes absolute counts flake in a full-suite run (observed once
        # the suite grew more eager-checkpoint operators). Removals never
        # ADD ids, so set differences stay exact.
        ids, it = set(), jsc.getPersistentRDDs().keysIterator()
        while it.hasNext():
            ids.add(int(it.next()))
        return ids

    before = rdd_ids()
    corpus = _mk(spark, [
        (0, f"{_wordsoup(30, 60)} a shared run of at least eight plus words "
            f"here {_wordsoup(31, 60)}"),
        (1, f"{_wordsoup(32, 70)} a shared run of at least eight plus words "
            "here"),
        (2, _wordsoup(33, 80)),
    ])
    # hold the DataFrame so its caches cannot be GC-reclaimed mid-test
    lazy_df = span_dup_pairs(corpus, "doc_id", "text", span_tokens=8,
                             eager=False)
    lazy = lazy_df.toPandas()
    mid = rdd_ids()
    assert len(mid - before) >= 1  # the lazy path does leave caches behind
    got = span_dup_pairs(corpus, "doc_id", "text", span_tokens=8)
    after = rdd_ids()
    # eager: fp + cand caches freed; at most the result checkpoint added
    assert len(after - mid) <= 1
    pd_got = got.toPandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    pd_lazy = lazy.sort_values(["id1", "id2"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(pd_got, pd_lazy)
    assert list(pd_got["id1"]) == [0]


def test_minhash_contamination_eager_unpersists_caches(spark):
    """Same eager contract for minhash_contamination: no signature or
    candidate caches left persisted after it returns (at most the
    output-sized checkpoint), eager/lazy results identical."""
    from modlyn_spark.operators.dedup import minhash_contamination

    jsc = spark.sparkContext._jsc.sc()

    def rdd_ids() -> set:
        # set differences, not counts — see the note in
        # test_eager_mode_unpersists_index_caches
        ids, it = set(), jsc.getPersistentRDDs().keysIterator()
        while it.hasNext():
            ids.add(int(it.next()))
        return ids

    q = "what is the airspeed velocity of an unladen swallow today friend"
    corpus = _mk(spark, [(1, q + " and some trailing words"),
                         (2, _wordsoup(40, 60))])
    probe = _mk(spark, [(100, q + " and some trailing words!")])
    lazy_df = minhash_contamination(
        corpus, probe, "doc_id", "text", threshold=0.8, eager=False
    )
    lazy = lazy_df.toPandas()
    mid = rdd_ids()
    got_df = minhash_contamination(
        corpus, probe, "doc_id", "text", threshold=0.8
    )
    after = rdd_ids()
    assert len(after - mid) <= 1
    got = got_df.toPandas().sort_values("corpus_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, lazy.sort_values("corpus_id").reset_index(drop=True)
    )
    assert set(got["corpus_id"]) == {1}


def test_span_contamination_finds_embedded_quote(spark):
    """An eval question quoted inside a LONG unrelated training doc:
    whole-doc Jaccard is tiny, the span check still fires; cross-corpus
    result equals the exact K-gram join."""
    from modlyn_spark.operators.spans import span_contamination

    question = " ".join(f"q{i}" for i in range(K + 2))  # K+2 tokens
    corpus = _mk(spark, [
        (0, f"{_wordsoup(20, 200)} {question} {_wordsoup(21, 200)}"),
        (1, _wordsoup(22, 300)),
    ])
    probe = _mk(spark, [(100, question), (101, _wordsoup(23, 40))])
    out = span_contamination(corpus, probe, "doc_id", "text", span_tokens=K)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # a K+2-token shared run contributes exactly 3 K-grams
    assert (r["corpus_id"], r["probe_id"], r["n_shared_grams"]) == (0, 100, 3)

    # whole-doc similarity would NOT have caught it
    from modlyn_spark.operators.dedup import ngram_jaccard_pairs

    both = corpus.unionByName(probe)
    jac = ngram_jaccard_pairs(both, "doc_id", "text", threshold=0.5)
    assert not [
        r for r in jac.collect() if {r["id1"], r["id2"]} == {0, 100}
    ]


def test_span_contamination_never_pairs_within_a_corpus(spark):
    from modlyn_spark.operators.spans import span_contamination

    shared = " ".join(f"s{i}" for i in range(K))
    corpus = _mk(spark, [
        (0, f"{shared} {_wordsoup(30, 30)}"),
        (1, f"{shared} {_wordsoup(31, 30)}"),  # within-corpus dup: ignored
    ])
    probe = _mk(spark, [(100, _wordsoup(32, 40))])
    assert span_contamination(corpus, probe, "doc_id", "text",
                              span_tokens=K).count() == 0
