"""End-to-end corpus curation: planted exact dups, near-dups, garbage and
contaminated rows are removed; clean rows survive with leak-free splits;
the whole dataflow is deterministic under repartitioning."""

from __future__ import annotations

import pandas as pd
import pytest

from modlyn_spark.plans.curation import curate_corpus

GOOD = [
    "the quick brown fox jumps over the lazy dog and it was good for all of "
    "them in the end because the story is long enough to pass the gate",
    "a second perfectly reasonable document that talks about the weather and "
    "the harvest and is also long enough for the quality heuristics to like",
    "yet another wholesome piece of text for the corpus with the usual words "
    "that it needs to be kept by the filters in the pipeline of the engine",
]


@pytest.fixture()
def corpus(spark):
    rows = []
    for i, t in enumerate(GOOD):
        rows.append({"doc_id": i, "text": t})
    rows.append({"doc_id": 100, "text": GOOD[0]})          # exact dup
    rows.append({"doc_id": 101, "text": GOOD[1] + " zz"})  # near dup
    rows.append({"doc_id": 102, "text": "@@@@ ###"})       # garbage
    rows.append({"doc_id": 103, "text": GOOD[2][:-4] + " okay"})  # near dup
    # contaminated: near-verbatim copy of an eval question
    rows.append(
        {"doc_id": 104,
         "text": "what is the capital of atlantis answer it is the city of "
                 "posadia which everyone knows from the benchmark of course"}
    )
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture()
def probe(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0],
                "text": [
                    "what is the capital of atlantis answer it is the city of "
                    "posadia which everyone knows from the benchmark of course!"
                ],
            }
        )
    )


def test_curation_end_to_end(spark, corpus, probe):
    out = curate_corpus(
        corpus,
        min_quality=0.3,
        near_dup_threshold=0.8,
        contamination_probe=probe,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
    ).toPandas()
    kept = set(out["doc_id"])
    assert kept == {0, 1, 2}, kept  # survivors: the three originals
    assert set(out.columns) >= {"doc_id", "text", "lang_pred", "quality", "split"}
    assert (out["lang_pred"] == "en").all()
    assert set(out["split"]) <= {"train", "val", "test"}


def test_curation_deterministic_under_partitioning(spark, corpus, probe):
    a = curate_corpus(
        corpus.repartition(7), contamination_probe=probe, near_dup_threshold=0.8
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = curate_corpus(
        corpus.coalesce(1), contamination_probe=probe, near_dup_threshold=0.8
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].values == b["doc_id"].values).all()
    assert (a["split"].values == b["split"].values).all()


def test_curation_on_real_documents(spark):
    """Drive on the real parquet corpus: output is a strict subset, has no
    exact-duplicate fingerprints, and every row carries a split."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate_corpus(docs, min_quality=0.0, near_dup_threshold=0.9)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in
    from modlyn_spark.functions.text import doc_fingerprint
    from pyspark.sql import functions as F

    dup_fp = (
        out.select(doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp").count().where("count > 1").count()
    )
    assert dup_fp == 0
    assert out.where(F.col("split").isNull()).count() == 0


def test_curation_optional_repetition_and_boilerplate_stages(spark):
    import pandas as pd

    banner = "subscribe to our newsletter for daily updates and offers"
    # long clean bodies (Gopher caps target web-length docs) with DISJOINT
    # char-3-gram vocabularies per doc (letter rotation), so the bodies are
    # not near-dups of each other under MinHash on character shingles
    def body(seed):
        rot = lambda w: "".join(  # noqa: E731
            chr((ord(c) - 97 + seed * 5) % 26 + 97) for c in w
        )
        # 90 DISTINCT words per body -> no repeated n-grams within a doc
        return " ".join(
            rot(f"wo{chr(97 + i % 26)}{chr(97 + i // 26)}dy")
            for i in range(90)
        )
    rows = [
        {"doc_id": 0, "text": f"{banner}\n{body(1)}\nthe weather is for all"},
        {"doc_id": 1, "text": f"{banner}\n{body(2)}\nthe harvest is for all"},
        {"doc_id": 2, "text": body(3) + " the it was is that for in of to"},
        # repetitious spam: passes length/quality but fails the Gopher gate
        {"doc_id": 3, "text": ("buy now best price " * 40)
                              + "the it was is that for in of to"},
        # boilerplate-only page: nothing left after line dedup
        {"doc_id": 4, "text": banner},
    ]
    out = curate_corpus(
        spark.createDataFrame(pd.DataFrame(rows)),
        min_quality=0.0,
        repetition_gate=True,
        boilerplate_delim="\n",
        boilerplate_min_count=2,
    ).toPandas()
    kept = set(out["doc_id"])
    assert kept == {0, 1, 2}
    # the shared banner line is gone from the surviving texts
    assert not out["text"].str.contains("newsletter").any()
    # no helper columns leak into the result
    assert not [c for c in out.columns if c.startswith("__rep_")]


def test_span_contamination_stage_catches_embedded_eval_quote(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    soup = lambda n: " ".join(  # noqa: E731
        f"tok{rng.integers(0, 9000)}" for _ in range(n)
    )
    question = "what is the airspeed velocity of an unladen swallow today"
    rows = [
        # long doc quoting the eval question verbatim — low whole-doc
        # similarity, must still be removed when the span stage is on
        {"doc_id": 0, "text": f"{soup(150)} {question} {soup(150)} "
                              "the it was is that for in of to the and"},
        {"doc_id": 1, "text": soup(160) + " the it was is that for in of"},
    ]
    probe = spark.createDataFrame(pd.DataFrame(
        [{"doc_id": 100, "text": question}]))
    corpus = spark.createDataFrame(pd.DataFrame(rows))

    kept_without = curate_corpus(
        corpus, min_quality=0.0, contamination_probe=probe
    ).toPandas()
    assert set(kept_without["doc_id"]) == {0, 1}  # whole-doc check misses it

    kept_with = curate_corpus(
        corpus, min_quality=0.0, contamination_probe=probe,
        contamination_span_tokens=8,
    ).toPandas()
    assert set(kept_with["doc_id"]) == {1}


def test_curation_pairs_mode_matches_star_on_fixture_and_rejects_unknown(
    spark, corpus, probe
):
    """near_dup_mode='pairs' (drop any doc with a smaller-id verified
    neighbor — the banding-independent, oracle-able policy) keeps the
    same survivors as star mode on the fixture corpus; unknown modes
    raise."""
    out = curate_corpus(
        corpus,
        min_quality=0.3,
        near_dup_threshold=0.8,
        near_dup_mode="pairs",
        contamination_probe=probe,
    ).toPandas()
    assert set(out["doc_id"]) == {0, 1, 2}
    with pytest.raises(ValueError, match="near_dup_mode"):
        curate_corpus(corpus, near_dup_mode="banana").collect()


def test_curation_lm_gate_drops_gibberish(spark):
    """min_avg_logprob gates on the corpus unigram-LM score: a doc of
    corpus-rare tokens drops; normal docs keep the score annotation."""
    import pandas as pd

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(GOOD)]
    rows.append({"doc_id": 50,
                 "text": "zxqv jkwp qqrr zzyy xkcd vvbb mmnn ppoo"})
    df = spark.createDataFrame(pd.DataFrame(rows))
    base = curate_corpus(df, min_quality=0.0).toPandas()
    assert 50 in set(base["doc_id"])  # without the gate it survives
    # threshold from the data: gibberish scores strictly below every
    # normal doc — gate midway between the two bands
    from modlyn_spark.operators.lm import unigram_doc_logprob

    lp = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_doc_logprob(df, "doc_id", "text").collect()
    }
    normal_min = min(lp[i] for i in (0, 1, 2))
    assert lp[50] < normal_min
    thr = (lp[50] + normal_min) / 2
    out = curate_corpus(df, min_quality=0.0, min_avg_logprob=thr).toPandas()
    kept = set(out["doc_id"])
    assert 50 not in kept and kept == {0, 1, 2}
    assert "avg_logprob" in out.columns
    assert (out["avg_logprob"] >= thr).all()


def test_early_termination_fixture_binds():
    """M6 gate precondition: the 5-step fixture must DIFFER from the
    8-step one (otherwise the early_termination row would not prove the
    max_steps bound executes)."""
    import numpy as np

    w5 = pd.read_parquet(
        "/root/repo/tests/fixtures/logreg_weights_steps5_sf001.parquet"
    )
    w8 = pd.read_parquet(
        "/root/repo/tests/fixtures/logreg_weights_sf001.parquet"
    )
    m = w5.merge(w8, on=["label", "pos"], suffixes=("_5", "_8"))
    assert len(m) == len(w5) == len(w8)
    assert np.abs(m["weight_5"] - m["weight_8"]).max() > 1e-3


def test_contamination_with_reserved_id_column_names(spark):
    """id_col literally named 'did' or 'cid' must not collide with the
    internal aliases of the semi-join that prunes shingle/gram packing to
    candidate documents (the joins use reserved __cand_id names)."""
    import pandas as pd
    from modlyn_spark.operators.dedup import minhash_contamination
    from modlyn_spark.operators.spans import span_contamination

    q = "what is the airspeed velocity of an unladen swallow today friend"
    corpus = spark.createDataFrame(
        pd.DataFrame([{"did": 1, "text": q + " and some trailing words"},
                      {"did": 2, "text": "completely unrelated text body"}])
    )
    probe = spark.createDataFrame(
        pd.DataFrame([{"did": 100, "text": q + " and some trailing words!"}])
    )
    got = minhash_contamination(
        corpus, probe, "did", "text", threshold=0.8
    ).toPandas()
    assert set(got["corpus_id"]) == {1}

    c2 = corpus.withColumnRenamed("did", "cid")
    p2 = probe.withColumnRenamed("did", "cid")
    got2 = span_contamination(c2, p2, "cid", "text", span_tokens=8).toPandas()
    assert set(got2["corpus_id"]) == {1}


def test_source_quality_rollup_semantics(spark):
    import pandas as pd
    from modlyn_spark.plans.curation import source_quality_rollup

    good = ("the quick brown fox jumps over the lazy dog and it was good "
            "for all of them in the end because the story is long enough")
    rows = [
        {"doc_id": 0, "source": "blog", "text": good},
        {"doc_id": 1, "source": "blog", "text": good + " extra words here"},
        {"doc_id": 2, "source": "mirror", "text": good},
        {"doc_id": 3, "source": "mirror", "text": good},      # exact dup
        {"doc_id": 4, "source": "mirror", "text": good.upper()},  # canon dup
        {"doc_id": 5, "source": "spam", "text": "@@@@ #### !!!! %%%%"},
    ]
    out = {
        r["source"]: r
        for r in source_quality_rollup(
            spark.createDataFrame(pd.DataFrame(rows))
        ).collect()
    }
    assert out["blog"]["n_docs"] == 2 and out["blog"]["dup_frac"] == 0.0
    # mirror: 3 docs, 1 distinct canonical fingerprint -> 2/3 duplicated
    assert out["mirror"]["n_docs"] == 3
    assert out["mirror"]["dup_frac"] == pytest.approx(round(2 / 3, 4))
    assert out["spam"]["avg_quality"] < out["blog"]["avg_quality"]


def test_curation_pii_scrub_collapses_pii_only_dups(spark):
    base = ("a perfectly reasonable training document with enough words "
            "to pass the quality gate and some more text for padding here")
    rows = [
        {"doc_id": 0, "text": base + " contact alice@example.com now"},
        {"doc_id": 1, "text": base + " contact bob@example.org now"},
        {"doc_id": 2, "text": "another quite distinct document about other "
                              "topics entirely with plenty of words to keep "
                              "the quality gate satisfied for this test"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    plain = curate_corpus(df, min_quality=0.0).toPandas()
    assert sorted(plain["doc_id"]) == [0, 1, 2]  # distinct emails: no dups
    scrubbed = curate_corpus(df, min_quality=0.0, pii_scrub=True).toPandas()
    # after redaction docs 0 and 1 are byte-identical -> exact dedup keeps 0
    assert sorted(scrubbed["doc_id"]) == [0, 2]
    assert "<EMAIL>" in scrubbed.set_index("doc_id").loc[0, "text"]


def test_curation_domain_blocklist_stage(spark):
    filler = ("plenty of ordinary filler words so the quality gate keeps "
              "this document around without any complaint at all today")
    rows = [
        {"doc_id": 0, "text": f"{filler} see https://ok.example.com/x"},
        {"doc_id": 1, "text": f"{filler} via https://www.bad-place.net/y"},
        {"doc_id": 2, "text": f"{filler} no links at all"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["bad-place.net"]}))
    out = curate_corpus(
        df, min_quality=0.0, domain_blocklist=bl
    ).toPandas()
    assert sorted(out["doc_id"]) == [0, 2]
