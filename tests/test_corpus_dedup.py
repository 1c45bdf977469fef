"""C4-style corpus-level line/chunk dedup: planted boilerplate removed
everywhere, survivors untouched, order preserved; DuckDB cross-checks in
both modes; broadcast plan assertion."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.dedup import corpus_line_dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_line_mode_removes_global_boilerplate(spark):
    banner = "accept all cookies to continue"
    docs = [
        (0, f"{banner}\nunique alpha text\nfooter nav"),
        (1, f"intro beta\n{banner}\nfooter nav"),
        (2, "only unique content here\nnothing shared"),
        (3, f"{banner}"),  # reduced to nothing
        (4, ""),  # empty in, empty out
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in corpus_line_dedup(
            df, "doc_id", "text", min_count=2
        ).collect()
    }
    assert out[0]["text"] == "unique alpha text"
    assert out[1]["text"] == "intro beta"
    assert out[2]["text"] == "only unique content here\nnothing shared"
    assert out[3]["text"] == ""
    assert out[4]["text"] == ""
    assert out[0]["n_units_kept"] == 1 and out[0]["n_units_removed"] == 2
    assert out[3]["n_units_kept"] == 0 and out[3]["n_units_removed"] == 1
    assert out[4]["n_units_kept"] == 0 and out[4]["n_units_removed"] == 0


def test_order_preserved_and_multiline_units(spark):
    df = spark.createDataFrame(
        [(0, "z last\na a\nm mid\na a\nb first"), (1, "other doc")],
        "doc_id int, text string",
    )
    out = corpus_line_dedup(df, "doc_id", "text", min_count=2).collect()
    got = {r["doc_id"]: r["text"] for r in out}
    # "a a" occurs twice within doc 0 -> removed; order of the rest intact
    assert got[0] == "z last\nm mid\nb first"


def test_chunk_mode_matches_duckdb_on_real_corpus(spark, docs):
    got = (
        corpus_line_dedup(
            docs.select("doc_id", "text"),
            "doc_id",
            "text",
            chunk_words=3,
            min_count=2,
            out_col="clean_text",
        )
        .select("doc_id", "clean_text", "n_units_kept", "n_units_removed")
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
          SELECT doc_id, word,
                 row_number() OVER (PARTITION BY doc_id ORDER BY o0) AS ord
          FROM (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS o0
            FROM documents
          ) WHERE word <> ''
        ),
        ch AS (
          SELECT doc_id, (ord - 1) // 3 AS cid,
                 string_agg(word, ' ' ORDER BY ord) AS unit
          FROM w GROUP BY doc_id, (ord - 1) // 3
        ),
        hot AS (
          SELECT unit FROM ch GROUP BY unit HAVING count(*) >= 2
        ),
        kept AS (
          SELECT ch.* FROM ch ANTI JOIN hot USING (unit)
        ),
        tot AS (
          SELECT doc_id, count(*) AS n_total FROM ch GROUP BY doc_id
        ),
        re AS (
          SELECT doc_id,
                 string_agg(unit, ' ' ORDER BY cid) AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(re.clean_text, '') AS clean_text,
               CAST(coalesce(re.n_kept, 0) AS BIGINT) AS n_units_kept,
               CAST(coalesce(tot.n_total, 0) - coalesce(re.n_kept, 0) AS BIGINT)
                 AS n_units_removed
        FROM documents d
        LEFT JOIN tot USING (doc_id)
        LEFT JOIN re USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the corpus has a tiny vocabulary -> removal must actually happen
    assert (got["n_units_removed"] > 0).any()
    assert (got["n_units_kept"] > 0).any()


def test_hot_set_is_broadcast(spark):
    """Auto mode force-broadcasts for a small PARQUET corpus (real scan
    estimate); an in-memory relation has NO size estimate (Long.MaxValue)
    so auto declines the hint — broadcast_hot=True still forces it."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = corpus_line_dedup(
        docs, "doc_id", "text", chunk_words=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nc")], "doc_id int, text string"
    )
    plan = corpus_line_dedup(
        df, "doc_id", "text", broadcast_hot=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_hot_set_not_broadcast_when_input_large(spark, monkeypatch):
    """broadcast_hot=None is SIZE-based: an input whose scan estimate
    exceeds the threshold must NOT force-broadcast the hot-unit set (at
    web scale the duplicated-line set is billions of strings — a forced
    broadcast OOMs executors); AQE decides instead. Simulated by shrinking
    the threshold under a small corpus. Output must be identical."""
    import pandas as pd

    import modlyn_spark.operators.dedup as dd

    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nc"), (2, "b\nd")], "doc_id int, text string"
    )
    with_bc = corpus_line_dedup(df, "doc_id", "text").toPandas()
    monkeypatch.setattr(dd, "_BROADCAST_HOT_MAX_BYTES", 0)
    out = corpus_line_dedup(df, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no ResolvedHint-forced broadcast in the initial physical plan (AQE
    # may still pick one at runtime from actual sizes — that's the point)
    assert "BroadcastHashJoin" not in plan
    got = out.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = with_bc.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_random_corpora_match_python_twin_under_repartitioning(spark):
    """Property: line-mode output equals a plain-Python twin on random
    corpora with planted repeats, and is identical at 1 vs 13
    partitions."""
    import numpy as np
    from collections import Counter

    rng = np.random.default_rng(7)
    pool = [f"line {i} {'x' * int(rng.integers(0, 5))}" for i in range(30)]
    docs = []
    for d in range(40):
        n = int(rng.integers(0, 8))
        docs.append((d, "\n".join(pool[i] for i in rng.integers(0, 30, n))))

    def twin(docs, min_count):
        units = []
        for _, t in docs:
            units.extend(u for u in t.split("\n") if u.strip())
        c = Counter(units)
        out = {}
        for d, t in docs:
            us = [u for u in t.split("\n") if u.strip()]
            kept = [u for u in us if c[u] < min_count]
            out[d] = ("\n".join(kept), len(kept), len(us) - len(kept))
        return out

    for min_count in (2, 3):
        want = twin(docs, min_count)
        for parts in (1, 13):
            df = spark.createDataFrame(docs, "doc_id int, text string").repartition(parts)
            got = {
                r["doc_id"]: (r["text"], r["n_units_kept"], r["n_units_removed"])
                for r in corpus_line_dedup(
                    df, "doc_id", "text", min_count=min_count
                ).collect()
            }
            assert got == want, (min_count, parts)
