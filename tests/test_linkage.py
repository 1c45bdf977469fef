"""Blocked fuzzy linkage: python-twin parity (same blocking, brute
edit distance), typo/word-swap recall, blocking-miss honesty, cross
mode, prefilter soundness, DuckDB parity on the real corpus."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from modlyn_spark.operators.linkage import linked_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()


def _twin(rows, *, block_tokens=1, min_sim=None, max_dist=None, cross=None):
    def prep(rs):
        out = []
        for i, t in rs:
            n = _norm(t)
            if n:
                key = " ".join(sorted(n.split(" "))[:block_tokens])
                out.append((i, n, key))
        return out

    L = prep(rows)
    R = prep(cross) if cross is not None else L
    pairs = []
    for i1, t1, k1 in L:
        for i2, t2, k2 in R:
            if k1 != k2 or (cross is None and not i1 < i2):
                continue
            d = _lev(t1, t2)
            s = 1 - d / max(len(t1), len(t2))
            if (max_dist is not None and d <= max_dist) or (
                min_sim is not None and s >= min_sim
            ):
                pairs.append((i1, i2, d, round(s, 10)))
    return sorted(pairs)


def _collect(df):
    return sorted(
        (r["id1"], r["id2"], r["dist"], round(r["sim"], 10))
        for r in df.collect()
    )


ROWS = [
    (1, "Chocolate lavender Spring lace"),
    (2, "chocolate lavender spring lace!"),  # punctuation/case twin of 1
    (3, "chocolate lavander spring lace"),  # one typo
    (4, "lavender chocolate spring lace"),  # word swap (same sorted key)
    (5, "goldenrod peach powder drab"),
    (6, "goldenrod peach powser drab"),  # typo NOT in the first sorted token
    (7, "  plum   navy  "),  # whitespace runs
    (8, "plum navy"),
    (9, "!!!"),  # normalizes to empty -> dropped
    (10, "zzz totally unrelated thing"),
]


def test_self_linkage_matches_twin(spark):
    df = spark.createDataFrame(pd.DataFrame(ROWS, columns=["id", "t"]))
    got = _collect(
        linked_pairs(df, "id", "t", block_tokens=1, min_sim=0.75)
    )
    exp = _twin(ROWS, block_tokens=1, min_sim=0.75)
    assert got == exp
    ids = {(a, b) for a, b, _, _ in got}
    # the planted twins all link...
    assert {(1, 2), (1, 3), (2, 3), (5, 6), (7, 8)} <= ids
    # the word swap co-blocks (order-insensitive sorted-token key) but
    # char-level edit distance correctly rejects it at this threshold
    assert (1, 4) not in ids and (2, 4) not in ids
    assert _twin([ROWS[0], ROWS[3]], min_sim=0.75) == []
    assert not any(10 in p for p in ids)


def test_max_dist_mode_and_prefilter_soundness(spark):
    df = spark.createDataFrame(pd.DataFrame(ROWS, columns=["id", "t"]))
    got = _collect(linked_pairs(df, "id", "t", max_dist=2))
    exp = _twin(ROWS, max_dist=2)
    assert got == exp  # length prefilter drops nothing admissible
    assert all(d <= 2 for _, _, d, _ in got)


def test_cross_mode(spark):
    left = [(1, "chocolate lavender spring lace")]
    right = [(100, "chocolate lavander spring lace"), (101, "other stuff")]
    got = _collect(
        linked_pairs(
            spark.createDataFrame(pd.DataFrame(left, columns=["id", "t"])),
            "id",
            "t",
            other=spark.createDataFrame(
                pd.DataFrame(right, columns=["id", "t"])
            ),
            min_sim=0.8,
        )
    )
    assert [(a, b) for a, b, _, _ in got] == [(1, 100)]


def test_blocking_miss_is_documented_behavior(spark):
    # an edit in the FIRST sorted token moves the record to another
    # block: the pair is (honestly) missed at block_tokens=1
    rows = [(1, "aaa zebra"), (2, "aab zebra")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "t"]))
    assert _collect(linked_pairs(df, "id", "t", min_sim=0.5)) == []


def test_param_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(ROWS, columns=["id", "t"]))
    with pytest.raises(ValueError, match="exactly one"):
        linked_pairs(df, "id", "t")
    with pytest.raises(ValueError, match="exactly one"):
        linked_pairs(df, "id", "t", min_sim=0.5, max_dist=3)


def test_duckdb_parity_on_real_parts(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    parts = spark.read.parquet(f"{sf}/part.parquet")
    got = _collect(
        linked_pairs(
            parts, "p_partkey", "p_name", block_tokens=2, min_sim=0.5
        )
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH n AS (
          SELECT p_partkey AS id,
                 trim(regexp_replace(regexp_replace(lower(p_name),
                      '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')) AS t
          FROM '{sf}/part.parquet'),
        k AS (SELECT id, t,
                     array_to_string(list_sort(string_split(t, ' '))[1:2],
                                     ' ') AS bk
              FROM n WHERE len(t) > 0),
        c AS (SELECT a.id AS id1, b.id AS id2, a.t AS t1, b.t AS t2
              FROM k a JOIN k b ON a.bk = b.bk AND a.id < b.id),
        s AS (SELECT id1, id2, levenshtein(t1, t2) AS dist,
                     1.0 - levenshtein(t1, t2)
                         / greatest(len(t1), len(t2)) AS sim
              FROM c)
        SELECT id1, id2, dist, sim FROM s WHERE sim >= 0.5
        """
    ).df()
    assert got == sorted(
        (int(r.id1), int(r.id2), int(r.dist), round(float(r.sim), 10))
        for r in exp.itertuples(index=False)
    )
    assert len(got) > 0  # the real corpus produces matches


def test_salting_is_exact_and_lev_single_eval(spark):
    # two-sided chunk salting: identical pair set to the unsalted join,
    # tiny chunk to force m > 1 on every block
    sf = "/root/testdata/sf0.001"
    parts = spark.read.parquet(f"{sf}/part.parquet")
    unsalted = _collect(
        linked_pairs(
            parts, "p_partkey", "p_name", block_tokens=1, min_sim=0.5,
            hot_block_chunk=None,
        )
    )
    salted = _collect(
        linked_pairs(
            parts, "p_partkey", "p_name", block_tokens=1, min_sim=0.5,
            hot_block_chunk=4,
        )
    )
    assert salted == unsalted and len(salted) > 0
    # the verify predicate fuses into the JOIN condition: the
    # per-candidate levenshtein runs where candidates materialize, and
    # the output projection recomputes only for surviving pairs
    out = linked_pairs(
        parts, "p_partkey", "p_name", block_tokens=1, min_sim=0.5
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    join_line = next(
        ln for ln in plan.split("\n") if "Join Inner" in ln
    )
    assert "levenshtein" in join_line
