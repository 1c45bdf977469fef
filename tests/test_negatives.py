"""Negative sampling: python twin of the slot-hash draw, exclusion
guarantees, determinism across partitionings/seeds, DuckDB parity on
the real corpus."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.negatives import sample_negatives


def _h(key: str, n: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % n


def _twin(pos_pairs, pool_items, k, oversample=3, seed=0, self_ex=True):
    # sharded pool index: global rank under (md5(item) mod 256, item)
    items = sorted(set(pool_items), key=lambda it: (_h(str(it), 256), it))
    n = len(items)
    pos = {}
    for a, i in pos_pairs:
        pos.setdefault(a, set()).add(i)
    out = []
    for a in sorted(pos):
        seen, kept = set(), 0
        for slot in range(k * oversample):
            idx = _h(f"{a}|{slot}|{seed}", n)
            it = items[idx]
            if it in pos[a] or (self_ex and str(it) == str(a)):
                continue
            if it in seen:
                continue
            seen.add(it)
            out.append((a, it, slot))
            kept += 1
            if kept == k:
                break
    return sorted(out)


def test_matches_twin_and_guarantees(spark):
    rng = np.random.default_rng(41)
    pool = list(range(100, 400))
    pairs = [
        (int(a), int(rng.choice(pool)))
        for a in range(30)
        for _ in range(rng.integers(1, 5))
    ]
    pos_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["anchor", "item"])
    )
    pool_df = spark.createDataFrame(pd.DataFrame({"item": pool}))
    got = sorted(
        (r["anchor"], r["item"], r["slot"])
        for r in sample_negatives(
            pos_df, pool_df, anchor_col="anchor", item_col="item", k=5
        ).collect()
    )
    assert got == _twin(pairs, pool, 5)
    # guarantees: k per anchor, no positives, items from the pool
    by_a = {}
    for a, i, _ in got:
        by_a.setdefault(a, []).append(i)
    pos_map = {}
    for a, i in pairs:
        pos_map.setdefault(a, set()).add(i)
    for a, items in by_a.items():
        assert len(items) == 5 and len(set(items)) == 5
        assert not (set(items) & pos_map[a])
        assert set(items) <= set(pool)
    assert set(by_a) == set(pos_map)


def test_determinism_and_seed_sensitivity(spark):
    pairs = [(a, 100 + a) for a in range(20)]
    pool = list(range(100, 200))
    pos_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["anchor", "item"])
    )
    pool_df = spark.createDataFrame(pd.DataFrame({"item": pool}))
    runs = []
    for parts in (2, 17):
        runs.append(
            sorted(
                tuple(r)
                for r in sample_negatives(
                    pos_df.repartition(parts),
                    pool_df.repartition(parts),
                    anchor_col="anchor",
                    item_col="item",
                    k=3,
                ).collect()
            )
        )
    assert runs[0] == runs[1]  # partitioning-independent
    other = sorted(
        tuple(r)
        for r in sample_negatives(
            pos_df, pool_df, anchor_col="anchor", item_col="item", k=3,
            seed=7,
        ).collect()
    )
    assert other != runs[0]  # seed changes the draw
    with pytest.raises(ValueError, match="k must"):
        sample_negatives(
            pos_df, pool_df, anchor_col="anchor", item_col="item", k=0
        )


def test_duckdb_parity_on_real_docs(spark):
    import duckdb
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # positives: each doc paired with its embedding-space id twin
    pos = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor"),
        (F.col("doc_id") + 1).alias("item"),
    )
    pool = docs.select(F.col("doc_id").alias("item"))
    got = sorted(
        tuple(r)
        for r in sample_negatives(
            pos, pool, anchor_col="anchor", item_col="item", k=4
        ).collect()
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH pool AS (SELECT DISTINCT doc_id AS item
                      FROM '{sf}/documents.parquet'),
        idx AS (SELECT item,
                       row_number() OVER (ORDER BY
                           CAST(('0x' || substr(md5(
                               CAST(item AS VARCHAR)), 1, 15))
                               AS BIGINT) % 256, item) - 1 AS i
                FROM pool),
        np AS (SELECT count(*) AS n FROM pool),
        anchors AS (SELECT DISTINCT doc_id AS anchor
                    FROM '{sf}/documents.parquet' WHERE doc_id % 10 = 0),
        pos AS (SELECT doc_id AS anchor, doc_id + 1 AS item
                FROM '{sf}/documents.parquet' WHERE doc_id % 10 = 0),
        draws AS (SELECT anchor, unnest(range(0, 12)) AS slot
                  FROM anchors),
        hashed AS (SELECT anchor, slot,
                          CAST(('0x' || substr(md5(
                              anchor || '|' || slot || '|0'), 1, 15))
                              AS BIGINT) % (SELECT n FROM np) AS i
                   FROM draws),
        cand AS (SELECT h.anchor, h.slot, idx.item
                 FROM hashed h JOIN idx USING (i)
                 WHERE NOT EXISTS (SELECT 1 FROM pos
                                   WHERE pos.anchor = h.anchor
                                     AND pos.item = idx.item)
                   AND CAST(idx.item AS VARCHAR)
                       <> CAST(h.anchor AS VARCHAR)),
        dedup AS (SELECT * FROM (
                    SELECT cand.*, row_number() OVER (
                        PARTITION BY anchor, item ORDER BY slot) AS rd
                    FROM cand) WHERE rd = 1)
        SELECT anchor, item, slot FROM (
          SELECT dedup.*, row_number() OVER (
              PARTITION BY anchor ORDER BY slot) AS rk
          FROM dedup) WHERE rk <= 4
        """
    ).df()
    exp_rows = sorted(
        (int(r.anchor), int(r.item), int(r.slot))
        for r in exp.itertuples(index=False)
    )
    assert got == exp_rows and len(got) > 100
