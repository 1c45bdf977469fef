"""PageRank: textbook power-iteration twin on random graphs, closed-form
tiny graphs, mass conservation with dangling nodes, partitioning
invariance, multigraph mode, real-parquet drive."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.graph import pagerank


def _twin(edges, iterations, damping, dedup=True):
    """Dense float64 power iteration with uniform dangling redistribution."""
    if dedup:
        edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = r[deg == 0].sum()
        s = np.zeros(n)
        for u, v in edges:
            s[idx[v]] += r[idx[u]] / deg[idx[u]]
        r = (1 - damping) / n + damping * (s + dm / n)
    return dict(zip(nodes, r))


def _run(spark, edges, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"])
    )
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_closed_form(spark):
    # symmetric 2-cycle: stationary distribution is uniform at any damping
    got = _run(spark, [(1, 2), (2, 1)], iterations=10)
    assert got[1] == pytest.approx(0.5, abs=1e-12)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_matches_power_iteration_twin(spark):
    rng = np.random.default_rng(11)
    edges = list(
        {(int(u), int(v)) for u, v in rng.integers(0, 60, (400, 2)) if u != v}
    )
    got = _run(spark, edges, iterations=25)
    want = _twin(edges, 25, 0.85)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-10)


def test_mass_conserved_with_dangling(spark):
    # node 3 is dangling (no out-edges), node 4 only appears as a source
    edges = [(1, 2), (2, 3), (4, 3), (4, 1)]
    got = _run(spark, edges, iterations=15)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    want = _twin(edges, 15, 0.85)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # the sink accumulates the most mass
    assert max(got, key=got.get) == 3


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(3)
    edges = list(
        {(int(u), int(v)) for u, v in rng.integers(0, 40, (200, 2)) if u != v}
    )
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    base = None
    for p in (1, 7, 32):
        df = spark.createDataFrame(pdf).repartition(p)
        got = {r["node"]: round(r["rank"], 10)
               for r in pagerank(df, iterations=12).collect()}
        if base is None:
            base = got
        else:
            assert got == base, p


def test_multigraph_mode(spark):
    # duplicated edge 1->2 doubles its share of node 1's rank
    edges = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
    got = _run(spark, edges, iterations=20, dedup_edges=False)
    want = _twin(edges, 20, 0.85, dedup=False)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert got[2] > got[3]


def test_validation_and_nulls(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, None], "dst": [2, 5]})
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert set(got) == {1, 2}  # the null-src edge is dropped entirely
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_no_persisted_state_left_behind(spark):
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    )
    result = pagerank(df, iterations=4)
    result.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    # localCheckpoint blocks linger until the async ContextCleaner runs
    # (same accepted behavior as dedup.connected_components): at most
    # nodes + dangling + (iterations+1) rank checkpoints. The cached edge
    # layout MUST be gone — a links leak would push the delta past this.
    new = after - before
    assert len(new) <= 4 + 3


def test_real_parquet_slot_hash_graph(spark):
    """Drive on the real documents table: the deterministic slot-hash
    link graph the driver query uses (3 out-links per doc)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    slots = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j"),
    )
    edges = slots.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("src"), F.col("j"), F.lit("pr"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long") % n
        ).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    out = pagerank(edges, iterations=10)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert len(ranks) == n  # every doc appears (src side guarantees it)
