"""Triangle counting: brute-force itertools twin parity on random
graphs, direction/multiplicity/self-loop insensitivity, star-graph
zero-triangle sanity (the degree-orientation point), per-node count
semantics, partition invariance."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from modlyn_spark.operators.graph import triangle_counts


def _twin(edges: list[tuple]) -> dict:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {x for e in und for x in e}
    counts = {x: 0 for x in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in und and (a, c) in und and (b, c) in und:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return {k: v for k, v in counts.items() if v > 0}


def _rand_edges(seed: int, n: int, m: int) -> list[tuple]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]


def _got(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    out = triangle_counts(df).toPandas()
    return dict(zip(out["node"], out["n_triangles"]))


def test_twin_parity_random_graphs(spark):
    for seed, n, m in [(1, 12, 40), (2, 20, 90), (3, 8, 60)]:
        edges = _rand_edges(seed, n, m)
        assert _got(spark, edges) == _twin(edges), (seed, n, m)


def test_direction_multiplicity_selfloop_insensitive(spark):
    base = [(0, 1), (1, 2), (0, 2)]
    messy = base + [(1, 0), (2, 1), (0, 1), (3, 3), (0, 0)]
    assert _got(spark, messy) == {0: 1, 1: 1, 2: 1}


def test_star_graph_has_no_triangles(spark):
    star = [(0, i) for i in range(1, 30)]
    assert _got(spark, star) == {}


def test_two_triangles_sharing_an_edge(spark):
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert _got(spark, edges) == {0: 1, 1: 2, 2: 2, 3: 1}


def test_partition_invariance(spark):
    edges = _rand_edges(7, 15, 70)
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    a = triangle_counts(df.repartition(1)).toPandas()
    b = triangle_counts(df.repartition(9)).toPandas()
    da = dict(zip(a["node"], a["n_triangles"]))
    db = dict(zip(b["node"], b["n_triangles"]))
    assert da == db
