"""Sketch tier: constant-memory approximations whose outputs are
engine-specific (so they are accuracy-gated here rather than hash-gated by
the driver oracle — the exact percentile/count-distinct twins ARE
oracle-gated via the value_percentiles / groupby_count queries).

- percentile_approx: rank error is bounded by 1/accuracy — with
  accuracy=10000 on a 10k-row group the approximate quantile must sit
  within a tight value band of the exact one.
- approx_count_distinct: HyperLogLog++ with rsd=0.02 must land within a
  few percent of the exact distinct count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_percentile_approx_accuracy(spark, events):
    both = events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("exact_p50"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.percentile("value", 0.99).alias("exact_p99"),
        F.percentile_approx("value", 0.99, 10000).alias("approx_p99"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    for r in both.collect():
        spread = r["hi"] - r["lo"]
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.02 * spread, r
        assert abs(r["approx_p99"] - r["exact_p99"]) <= 0.02 * spread, r


def test_approx_count_distinct_accuracy(spark, events):
    both = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(both["approx"] - both["exact"]) / both["exact"]
    assert rel_err <= 0.06, (both["exact"], both["approx"], rel_err)


def test_sketches_are_partial_aggregable(spark, events):
    """The scale property that makes sketches worth having: the plan shows
    partial (map-side) aggregation — no full shuffle of raw values."""
    plan = (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial" in plan.lower()


def test_ensure_parallelism_never_repartitions_down(spark):
    """A source already carrying >= target partitions must pass through
    untouched (at scale, coalescing a wide scan would be the bug), and a
    big-enough Catalyst size estimate skips the exchange entirely."""
    from modlyn_spark.session import ensure_parallelism

    wide = spark.range(0, 10_000, 1, 64)  # 64 partitions > any local target
    out = ensure_parallelism(wide, min_partitions=8)
    assert "RoundRobinPartitioning" not in out._jdf.queryExecution().toString()

    narrow = spark.range(0, 10_000, 1, 1)
    up = ensure_parallelism(narrow, min_partitions=8, min_bytes=0)
    assert up.rdd.getNumPartitions() == 8


def test_hamming_topk_matches_bruteforce_and_broadcasts(spark):
    """Image phash retrieval: exact per-probe top-k, broadcast probe side."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from modlyn_spark.operators.similarity import hamming_topk

    rng = np.random.default_rng(11)
    chash = rng.integers(-(2**62), 2**62, size=200)
    corpus = spark.createDataFrame(
        pd.DataFrame({"corpus_id": range(200), "chash": chash})
    )
    # probes: three corpus hashes with a few bits flipped + one random
    ph = [int(chash[5]) ^ 0b11, int(chash[50]) ^ 0b10101,
          int(chash[150]), int(rng.integers(-(2**62), 2**62))]
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": range(4), "phash": ph})
    )
    out = hamming_topk(probes, corpus, k=3)
    got = out.orderBy("probe_id", "rank").toPandas()
    for pi in range(4):
        d = np.array([bin((int(ph[pi]) ^ int(c)) & (2**64 - 1)).count("1")
                      for c in chash])
        order = np.lexsort((np.arange(200), d))[:3]
        sub = got[got.probe_id == pi]
        assert sub["corpus_id"].tolist() == order.tolist()
        assert sub["hamming"].tolist() == d[order].tolist()
    # nearest self-matches rank first
    assert got[(got.probe_id == 2) & (got["rank"] == 1)]["hamming"].iloc[0] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_topk_probe_contract_guards(spark):
    """cosine_topk / hamming_topk broadcast their probe side BY CONTRACT;
    the max_probes guard enforces it with a clear raise (and None opts
    out) instead of an oversized broadcast OOMing the driver."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from modlyn_spark.operators.similarity import cosine_topk, hamming_topk

    corpus_h = spark.createDataFrame(
        pd.DataFrame({"corpus_id": [1, 2], "chash": [3, 5]})
    )
    probes_h = spark.range(10).select(
        F.col("id").alias("probe_id"), F.col("id").alias("phash")
    )
    with pytest.raises(ValueError, match="max_probes"):
        hamming_topk(probes_h, corpus_h, max_probes=5)
    assert hamming_topk(probes_h, corpus_h, max_probes=None).count() > 0
    assert hamming_topk(probes_h, corpus_h, k=1).count() == 10

    corpus_v = spark.createDataFrame(
        pd.DataFrame({"corpus_id": [1, 2], "cvec": [[1.0, 0.0], [0.0, 1.0]]})
    )
    probes_v = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": range(8), "qvec": [[1.0, float(i)] for i in range(8)]}
        )
    )
    with pytest.raises(ValueError, match="max_probes"):
        cosine_topk(probes_v, corpus_v, max_probes=4)
    assert cosine_topk(probes_v, corpus_v, k=1).count() == 8
