from __future__ import annotations

import pytest

from modlyn_spark.operators.shards import shard_manifest, shard_plan


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "id long, size long")
    return df.repartition(parts) if parts else df


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic sizes, heavy tail: ~2% of items near half a shard
    rows = [
        (i, 500 + (i * 7919) % 1500 + (40_000 if i % 50 == 0 else 0))
        for i in range(3000)
    ]
    return rows


def test_deterministic_at_any_parallelism(spark, corpus):
    a = shard_plan(
        _df(spark, corpus, 2), "id", "size", target_bytes=100_000, groups=8
    )
    b = shard_plan(
        _df(spark, corpus, 13), "id", "size", target_bytes=100_000, groups=8
    )
    pa = {r["id"]: (r["shard_id"], r["seq_in_shard"]) for r in a.collect()}
    pb = {r["id"]: (r["shard_id"], r["seq_in_shard"]) for r in b.collect()}
    assert pa == pb


def test_shard_size_bounds(spark, corpus):
    target = 100_000
    plan = shard_plan(
        _df(spark, corpus), "id", "size", target_bytes=target, groups=8
    ).collect()
    by_shard: dict[tuple, list] = {}
    for r in plan:
        by_shard.setdefault((r["shard_group"], r["local_shard"]), []).append(
            r["size"]
        )
    max_item = max(s for _, s in corpus)
    last = {
        g: max(ls for (gg, ls) in by_shard if gg == g)
        for g in {gg for (gg, _) in by_shard}
    }
    for (g, ls), sizes in by_shard.items():
        total = sum(sizes)
        # next-fit by byte offset: every shard stays within one item of
        # the target; non-final shards also can't undershoot by more
        # than one item
        assert total < target + max_item
        if ls != last[g]:
            assert total > target - max_item
    # conservation: every byte lands in exactly one shard
    assert sum(sum(v) for v in by_shard.values()) == sum(
        s for _, s in corpus
    )
    assert len(plan) == len(corpus)


def test_local_shards_contiguous_and_seq(spark, corpus):
    plan = shard_plan(
        _df(spark, corpus), "id", "size", target_bytes=100_000, groups=4
    ).collect()
    by_group: dict[int, set] = {}
    by_shard: dict[tuple, list] = {}
    for r in plan:
        by_group.setdefault(r["shard_group"], set()).add(r["local_shard"])
        by_shard.setdefault((r["shard_group"], r["local_shard"]), []).append(
            r["seq_in_shard"]
        )
    for g, shards in by_group.items():
        assert shards == set(range(max(shards) + 1))
    for key, seqs in by_shard.items():
        assert sorted(seqs) == list(range(len(seqs)))


def test_oversize_item_gets_own_boundary(spark):
    # one item larger than the target still lands in exactly one shard
    rows = [(1, 10), (2, 500_000), (3, 10), (4, 10)]
    plan = shard_plan(
        _df(spark, rows), "id", "size", target_bytes=1000, groups=1
    ).collect()
    assert len(plan) == 4
    shards = {r["id"]: r["local_shard"] for r in plan}
    assert len(set(shards.values())) >= 2  # the giant forces a boundary


def test_null_and_negative_sizes_excluded(spark):
    rows = [(1, 100), (2, None), (3, -5), (4, 0)]
    plan = shard_plan(
        _df(spark, rows), "id", "size", target_bytes=1000, groups=2
    ).collect()
    assert {r["id"] for r in plan} == {1, 4}


def test_manifest_consistency(spark, corpus):
    plan = shard_plan(
        _df(spark, corpus), "id", "size", target_bytes=100_000, groups=8
    )
    man = {
        (r["shard_group"], r["local_shard"]): (r["n_samples"], r["total_bytes"])
        for r in shard_manifest(plan, "size").collect()
    }
    assert sum(n for n, _ in man.values()) == len(corpus)
    assert sum(b for _, b in man.values()) == sum(s for _, s in corpus)


def test_validation(spark):
    df = _df(spark, [(1, 10)])
    with pytest.raises(ValueError):
        shard_plan(df, "id", "size", target_bytes=0)
    with pytest.raises(ValueError):
        shard_plan(df, "id", "size", target_bytes=10, groups=0)


def test_salt_redeals(spark, corpus):
    a = shard_plan(
        _df(spark, corpus), "id", "size", target_bytes=100_000, salt="v1"
    ).collect()
    b = shard_plan(
        _df(spark, corpus), "id", "size", target_bytes=100_000, salt="v2"
    ).collect()
    pa = {r["id"]: r["shard_id"] for r in a}
    pb = {r["id"]: r["shard_id"] for r in b}
    moved = sum(1 for i in pa if pa[i] != pb[i])
    assert moved > len(pa) // 2
