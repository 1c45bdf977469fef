from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.bloom import (
    bloom_prefilter,
    build_bucketed_bloom,
    incremental_dedup,
)


@pytest.fixture(scope="module")
def corpora(spark):
    hist = pd.DataFrame(
        {"k": [f"hist_{i:05d}" for i in range(2000)], "payload": range(2000)}
    )
    new = pd.DataFrame(
        {
            # 500 genuinely new + 250 repeats from history
            "k": [f"new_{i:05d}" for i in range(500)]
            + [f"hist_{i:05d}" for i in range(0, 500, 2)],
            "payload": range(750),
        }
    )
    return spark.createDataFrame(hist), spark.createDataFrame(new)


BLOOM_KW = dict(n_buckets=16, bits_per_bucket=1 << 14, n_hashes=7)


def test_no_false_negatives(spark, corpora):
    hist, _ = corpora
    bloom = build_bucketed_bloom(hist, "k", **BLOOM_KW)
    flags = bloom_prefilter(hist, bloom, "k", **BLOOM_KW).toPandas()
    assert len(flags) == 2000 and flags["maybe_seen"].all()


def test_fp_rate_is_small(spark, corpora):
    hist, new = corpora
    bloom = build_bucketed_bloom(hist, "k", **BLOOM_KW)
    flags = bloom_prefilter(new, bloom, "k", **BLOOM_KW).toPandas()
    truly_new = flags[flags["k"].str.startswith("new_")]
    # 2000 keys in 16*16384 bits at k=7 -> fp ~ 0.8%; allow 5% slack
    assert truly_new["maybe_seen"].mean() < 0.05
    dups = flags[flags["k"].str.startswith("hist_")]
    assert dups["maybe_seen"].all()


def test_incremental_dedup_is_exact(spark, corpora):
    hist, new = corpora
    got = (
        incremental_dedup(new, hist, "k", **BLOOM_KW)
        .orderBy("k")
        .toPandas()
    )
    exp = (
        new.join(hist.select("k").distinct(), "k", "left_anti")
        .orderBy("k")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    assert set(got["k"]) == {f"new_{i:05d}" for i in range(500)}


def test_prebuilt_bloom_artifact_roundtrip(spark, corpora, tmp_path):
    hist, new = corpora
    path = str(tmp_path / "bloom")
    build_bucketed_bloom(hist, "k", **BLOOM_KW).write.parquet(path)
    bloom = spark.read.parquet(path)
    got = incremental_dedup(new, hist, "k", bloom_df=bloom, **BLOOM_KW)
    assert got.count() == 500


def test_empty_history_bucket_means_definitely_new(spark, corpora):
    hist, _ = corpora
    # history confined to a few buckets; probes hitting empty buckets must
    # come back definitively new
    small = hist.limit(3)
    bloom = build_bucketed_bloom(small, "k", **BLOOM_KW)
    probe = hist.select("k").subtract(small.select("k"))
    flags = bloom_prefilter(probe, bloom, "k", **BLOOM_KW).toPandas()
    assert (~flags["maybe_seen"]).sum() >= len(flags) - 50


def test_sketch_only_mode_drops_all_dups_without_history(spark, corpora):
    hist, new = corpora
    bloom = build_bucketed_bloom(hist, "k", **BLOOM_KW)
    got = incremental_dedup(
        new, None, "k", bloom_df=bloom, exact=False, **BLOOM_KW
    ).toPandas()
    # no false negatives: every true duplicate is gone
    assert not got["k"].str.startswith("hist_").any()
    # fp-rate loss only: nearly all genuinely-new rows survive
    assert got["k"].str.startswith("new_").sum() >= 500 * 0.95
    import pytest as _pt

    with _pt.raises(ValueError):
        incremental_dedup(new, None, "k", bloom_df=bloom, **BLOOM_KW)
