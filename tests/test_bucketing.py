"""Bucketed tables: the write-once-shuffle contract — a join of two
tables bucketed on the key must plan with ZERO Exchange, and bucket+sort
must also eliminate the Sort under a sort-merge join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modlyn_spark.sources.bucketing import (
    join_is_exchange_free,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # managed tables land in the session's spark-warehouse dir
    # (warehouse.dir is a static conf); DROP TABLE in teardown cleans up
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.select("event_id", "user_id", "ts", "value")
    right = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    )
    for t in ("bk_left", "bk_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(left, "bk_left", ["user_id"], n_buckets=8,
                   sort_cols=["user_id", "ts"])
    write_bucketed(right, "bk_right", ["user_id"], n_buckets=8)
    yield read_bucketed(spark, "bk_left"), read_bucketed(spark, "bk_right")
    for t in ("bk_left", "bk_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable runtime broadcast so the join exercises the bucketed
    # sort-merge path (a broadcast would trivially have no shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ok, plan = join_is_exchange_free(left, right, ["user_id"])
        assert ok, plan
        assert "SortMergeJoin" in plan
        # results are still correct
        n = left.join(right, "user_id").count()
        assert n == left.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_counts_roundtrip(spark, bucketed_pair):
    left, right = bucketed_pair
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert left.count() == ev.count()
    assert right.count() == ev.select("user_id").distinct().count()
