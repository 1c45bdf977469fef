"""Aspect-ratio bucketing: ladder generation, argmin assignment vs an
independent python twin, cover-crop geometry invariants, and the
shard-local batch packer's determinism."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.aspect import (
    assign_aspect_buckets,
    bucket_ladder,
    pack_bucket_batches,
)


def twin_assign(w: int, h: int, ladder):
    """Independent argmin: explicit loop, same (dist, -area, bw, bh)
    ordering, cross-ratio distance computed the same exact-IEEE way."""
    best = None
    for bw, bh in ladder:
        a, b = w * bh, bw * h
        dist = max(a, b) / min(a, b)
        key = (dist, -(bw * bh), bw, bh)
        if best is None or key < best:
            best = key
    return best[2], best[3]


def test_ladder_shape():
    lad = bucket_ladder(target_area=1024 * 1024, step=64,
                        min_side=256, max_side=2048, max_ratio=4.0)
    assert lad == sorted(lad) and len(lad) == len(set(lad))
    for w, h in lad:
        assert w % 64 == 0 and h % 64 == 0
        assert 256 <= w <= 2048 and 256 <= h <= 2048
        assert w * h <= 1024 * 1024
        assert max(w / h, h / w) <= 4.0
    assert (1024, 1024) in lad
    # transpose-closed
    assert all((h, w) in lad for w, h in lad)


def test_ladder_validation():
    with pytest.raises(ValueError):
        bucket_ladder(step=0)
    with pytest.raises(ValueError):
        bucket_ladder(min_side=100, step=64)
    with pytest.raises(ValueError):
        bucket_ladder(target_area=100, min_side=512, max_side=512)


def test_assignment_matches_twin(spark):
    lad = bucket_ladder()
    dims = [(1024, 1024), (1920, 1080), (1080, 1920), (640, 480),
            (3000, 1000), (257, 1021), (4096, 4096), (300, 300),
            (512, 2048), (1, 1), (123, 456)]
    pdf = pd.DataFrame(
        [{"i": i, "w": w, "h": h} for i, (w, h) in enumerate(dims)]
    )
    got = (
        assign_aspect_buckets(spark.createDataFrame(pdf))
        .orderBy("i")
        .toPandas()
    )
    for _, r in got.iterrows():
        bw, bh = twin_assign(int(r["w"]), int(r["h"]), lad)
        assert (r["bucket_w"], r["bucket_h"]) == (bw, bh), r["i"]


def test_assignment_null_and_bad_dims(spark):
    pdf = pd.DataFrame(
        [{"i": 0, "w": None, "h": 100}, {"i": 1, "w": 0, "h": 5},
         {"i": 2, "w": -3, "h": 7}]
    )
    got = assign_aspect_buckets(
        spark.createDataFrame(pdf).withColumn("w", F.col("w").cast("long"))
    ).orderBy("i").toPandas()
    assert got["bucket_w"].isna().all()
    assert got["bucket_scale"].isna().all()


def test_geometry_covers_bucket(spark):
    pdf = pd.DataFrame(
        [{"i": i, "w": w, "h": h}
         for i, (w, h) in enumerate(
             [(1920, 1080), (999, 1001), (640, 481), (2048, 512),
              (333, 777), (1024, 1024)])]
    )
    got = assign_aspect_buckets(spark.createDataFrame(pdf)).toPandas()
    for _, r in got.iterrows():
        # resized frame covers the bucket; crop is centered and in-frame
        assert r["bucket_rw"] >= r["bucket_w"]
        assert r["bucket_rh"] >= r["bucket_h"]
        assert r["bucket_crop_x"] == (r["bucket_rw"] - r["bucket_w"]) // 2
        assert r["bucket_crop_y"] == (r["bucket_rh"] - r["bucket_h"]) // 2
        assert r["bucket_crop_x"] + r["bucket_w"] <= r["bucket_rw"]
        assert r["bucket_crop_y"] + r["bucket_h"] <= r["bucket_rh"]
        # scale is the cover scale
        assert r["bucket_scale"] == pytest.approx(
            max(r["bucket_w"] / r["w"], r["bucket_h"] / r["h"])
        )


def test_exact_bucket_identity(spark):
    """An image already at a ladder resolution maps to itself with
    scale 1 and zero crop."""
    lad = bucket_ladder()
    pdf = pd.DataFrame(
        [{"i": i, "w": w, "h": h} for i, (w, h) in enumerate(lad[:10])]
    )
    got = assign_aspect_buckets(spark.createDataFrame(pdf)).toPandas()
    assert (got["bucket_w"] == got["w"]).all()
    assert (got["bucket_h"] == got["h"]).all()
    assert (got["bucket_scale"] == 1.0).all()
    assert (got["bucket_crop_x"] == 0).all()


def _packed(spark, n=100, batch_size=8, n_shards=4, drop_last=True):
    pdf = pd.DataFrame(
        [{"img": f"im_{i:04d}",
          "w": 640 + (i % 5) * 320, "h": 480 + (i % 3) * 240}
         for i in range(n)]
    )
    df = assign_aspect_buckets(spark.createDataFrame(pdf))
    return pack_bucket_batches(
        df, ["img"], batch_size=batch_size, n_shards=n_shards,
        drop_last=drop_last,
    ).toPandas()


def test_packing_full_batches(spark):
    got = _packed(spark)
    sizes = got.groupby("batch_id").size()
    assert (sizes == 8).all()
    for _, grp in got.groupby("batch_id"):
        assert sorted(grp["batch_pos"]) == list(range(8))
        # one bucket per batch
        assert grp[["bucket_w", "bucket_h"]].drop_duplicates().shape[0] == 1


def test_packing_keep_last(spark):
    kept = _packed(spark, drop_last=False)
    dropped = _packed(spark, drop_last=True)
    assert len(kept) == 100  # nothing lost
    assert len(dropped) <= len(kept)
    sizes = kept.groupby("batch_id").size()
    assert (sizes <= 8).all()


def test_packing_deterministic_and_shard_local(spark):
    a = _packed(spark).sort_values("img").reset_index(drop=True)
    # same input repartitioned arbitrarily -> identical assignment
    pdf = pd.DataFrame(
        [{"img": f"im_{i:04d}",
          "w": 640 + (i % 5) * 320, "h": 480 + (i % 3) * 240}
         for i in range(100)]
    )
    df = assign_aspect_buckets(spark.createDataFrame(pdf).repartition(7))
    b = (
        pack_bucket_batches(df, ["img"], batch_size=8, n_shards=4)
        .toPandas()
        .sort_values("img")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # the shard in the batch id matches the hash draw
    for _, r in a.iterrows():
        # _key_string appends the (empty) salt: 'im_0000|' then '#shard'
        key = f"{r['img']}|#shard".encode()
        shard = int(hashlib.md5(key).hexdigest()[:8], 16) % 4
        assert r["batch_id"].split("/")[1] == str(shard)


def test_packing_validation(spark):
    pdf = pd.DataFrame([{"img": "a", "w": 512, "h": 512}])
    df = assign_aspect_buckets(spark.createDataFrame(pdf))
    with pytest.raises(ValueError):
        pack_bucket_batches(df, ["img"], batch_size=0)
