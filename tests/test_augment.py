"""Deterministic augmentation: plan twin + generated-DuckDB parity on the
image fixture, bounds/uniform-reachability properties, pixel application
== numpy twin exactly (lossless path), epoch/seed independence."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from modlyn_spark.functions.augment import (
    apply_augmentations,
    augmentation_plan,
    duckdb_plan_sql,
)

FIXTURE = "/root/repo/tests/fixtures/images_curation_input.parquet"


def _u(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2 ** 32


def _twin_plan(image_id, w, h, epoch, seed=0, frac=0.875, fp=0.5):
    cw = max(1, int(np.floor(w * frac)))
    ch = max(1, int(np.floor(h * frac)))
    base = f"{image_id}|{epoch}|{seed}"
    return (
        _u(f"{base}|fl") < fp,
        int(np.floor(_u(f"{base}|cx") * (w - cw + 1))),
        int(np.floor(_u(f"{base}|cy") * (h - ch + 1))),
        cw,
        ch,
    )


@pytest.fixture(scope="module")
def images(spark):
    return spark.read.parquet(FIXTURE)


def test_plan_matches_twin_and_bounds(spark, images):
    rows = images.select("image_id", "w", "h").dropna().distinct()
    got = {
        r["image_id"]: (
            r["flip"], r["crop_x"], r["crop_y"], r["crop_w"], r["crop_h"]
        )
        for r in augmentation_plan(rows, epoch=3).collect()
    }
    for r in rows.collect():
        want = _twin_plan(r["image_id"], r["w"], r["h"], 3)
        assert got[r["image_id"]] == want, r["image_id"]
        f, x, y, cw, ch = got[r["image_id"]]
        assert 0 <= x <= r["w"] - cw and 0 <= y <= r["h"] - ch


def test_plan_duckdb_parity(spark, images):
    rows = images.select("image_id", "w", "h").dropna().distinct()
    got = (
        augmentation_plan(rows, epoch=7, seed=2)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW imgs AS SELECT DISTINCT image_id, w, h "
        f"FROM '{FIXTURE}' WHERE w IS NOT NULL"
    )
    want = (
        con.sql(duckdb_plan_sql("imgs", epoch=7, seed=2))
        .df()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("flip", "crop_x", "crop_y", "crop_w", "crop_h"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_plan_epochs_redraw_and_partitioning_invariant(spark, images):
    rows = images.select("image_id", "w", "h").dropna().distinct()
    e1 = augmentation_plan(rows, epoch=1).collect()
    e2 = {r["image_id"]: r for r in
          augmentation_plan(rows, epoch=2).collect()}
    diff = sum(
        (r["crop_x"], r["crop_y"], r["flip"])
        != (e2[r["image_id"]]["crop_x"], e2[r["image_id"]]["crop_y"],
            e2[r["image_id"]]["flip"])
        for r in e1
    )
    assert diff > len(e1) * 0.5  # epochs genuinely redraw
    a = sorted(map(tuple, augmentation_plan(
        rows.repartition(1), epoch=1).collect()))
    b = sorted(map(tuple, augmentation_plan(
        rows.repartition(13), epoch=1).collect()))
    assert a == b


def test_apply_matches_numpy_twin_exactly(spark, images):
    from modlyn_spark.functions.image import decode_bytes

    from pyspark.sql import Window

    w_latest = Window.partitionBy("image_id").orderBy(
        F.col("ts").desc(), F.col("version").desc()
    )
    src = (
        images.where(
            (F.col("fmt").isin("png", "qpng")) & F.col("bytes").isNotNull()
        )
        .withColumn("__rn", F.row_number().over(w_latest))
        .where("__rn = 1")
        .drop("__rn")
        .orderBy("image_id")
        .limit(12)
    )
    rows = src.select("image_id", "w", "h")
    plan = augmentation_plan(rows, epoch=5)
    out = {
        r["image_id"]: r
        for r in apply_augmentations(src, plan).collect()
    }
    plan_rows = {r["image_id"]: r for r in plan.collect()}
    n = 0
    for r in src.collect():
        p = plan_rows[r["image_id"]]
        px = decode_bytes(bytes(r["bytes"]), r["fmt"])
        want = px[p["crop_y"]:p["crop_y"] + p["crop_h"],
                  p["crop_x"]:p["crop_x"] + p["crop_w"]]
        if p["flip"]:
            want = want[:, ::-1]
        got = decode_bytes(bytes(out[r["image_id"]]["bytes"]), "png")
        assert out[r["image_id"]]["w"] == p["crop_w"]
        assert out[r["image_id"]]["h"] == p["crop_h"]
        # png and qpng sources both decode deterministically; the PNG
        # round trip of the cropped pixels is lossless -> exact equality
        assert got.shape == want.shape and (got == want).all()
        n += 1
    assert n == 12


def test_crop_frac_validation(spark, images):
    rows = images.select("image_id", "w", "h").limit(1)
    with pytest.raises(ValueError):
        augmentation_plan(rows, epoch=0, crop_frac=0.0)
