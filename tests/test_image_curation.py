from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.plans.image_curation import curate_images

FIXTURE = "/root/repo/tests/fixtures/images_curation_input.parquet"


@pytest.fixture(scope="module")
def images(spark):
    return spark.read.parquet(FIXTURE)


def test_planted_structure_fully_resolved(images):
    out = curate_images(images, min_side=8).toPandas()
    ids = set(out["image_id"])
    # every planted row dropped, every base entity kept exactly once
    assert not any(i.startswith("z") for i in ids)
    assert len(out) == 60 and out["image_id"].is_unique
    assert set(out.columns) == {
        "image_id", "ts", "version", "w", "h", "fmt", "caption", "phash", "fp",
    }


def test_exact_vs_phash_stage_separation(images):
    # with the phash prune off, the exact-byte clones still drop (same
    # payload) but the phash twins survive (distinct bytes)
    out = curate_images(images, min_side=8, phash_radius=None).toPandas()
    ids = set(out["image_id"])
    assert not any(i.startswith("zdup_") for i in ids)
    assert sum(i.startswith("zpht_") for i in ids) == 10
    assert not any(i.startswith("zbad_") for i in ids)


def test_each_invalid_row_fails_its_own_gate(images):
    # relax one gate at a time; exactly that zbad row comes back
    relaxed = curate_images(
        images, min_side=4, phash_radius=None
    ).toPandas()["image_id"]
    assert "zbad_0000" in set(relaxed)  # w=4 passes once min_side drops
    fmts = curate_images(
        images, min_side=8, allowed_fmts=("png", "qpng", "jpeg", "bmp"),
        phash_radius=None,
    ).toPandas()["image_id"]
    assert "zbad_0002" in set(fmts)
    caps = curate_images(
        images, min_side=8, min_caption_tokens=1, phash_radius=None
    ).toPandas()["image_id"]
    assert "zbad_0003" in set(caps)


def test_decode_check_keeps_base_corpus(images):
    out = curate_images(images, min_side=8, decode_check=True).toPandas()
    ids = set(out["image_id"])
    assert {i for i in ids if not i.startswith("z")} == ids and len(ids) == 60


def test_split_assignment_total_and_deterministic(images, spark):
    out = curate_images(
        images, min_side=8, splits={"train": 0.5, "val": 0.25, "test": 0.25},
        salt="t",
    )
    a = out.toPandas().sort_values("image_id").reset_index(drop=True)
    b = (
        curate_images(
            spark.read.parquet(FIXTURE).repartition(7),
            min_side=8,
            splits={"train": 0.5, "val": 0.25, "test": 0.25},
            salt="t",
        )
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(a["split"]) <= {"train", "val", "test"}
    assert a["split"].value_counts()["train"] >= 20  # ~0.5 of 60


def test_manifest_carries_no_payload(images):
    plan = (
        curate_images(images, min_side=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bytes column must not appear in any Exchange input — it is
    # fingerprinted map-side and dropped before the first shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line


def test_incremental_image_ingestion_by_payload_fp(spark, images):
    """Cross-modality composition: the Bloom incremental dedup keyed on
    the image pipeline's payload fingerprint md5(hex(bytes)) — a new
    ingest batch drops exactly the images whose payload already exists
    in the curated history, without joining the full history."""
    from pyspark.sql import functions as F

    from modlyn_spark.operators.bloom import incremental_dedup

    fp = F.md5(F.hex(F.col("bytes")))
    hist = images.where(~F.col("image_id").startswith("z")).select(
        "image_id", fp.alias("fp")
    )
    new = images.where(
        F.col("image_id").startswith("zdup_")  # exact payload clones
        | F.col("image_id").startswith("zpht_")  # distinct payloads
    ).select("image_id", fp.alias("fp"))
    got = incremental_dedup(
        new, hist, "fp", n_buckets=8, bits_per_bucket=1 << 13
    ).toPandas()
    assert sorted(got["image_id"]) == [f"zpht_{j:04d}" for j in range(10)]


def test_px_var_gate_drops_constant_images(spark, images):
    """The blank-image junk filter: a planted solid-color payload decodes
    fine and passes every metadata gate, but its pixel variance is 0."""
    import numpy as np
    import pandas as pd

    from modlyn_spark.functions.image import png_encode

    blank = np.full((16, 16, 3), 128, dtype=np.uint8)
    extra = pd.DataFrame(
        [
            {
                "image_id": "zblank_0000",
                "bytes": png_encode(blank),
                "w": 16, "h": 16, "fmt": "png",
                "caption": "a perfectly blank placeholder image",
                "phash": 4242424242,
                "ts": pd.Timestamp("2024-06-01"),
                "version": 0,
            }
        ]
    )
    df = images.unionByName(spark.createDataFrame(extra))
    no_gate = curate_images(df, min_side=8).toPandas()
    assert "zblank_0000" in set(no_gate["image_id"])
    gated = curate_images(df, min_side=8, px_var_min=1.0).toPandas()
    ids = set(gated["image_id"])
    assert "zblank_0000" not in ids and len(ids) == 60


# ---------------------------------------------------------------------------
# contrastive pair assembly
# ---------------------------------------------------------------------------


def test_contrastive_pairs_structure(images):
    from modlyn_spark.plans.image_curation import build_contrastive_pairs

    out = build_contrastive_pairs(
        images,
        k_negatives=3,
        min_side=8,
        splits={"train": 0.5, "val": 0.25, "test": 0.25},
        salt="r4",
    ).toPandas()
    manifest = curate_images(
        images, min_side=8,
        splits={"train": 0.5, "val": 0.25, "test": 0.25}, salt="r4",
    ).toPandas()
    train = manifest[manifest["split"] == "train"]
    train_ids = set(train["image_id"])
    caps = dict(zip(train["image_id"], train["caption"]))

    pos = out[out["label"] == 1]
    neg = out[out["label"] == 0]
    # one positive per train image, carrying its OWN caption, slot -1
    assert set(pos["anchor"]) == train_ids
    assert (pos["anchor"] == pos["item"]).all()
    assert all(caps[a] == c for a, c in zip(pos["anchor"], pos["caption"]))
    assert (pos["slot"] == -1).all()
    # negatives: k per anchor, never self, always train-split items,
    # carrying the ITEM's caption
    per = neg.groupby("anchor").size()
    assert set(per.index) == train_ids and (per == 3).all()
    assert (neg["anchor"] != neg["item"]).all()
    assert set(neg["item"]) <= train_ids
    assert all(caps[i] == c for i, c in zip(neg["item"], neg["caption"]))


def test_contrastive_pairs_no_split_leakage(images):
    from modlyn_spark.plans.image_curation import build_contrastive_pairs

    splits = {"train": 0.5, "val": 0.25, "test": 0.25}
    manifest = curate_images(images, min_side=8, splits=splits, salt="r4")
    val_ids = {
        r["image_id"]
        for r in manifest.where("split = 'val'").collect()
    }
    out = build_contrastive_pairs(
        images, k_negatives=4, split="val",
        min_side=8, splits=splits, salt="r4",
    )
    ids = {r["item"] for r in out.collect()} | {
        r["anchor"] for r in out.collect()
    }
    assert ids <= val_ids  # a val batch never sees train/test captions


def test_contrastive_pairs_deterministic_across_partitionings(images):
    from modlyn_spark.plans.image_curation import build_contrastive_pairs

    kw = dict(k_negatives=2, min_side=8,
              splits={"train": 0.5, "val": 0.25, "test": 0.25}, salt="r4")
    a = build_contrastive_pairs(images.repartition(1), **kw)
    b = build_contrastive_pairs(images.repartition(17), **kw)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_contrastive_pairs_requires_split_config(images):
    from modlyn_spark.plans.image_curation import build_contrastive_pairs

    with pytest.raises(ValueError, match="splits"):
        build_contrastive_pairs(images, min_side=8)  # no splits=...
