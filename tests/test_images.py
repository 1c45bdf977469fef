"""Image layer: PNG codec roundtrip, PSNR gate, caption equality, phash
deltas — the input_hint per-row invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from modlyn_spark.functions.image import (
    decode_bytes,
    decode_image_stats,
    png_decode,
    png_encode,
    psnr,
    qpng_encode,
    verify_images,
)
from modlyn_spark.functions.phash import average_hash, hamming64
from modlyn_spark.sources.images import (
    generate_images_df,
    generate_images_pandas,
    reference_caption,
    reference_phash,
    reference_pixels,
)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert (png_decode(png_encode(px)) == px).all()


def test_png_roundtrip_gray():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(9, 31), dtype=np.uint8)
    assert (png_decode(png_encode(px)) == px).all()


def test_png_decode_all_filters():
    """Decoder must handle filters 1-4 (encoders in the wild use them)."""
    import struct
    import zlib

    from modlyn_spark.functions.image import _PNG_SIG, _chunk

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)

    # hand-encode with a cycling filter type per scanline
    def enc_filters(pixels):
        h, w, _ = pixels.shape
        stride = w * 3
        prev = np.zeros(stride, dtype=np.int32)
        raw = b""
        for y in range(h):
            cur = pixels[y].reshape(-1).astype(np.int32)
            ft = y % 5
            if ft == 0:
                line = cur
            elif ft == 1:
                line = cur.copy()
                line[3:] = (cur[3:] - cur[:-3]) % 256
            elif ft == 2:
                line = (cur - prev) % 256
            elif ft == 3:
                line = cur.copy()
                for i in range(stride):
                    left = cur[i - 3] if i >= 3 else 0
                    line[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
            else:
                line = cur.copy()
                for i in range(stride):
                    a = cur[i - 3] if i >= 3 else 0
                    b = prev[i]
                    c = prev[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (cur[i] - pred) % 256
            raw += bytes([ft]) + line.astype(np.uint8).tobytes()
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )

    assert (png_decode(enc_filters(px)) == px).all()


def test_qpng_psnr_above_gate():
    for eid in ["img_00000000", "img_00000003"]:
        px = reference_pixels(eid, 0)
        dec = decode_bytes(qpng_encode(px), "qpng")
        # 16-level quantization: max error 8 -> PSNR ~ 30+dB; gradient images
        # with small per-pixel error land well above 40 dB? verify actual gate
        assert psnr(px, dec) > 30  # sanity; per-row gate tested distributed


def test_jpeg_roundtrip_psnr_and_dims():
    """Real baseline JPEG codec (functions/jpeg.py): gray and RGB, 4:2:0
    and 4:4:4, odd sizes — dims exact, PSNR above the 40 dB gate at the
    generator's settings."""
    from modlyn_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(0)
    gray = np.clip(
        (np.linspace(0, 255, 64)[None, :] * 0.5
         + np.linspace(0, 255, 64)[:, None] * 0.5).astype(int)
        + rng.integers(-8, 8, (64, 64)),
        0, 255,
    ).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(gray, quality=95))
    assert dec.shape == gray.shape
    assert psnr(gray, dec) >= 40.0

    for eid in ["img_00000000", "img_00000003", "img_00000007"]:
        px = reference_pixels(eid, 1)
        for q, sub in [(98, "444"), (95, "420")]:
            dec = jpeg_decode(jpeg_encode(px, quality=q, subsampling=sub))
            assert dec.shape == px.shape
            if sub == "444":
                assert psnr(px, dec) >= 40.0, (eid, q, sub)
            else:
                # 4:2:0 on checker-pattern chroma is inherently lossy;
                # sanity floor only (the PSNR>=40 contract uses 4:4:4)
                assert psnr(px, dec) >= 25.0


def test_phash_near_dup_pairs_match_brute_force(spark):
    """Image near-dup via the PRECOMPUTED phash column (the image-payload
    dedup modality): the generic multi-block hamming join must equal the
    exact all-pairs bit_count(xor) <= r twin on the synthetic image
    table — recall within the radius is a theorem, this checks it."""
    from modlyn_spark.operators.dedup import hash_hamming_pairs
    from modlyn_spark.sources.images import generate_images_pandas

    pdf = generate_images_pandas(40, hot_every=10, hot_factor=5)
    # one row per (image_id, version): use the latest state per image
    st = pdf.sort_values(["image_id", "ts"]).groupby("image_id").tail(1)
    st = st.reset_index(drop=True)[["image_id", "phash"]]
    df = spark.createDataFrame(st)
    for r in (0, 4, 8):
        got = {
            (a, b): h
            for a, b, h in hash_hamming_pairs(
                df, "image_id", "phash", max_hamming=r
            ).collect()
        }
        ph = st.set_index("image_id")["phash"].astype("uint64")
        exp = {}
        ids = list(ph.index)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = sorted((ids[i], ids[j]))
                h = int(ph[a] ^ ph[b]).bit_count()
                if h <= r:
                    exp[(a, b)] = h
        assert got == exp, (r, len(got), len(exp))


def test_jpeg_non_interleaved_scans_decode_identically():
    """Externally-produced baseline files may carry one single-component
    scan per plane (non-interleaved T.81 layout). The decoder must size
    each scan's blocks against the FRAME-wide Hmax/Vmax (A.1.1): with
    scan-local maxima a chroma h=v=1 scan of a 4:2:0 frame allocates
    ceil(w/8) instead of ceil(w/16) blocks and garbles or EOFs."""
    from modlyn_spark.functions.jpeg import jpeg_decode, jpeg_encode

    for shape in [(24, 24), (17, 23), (32, 48)]:
        base = np.linspace(0, 255, shape[0] * shape[1]).reshape(shape)
        px = np.stack([base, base[::-1], 255 - base], axis=-1).astype(np.uint8)
        for sub in ("420", "444"):
            di = jpeg_decode(jpeg_encode(px, quality=95, subsampling=sub))
            ds = jpeg_decode(
                jpeg_encode(px, quality=95, subsampling=sub, interleave=False)
            )
            assert ds.shape == px.shape
            # same coefficients, different container layout -> identical
            np.testing.assert_array_equal(di, ds)


def test_jpeg_decoder_rejects_unsupported():
    from modlyn_spark.functions.jpeg import jpeg_decode

    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"notajpeg")
    # progressive (SOF2) must fail loudly, not decode garbage
    sof2 = b"\xFF\xD8" + b"\xFF\xC2" + (10).to_bytes(2, "big") + bytes(8)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(sof2 + b"\xFF\xD9")


def test_jpeg_through_decode_bytes():
    from modlyn_spark.functions.jpeg import jpeg_encode

    px = reference_pixels("img_00000001", 0)
    dec = decode_bytes(jpeg_encode(px, 98, "444"), "jpeg")
    assert psnr(px, dec) >= 40.0


def test_generator_pandas_spark_identical(spark):
    pdf = generate_images_pandas(8)
    sdf = generate_images_df(spark, 8, num_partitions=4).toPandas()
    key = ["image_id", "version"]
    pdf = pdf.sort_values(key).reset_index(drop=True)
    sdf = sdf.sort_values(key).reset_index(drop=True)
    assert len(pdf) == len(sdf)
    assert (pdf["caption"].values == sdf["caption"].values).all()
    assert (pdf["phash"].values == sdf["phash"].values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(pdf["bytes"], sdf["bytes"]))
    assert (pdf["ts"].values == sdf["ts"].values).all()


def test_distributed_verify_invariants(spark):
    """The north_rule per-row gate: decoded pixels match reference (PSNR>=40
    lossy / exact lossless), captions equal, sizes right."""
    df = generate_images_df(spark, 12, num_partitions=4)
    res = verify_images(df, reference_pixels, reference_caption).toPandas()
    assert len(res) > 0
    assert res["caption_ok"].all()
    assert res["size_ok"].all()
    lossless = res.merge(
        generate_images_pandas(12)[["image_id", "version", "fmt"]],
        on=["image_id", "version"],
    )
    assert np.isinf(lossless[lossless.fmt == "png"]["psnr_db"]).all()
    assert (lossless[lossless.fmt == "qpng"]["psnr_db"] >= 40.0).all()
    jp = lossless[lossless.fmt == "jpeg"]
    assert len(jp) > 0, "generator corpus must include real JPEG rows"
    assert (jp["psnr_db"] >= 40.0).all()


def test_decode_stats_and_phash_lag(spark):
    pdf = generate_images_pandas(10)
    df = spark.createDataFrame(pdf)
    stats = decode_image_stats(df).toPandas()
    assert len(stats) == len(pdf)
    assert (stats["px_max"] <= 255).all() and (stats["px_min"] >= 0).all()

    # phash hamming lag-delta: JVM-side bit_count(xor) equals numpy recompute
    from modlyn_spark.operators.windows import with_lag_lead

    ll = (
        with_lag_lead(df, "image_id", "ts", "phash", delta=False, hamming=True)
        .select("image_id", "version", "phash", "phash_hamming1")
        .toPandas()
        .sort_values(["image_id", "version"])
    )
    for eid, g in ll.groupby("image_id"):
        hashes = [reference_phash(eid, int(v)) for v in g["version"]]
        for i in range(1, len(hashes)):
            expected = bin((hashes[i] ^ hashes[i - 1]) & ((1 << 64) - 1)).count("1")
            assert g["phash_hamming1"].iloc[i] == expected


def test_hot_entity_skew_fixture(spark):
    pdf = generate_images_pandas(6, hot_every=3, hot_factor=10)
    counts = pdf.groupby("image_id").size()
    hot = counts[["img_00000000", "img_00000003"]]
    cold = counts.drop(["img_00000000", "img_00000003"])
    assert hot.min() >= 10 * 1  # hot entities have >= 10x base versions
    assert hot.min() > cold.max()


def test_compute_phash_matches_reference_generator(spark):
    """compute_phash (the producer side) reproduces the generator's
    reference_phash exactly for every lossless row; lossy rows stay
    within a small hamming distance of the reference hash."""
    from pyspark.sql import functions as F

    from modlyn_spark.functions.image import compute_phash
    from modlyn_spark.functions.phash import hamming64
    from modlyn_spark.sources.images import generate_images_df

    images = generate_images_df(spark, 20, hot_every=0)
    got = compute_phash(images).join(
        images.select("image_id", "version", "fmt",
                      F.col("phash").alias("ref_phash")),
        ["image_id", "version"],
    )
    checked = got.select(
        "fmt", hamming64(F.col("phash"), F.col("ref_phash")).alias("d")
    ).toPandas()
    lossless = checked[checked.fmt == "png"]
    assert (lossless["d"] == 0).all() and len(lossless) > 0
    assert (checked["d"] <= 6).all()  # lossy codecs may flip a few cells


def test_compute_phash_null_on_undecodable(spark):
    import pandas as pd

    from modlyn_spark.functions.image import compute_phash

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a"],
                "version": [0],
                "bytes": [b"not an image"],
                "fmt": ["png"],
            }
        )
    )
    out = compute_phash(df).toPandas()
    assert len(out) == 1 and pd.isna(out.loc[0, "phash"])
