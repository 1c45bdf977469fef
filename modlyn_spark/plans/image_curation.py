"""End-to-end image+caption curation — curate_corpus's multimodal twin.

The LAION/DataComp-style gate sequence over the engine's image-state table
(image_id, ts, version, bytes, w, h, fmt, caption, phash), producing a
training-ready curated MANIFEST:

1. latest-state reduction: one row per entity (max ts, then max version) —
   the point-in-time snapshot the caption/feature pipelines train on;
2. validity gates (pure column expressions): supported format, side
   bounds, aspect-ratio cap, non-null payload;
3. caption gates: non-null + minimum token count (functions/text.py's
   TOKEN_PATTERN — the same tokenizer as the text tier);
4. exact-payload dedup: portable fingerprint md5(hex(bytes)), keep the
   smallest image_id per fingerprint;
5. perceptual near-dup prune: multi-block pigeonhole hamming join over
   the precomputed ``phash`` column (operators/dedup.hash_hamming_pairs —
   exact recall within the radius); any row with a SMALLER-id neighbor
   within the radius drops (banding-independent min-id rule, same policy
   family as curate_corpus(near_dup_mode="pairs") and semdedup);
6. optional decode validation (Arrow-batched, pytest-gated): bytes must
   decode and match the declared (w, h);
7. leak-free split assignment keyed on image_id (operators/sampling).

Scale shape: the payload ``bytes`` column NEVER crosses a shuffle — its
fingerprint is computed map-side before the entity window, and the output
is a manifest (all metadata + fp + split, no bytes); training jobs
re-attach payloads by a semi-join on image_id against the source table,
which prunes the scan instead of dragging ~100 TB of pixels through every
exchange. Stages 1 and 4 are the only shuffles (entity window; fingerprint
window); stage 5 moves (id, key) pairs only.

Reference context: modlyn filters AnnData matrices in memory
(reference: modlyn/_curate.py-equivalent filtering in core 690-line loop);
this is that intent for the image modality at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.functions.text import token_count
from modlyn_spark.operators.dedup import hash_hamming_pairs
from modlyn_spark.operators.sampling import split_column

SUPPORTED_FMTS = ("png", "qpng", "jpeg")


def _decode_valid(
    df: DataFrame, id_col: str, px_var_min: float | None = None
) -> DataFrame:
    """Keep rows whose payload decodes and matches the declared (w, h) —
    and, with ``px_var_min``, whose decoded pixels are not (near-)constant
    (the classic blank/solid-color junk filter: a placeholder image has
    pixel variance ~0, a real photo hundreds).

    Generic validity twin of functions/image.verify_images (which checks
    against a known reference generator): Arrow-batched, runs BEFORE any
    further shuffle, and only a boolean leaves Python."""
    from typing import Iterator

    import pandas as pd

    from modlyn_spark.functions.image import decode_bytes

    cols = df.columns
    vmin = px_var_min

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep = []
            for _, r in pdf.iterrows():
                try:
                    px = decode_bytes(bytes(r["bytes"]), r["fmt"])
                    ok = px.shape[1] == int(r["w"]) and px.shape[0] == int(r["h"])
                    if ok and vmin is not None:
                        ok = float(px.var()) >= vmin
                    keep.append(ok)
                except Exception:
                    keep.append(False)
            yield pdf[keep]

    return df.mapInPandas(run, schema=df.schema).select(*cols)


def curate_images(
    images: DataFrame,
    *,
    id_col: str = "image_id",
    min_side: int = 16,
    max_side: int = 65536,
    max_aspect: float = 4.0,
    allowed_fmts: tuple[str, ...] = SUPPORTED_FMTS,
    min_caption_tokens: int = 3,
    phash_radius: int | None = 4,
    decode_check: bool = False,
    px_var_min: float | None = None,
    splits: dict | None = None,
    salt: str = "",
    eager: bool = True,
) -> DataFrame:
    """Returns the curated manifest: (image_id, ts, version, w, h, fmt,
    caption, phash, fp[, split]) — one surviving row per entity.

    ``eager=True`` (default, same lifecycle as operators/spans): the
    gated+exact-deduped frame feeds THREE consumers (both sides of the
    hamming self-join and the anti-join left side) — without a cache the
    scan + latest-window + fp-window subtree executes three times. The
    frame is cached, the (manifest-sized) result materialized via
    localCheckpoint, and the cache unpersisted before returning. Pass
    eager=False when composing into a larger lazy plan."""
    iid = F.col(id_col)

    # payload fingerprint map-side, BEFORE any shuffle; bytes then dropped
    slim = images.select(
        id_col, "ts", "version", "w", "h", "fmt", "caption", "phash",
        F.when(F.col("bytes").isNotNull(), F.md5(F.hex(F.col("bytes"))))
        .alias("fp"),
        *(["bytes"] if decode_check or px_var_min is not None else []),
    )

    # 1. latest state per entity
    wlatest = Window.partitionBy(id_col).orderBy(
        F.col("ts").desc(), F.col("version").desc()
    )
    latest = (
        slim.withColumn("__rn", F.row_number().over(wlatest))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 2+3. validity + caption gates (one codegen'd filter)
    side_ok = (
        (F.col("w") >= min_side) & (F.col("w") <= max_side)
        & (F.col("h") >= min_side) & (F.col("h") <= max_side)
    )
    aspect_ok = F.greatest(F.col("w"), F.col("h")) <= F.lit(float(max_aspect)) * F.least(
        F.col("w"), F.col("h")
    )
    caption_ok = F.col("caption").isNotNull() & (
        token_count(F.col("caption")) >= min_caption_tokens
    )
    gated = latest.where(
        F.col("fmt").isin(*allowed_fmts)
        & side_ok
        & aspect_ok
        & F.col("fp").isNotNull()
        & caption_ok
    )

    if decode_check or px_var_min is not None:
        gated = _decode_valid(gated, id_col, px_var_min).drop("bytes")

    # 4. exact-payload dedup: keep min id per fingerprint
    wfp = Window.partitionBy("fp").orderBy(iid.asc())
    exact = (
        gated.withColumn("__rn", F.row_number().over(wfp))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 5. perceptual near-dup prune (min-id rule over the exact pair set)
    out = exact
    cached = None
    if phash_radius is not None:
        if eager:
            exact = exact.cache()
            cached = exact
        pairs = hash_hamming_pairs(
            exact, id_col, "phash", max_hamming=phash_radius
        )
        dropped = pairs.select(F.col("id2").alias(id_col)).distinct()
        out = exact.join(dropped, id_col, "left_anti")

    # 7. split assignment
    if splits is not None:
        out = split_column(out, [id_col], splits, salt=salt)
    if cached is not None:
        out = out.localCheckpoint(eager=True)
        cached.unpersist()
    return out


def build_contrastive_pairs(
    images: DataFrame,
    *,
    k_negatives: int = 4,
    split: str | None = "train",
    seed: int = 0,
    id_col: str = "image_id",
    **curate_kwargs,
) -> DataFrame:
    """CLIP-style contrastive training pairs from the curated manifest —
    the composition a multimodal training job actually consumes:

    1. :func:`curate_images` produces the deduped, gated, split manifest
       (eager: the manifest feeds four consumers below);
    2. anchors are restricted to ONE split (default ``train``) and the
       negative pool is the SAME split — negatives can never leak
       val/test captions into a training batch (run once per split for
       the others);
    3. each surviving image contributes its own caption as the positive
       (label 1, slot -1) and ``k_negatives`` OTHER images' captions
       drawn by ``operators.negatives.sample_negatives`` (label 0; slot
       is the deterministic draw index) — a pure function of
       (anchor, slot, seed), so the training set is identical across
       cluster sizes, partitionings and resumes.

    Output: ``(anchor, item, caption, label, slot)`` where ``caption`` is
    the ITEM's caption (what the text tower encodes against the anchor
    image). Captions attach by one join against the manifest — the bytes
    column is never touched; the training job semi-joins payloads by
    ``anchor`` afterwards (the manifest contract, see module docstring).
    """
    from modlyn_spark.operators.negatives import sample_negatives

    manifest = curate_images(images, id_col=id_col, **curate_kwargs)
    if split is not None:
        if "split" not in manifest.columns:
            raise ValueError("split filtering needs curate_images(splits=...)")
        manifest = manifest.where(F.col("split") == split)

    anchors = manifest.select(
        F.col(id_col).alias("anchor"), F.col("caption")
    )
    positives = anchors.select("anchor", F.col("anchor").alias("item"))
    pool = manifest.select(F.col(id_col).alias("item"))
    negs = sample_negatives(
        positives, pool, anchor_col="anchor", item_col="item",
        k=k_negatives, seed=seed,
    )
    caps = manifest.select(
        F.col(id_col).alias("item"), F.col("caption").alias("__item_cap")
    )
    pos_rows = anchors.select(
        "anchor",
        F.col("anchor").alias("item"),
        F.col("caption"),
        F.lit(1).alias("label"),
        F.lit(-1).cast("long").alias("slot"),
    )
    neg_rows = negs.join(caps, "item").select(
        "anchor",
        "item",
        F.col("__item_cap").alias("caption"),
        F.lit(0).alias("label"),
        F.col("slot").cast("long").alias("slot"),
    )
    return pos_rows.unionByName(neg_rows)
