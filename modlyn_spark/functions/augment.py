"""Deterministic image augmentation: reproducible crops/flips at 10^12 rows.

Training jobs re-augment every epoch. With framework RNGs the pixels a
model saw are unrecoverable after a crash, a resume, or a cluster
resize; debugging a loss spike means replaying the exact batch. Here the
augmentation PARAMETERS are a pure column function of
``(image_id, epoch, seed)`` — the house portable md5 draw
(operators/sampling.py family) — so:

- any engine reproduces the plan bit-for-bit (the plan is SQL; the
  driver oracle replays it in DuckDB);
- resumes, retries and different cluster sizes see identical pixels;
- the plan is a narrow map: no shuffle, storage-order-independent.

Two layers, deliberately split:

- :func:`augmentation_plan` — the parameters table (flip + crop window),
  pure codegen integer arithmetic from the hash units. floor() on the
  scaled unit keeps the arithmetic identical across engines (the same
  double-literal discipline as the split/sample oracles);
- :func:`apply_augmentations` — Arrow-batched decode -> crop -> flip ->
  re-encode (lossless PNG out) using the pure-numpy codecs in
  functions/image.py. Pixels never cross a shuffle: the plan joins onto
  the payload by id (broadcast when epoch-plan-sized), and each batch
  transforms locally.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U32 = float(1 << 32)


def _unit(parts: list[Column], tag: str) -> Column:
    """Uniform [0, 1) md5 draw — portable to any SQL engine."""
    key = F.concat_ws("|", *parts, F.lit(tag))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") / F.lit(
        _U32
    )


def augmentation_plan(
    df: DataFrame,
    *,
    epoch: int,
    seed: int = 0,
    crop_frac: float = 0.875,
    flip_prob: float = 0.5,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Per-image augmentation parameters for one epoch:

    ``(id, flip, crop_x, crop_y, crop_w, crop_h)``

    - ``crop_w/h = max(1, floor(dim * crop_frac))`` (use an exact binary
      fraction — 0.875, 0.75 — so the doubled arithmetic is engine-exact,
      the repo-wide hash-fraction contract);
    - ``crop_x = floor(u * (w - crop_w + 1))`` with an independent draw
      per axis — every valid offset reachable, uniformly;
    - ``flip`` is a Bernoulli(flip_prob) draw.

    Different epochs/seeds redraw independently; the same (image, epoch,
    seed) is identical everywhere, forever.
    """
    if not 0.0 < crop_frac <= 1.0:
        raise ValueError("crop_frac must be in (0, 1]")
    sid = F.col(id_col).cast("string")
    ep = F.lit(str(int(epoch)))
    sd = F.lit(str(int(seed)))
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    cw = F.greatest(F.lit(1), F.floor(w * F.lit(crop_frac)))
    ch = F.greatest(F.lit(1), F.floor(h * F.lit(crop_frac)))
    ux = _unit([sid, ep, sd], "cx")
    uy = _unit([sid, ep, sd], "cy")
    uf = _unit([sid, ep, sd], "fl")
    return df.select(
        F.col(id_col),
        (uf < F.lit(flip_prob)).alias("flip"),
        F.floor(ux * (w - cw + 1)).cast("int").alias("crop_x"),
        F.floor(uy * (h - ch + 1)).cast("int").alias("crop_y"),
        cw.cast("int").alias("crop_w"),
        ch.cast("int").alias("crop_h"),
    )


def duckdb_plan_sql(
    table: str,
    *,
    epoch: int,
    seed: int = 0,
    crop_frac: float = 0.875,
    flip_prob: float = 0.5,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> str:
    """DuckDB twin of :func:`augmentation_plan`, generated from the same
    parameters (single source of truth, the functions/pii.py pattern)."""

    def unit(tag: str) -> str:
        return (
            f"(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || "
            f"'|{int(epoch)}|{int(seed)}|{tag}'), 1, 8)) AS BIGINT) "
            f"/ 4294967296.0)"
        )

    cw = f"greatest(1, CAST(floor({w_col} * {crop_frac!r}) AS BIGINT))"
    ch = f"greatest(1, CAST(floor({h_col} * {crop_frac!r}) AS BIGINT))"
    return f"""
        SELECT {id_col},
               {unit('fl')} < {flip_prob!r} AS flip,
               CAST(floor({unit('cx')} * ({w_col} - {cw} + 1)) AS INT)
                   AS crop_x,
               CAST(floor({unit('cy')} * ({h_col} - {ch} + 1)) AS INT)
                   AS crop_y,
               CAST({cw} AS INT) AS crop_w,
               CAST({ch} AS INT) AS crop_h
        FROM {table}
    """


_AUG_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def apply_augmentations(
    images: DataFrame,
    plan: DataFrame,
    *,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    broadcast_plan: bool = True,
) -> DataFrame:
    """Decode -> crop -> horizontal flip -> lossless PNG re-encode,
    Arrow-batched; one equi-join attaches the (epoch-plan-sized) plan to
    the payload table (broadcast by default — the plan is parameters,
    not pixels), then every batch transforms locally. Output rows:
    (image_id, bytes, w, h, fmt='png')."""
    from modlyn_spark.functions.image import decode_bytes, png_encode

    p = plan.select(
        F.col(id_col), "flip", "crop_x", "crop_y", "crop_w", "crop_h"
    )
    joined = images.select(id_col, bytes_col, fmt_col).join(
        F.broadcast(p) if broadcast_plan else p, id_col
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for _, r in pdf.iterrows():
                px = decode_bytes(bytes(r[bytes_col]), r[fmt_col])
                x, y = int(r["crop_x"]), int(r["crop_y"])
                cw, ch = int(r["crop_w"]), int(r["crop_h"])
                out = px[y:y + ch, x:x + cw]
                if bool(r["flip"]):
                    out = out[:, ::-1]
                out = np.ascontiguousarray(out)
                recs.append(
                    {
                        "image_id": r[id_col],
                        "bytes": png_encode(out),
                        "w": cw,
                        "h": ch,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(recs)

    return joined.mapInPandas(run, schema=_AUG_SCHEMA)
