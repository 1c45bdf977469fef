"""Deterministic mixup pairing and CutMix box geometry.

Mixup (Zhang et al., "mixup: Beyond Empirical Risk Minimization", ICLR
2018) trains on convex combinations ``lam * x_a + (1-lam) * x_b`` of
random sample pairs; CutMix (Yun et al., ICCV 2019) instead pastes a
random box from image b onto image a, with the label weight set to the
surviving area ratio. Both are implemented from the papers' formulas.
At cluster scale the PAIRING PLAN is the data-engineering part: the
trainer needs, per epoch, a reproducible (sample_a, sample_b, lam[,
box]) table that never shuffles pixels — pixels meet only inside the
training step, by reading both manifest entries.

Reference context: modlyn's datamodule has no augmentation stage
(`/root/reference/modlyn/models/_simple_logreg_datamodule.py`); this is
the mixing layer a vision pipeline inserts between the shard manifest
and the loader. Siblings: ``operators/negatives.py`` draws CROSS-class
contrastive negatives from a pool; mixup pairs WITHIN the (optionally
grouped) corpus and carries an interpolation coefficient.

Physical plan — the "roll" pairing (a modular shift of a shuffled
order, the standard distributed-mixup trick): rows hash into ``groups``
independent streams; within a group, row at position i pairs with the
row at ``(i + off_g) mod n_g`` where ``off_g`` is an epoch-keyed hash
in [1, n_g) — a derangement-free bijection (everyone is used exactly
once as a partner, nobody pairs with itself for n_g >= 2). Cost: one
exchange for the in-group window + one co-keyed self-join on (group,
position). Every draw is portable md5 arithmetic, so the plan is a
pure function of (ids, epoch, seed) — bit-identical on any engine.

The interpolation coefficient: mixup's Beta(a, a) has no closed-form
inverse CDF, which would force driver-side sampling; the Kumaraswamy
(a, a) distribution is the standard drop-in with the SAME support and
shape family and a closed form, ``lam = (1 - (1-u)^(1/a))^(1/a)`` —
a pure column expression any engine reproduces. ``alpha=None`` gives
the exact Beta(1,1) = uniform case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modlyn_spark.operators.sampling import _hash_unit


def _lam(u: Column, alpha: float | None) -> Column:
    if alpha is None:
        return u
    inv = 1.0 / float(alpha)
    return F.pow(
        F.lit(1.0) - F.pow(F.lit(1.0) - u, F.lit(inv)), F.lit(inv)
    )


def mixup_pairs(
    df: DataFrame,
    id_cols: str | list[str],
    *,
    epoch: int = 0,
    alpha: float | None = None,
    groups: int = 64,
    seed: str = "",
    lam_col: str = "lam",
) -> DataFrame:
    """Per-epoch mixup pairing plan: one output row per input row with
    the partner's ids (prefixed ``b_``) and the interpolation
    coefficient ``lam_col``.

    Every row appears exactly once as side a and exactly once as side
    b (the pairing is a bijection within each hash group). A singleton
    group degenerates to a self-pair with ``lam = 1.0`` (no mix) — the
    trainer consumes it as a plain sample. ``alpha`` selects the
    Kumaraswamy(a, a) coefficient law (None = uniform, the exact
    Beta(1,1) case)."""
    if groups <= 0:
        raise ValueError("groups must be > 0")
    if epoch < 0:
        raise ValueError("epoch must be >= 0")
    if alpha is not None and alpha <= 0:
        raise ValueError("alpha must be > 0")
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    tag = f"mix|{epoch}|{seed}"
    u = _hash_unit(ids, tag)
    base = (
        df.select(*ids)
        .withColumn("__u", u)
        .withColumn("__g", (F.col("__u") * groups).cast("int"))
    )
    w = Window.partitionBy("__g").orderBy("__u", *ids)
    wg = Window.partitionBy("__g")
    base = (
        base.withColumn("__pos", F.row_number().over(w) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(wg))
    )
    # per-group shift in [1, n_g): an epoch-keyed 60-bit md5 mod (n-1)
    off = F.lit(1) + F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("__g").cast("string"), F.lit(tag)
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.col("__n") - 1,
    )
    lam = _lam(_hash_unit(ids, f"lam|{epoch}|{seed}"), alpha)
    a_side = base.withColumn(
        "__ppos",
        F.when(F.col("__n") >= 2, F.pmod(F.col("__pos") + off, F.col("__n")))
        .otherwise(F.col("__pos")),
    ).withColumn(
        lam_col, F.when(F.col("__n") >= 2, lam).otherwise(F.lit(1.0))
    )
    b_side = base.select(
        F.col("__g").alias("__bg"),
        F.col("__pos").alias("__bpos"),
        *[F.col(c).alias(f"b_{c}") for c in ids],
    )
    return (
        a_side.join(
            b_side,
            (F.col("__g") == F.col("__bg"))
            & (F.col("__ppos") == F.col("__bpos")),
        )
        .select(*ids, *[f"b_{c}" for c in ids], lam_col)
    )


def cutmix_boxes(
    df: DataFrame,
    id_cols: str | list[str],
    w_col: str,
    h_col: str,
    *,
    epoch: int = 0,
    alpha: float | None = None,
    seed: str = "",
) -> DataFrame:
    """Append the CutMix box for each row: ``lam`` (drawn as in
    :func:`mixup_pairs`), integer box ``(box_x, box_y, box_w, box_h)``
    clipped to the image, and ``lam_adj`` — the paper's corrected label
    weight ``1 - box_area / (w * h)``.

    Geometry (Yun 2019 §3.1): the box is ``w * sqrt(1-lam)`` by
    ``h * sqrt(1-lam)`` centered at a uniform point, clipped — so
    ``lam_adj`` can exceed ``lam`` when the box overhangs the border.
    Pure column expressions: ZERO shuffle, zero Python; pixels are
    untouched (the box is manifest metadata the training step applies).
    NULL/non-positive dimensions yield NULL box columns."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    if epoch < 0:
        raise ValueError("epoch must be >= 0")
    if alpha is not None and alpha <= 0:
        raise ValueError("alpha must be > 0")
    wv = F.col(w_col).cast("long")
    hv = F.col(h_col).cast("long")
    ok = wv.isNotNull() & hv.isNotNull() & (wv > 0) & (hv > 0)
    lam = _lam(_hash_unit(ids, f"lam|{epoch}|{seed}"), alpha)
    ux = _hash_unit(ids, f"cx|{epoch}|{seed}")
    uy = _hash_unit(ids, f"cy|{epoch}|{seed}")
    cut = F.sqrt(F.lit(1.0) - F.col("lam"))
    rw = F.floor(wv.cast("double") * cut).cast("long")
    rh = F.floor(hv.cast("double") * cut).cast("long")
    cx = F.floor(ux * wv.cast("double")).cast("long")
    cy = F.floor(uy * hv.cast("double")).cast("long")
    x1 = F.greatest(F.lit(0).cast("long"), cx - F.floor(rw / 2).cast("long"))
    y1 = F.greatest(F.lit(0).cast("long"), cy - F.floor(rh / 2).cast("long"))
    x2 = F.least(wv, x1 + rw)
    y2 = F.least(hv, y1 + rh)
    out = df.withColumn("lam", F.when(ok, lam))
    area = (x2 - x1) * (y2 - y1)
    return (
        out.withColumn("box_x", F.when(ok, x1))
        .withColumn("box_y", F.when(ok, y1))
        .withColumn("box_w", F.when(ok, x2 - x1))
        .withColumn("box_h", F.when(ok, y2 - y1))
        .withColumn(
            "lam_adj",
            F.when(
                ok,
                F.lit(1.0)
                - area.cast("double") / (wv * hv).cast("double"),
            ),
        )
    )
