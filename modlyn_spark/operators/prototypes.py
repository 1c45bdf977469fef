"""Class-prototype margins: embedding-space label-error detection.

The cheapest effective mislabel detector over an embedded corpus (the
spirit of confident learning / prototype networks, built from first
principles): the prototype of a class is its mean embedding; a row
whose vector is closer (by cosine) to ANOTHER class's prototype than to
its own is a label-error candidate, ranked by the (negative) margin

    margin = cos(x, proto[own]) − max_{c != own} cos(x, proto[c]).

The reference ranks features by per-class model weights
(`/root/reference/modlyn/models/_simple_logreg_model.py:170-192`); this
operator is the row-direction analogue — rank ROWS by how badly they
fit their class — and the curation step a labeling pipeline runs before
trusting `adata.obs[label]` as a target.

Physical plan, two stages, both aggregate-bounded:

1. **Prototypes** — posexplode the vectors and `groupBy(label, pos)`
   avg: ONE shuffle of n·d value rows (d = embedding width; the melt is
   the price of an exactly-SQL-reproducible mean — swap in
   `operators/combine.py` numpy partials when d is large and no oracle
   is needed). The result is (classes × d) — aggregate-sized. Centroid
   components are ROUNDED (1e-9) before use: the grouped avg is the one
   float reduction whose order the engine may reorder, and rounding
   re-pins everything downstream to engine-bit-identical arithmetic.
2. **Margins** — prototypes collect into a LITERAL map of unit-
   normalized arrays (label-vocabulary contract, same as the label
   encoders), so the per-row cosine against every class is a pure
   `aggregate`/`zip_with` column expression: zero joins, zero shuffle,
   zero Python in the scoring pass.

NULL vectors and labels absent from the prototype table produce NULL
margins (never flagged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def class_prototypes(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    *,
    ndigits: int = 9,
) -> DataFrame:
    """(label, ``proto`` array<double>) — per-class mean embedding,
    components rounded at ``ndigits`` (see module docstring). Rows with
    NULL label or NULL vector are excluded; ragged widths raise at
    action time via the positional group sizes."""
    melted = (
        df.where(
            F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(
            F.col(label_col).alias("label"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
    )
    comp = melted.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), ndigits).alias("c")
    )
    return (
        comp.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("__s"))
        .select(
            "label",
            F.transform(F.col("__s"), lambda s: s["c"]).alias("proto"),
        )
    )


def _unit(v: list[float]) -> list[float]:
    # math.sqrt, not **0.5: pow(x, 0.5) is not guaranteed correctly
    # rounded, sqrt is — and the SQL oracle uses sqrt
    import math

    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0 else list(v)


def prototype_margins(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    *,
    prototypes: DataFrame | None = None,
    margin_col: str = "proto_margin",
    second_col: str = "nearest_other",
    flag_col: str = "is_mislabel_candidate",
    max_classes: int = 1024,
) -> DataFrame:
    """Input rows + cosine-to-own-prototype margin and the nearest
    OTHER class. ``prototypes`` defaults to :func:`class_prototypes`
    over the input itself (pass a held-out or prior-epoch table to
    avoid the flagged rows dragging their own prototypes).

    The prototype table collects to a broadcast literal and the scoring
    expression embeds one cosine fold PER CLASS — ``max_classes``
    (default 1024) bounds both the closure and the codegen size; past
    it, melt the vectors and join the prototype table instead."""
    protos = (
        class_prototypes(df, label_col, vec_col)
        if prototypes is None
        else prototypes
    )
    rows = protos.collect()
    if len(rows) > max_classes:
        raise ValueError(
            f"{len(rows)} classes exceed the broadcast-prototype "
            f"contract (max_classes={max_classes})"
        )
    if not rows:
        return (
            df.withColumn(margin_col, F.lit(None).cast("double"))
            .withColumn(second_col, F.lit(None).cast("string"))
            .withColumn(flag_col, F.lit(None).cast("boolean"))
        )
    units = {str(r["label"]): _unit([float(x) for x in r["proto"]]) for r in rows}

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )

    def cos_to(unit: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in unit])
        dot = F.aggregate(
            F.zip_with(v, lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(norm > 0, dot / norm)

    lab = F.col(label_col).cast("string")
    own = None
    for name, unit in units.items():
        c = F.when(lab == F.lit(name), cos_to(unit))
        own = c if own is None else F.coalesce(own, c)
    # best OTHER class: array_max over (sim, label) structs of every
    # class except the row's own — ties break toward the LARGER label
    # string via the struct ordering, deterministically
    others = F.array_max(
        F.filter(
            F.array(
                *[
                    F.struct(
                        cos_to(unit).alias("sim"),
                        F.lit(name).alias("other"),
                    )
                    for name, unit in units.items()
                ]
            ),
            lambda s: s["other"] != lab,
        )
    )
    ok = F.col(vec_col).isNotNull() & own.isNotNull() & others.isNotNull()
    margin = F.when(ok, own - others["sim"])
    return (
        df.withColumn(margin_col, margin)
        .withColumn(second_col, F.when(ok, others["other"]))
        .withColumn(flag_col, F.when(ok, margin < 0))
    )
