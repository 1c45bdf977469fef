"""Confident-learning label-error detection (Northcutt, Jiang & Chuang,
"Confident Learning: Estimating Uncertainty in Dataset Labels", JAIR
2021) — implemented from the paper's formulas, not any codebase.

Given out-of-sample predicted probabilities ``p`` and the (possibly
noisy) given label ``y`` for each example:

1. per-class threshold ``t_j`` = mean self-confidence of class j
   (average of ``p_j`` over examples whose GIVEN label is j);
2. the confident prediction for an example is the RESTRICTED argmax
   ``argmax_j { p_j : p_j >= t_j }`` (no class passes -> unconfident,
   excluded);
3. the confident joint ``C[y][y*]`` counts examples by (given,
   predicted); its off-diagonal mass estimates the label-error rate,
   and the off-diagonal examples themselves — ranked by ascending
   self-confidence — are the label-error candidates.

Reference context: modlyn surfaces per-class weights but trusts its
labels (`/root/reference/modlyn/models/_simple_logreg.py`); this is the
label-audit step a curation pipeline runs before training on web-scale
annotations.

Physical plan (scale-first): the thresholds are ONE map-side-combinable
aggregate producing k rows (k = number of classes) collected to the
driver and re-embedded as a LITERAL double array — the same
literal-side-table pattern as ``operators/prototypes.py``. The scoring
pass is then pure JVM array algebra (``zip_with`` mask + first-index
argmax): zero joins, zero shuffles, one scan — at 100 TB the candidate
pass rides the existing scan. (Array HOFs evaluate as CodegenFallback
expressions inside the codegen stage — no Python, but see the input
contract below.) Thresholds are rounded (default
6 dp) BEFORE the comparison so the ``p_j >= t_j`` boundary is identical
on every engine regardless of aggregation order.

Input contract: the probability column should be MATERIALIZED data (a
stored column, or a checkpointed/shuffled one), not a lazily-composed
nested-HOF expression. Spark evaluates array higher-order functions
interpreted (CodegenFallback) with no common-subexpression elimination,
so an expression-valued probs argument re-evaluates its entire subtree
per array element and per reference in the masked-argmax scan —
measured 25x slower than the same scan over materialized vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NEVER = 1.0e308  # threshold for classes never seen as a given label


def class_thresholds(
    df: DataFrame,
    label_idx_col: str,
    probs_col: str,
    *,
    ndigits: int = 6,
) -> DataFrame:
    """Per-class self-confidence thresholds: ``(class_idx, threshold,
    n_class)`` with ``threshold = round(avg(p[given]), ndigits)``.

    Rows with a NULL or out-of-range label index are excluded. ONE
    aggregate; output is class-cardinality-sized."""
    y = F.col(label_idx_col).cast("int")
    p = F.transform(F.col(probs_col), lambda x: x.cast("double"))
    valid = (
        y.isNotNull() & F.col(probs_col).isNotNull() & (y >= 0) & (y < F.size(p))
    )
    return (
        df.where(valid)
        .select(y.alias("class_idx"), F.element_at(p, y + 1).alias("__pt"))
        .groupBy("class_idx")
        .agg(
            F.round(F.avg("__pt"), ndigits).alias("threshold"),
            F.count(F.lit(1)).alias("n_class"),
        )
    )


def _threshold_literal(
    df: DataFrame, label_idx_col: str, probs_col: str, k: int, ndigits: int
) -> Column:
    rows = class_thresholds(
        df, label_idx_col, probs_col, ndigits=ndigits
    ).collect()
    t = [_NEVER] * k
    for r in rows:
        if 0 <= r["class_idx"] < k:
            t[r["class_idx"]] = float(r["threshold"])
    return F.array(*[F.lit(v) for v in t])


def confident_predictions(
    df: DataFrame,
    label_idx_col: str,
    probs_col: str,
    *,
    n_classes: int,
    ndigits: int = 6,
    predicted_col: str = "predicted_idx",
    self_conf_col: str = "self_conf",
) -> DataFrame:
    """Append the confident prediction (restricted argmax, NULL when no
    class clears its threshold; first index wins ties) and the row's
    self-confidence ``p[given]``.

    ``n_classes`` fixes the probability-vector length (vectors of a
    different size yield NULL predictions rather than misaligned
    thresholds). Zero shuffle in the scoring pass."""
    thr = _threshold_literal(df, label_idx_col, probs_col, n_classes, ndigits)
    p = F.transform(F.col(probs_col), lambda x: x.cast("double"))
    ok = F.col(probs_col).isNotNull() & (F.size(p) == n_classes)
    masked = F.zip_with(p, thr, lambda a, b: F.when(a >= b, a))
    mx = F.array_max(masked)  # array_max skips NULL entries
    pred = F.when(
        ok & mx.isNotNull(), F.array_position(masked, mx) - 1
    ).cast("int")
    y = F.col(label_idx_col).cast("int")
    self_conf = F.when(
        ok & y.isNotNull() & (y >= 0) & (y < n_classes),
        F.element_at(p, y + 1),
    )
    return df.withColumn(predicted_col, pred).withColumn(
        self_conf_col, self_conf
    )


def confident_joint(
    df: DataFrame,
    label_idx_col: str,
    probs_col: str,
    *,
    n_classes: int,
    ndigits: int = 6,
) -> DataFrame:
    """The confident joint ``(given_idx, predicted_idx, n)``: counts of
    confidently-predicted examples by (given, predicted). Unconfident
    rows (NULL prediction) and rows without a valid given label are
    excluded — the joint is about the labeled, confidently-mapped mass.
    One aggregate over the shuffle-free scoring pass."""
    scored = confident_predictions(
        df, label_idx_col, probs_col, n_classes=n_classes, ndigits=ndigits
    )
    y = F.col(label_idx_col).cast("int")
    return (
        scored.where(
            F.col("predicted_idx").isNotNull()
            & y.isNotNull()
            & (y >= 0)
            & (y < n_classes)
        )
        .groupBy(
            y.alias("given_idx"), F.col("predicted_idx")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def label_error_candidates(
    df: DataFrame,
    id_cols: str | list[str],
    label_idx_col: str,
    probs_col: str,
    *,
    n_classes: int,
    ndigits: int = 6,
) -> DataFrame:
    """Off-diagonal examples of the confident joint: rows whose
    confident prediction differs from their given label, with
    ``self_conf`` (ascending = most suspicious first) and ``margin`` =
    ``p[predicted] - p[given]`` (how strongly the model disagrees).

    Output: id columns + ``given_idx, predicted_idx, self_conf,
    margin``. The pass is join-free; rank/sort is the caller's choice
    (a global order is a presentation concern, not a plan stage)."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    scored = confident_predictions(
        df, label_idx_col, probs_col, n_classes=n_classes, ndigits=ndigits
    )
    y = F.col(label_idx_col).cast("int")
    p = F.transform(F.col(probs_col), lambda x: x.cast("double"))
    return (
        scored.where(
            F.col("predicted_idx").isNotNull()
            & y.isNotNull()
            & (y >= 0)
            & (y < n_classes)
            & (F.col("predicted_idx") != y)
        )
        .select(
            *ids,
            y.alias("given_idx"),
            "predicted_idx",
            "self_conf",
            (
                F.element_at(p, F.col("predicted_idx") + 1)
                - F.col("self_conf")
            ).alias("margin"),
        )
    )
