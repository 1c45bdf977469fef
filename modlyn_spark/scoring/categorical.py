"""Categorical feature scoring: chi-square independence and weight of
evidence / information value.

The numeric scorers (``scoring.stats`` F-test/Wilcoxon,
``scoring.selection`` MI/PSI — reference modlyn scores per-feature
signal the same way on expression matrices) leave the CATEGORICAL half
of a feature table unscored. This module closes that:

- :func:`chi2_scores` — Pearson chi-square statistic of each feature
  column against a label, over the full value × label grid (unobserved
  cells contribute their expected mass, matching the textbook
  contingency test);
- :func:`woe_iv` — per-category weight of evidence against a binary
  label with additive smoothing, plus the per-feature information value
  (the credit-scoring feature-ranking standard).

Scale design: ALL feature columns melt into one ``(feature, value,
label)`` frame (a pure column ``explode`` — no per-column pass) feeding
ONE map-side-combinable ``groupBy(...).count()``; every expected-count /
smoothing / log step then runs over the tiny cells aggregate
(``Σ_f |values_f| × |labels|`` rows), never over the data. One data
shuffle total regardless of how many features are scored. Every formula
is plain double arithmetic so a SQL engine replays it exactly.

Semantics pinned for the oracle:
- rows with a NULL label are dropped globally; a NULL feature VALUE is
  dropped for that feature only (per-feature n may differ);
- chi2 grid = observed distinct values × observed distinct labels per
  feature; ``dof = (|values| - 1) * (|labels| - 1)``;
- WOE smoothing: ``p_i = (pos_i + alpha) / (pos_tot + alpha * |values|)``
  (same for negatives), ``woe_i = ln(p_i / q_i)``,
  ``iv = Σ_i (p_i - q_i) * woe_i`` over the same smoothed shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """One melted pass: ``(feature, value, label, c)`` observed counts."""
    if not feature_cols:
        raise ValueError("feature_cols must not be empty")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.col(c).cast("string").alias("value"),
            )
            for c in feature_cols
        ]
    )
    return (
        df.where(F.col(label_col).isNotNull())
        .select(
            F.col(label_col).cast("string").alias("label"),
            F.explode(pairs).alias("fv"),
        )
        .select("fv.feature", "fv.value", "label")
        .where(F.col("value").isNotNull())
        .groupBy("feature", "value", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def chi2_scores(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """Chi-square statistic of every feature column vs ``label_col``:
    ``(feature, chi2, dof, n)``, one row per feature.

    ``chi2 = Σ_cells (o - e)² / e`` with ``e = row_tot · col_tot / n``
    over the FULL grid — a (value, label) pair never observed together
    still contributes ``e`` (o = 0), exactly like the textbook test.
    Computed in the algebraically-identical closed form over observed
    cells only (see inline note), with margins as window sums over the
    cells aggregate: one scan, one shuffle, no grid materialization.
    """
    from pyspark.sql import Window

    cells = _cells(df, feature_cols, label_col)
    # margins via windows over the CELLS aggregate — no self-joins, so the
    # data is scanned exactly once. The closed form
    #   chi2 = Σ_observed o²·n/(rt·ct) − n
    # equals Σ_fullgrid (o−e)²/e (expand: Σ o²/e − 2Σo + Σe, and Σe over
    # the FULL grid telescopes to n) — unobserved cells are accounted for
    # without materializing them.
    rt = F.sum("c").over(Window.partitionBy("feature", "value"))
    ct = F.sum("c").over(Window.partitionBy("feature", "label"))
    nt = F.sum("c").over(Window.partitionBy("feature"))
    g = cells.select(
        "feature",
        "value",
        "label",
        (
            F.col("c").cast("double") * F.col("c") * nt / (rt * ct)
        ).alias("__t"),
        nt.alias("__n"),
    )
    per = g.groupBy("feature", "__n").agg(
        (F.sum("__t") - F.col("__n")).alias("chi2"),
        F.count_distinct("value").alias("nv"),
        F.count_distinct("label").alias("nl"),
    )
    return per.select(
        "feature",
        "chi2",
        ((F.col("nv") - 1) * (F.col("nl") - 1)).cast("long").alias("dof"),
        F.col("__n").cast("long").alias("n"),
    )


def woe_iv(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    positive: str,
    *,
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Weight of evidence per category and information value per feature
    against the binary event ``label == positive``.

    Returns ``(woe_df, iv_df)``: ``woe_df`` is ``(feature, value,
    n_pos, n_neg, woe)``; ``iv_df`` is ``(feature, iv)``. Smoothing
    ``alpha`` keeps zero-event categories finite (see module docstring
    for the exact shares)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero cells must stay finite)")
    from pyspark.sql import Window

    cells = _cells(df, feature_cols, label_col)
    is_pos = (F.col("label") == F.lit(positive)).cast("long")
    pv = cells.groupBy("feature", "value").agg(
        F.sum(F.col("c") * is_pos).alias("n_pos"),
        F.sum(F.col("c") * (1 - is_pos)).alias("n_neg"),
    )
    # feature totals as windows over the tiny per-value aggregate — one
    # data scan, no self-join
    wf = Window.partitionBy("feature")
    a = float(alpha)
    j = pv.select(
        "feature", "value", "n_pos", "n_neg",
        F.sum("n_pos").over(wf).alias("tp"),
        F.sum("n_neg").over(wf).alias("tn"),
        F.count(F.lit(1)).over(wf).alias("nv"),
    ).select(
        "feature",
        "value",
        "n_pos",
        "n_neg",
        ((F.col("n_pos") + a) / (F.col("tp") + a * F.col("nv"))).alias("p"),
        ((F.col("n_neg") + a) / (F.col("tn") + a * F.col("nv"))).alias("q"),
    )
    woe = j.select(
        "feature",
        "value",
        "n_pos",
        "n_neg",
        F.log(F.col("p") / F.col("q")).alias("woe"),
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
            "__ivc"
        ),
    )
    iv = woe.groupBy("feature").agg(F.sum("__ivc").alias("iv"))
    return woe.drop("__ivc"), iv
