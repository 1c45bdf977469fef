"""Inter-annotator agreement: Fleiss' kappa over a ratings table.

Labels produced by crowds (or by model ensembles voting on training
data) need an agreement number before they are trusted as targets.
Fleiss' kappa (Fleiss 1971, "Measuring nominal scale agreement among
many raters" — implemented from the published formulas, generalized to
varying raters-per-item by restricting to items with >= 2 ratings):

    P_i   = Σ_j n_ij (n_ij − 1) / (n_i (n_i − 1))   per-item agreement
    P̄    = mean_i P_i                               observed agreement
    p_j   = Σ_i n_ij / Σ_i n_i                      category marginals
    P̄_e  = Σ_j p_j²                                 chance agreement
    κ     = (P̄ − P̄_e) / (1 − P̄_e)

Reference context: modlyn consumes `adata.obs[label]` as ground truth
(`/root/reference/modlyn/models/_simple_logreg_datamodule.py:97`);
this operator is the upstream quality gate on how that label column was
produced.

Physical plan: ONE shuffle on the item key — `groupBy(item, label)`
counts feed a same-key `groupBy(item)` re-aggregate (Catalyst keeps the
partitioning; no second exchange of the data), and everything after is
aggregate-sized: the category-marginal table is label-cardinality rows,
the result is ONE row. Per-item state is the item's distinct-label
histogram — bounded by the rating fan-in, never by corpus size. This is
the shape that survives 100 TB of ratings: the only data-sized exchange
is the item hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def category_marginals(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """(label, n_ratings, p_j) over items with >= 2 ratings — the
    marginal distribution Fleiss' chance term is built from."""
    eligible = _eligible(df, item_col, label_col)
    tot = eligible.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_ratings")
    )
    # unpartitioned window over a label-cardinality table: bounded by
    # the category vocabulary, never by data size
    return tot.withColumn(
        "p_j", F.col("n_ratings") / F.sum("n_ratings").over(Window.partitionBy())
    )


def _eligible(df: DataFrame, item_col: str, label_col: str) -> DataFrame:
    """Rows of items with >= 2 non-null ratings (kappa is undefined on
    singletons)."""
    clean = df.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    )
    per_item = clean.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("__n_i")
    )
    return clean.join(
        per_item.where(F.col("__n_i") >= 2), item_col, "left_semi"
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    *,
    ndigits: int = 8,
) -> DataFrame:
    """ONE row: (kappa, p_bar, p_e, n_items, n_ratings, n_categories).

    Items with fewer than 2 non-null ratings are excluded (agreement is
    undefined there); duplicate (item, rater) rows are the caller's
    modeling choice — every row counts as one rating. Returns kappa =
    NULL when no item qualifies or when P̄_e = 1 (all raters always
    pick the same single category — agreement is vacuous). Float
    reductions over item-sized sums are rounded at ``ndigits`` so the
    result is engine-reproducible."""
    eligible = _eligible(df, item_col, label_col)
    cells = eligible.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).alias("__nij")
    )
    items = cells.groupBy(item_col).agg(
        F.sum("__nij").alias("__ni"),
        F.sum(F.col("__nij") * (F.col("__nij") - 1)).alias("__agree"),
    )
    per_item = items.select(
        (
            F.col("__agree")
            / (F.col("__ni") * (F.col("__ni") - F.lit(1)))
        ).alias("__pi"),
        F.col("__ni"),
    )
    # category marginals: label-cardinality-sized
    marg = cells.groupBy(label_col).agg(F.sum("__nij").alias("__nj"))
    totals = per_item.agg(
        F.avg("__pi").alias("p_bar"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__ni").alias("n_ratings"),
    )
    pe = marg.agg(
        F.sum("__nj").alias("__tot"),
        F.sum(F.col("__nj") * F.col("__nj")).alias("__sq"),
        F.count(F.lit(1)).alias("n_categories"),
    ).select(
        (F.col("__sq") / (F.col("__tot") * F.col("__tot"))).alias("p_e"),
        "n_categories",
    )
    out = totals.crossJoin(pe)  # 1 row x 1 row
    kappa = F.when(
        (F.col("n_items") > 0) & (F.col("p_e") < 1.0),
        (F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")),
    )
    return out.select(
        F.round(kappa, ndigits).alias("kappa"),
        F.round("p_bar", ndigits).alias("p_bar"),
        F.round("p_e", ndigits).alias("p_e"),
        "n_items",
        "n_ratings",
        "n_categories",
    )
