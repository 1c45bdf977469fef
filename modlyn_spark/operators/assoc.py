"""Frequent item pairs and association rules (market-basket mining).

The co-occurrence primitive behind "users who X also Y", tag
co-occurrence maps, token collocation mining, and feature-cross
discovery: given (basket, item) rows, find item PAIRS whose joint
support clears a threshold, with confidence and lift for both rule
directions. Implemented from the Apriori/association-rule problem
statement (Agrawal & Srikant, VLDB 1994) — not from any codebase.

Physical plan, in order of the knives that keep 10^12 rows feasible:

1. **Distinct first** — (basket, item) pairs dedup before anything
   else: multiplicity inside one basket is presence, not weight.
2. **Apriori prune** — a pair's support cannot exceed either item's, so
   items below ``min_support`` die BEFORE pair generation: one
   map-side-combinable item count + a broadcast-semi filter of the
   basket stream (the frequent-item table is vocabulary-sized, not
   corpus-sized).
3. **Pair generation** = the basket self-join on the basket key with
   ``item_a < item_b`` — shuffle cost is the surviving stream, compute
   is sum over baskets of k^2 with k = FREQUENT items per basket. That
   k^2 is the step that explodes on pathological baskets (one basket
   holding the whole vocabulary), so ``max_items_per_basket`` guards
   it: the count is one aggregate over the pruned stream, and a basket
   above the cap RAISES with the offending count (pass ``None`` to
   opt out) — the same guard culture as simhash's key cap and
   resample's grid cap.
4. Pair counts group by (item_a, item_b) — map-side combinable; rule
   stats join the vocabulary-sized item-count table back twice
   (broadcast both sides).

Support convention: fractions of the TOTAL BASKET COUNT (the standard
definition); ``lift = P(ab) / (P(a) P(b))``, symmetric; confidence is
directional and emitted both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: float = 0.01,
    min_pair_support: float | None = None,
    max_items_per_basket: int | None = 10_000,
) -> DataFrame:
    """Frequent item pairs with support / confidence / lift.

    Returns one row per unordered pair (``item_a < item_b``):
    ``n_a, n_b, n_ab`` (basket counts), ``support`` (= n_ab / n_baskets),
    ``conf_a_to_b``, ``conf_b_to_a``, ``lift``. ``min_support`` prunes
    single items (apriori bound); ``min_pair_support`` (defaults to
    ``min_support``) prunes the output pairs.
    """
    if not 0.0 < min_support <= 1.0:
        raise ValueError("min_support must be in (0, 1]")
    ps = min_support if min_pair_support is None else min_pair_support
    if not 0.0 < ps <= 1.0:
        raise ValueError("min_pair_support must be in (0, 1]")

    pairs = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .where(F.col("__i").isNotNull() & F.col("__b").isNotNull())
        .distinct()
    )
    n_baskets = pairs.select("__b").distinct().count()
    if n_baskets == 0:
        raise ValueError("no baskets (all basket/item values NULL?)")
    min_n = float(min_support) * n_baskets

    item_counts = pairs.groupBy("__i").agg(F.count("*").alias("__n_item"))
    frequent = item_counts.where(F.col("__n_item") >= min_n)
    kept = pairs.join(F.broadcast(frequent.select("__i")), "__i", "semi")

    if max_items_per_basket is not None:
        worst = (
            kept.groupBy("__b")
            .agg(F.count("*").alias("k"))
            .agg(F.max("k").alias("mx"))
            .collect()[0]["mx"]
        )
        if worst is not None and worst > max_items_per_basket:
            raise ValueError(
                f"a basket holds {worst} frequent items "
                f"(> max_items_per_basket={max_items_per_basket}); pair "
                f"generation is quadratic per basket — raise min_support, "
                f"split the basket upstream, or pass "
                f"max_items_per_basket=None to force"
            )

    a = kept.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = kept.select(F.col("__b"), F.col("__i").alias("item_b"))
    co = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= float(ps) * n_baskets)
    )
    ia = F.broadcast(
        frequent.select(
            F.col("__i").alias("item_a"), F.col("__n_item").alias("n_a")
        )
    )
    ib = F.broadcast(
        frequent.select(
            F.col("__i").alias("item_b"), F.col("__n_item").alias("n_b")
        )
    )
    nb = float(n_baskets)
    return (
        co.join(ia, "item_a")
        .join(ib, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            (F.col("n_ab") / F.lit(nb)).alias("support"),
            (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
            (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
            (
                F.col("n_ab") * F.lit(nb) / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
