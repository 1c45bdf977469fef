"""Association rules: pandas twin parity (explicit double loop over
baskets), apriori-prune equivalence (pruned == unpruned output), basket
multiplicity-is-presence semantics, the quadratic-basket guard, and
partition invariance."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from modlyn_spark.operators.assoc import frequent_pairs


def _twin(pdf: pd.DataFrame, min_support: float, ps: float | None = None):
    ps = min_support if ps is None else ps
    baskets = (
        pdf.dropna()
        .drop_duplicates()
        .groupby("b")["i"]
        .apply(lambda s: sorted(set(s)))
    )
    n = len(baskets)
    item_n: dict[str, int] = {}
    for items in baskets:
        for it in items:
            item_n[it] = item_n.get(it, 0) + 1
    pair_n: dict[tuple, int] = {}
    for items in baskets:
        for x, y in itertools.combinations(items, 2):
            pair_n[(x, y)] = pair_n.get((x, y), 0) + 1
    rows = []
    for (x, y), nab in pair_n.items():
        if item_n[x] < min_support * n or item_n[y] < min_support * n:
            continue
        if nab < ps * n:
            continue
        rows.append(
            {
                "item_a": x,
                "item_b": y,
                "n_a": item_n[x],
                "n_b": item_n[y],
                "n_ab": nab,
                "support": nab / n,
                "conf_a_to_b": nab / item_n[x],
                "conf_b_to_a": nab / item_n[y],
                "lift": nab * n / (item_n[x] * item_n[y]),
            }
        )
    return (
        pd.DataFrame(
            rows,
            columns=[
                "item_a", "item_b", "n_a", "n_b", "n_ab",
                "support", "conf_a_to_b", "conf_b_to_a", "lift",
            ],
        )
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )


def _pdf():
    rows = []
    for b in range(60):
        items = {f"i{(b * 7 + j * 13) % 10}" for j in range(1 + b % 5)}
        if b % 3 == 0:
            items |= {"bread", "butter"}
        if b % 6 == 0:
            items.add("jam")
        for i in items:
            rows.append({"b": f"b{b}", "i": i})
    # duplicate (basket, item) rows: multiplicity must not inflate counts
    rows += [{"b": "b0", "i": "bread"}] * 3
    rows += [{"b": None, "i": "bread"}, {"b": "b1", "i": None}]
    return pd.DataFrame(rows)


def _got(spark, pdf, **kw):
    out = (
        frequent_pairs(spark.createDataFrame(pdf), "b", "i", **kw)
        .toPandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    return out


def test_twin_parity(spark):
    pdf = _pdf()
    got = _got(spark, pdf, min_support=0.1)
    exp = _twin(pdf, 0.1)
    assert len(got) == len(exp) and len(got) > 5
    for c in ["item_a", "item_b"]:
        assert (got[c] == exp[c]).all(), c
    for c in ["n_a", "n_b", "n_ab"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    for c in ["support", "conf_a_to_b", "conf_b_to_a", "lift"]:
        pd.testing.assert_series_equal(
            got[c], exp[c], check_exact=False, rtol=1e-12
        )


def test_planted_rule_lift(spark):
    got = _got(spark, _pdf(), min_support=0.1)
    row = got[(got["item_a"] == "bread") & (got["item_b"] == "butter")]
    assert len(row) == 1
    # bread and butter always co-occur -> confidence 1 both ways, lift = n/n_a
    assert row["conf_a_to_b"].iloc[0] == 1.0
    assert row["conf_b_to_a"].iloc[0] == 1.0
    assert row["lift"].iloc[0] > 2.0


def test_pair_support_threshold(spark):
    pdf = _pdf()
    loose = _got(spark, pdf, min_support=0.1, min_pair_support=0.1)
    tight = _got(spark, pdf, min_support=0.1, min_pair_support=0.3)
    assert len(tight) < len(loose)
    assert (tight["support"] >= 0.3).all()


def test_basket_guard(spark):
    rows = [{"b": "mega", "i": f"i{j}"} for j in range(50)]
    rows += [{"b": f"b{k}", "i": f"i{j}"} for k in range(20) for j in range(50)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    with pytest.raises(ValueError, match="max_items_per_basket"):
        frequent_pairs(df, "b", "i", min_support=0.5, max_items_per_basket=10)
    out = frequent_pairs(
        df, "b", "i", min_support=0.5, max_items_per_basket=None
    )
    assert out.count() == 50 * 49 // 2


def test_partition_invariance(spark):
    pdf = _pdf()
    a = _got(spark, pdf, min_support=0.1)
    df = spark.createDataFrame(pdf).repartition(11)
    b = (
        frequent_pairs(df, "b", "i", min_support=0.1)
        .toPandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame([{"b": "x", "i": "y"}]))
    with pytest.raises(ValueError, match="min_support"):
        frequent_pairs(df, "b", "i", min_support=0.0)
    with pytest.raises(ValueError, match="min_pair_support"):
        frequent_pairs(df, "b", "i", min_support=0.5, min_pair_support=2.0)
    empty = spark.createDataFrame(pd.DataFrame([{"b": None, "i": "y"}]))
    with pytest.raises(ValueError, match="no baskets"):
        frequent_pairs(empty, "b", "i", min_support=0.5)
