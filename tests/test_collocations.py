"""collocations: PMI/NPMI phrase table vs an exact Python twin."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from modlyn_spark.operators.lm import collocations

DOCS = [
    "New York is big. New York never sleeps",
    "york is not new",
    "the new house in york",
    "big data is big",
    "",
]


def _twin(min_count):
    big = Counter()
    for d in DOCS:
        toks = re.findall("[a-z0-9]+", d.lower())
        big.update(zip(toks, toks[1:]))
    n = sum(big.values())
    left, right = Counter(), Counter()
    for (w1, w2), c in big.items():
        left[w1] += c
        right[w2] += c
    out = {}
    for (w1, w2), c in big.items():
        if c < min_count:
            continue
        p = c / n
        pmi = math.log(p / ((left[w1] / n) * (right[w2] / n)))
        out[(w1, w2)] = (c, left[w1], right[w2], pmi, pmi / -math.log(p))
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(pd.DataFrame({"text": DOCS}))


def test_matches_twin(df):
    exp = _twin(1)
    got = {
        (r["w1"], r["w2"]): r
        for r in collocations(df, "text", min_count=1).collect()
    }
    assert set(got) == set(exp)
    for k, (c, c1, c2, pmi, npmi) in exp.items():
        r = got[k]
        assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (c, c1, c2)
        assert r["pmi"] == pytest.approx(pmi, abs=1e-12)
        assert r["npmi"] == pytest.approx(npmi, abs=1e-12)


def test_min_count_prunes(df):
    got = collocations(df, "text", min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in got} == set(_twin(2))
    assert all(r["n_pair"] >= 2 for r in got)


def test_npmi_bounds_and_collocation_ranks_first(df):
    rows = collocations(df, "text", min_count=2).collect()
    assert all(-1.0 <= r["npmi"] <= 1.0 for r in rows)
    # twin-verified ranking: (is, big) has the smallest positional
    # marginals among the count>=2 pairs, so it tops npmi; (new, york)
    # is still a positive collocation
    top = max(rows, key=lambda r: r["npmi"])
    assert (top["w1"], top["w2"]) == ("is", "big")
    ny = {(r["w1"], r["w2"]): r["npmi"] for r in rows}[("new", "york")]
    assert ny > 0


def test_single_distinct_pair_npmi_null(spark):
    df1 = spark.createDataFrame(pd.DataFrame({"text": ["ab cd"]}))
    r = collocations(df1, "text", min_count=1).collect()[0]
    # positional marginals: p(pair)=p(ab|1st)=p(cd|2nd)=1 -> pmi = ln 1
    # = 0; -ln p(pair) = 0 -> npmi NULL
    assert r["npmi"] is None and r["pmi"] == pytest.approx(0.0)


def test_min_count_validation(df):
    with pytest.raises(ValueError, match="min_count"):
        collocations(df, "text", min_count=0)
