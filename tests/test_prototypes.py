"""Prototype margins: centroid parity with numpy, planted-mislabel
recall, the held-out prototype path, and NULL/degenerate contracts."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.prototypes import (
    class_prototypes,
    prototype_margins,
)


def _corpus():
    """3 well-separated clusters; rows 0/1 carry a WRONG label."""
    rng = np.random.default_rng(5)
    centers = {"a": [10, 0, 0, 0], "b": [0, 10, 0, 0], "c": [0, 0, 10, 0]}
    rows = []
    i = 0
    for lab, c in centers.items():
        for _ in range(30):
            v = (np.asarray(c, dtype=float) + rng.normal(0, 0.5, 4)).tolist()
            rows.append({"id": i, "label": lab, "vec": v})
            i += 1
    # planted mislabels: an 'a'-cluster point labeled 'b', and vice versa
    rows[0]["label"] = "b"
    rows[30]["label"] = "a"
    return pd.DataFrame(rows)


def twin_protos(pdf):
    out = {}
    for lab, grp in pdf.dropna(subset=["label", "vec"]).groupby("label"):
        m = np.mean(np.stack(grp["vec"].to_numpy()), axis=0)
        out[lab] = [round(float(x), 9) for x in m]
    return out


def test_prototypes_match_numpy(spark):
    pdf = _corpus()
    got = {
        r["label"]: list(r["proto"])
        for r in class_prototypes(
            spark.createDataFrame(pdf), "label", "vec"
        ).collect()
    }
    want = twin_protos(pdf)
    assert set(got) == set(want)
    for lab in want:
        assert got[lab] == pytest.approx(want[lab], abs=1e-9)


def twin_margin(v, own, units):
    nv = math.sqrt(sum(x * x for x in v))
    if nv == 0:
        return None, None
    sims = {
        lab: sum(a * b for a, b in zip(v, u)) / nv
        for lab, u in units.items()
    }
    # max by (sim, label): ties toward the larger label string
    other, osim = max(
        ((lab, s) for lab, s in sims.items() if lab != own),
        key=lambda kv: (kv[1], kv[0]),
    )
    return sims[own] - osim, other


def test_margins_match_twin_and_catch_planted(spark):
    pdf = _corpus()
    got = (
        prototype_margins(spark.createDataFrame(pdf), "label", "vec")
        .orderBy("id")
        .toPandas()
    )
    protos = twin_protos(pdf)
    units = {}
    for lab, p in protos.items():
        n = math.sqrt(sum(x * x for x in p))
        units[lab] = [x / n for x in p]
    for _, r in got.iterrows():
        m, other = twin_margin(list(r["vec"]), r["label"], units)
        assert r["proto_margin"] == pytest.approx(m, abs=1e-12), r["id"]
        assert r["nearest_other"] == other
    # exactly the two planted rows are flagged
    flagged = set(got[got["is_mislabel_candidate"]]["id"])
    assert flagged == {0, 30}


def test_heldout_prototypes(spark):
    pdf = _corpus()
    clean = pdf[pdf["id"].isin({0, 30}) == False]  # noqa: E712
    protos = class_prototypes(
        spark.createDataFrame(clean), "label", "vec"
    )
    got = prototype_margins(
        spark.createDataFrame(pdf), "label", "vec", prototypes=protos
    ).toPandas()
    flagged = set(got[got["is_mislabel_candidate"]]["id"])
    assert flagged == {0, 30}
    # margins with held-out prototypes are at least as negative for the
    # planted rows (their own wrong vectors no longer pull the centroid)
    full = prototype_margins(
        spark.createDataFrame(pdf), "label", "vec"
    ).toPandas()
    for i in (0, 30):
        h = got.loc[got["id"] == i, "proto_margin"].iloc[0]
        f = full.loc[full["id"] == i, "proto_margin"].iloc[0]
        assert h <= f + 1e-12


def test_null_and_unknown_label(spark):
    pdf = _corpus().head(60)  # labels a, b only
    extra = pd.DataFrame(
        [
            {"id": 900, "label": "zz", "vec": [1.0, 0, 0, 0]},
            {"id": 901, "label": "a", "vec": None},
        ]
    )
    df = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    # prototypes built from the clean a/b corpus only: 'zz' is a label
    # WITHOUT a prototype (self-built prototypes would give it one —
    # every present label always self-prototypes)
    protos = class_prototypes(spark.createDataFrame(pdf), "label", "vec")
    got = (
        prototype_margins(df, "label", "vec", prototypes=protos)
        .toPandas()
        .set_index("id")
    )
    assert pd.isna(got.loc[900, "proto_margin"])  # label has no prototype
    assert pd.isna(got.loc[901, "proto_margin"])  # null vector
    assert got.loc[900, "is_mislabel_candidate"] is None or pd.isna(
        got.loc[900, "is_mislabel_candidate"]
    )
    # self-built path: 'zz' prototypes itself and is its own best match
    self_got = prototype_margins(df, "label", "vec").toPandas().set_index("id")
    assert self_got.loc[900, "proto_margin"] > 0


def test_single_class_never_flags(spark):
    pdf = pd.DataFrame(
        [{"id": i, "label": "only", "vec": [float(i), 1.0]} for i in range(5)]
    )
    got = prototype_margins(
        spark.createDataFrame(pdf), "label", "vec"
    ).toPandas()
    assert got["proto_margin"].isna().all()


def test_max_classes_guard(spark):
    pdf = pd.DataFrame(
        [{"id": i, "label": f"c{i}", "vec": [1.0, float(i)]} for i in range(5)]
    )
    with pytest.raises(ValueError):
        prototype_margins(
            spark.createDataFrame(pdf), "label", "vec", max_classes=3
        )


def test_no_shuffle_in_scoring_pass(spark):
    """With prototypes supplied, the scoring pass is join-free: the
    only Exchange in the plan belongs to the (tiny) prototype build,
    not to the scored data."""
    pdf = _corpus()
    protos = class_prototypes(spark.createDataFrame(pdf), "label", "vec")
    protos_pdf = protos.toPandas()
    protos_df = spark.createDataFrame(protos_pdf)
    plan = (
        prototype_margins(
            spark.createDataFrame(pdf), "label", "vec",
            prototypes=protos_df,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
