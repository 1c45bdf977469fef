"""Repeat-factor sampling: LVIS formulas vs hand arithmetic, the
multi-label max rule, and exact replication of the hash-rounded
oversample plan."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from modlyn_spark.operators.balance import oversample_plan, repeat_factors


def _single_pdf():
    # 8 'a', 2 'b' -> f_a = 0.8, f_b = 0.2
    return pd.DataFrame(
        [{"id": i, "lab": "a" if i < 8 else "b"} for i in range(10)]
    )


def test_single_label_factors(spark):
    got = (
        repeat_factors(spark.createDataFrame(_single_pdf()), "lab",
                       threshold=0.5)
        .toPandas()
        .set_index("id")
    )
    for i in range(10):
        f = 0.8 if i < 8 else 0.2
        want = max(1.0, math.sqrt(0.5 / f))
        assert got.loc[i, "repeat_factor"] == pytest.approx(want, abs=1e-12)


def test_null_label_gets_one(spark):
    pdf = pd.DataFrame(
        [{"id": 0, "lab": "a"}, {"id": 1, "lab": None},
         {"id": 2, "lab": "a"}]
    )
    got = repeat_factors(
        spark.createDataFrame(pdf), "lab", threshold=0.9
    ).toPandas().set_index("id")
    assert got.loc[1, "repeat_factor"] == 1.0
    # f_a = 2/3 of ROWS (null row still counts in the denominator)
    assert got.loc[0, "repeat_factor"] == pytest.approx(
        math.sqrt(0.9 / (2 / 3))
    )


def test_multi_label_max_and_dedup(spark):
    pdf = pd.DataFrame(
        [
            {"id": 0, "labs": ["common", "rare"]},
            {"id": 1, "labs": ["common"]},
            {"id": 2, "labs": ["common", "common"]},  # dup counts once
            {"id": 3, "labs": ["common"]},
            {"id": 4, "labs": []},
            {"id": 5, "labs": None},
        ]
    )
    got = repeat_factors(
        spark.createDataFrame(pdf), "labs", threshold=0.5, multi_label=True
    ).toPandas().set_index("id")
    n = 6
    f_rare, f_common = 1 / n, 4 / n
    r_rare = max(1.0, math.sqrt(0.5 / f_rare))
    r_common = max(1.0, math.sqrt(0.5 / f_common))
    assert got.loc[0, "repeat_factor"] == pytest.approx(max(r_rare, r_common))
    assert got.loc[1, "repeat_factor"] == pytest.approx(r_common)
    assert got.loc[2, "repeat_factor"] == pytest.approx(r_common)
    assert got.loc[4, "repeat_factor"] == 1.0
    assert got.loc[5, "repeat_factor"] == 1.0


def _twin_draw(key: str, epoch: int, salt: str = "") -> float:
    s = f"{key}|rfs|{epoch}|{salt}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32


def test_oversample_plan_exact(spark):
    pdf = _single_pdf()
    got = oversample_plan(
        spark.createDataFrame(pdf), ["id"], "lab", threshold=0.5, epoch=3
    ).toPandas()
    # replicate: r, then floor + deterministic bernoulli
    for i in range(10):
        f = 0.8 if i < 8 else 0.2
        r = max(1.0, math.sqrt(0.5 / f))
        want = math.floor(r) + (1 if _twin_draw(str(i), 3) < r - math.floor(r) else 0)
        copies = got[got["id"] == i]
        assert len(copies) == want, i
        assert sorted(copies["copy_idx"]) == list(range(want))


def test_every_row_survives(spark):
    got = oversample_plan(
        spark.createDataFrame(_single_pdf()), ["id"], "lab", threshold=0.01
    ).toPandas()
    # threshold below every frequency -> all factors 1, plan == input
    assert len(got) == 10
    assert (got["copy_idx"] == 0).all()


def test_epochs_differ(spark):
    # 100/100 split at threshold 0.9: every row has r = sqrt(1.8) with
    # frac ~ 0.342, so every id redraws its bernoulli per epoch — two
    # epochs matching on all 200 draws has probability ~0.55^200
    pdf = pd.DataFrame(
        [{"id": i, "lab": "a" if i % 2 else "b"} for i in range(200)]
    )
    df = spark.createDataFrame(pdf)

    def counts(epoch):
        out = oversample_plan(
            df, ["id"], "lab", threshold=0.9, epoch=epoch
        ).toPandas()
        return out.groupby("id").size().to_dict()

    assert counts(0) != counts(1)


def test_validation(spark):
    df = spark.createDataFrame(_single_pdf())
    with pytest.raises(ValueError):
        repeat_factors(df, "lab", threshold=0.0)
    with pytest.raises(ValueError):
        repeat_factors(df, "lab", threshold=1.5)
    with pytest.raises(ValueError):
        oversample_plan(df, ["id"], "lab", threshold=0.5, epoch=-1)


# ---------------------------------------------------------------------------
# effective-number class weights (Cui et al. 2019)
# ---------------------------------------------------------------------------


def test_effective_number_weights_hand_arithmetic(spark):
    from modlyn_spark.operators.balance import effective_number_weights

    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1 + [(None,)], "label string"
    )
    got = {
        r["label"]: r
        for r in effective_number_weights(df, "label", beta=0.9).collect()
    }
    assert set(got) == {"a", "b"}  # NULL labels excluded
    raw_a = 0.1 / (1.0 - 0.9**3)
    raw_b = 0.1 / (1.0 - 0.9)
    s = raw_a + raw_b
    assert got["a"]["n"] == 3 and got["b"]["n"] == 1
    assert got["a"]["weight"] == pytest.approx(raw_a / s * 2, abs=1e-8)
    assert got["b"]["weight"] == pytest.approx(raw_b / s * 2, abs=1e-8)
    # weights sum to the number of classes
    assert sum(r["weight"] for r in got.values()) == pytest.approx(2.0)


def test_effective_number_limits(spark):
    from modlyn_spark.operators.balance import effective_number_weights

    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 1, "label string"
    )
    # beta -> 0: uniform weights regardless of counts
    got0 = {
        r["label"]: r["weight"]
        for r in effective_number_weights(df, "label", beta=0.0).collect()
    }
    assert got0["a"] == pytest.approx(1.0) and got0["b"] == pytest.approx(1.0)
    # beta close to 1: approaches inverse frequency (9x ratio)
    got1 = {
        r["label"]: r["weight"]
        for r in effective_number_weights(
            df, "label", beta=0.99999
        ).collect()
    }
    assert got1["b"] / got1["a"] == pytest.approx(9.0, rel=1e-3)
    import pytest as _pt

    with _pt.raises(ValueError):
        effective_number_weights(df, "label", beta=1.0)
