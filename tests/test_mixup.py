from __future__ import annotations

import hashlib

import pytest

from modlyn_spark.operators.mixup import cutmix_boxes, mixup_pairs


def _ids(spark, n, parts=None):
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return df.repartition(parts) if parts else df


def test_bijection_and_no_self_pairs(spark):
    got = mixup_pairs(_ids(spark, 500), "id", epoch=1, groups=8).collect()
    assert len(got) == 500
    a = [r["id"] for r in got]
    b = [r["b_id"] for r in got]
    assert sorted(a) == list(range(500))
    # partner side is a bijection: every row is used exactly once as b
    assert sorted(b) == list(range(500))
    assert all(r["id"] != r["b_id"] for r in got)
    assert all(0.0 <= r["lam"] <= 1.0 for r in got)


def test_deterministic_at_any_parallelism(spark):
    a = {
        (r["id"], r["b_id"], round(r["lam"], 12))
        for r in mixup_pairs(_ids(spark, 300, 3), "id", epoch=2).collect()
    }
    b = {
        (r["id"], r["b_id"], round(r["lam"], 12))
        for r in mixup_pairs(_ids(spark, 300, 11), "id", epoch=2).collect()
    }
    assert a == b


def test_epoch_redeals(spark):
    e0 = {
        r["id"]: r["b_id"]
        for r in mixup_pairs(_ids(spark, 200), "id", epoch=0).collect()
    }
    e1 = {
        r["id"]: r["b_id"]
        for r in mixup_pairs(_ids(spark, 200), "id", epoch=1).collect()
    }
    assert sum(1 for i in e0 if e0[i] != e1[i]) > 100


def test_singleton_group_self_pair(spark):
    got = mixup_pairs(_ids(spark, 1), "id", groups=4).collect()
    assert len(got) == 1
    assert got[0]["id"] == got[0]["b_id"]
    assert got[0]["lam"] == 1.0


def test_kumaraswamy_lambda_shape(spark):
    # alpha < 1 pushes mass to the extremes: mean of |lam - 0.5| should
    # exceed the uniform case's (0.25) clearly
    uni = mixup_pairs(_ids(spark, 2000), "id", alpha=None).collect()
    kum = mixup_pairs(_ids(spark, 2000), "id", alpha=0.2).collect()
    m_uni = sum(abs(r["lam"] - 0.5) for r in uni) / len(uni)
    m_kum = sum(abs(r["lam"] - 0.5) for r in kum) / len(kum)
    assert m_kum > m_uni + 0.1
    assert all(0.0 <= r["lam"] <= 1.0 for r in kum)


def test_exact_hash_replication(spark):
    """The lam draw replicates hashlib md5 exactly (portable contract)."""
    got = {
        r["id"]: r["lam"]
        for r in mixup_pairs(
            _ids(spark, 50), "id", epoch=3, seed="s", groups=4
        ).collect()
    }
    n_multi = 0
    for i in range(50):
        u = (
            int(hashlib.md5(f"{i}|lam|3|s".encode()).hexdigest()[:8], 16)
            / 2**32
        )
        if got[i] != 1.0:  # singleton groups pin lam to 1.0
            assert got[i] == pytest.approx(u, abs=1e-15)
            n_multi += 1
    assert n_multi >= 45


def test_validation(spark):
    df = _ids(spark, 5)
    with pytest.raises(ValueError):
        mixup_pairs(df, "id", groups=0)
    with pytest.raises(ValueError):
        mixup_pairs(df, "id", epoch=-1)
    with pytest.raises(ValueError):
        mixup_pairs(df, "id", alpha=0.0)


# ---------------------------------------------------------------------------
# CutMix boxes
# ---------------------------------------------------------------------------


def _imgs(spark, rows):
    return spark.createDataFrame(rows, "id long, w long, h long")


def test_cutmix_geometry(spark):
    rows = [(i, 640, 480) for i in range(300)]
    got = cutmix_boxes(_imgs(spark, rows), "id", "w", "h", epoch=1).collect()
    for r in got:
        assert 0 <= r["box_x"] and r["box_x"] + r["box_w"] <= 640
        assert 0 <= r["box_y"] and r["box_y"] + r["box_h"] <= 480
        area = r["box_w"] * r["box_h"]
        assert r["lam_adj"] == pytest.approx(1.0 - area / (640 * 480))
        # unclipped box area is (1-lam) * w * h (floor-rounded); the
        # clipped area can only be smaller -> lam_adj >= lam - rounding
        assert r["lam_adj"] >= r["lam"] - 0.01


def test_cutmix_null_dims(spark):
    rows = [(0, None, 480), (1, 640, 0), (2, 640, 480)]
    got = {
        r["id"]: r
        for r in cutmix_boxes(_imgs(spark, rows), "id", "w", "h").collect()
    }
    assert got[0]["box_x"] is None and got[0]["lam_adj"] is None
    assert got[1]["box_w"] is None
    assert got[2]["box_w"] is not None


def test_cutmix_no_shuffle_no_python(spark):
    df = cutmix_boxes(_imgs(spark, [(0, 64, 64)]), "id", "w", "h")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan
