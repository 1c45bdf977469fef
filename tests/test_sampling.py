"""Deterministic sampling/splitting: partitioning-independence, exact
DuckDB parity of the selected row SET (the portability claim), stratum
exactness, and the zero-leakage split property."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from modlyn_spark.operators.sampling import (
    hash_sample,
    split_column,
    stratified_sample,
    stratified_take,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_matches_duckdb_exactly(spark):
    got = sorted(
        r["doc_id"]
        for r in hash_sample(_docs(spark), ["doc_id"], 0.3, salt="s1")
        .select("doc_id")
        .collect()
    )
    exp = sorted(
        r[0]
        for r in duckdb.sql(
            f"""
            SELECT doc_id FROM '{SF}/documents.parquet'
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|s1'), 1, 8))
                       AS BIGINT) / 4294967296.0 < 0.3
            """
        ).fetchall()
    )
    assert got == exp and len(got) > 0


def test_hash_sample_partitioning_independent(spark):
    docs = _docs(spark)
    a = set(r["doc_id"] for r in hash_sample(docs.repartition(13), ["doc_id"], 0.25).select("doc_id").collect())
    b = set(r["doc_id"] for r in hash_sample(docs.coalesce(1), ["doc_id"], 0.25).select("doc_id").collect())
    assert a == b
    n = docs.count()
    assert abs(len(a) / n - 0.25) < 0.1  # binomial tolerance at n=500
    # different salt redraws (almost surely a different set)
    c = set(r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.25, salt="x").select("doc_id").collect())
    assert c != a


def test_stratified_sample_respects_per_label_fractions(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = stratified_sample(
        emb, "label", {0: 1.0, 1: 0.0}, ["vec_id"], default=0.5
    ).groupBy("label").count().collect()
    counts = {r["label"]: r["count"] for r in out}
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    assert counts[0] == base[0]          # fraction 1.0 keeps everything
    assert 1 not in counts               # fraction 0.0 drops the stratum
    for lab in base:
        if lab in (0, 1):
            continue
        assert abs(counts.get(lab, 0) / base[lab] - 0.5) < 0.25


def test_stratified_take_exact_counts_and_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = stratified_take(emb, "label", 7, ["vec_id"])
    counts = {r["label"]: r["count"] for r in out.groupBy("label").count().collect()}
    base = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    for lab, n in base.items():
        assert counts[lab] == min(7, n)
    ids1 = sorted(r["vec_id"] for r in out.select("vec_id").collect())
    ids2 = sorted(
        r["vec_id"]
        for r in stratified_take(emb.repartition(17), "label", 7, ["vec_id"])
        .select("vec_id")
        .collect()
    )
    assert ids1 == ids2


def test_stratified_take_skew_prefilter_exact_and_narrow(spark):
    """The approximate hash-threshold pre-filter (r3 verdict item 6) must
    (a) leave the output IDENTICAL to the plain exact window and (b) feed
    the window only ~n + 10*sqrt(n) + 50 rows of a skewed stratum, not
    the whole stratum."""
    import hashlib

    n = 10
    rows = pd.DataFrame(
        {
            "k": range(5000),
            # one label holds 96% of the corpus — the skew shape that
            # would serialize the naive window on a single reducer
            "label": ["hot"] * 4800 + ["cold"] * 200,
        }
    )
    df = spark.createDataFrame(rows).repartition(16)
    got = (
        stratified_take(df, "label", n, ["k"])
        .toPandas()
        .sort_values(["label", "k"])
        .reset_index(drop=True)
    )
    # independent exact twin: n smallest md5(key|salt) per label
    rows["h"] = [
        hashlib.md5(f"{k}|".encode()).hexdigest() for k in rows["k"]
    ]
    exp = (
        rows.sort_values("h")
        .groupby("label", sort=False)
        .head(n)[["k", "label"]]
        .sort_values(["label", "k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "label"]], exp)

    # the pre-filter bound: rows entering the window per label
    cut = (n + 10.0 * n**0.5 + 50.0)
    u = rows["h"].str[:8].apply(lambda s: int(s, 16)) / 2**32
    survivors = (u < cut / 4800)[rows["label"] == "hot"].sum()
    assert survivors < 200  # ~91 expected, vs 4800 unfiltered
    # and they are sufficient (the n-th smallest is inside the cutoff)
    assert survivors >= n


def test_source_mix_plan_and_apply(spark):
    """Domain mixing: the plan hits the requested token mixture (up to
    Bernoulli noise), caps full sources at fraction 1 with a reported
    deficit, and apply is deterministic under repartitioning."""
    import numpy as np

    from modlyn_spark.operators.sampling import (
        apply_source_mix,
        source_mix_plan,
    )

    rng = np.random.default_rng(5)
    rows = []
    sizes = {"web": 4000, "books": 400, "code": 2000}
    i = 0
    for src, n_docs in sizes.items():
        for _ in range(n_docs):
            rows.append({"doc_id": i, "source": src,
                         "n_tokens": int(rng.integers(50, 150))})
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows))
    plan = source_mix_plan(
        df, "source", "n_tokens",
        token_budget=120_000,
        weights={"web": 1.0, "books": 1.0, "code": 2.0},
    )
    p = {r["source"]: r for r in plan.collect()}
    # books: target 30k > available (~40k? no: 400 docs * ~100 = ~40k).
    # compute from the plan itself: invariants, not magic numbers
    for src, r in p.items():
        target = 120_000 * r["weight"] / 4.0
        assert r["target_tokens"] == pytest.approx(target)
        if r["available_tokens"] >= target:
            assert r["fraction"] == pytest.approx(target / r["available_tokens"])
            assert r["deficit_tokens"] == 0.0
        else:
            assert r["fraction"] == 1.0
            assert r["deficit_tokens"] == pytest.approx(
                target - r["available_tokens"]
            )
    out = apply_source_mix(df, plan, "source", ["doc_id"], salt="m")
    got = out.toPandas()
    # sampled token mass per source ~ target (Bernoulli, ~1% tolerance at
    # these counts) for the non-capped sources; capped sources keep all
    mass = got.groupby("source")["n_tokens"].sum()
    for src, r in p.items():
        if r["fraction"] < 1.0:
            assert abs(mass[src] / r["target_tokens"] - 1) < 0.05
        else:
            assert mass[src] == r["available_tokens"]
    ids_a = sorted(got["doc_id"])
    ids_b = sorted(
        r["doc_id"]
        for r in apply_source_mix(
            df.repartition(17), plan, "source", ["doc_id"], salt="m"
        ).select("doc_id").collect()
    )
    assert ids_a == ids_b
    with pytest.raises(ValueError, match="token_budget"):
        source_mix_plan(df, "source", "n_tokens", token_budget=0)


def test_split_column_partition_function_and_no_leakage(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = split_column(ev, ["user_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
    # every row assigned, fractions sane at the KEY level
    per_user = out.select("user_id", "split").distinct()
    # zero leakage: each user_id maps to exactly ONE split even though it
    # recurs across many event rows (events at this SF: ~15 users, ~10k rows)
    multi = per_user.groupBy("user_id").count().where("count > 1").count()
    assert multi == 0
    assert {r["split"] for r in per_user.collect()} <= {"train", "val", "test"}
    # fraction accuracy needs a larger key population: 500 doc_ids
    docs = split_column(
        _docs(spark), ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    frac = {r["split"]: r["count"] for r in docs.groupBy("split").count().collect()}
    total = sum(frac.values())
    assert total == _docs(spark).count()
    assert abs(frac["train"] / total - 0.8) < 0.06  # ~3 sigma at n=500
    with pytest.raises(ValueError, match="sum to 1"):
        split_column(ev, ["user_id"], {"a": 0.5, "b": 0.4})


def test_null_key_components_draw_independently(spark):
    """concat_ws SKIPS nulls, so without explicit encoding the composite
    keys (NULL,'a') and ('a',NULL) — and NULL vs '' — would build the
    same key string and share one draw. The sentinel encoding keeps
    distinct composite keys on distinct draws, while non-null keys hash
    exactly as before (oracle strings unchanged)."""
    import hashlib

    from modlyn_spark.operators.sampling import _hash_unit

    pdf = pd.DataFrame(
        {
            "a": [None, "a", None, "", "x"],
            "b": ["a", None, "", None, "y"],
        }
    )
    df = spark.createDataFrame(pdf).select(
        "a", "b", _hash_unit(["a", "b"], "s").alias("u")
    )
    rows = {(r["a"], r["b"]): r["u"] for r in df.collect()}
    # the four null/empty composites are four DISTINCT draws
    assert len(set(rows.values())) == 5
    # non-null keys still hash as the plain '<a>|<b>|<salt>' string —
    # bit-compatibility with every existing md5 oracle
    exp = int(hashlib.md5(b"x|y|s").hexdigest()[:8], 16) / float(2**32)
    assert abs(rows[("x", "y")] - exp) < 1e-15


def test_hash_sample_pandas_twin(spark):
    """The same decision rule reproduced in pandas/hashlib — the oracle
    pattern any external system can implement."""
    import hashlib

    docs = _docs(spark).select("doc_id").toPandas()
    keep = docs["doc_id"][
        docs["doc_id"].map(
            lambda d: int(hashlib.md5(f"{d}|".encode()).hexdigest()[:8], 16)
            / 2**32
            < 0.4
        )
    ]
    got = sorted(
        r["doc_id"]
        for r in hash_sample(_docs(spark), ["doc_id"], 0.4).select("doc_id").collect()
    )
    assert got == sorted(keep.tolist())


# ---------------------------------------------------------------------------
# temporal split with embargo
# ---------------------------------------------------------------------------


def test_time_split_partitions_and_embargo(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from modlyn_spark.operators.sampling import time_split

    pdf = pd.DataFrame(
        {
            "rid": range(100),
            "ts": pd.date_range("2024-01-01", periods=100, freq="D"),
        }
    )
    df = spark.createDataFrame(pdf)
    cut = F.lit("2024-03-01").cast("timestamp")
    out = time_split(
        df, "ts", cut, embargo=F.expr("INTERVAL 7 DAYS")
    ).toPandas()
    cutoff = pd.Timestamp("2024-03-01")
    assert (out.loc[out["ts"] < cutoff, "split"] == "train").all()
    emb = (out["ts"] >= cutoff) & (out["ts"] < cutoff + pd.Timedelta(days=7))
    assert (out.loc[emb, "split"] == "embargo").all()
    assert (out.loc[out["ts"] >= cutoff + pd.Timedelta(days=7), "split"]
            == "test").all()
    assert set(out["split"]) == {"train", "embargo", "test"}
    # every row assigned exactly once; boundaries leak nowhere
    assert out["split"].notna().all()
    # no embargo: test starts exactly at the cutoff
    out2 = time_split(df, "ts", cut).toPandas()
    assert (out2.loc[out2["ts"] >= cutoff, "split"] == "test").all()
    assert set(out2["split"]) == {"train", "test"}


def test_time_split_on_real_ntz_parquet(spark):
    from pyspark.sql import functions as F

    from modlyn_spark.operators.sampling import time_split

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    med = ev.selectExpr(
        "percentile(cast(cast(ts as timestamp_ltz) as long), 0.5) p"
    ).collect()[0]["p"]
    cut = F.timestamp_seconds(F.lit(float(med))).cast("timestamp_ntz")
    out = time_split(ev, "ts", cut, embargo=F.expr("INTERVAL 1 DAY"))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("train", 0) > 0 and counts.get("test", 0) > 0


# ---------------------------------------------------------------------------
# rebalance_fractions (largest feasible target-distribution subsample)
# ---------------------------------------------------------------------------


def test_rebalance_uniform_hand_arithmetic(spark):
    from modlyn_spark.operators.sampling import rebalance_fractions

    rows = [("a",)] * 90 + [("b",)] * 30 + [("c",)] * 60
    df = spark.createDataFrame(rows, "label string")
    p = rebalance_fractions(df, "label")
    # uniform target: binding class is b (30) -> 30 per class
    assert p["b"] == pytest.approx(1.0)
    assert p["a"] == pytest.approx(30 / 90)
    assert p["c"] == pytest.approx(30 / 60)


def test_rebalance_target_and_drops(spark):
    from modlyn_spark.operators.sampling import rebalance_fractions

    rows = [("a",)] * 80 + [("b",)] * 20 + [("x",)] * 5
    df = spark.createDataFrame(rows, "label string")
    p = rebalance_fractions(df, "label", target={"a": 3, "b": 1})
    # normalized target (.75, .25); M = min(80/.75, 20/.25) = 80
    assert p["a"] == pytest.approx(0.75 * 80 / 80)
    assert p["b"] == pytest.approx(0.25 * 80 / 20)
    assert p["x"] == 0.0  # not in target -> dropped
    import pytest as _pt

    with _pt.raises(ValueError):
        rebalance_fractions(df, "label", target={"zzz": 1})


def test_rebalance_composes_with_stratified_sample(spark):
    from modlyn_spark.operators.sampling import (
        rebalance_fractions,
        stratified_sample,
    )

    rows = [(i, "a" if i % 4 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, label string")
    p = rebalance_fractions(df, "label")
    kept = stratified_sample(df, "label", p, ["id"]).groupBy("label").count()
    got = {r["label"]: r["count"] for r in kept.collect()}
    # expected ~1000 of each (hash-Bernoulli: allow 10% band)
    assert abs(got["a"] - 1000) < 100
    assert got["b"] == 1000  # binding class keeps everything
