"""CDC apply-changes: pandas twin, idempotence + composition
properties, tie detection, delete-then-upsert ordering, DuckDB parity
on a real-parquet-derived changelog."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.operators.cdc import apply_changes


def _twin(base, changes, delete_op="delete"):
    latest = (
        changes.sort_values(["k", "seq"])
        .groupby("k", as_index=False)
        .last()
    )
    out = base[~base["k"].isin(latest["k"])]
    ups = latest[latest["op"] != delete_op][base.columns]
    return (
        pd.concat([out, ups])
        .sort_values("k")
        .reset_index(drop=True)
    )


def _mk(seed=7):
    rng = np.random.default_rng(seed)
    base = pd.DataFrame(
        {
            "k": np.arange(50, dtype=np.int64),
            "v": np.round(rng.random(50), 4),
            "tag": [f"b{i}" for i in range(50)],
        }
    )
    n = 120
    changes = pd.DataFrame(
        {
            "k": rng.integers(0, 70, n),  # some brand-new keys
            "v": np.round(rng.random(n), 4),
            "tag": [f"c{i}" for i in range(n)],
            "seq": np.arange(n, dtype=np.int64),
            "op": rng.choice(["upsert", "delete"], n, p=[0.7, 0.3]),
        }
    )
    return base, changes


def _collect(df):
    return (
        df.toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def test_matches_twin_and_properties(spark):
    base, changes = _mk()
    b, c = spark.createDataFrame(base), spark.createDataFrame(changes)
    got = _collect(apply_changes(b, c, "k", "seq"))
    exp = _twin(base, changes)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # new keys inserted, deleted keys absent
    latest = changes.sort_values("seq").groupby("k").last()
    assert set(got["k"]) == (
        set(base["k"]) - set(latest[latest["op"] == "delete"].index)
    ) | set(latest[latest["op"] != "delete"].index)
    # idempotence: re-applying the same changelog is a no-op
    again = _collect(
        apply_changes(spark.createDataFrame(got), c, "k", "seq")
    )
    pd.testing.assert_frame_equal(again, got, check_dtype=False)
    # composition: apply(c1 ++ c2) == apply(apply(c1), c2) when c2
    # orders after c1
    half = len(changes) // 2
    c1, c2 = changes.iloc[:half], changes.iloc[half:]
    two_step = _collect(
        apply_changes(
            apply_changes(b, spark.createDataFrame(c1), "k", "seq"),
            spark.createDataFrame(c2),
            "k",
            "seq",
        )
    )
    pd.testing.assert_frame_equal(two_step, got, check_dtype=False)


def test_tie_detection_and_validation(spark):
    base, changes = _mk(seed=9)
    # duplicate the LAST change (max seq overall -> rank-1 for its key):
    # the winner for that key is ambiguous and strict mode must raise
    tied = pd.concat([changes, changes.iloc[[-1]]])
    with pytest.raises(ValueError, match="ties"):
        apply_changes(
            spark.createDataFrame(base),
            spark.createDataFrame(tied),
            "k",
            "seq",
        )
    # a tie among SUPERSEDED changes (not the key's latest) leaves the
    # winner unambiguous — strict mode must NOT abort that merge
    multi = changes["k"].value_counts()
    k_multi = multi[multi >= 2].index[0]
    oldest = changes[changes["k"] == k_multi].nsmallest(1, "seq")
    assert int(oldest["seq"].iloc[0]) < int(
        changes[changes["k"] == k_multi]["seq"].max()
    )
    benign = pd.concat([changes, oldest])
    got = _collect(
        apply_changes(
            spark.createDataFrame(base),
            spark.createDataFrame(benign),
            "k",
            "seq",
        )
    )
    pd.testing.assert_frame_equal(
        got, _twin(base, changes), check_dtype=False
    )
    with pytest.raises(ValueError, match="missing base columns"):
        apply_changes(
            spark.createDataFrame(base),
            spark.createDataFrame(changes.drop(columns=["tag"])),
            "k",
            "seq",
        )
    # delete then later upsert of the same key -> key lives
    seq = pd.DataFrame(
        {
            "k": [1, 1],
            "v": [0.5, 0.9],
            "tag": ["x", "y"],
            "seq": [1, 2],
            "op": ["delete", "upsert"],
        }
    )
    out = _collect(
        apply_changes(
            spark.createDataFrame(base),
            spark.createDataFrame(seq),
            "k",
            "seq",
        )
    )
    row = out[out["k"] == 1].iloc[0]
    assert row["v"] == 0.9 and row["tag"] == "y"


def test_duckdb_parity_on_real_events(spark):
    import duckdb
    import pyspark.sql.functions as F

    # base = each user's pre-cutoff latest state; changes = post-cutoff
    # events, 'error' events deleting the user's row
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    cutoff = "2024-01-15"
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.where(F.col("ts") < F.lit(cutoff).cast("timestamp_ntz"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "value", "event_id")
    )
    changes = ev.where(
        F.col("ts") >= F.lit(cutoff).cast("timestamp_ntz")
    ).select(
        "user_id",
        "value",
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
    )
    got = sorted(
        (r["user_id"], r["event_id"], round(r["value"], 6))
        for r in apply_changes(
            base, changes, "user_id", "event_id"
        ).collect()
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH e AS (SELECT * FROM '{sf}/events.parquet'
                   WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        base AS (
          SELECT user_id, value, event_id FROM (
            SELECT user_id, value, event_id,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM e WHERE ts < TIMESTAMP '{cutoff}')
          WHERE rn = 1),
        ch AS (SELECT user_id, value, event_id,
                      CASE WHEN event_type = 'error' THEN 'delete'
                           ELSE 'upsert' END AS op
               FROM e WHERE ts >= TIMESTAMP '{cutoff}'),
        latest AS (SELECT * FROM (
                     SELECT ch.*, row_number() OVER (
                         PARTITION BY user_id
                         ORDER BY event_id DESC) AS rn
                     FROM ch) WHERE rn = 1)
        SELECT user_id, event_id, round(value, 6) AS value FROM base
        WHERE user_id NOT IN (SELECT user_id FROM latest)
        UNION ALL
        SELECT user_id, event_id, round(value, 6) FROM latest
        WHERE op <> 'delete'
        """
    ).df()
    exp_rows = sorted(
        (int(r.user_id), int(r.event_id), float(r.value))
        for r in exp.itertuples(index=False)
    )
    assert got == exp_rows and len(got) > 3


def test_snapshot_diff_and_roundtrip(spark):
    import pandas as pd

    from modlyn_spark.operators.cdc import snapshot_diff

    old = pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5],
            "v": [1.0, 2.0, 3.0, None, 5.0],
            "tag": ["a", "b", "c", "d", "e"],
        }
    )
    new = pd.DataFrame(
        {
            "k": [1, 2, 4, 6],  # 3,5 deleted; 6 inserted; 2 updated
            "v": [1.0, 2.5, None, 6.0],  # 4 unchanged incl. NULL == NULL
            "tag": ["a", "b", "d", "f"],
        }
    )
    o, n = spark.createDataFrame(old), spark.createDataFrame(new)
    d = snapshot_diff(o, n, "k")
    got = {r["k"]: r["op"] for r in d.collect()}
    assert got == {2: "update", 3: "delete", 5: "delete", 6: "insert"}
    # delete rows carry the OLD payload (self-describing changelog)
    row3 = next(r for r in d.collect() if r["k"] == 3)
    assert row3["v"] == 3.0 and row3["tag"] == "c"
    # round trip: applying the diff reproduces the new snapshot exactly
    from modlyn_spark.operators.cdc import apply_changes

    redo = apply_changes(
        o, d.withColumn("seq", F.lit(1)), "k", "seq", delete_op="delete"
    )
    got_new = redo.toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_new, new.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )
    # schema mismatch validation
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_diff(o, n.drop("tag"), "k")


def test_snapshot_diff_roundtrip_on_real_parquet(spark):
    import pandas as pd

    from modlyn_spark.operators.cdc import apply_changes, snapshot_diff

    sf = "/root/testdata/sf0.001"
    old = spark.read.parquet(f"{sf}/customer.parquet")
    # synthetic next snapshot: drop a third, perturb a third
    new = (
        old.where(F.col("c_custkey") % 3 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 3 == 1, F.col("c_acctbal") + 10.0
            ).otherwise(F.col("c_acctbal")),
        )
    )
    d = snapshot_diff(old, new, "c_custkey")
    ops = {r["op"] for r in d.select("op").distinct().collect()}
    assert ops == {"update", "delete"}
    redo = apply_changes(
        old, d.withColumn("seq", F.lit(1)), "c_custkey", "seq"
    )
    a = redo.toPandas().sort_values("c_custkey").reset_index(drop=True)
    b = new.toPandas().sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------


def _rand_snapshots(seed):
    """Two snapshots with inserts, deletes, value updates, group MOVES and
    NULL values/groups."""
    rng = np.random.default_rng(seed)
    n = 400
    old = pd.DataFrame(
        {
            "k": np.arange(n),
            "g": rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.2, 0.1]),
            "v": rng.integers(0, 100, n).astype("float64"),
        }
    )
    old.loc[rng.choice(n, 30, replace=False), "v"] = np.nan
    new = old.copy()
    new = new[new["k"] % 7 != 0]  # deletes
    upd = new["k"] % 5 == 0
    new.loc[upd, "v"] = new.loc[upd, "v"].fillna(0) + 1000  # value updates
    mov = new["k"] % 11 == 0
    new.loc[mov, "g"] = "d"  # group moves (into a brand-new group)
    ins = pd.DataFrame(
        {"k": np.arange(n, n + 50), "g": "a", "v": 7.0}
    )
    new = pd.concat([new, ins], ignore_index=True)
    return old, new


def _agg_twin(pdf):
    out = {}
    for g, sub in pdf.groupby("g", dropna=False):
        g = None if pd.isna(g) else g
        nn = int(sub["v"].notna().sum())
        s = float(sub["v"].sum()) if nn else None
        out[g] = (len(sub), nn, s)
    return out


def test_incremental_agg_matches_full_recompute(spark):
    from modlyn_spark.operators.cdc import (
        full_agg,
        incremental_agg,
        snapshot_diff,
    )

    for seed in (3, 19):
        old_pdf, new_pdf = _rand_snapshots(seed)
        old = spark.createDataFrame(old_pdf)
        new = spark.createDataFrame(new_pdf)
        state = full_agg(old, "g", "v")
        diff = snapshot_diff(old, new, "k", include_old=True)
        got = {
            r["g"]: (r["n"], r["nn_v"], r["sum_v"])
            for r in incremental_agg(state, diff, "g", "v").collect()
        }
        want = _agg_twin(new_pdf)
        assert set(got) == set(want)
        for g in want:
            assert got[g][0] == want[g][0], g
            assert got[g][1] == want[g][1], g
            if want[g][2] is None:
                assert got[g][2] is None, g
            else:
                assert got[g][2] == pytest.approx(want[g][2], rel=1e-12), g


def test_incremental_agg_group_vanishes_and_sum_reverts_null(spark):
    from modlyn_spark.operators.cdc import (
        full_agg,
        incremental_agg,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3], "g": ["x", "x", "y"], "v": [5.0, None, 2.0]}
        )
    )
    # delete all of group x; y's remaining row goes NULL-valued
    new = spark.createDataFrame(
        pd.DataFrame({"k": [3], "g": ["y"], "v": [None]}).astype(
            {"v": "float64"}
        )
    )
    state = full_agg(old, "g", "v")
    diff = snapshot_diff(old, new, "k", include_old=True)
    got = {r["g"]: (r["n"], r["nn_v"], r["sum_v"])
           for r in incremental_agg(state, diff, "g", "v").collect()}
    assert got == {"y": (1, 0, None)}


def test_incremental_agg_exact_on_integers(spark):
    """Integer sums must match a fresh full_agg EXACTLY (hash-equal), the
    property the driver oracle relies on."""
    from modlyn_spark.operators.cdc import (
        full_agg,
        incremental_agg,
        snapshot_diff,
    )

    rng = np.random.default_rng(23)
    old_pdf = pd.DataFrame(
        {
            "k": np.arange(1000),
            "g": rng.integers(0, 9, 1000),
            "v": rng.integers(-50, 50, 1000),
        }
    )
    new_pdf = old_pdf[old_pdf["k"] % 3 != 0].copy()
    new_pdf.loc[new_pdf["k"] % 4 == 0, "v"] += 17
    new_pdf.loc[new_pdf["k"] % 13 == 0, "g"] = 9
    old = spark.createDataFrame(old_pdf)
    new = spark.createDataFrame(new_pdf)
    inc = incremental_agg(
        full_agg(old, "g", "v"),
        snapshot_diff(old, new, "k", include_old=True),
        "g",
        "v",
    )
    fresh = full_agg(new, "g", "v")

    def rows(df):
        return sorted(
            (r["g"], r["n"], r["nn_v"], r["sum_v"]) for r in df.collect()
        )

    assert rows(inc) == rows(fresh)


def test_incremental_agg_requires_old_columns(spark):
    from modlyn_spark.operators.cdc import (
        full_agg,
        incremental_agg,
        snapshot_diff,
    )

    old = spark.createDataFrame(pd.DataFrame({"k": [1], "g": ["x"], "v": [1.0]}))
    new = spark.createDataFrame(pd.DataFrame({"k": [1], "g": ["x"], "v": [2.0]}))
    diff = snapshot_diff(old, new, "k")  # include_old=False
    with pytest.raises(ValueError, match="old_g"):
        incremental_agg(full_agg(old, "g", "v"), diff, "g", "v")


def test_incremental_agg_hand_built_changelog_guards(spark):
    """A hand-built changelog that carries SOME old_* columns but not one
    for a payload column it groups/sums on must raise, not silently
    retract at the new value: (a) a sum column always needs old_<c>;
    (b) with key_cols declared, a non-key group column needs old_<c>;
    (c) key_cols declared and the fallback column IS a key -> allowed."""
    from modlyn_spark.operators.cdc import full_agg, incremental_agg

    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "g": ["x", "y"], "v": [1.0, 2.0]})
    )
    # hand-built changelog: op + old_g present, old_v MISSING
    ch_no_old_v = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "g": ["x"],
                "old_g": ["x"],
                "v": [5.0],
                "op": ["update"],
            }
        )
    )
    with pytest.raises(ValueError, match="old_v"):
        incremental_agg(full_agg(old, "g", "v"), ch_no_old_v, "g", "v")
    # old_v present, old_g MISSING, g declared non-key -> raise
    ch_no_old_g = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "g": ["y"],  # the row MOVED groups; old group unknowable
                "old_v": [1.0],
                "v": [5.0],
                "op": ["update"],
            }
        )
    )
    with pytest.raises(ValueError, match="not in key_cols"):
        incremental_agg(
            full_agg(old, "g", "v"), ch_no_old_g, "g", "v", key_cols=["k"]
        )
    # grouping by the declared key itself falls back fine
    got = {
        r["k"]: (r["n"], r["sum_v"])
        for r in incremental_agg(
            full_agg(old, "k", "v"), ch_no_old_g.drop("g"), "k", "v",
            key_cols=["k"],
        ).collect()
    }
    assert got == {1: (1, 5.0), 2: (1, 2.0)}


def test_incremental_agg_group_by_key_column(spark):
    """Grouping by a diff KEY column needs no old_<c> (keys never change
    between snapshots)."""
    from modlyn_spark.operators.cdc import (
        full_agg,
        incremental_agg,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": [1.0, 5.0]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"k": [1, 3], "v": [2.0, 9.0]})
    )
    diff = snapshot_diff(old, new, "k", include_old=True)
    got = {r["k"]: (r["n"], r["sum_v"])
           for r in incremental_agg(full_agg(old, "k", "v"), diff, "k", "v")
           .collect()}
    assert got == {1: (1, 2.0), 3: (1, 9.0)}
