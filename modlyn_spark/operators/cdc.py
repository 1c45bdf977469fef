"""Change-data-capture merge: apply a changelog to a base snapshot.

The lakehouse maintenance primitive (Delta MERGE / "APPLY CHANGES
INTO" shape) that keeps a 10^12-row entity table current from an
upsert/delete stream without a runtime table format: given a base
snapshot and a changelog carrying the same payload columns plus an
operation column, produce the next snapshot —

- per key, only the LATEST change (by the caller's ``order_cols``,
  descending) is consulted: a full changelog replay collapses to one
  row per changed key before it ever meets the base;
- latest op delete  -> the key disappears;
- latest op upsert  -> the key takes the change row's payload;
- untouched keys pass through from the base.

Physical plan: one window shuffle on the changelog (keyed by the
entity — the changelog is normally orders of magnitude smaller than the
base), then a single left-anti join against the collapsed change-key
set (broadcastable when the changelog is small; AQE decides) and a
union. The base never sorts and never shuffles beyond that join.

Determinism contract: ``order_cols`` must totally order each key's
changes (ts + a sequence column in real CDC feeds). Ties are NOT
silently broken — ``strict=True`` (default) counts keys whose top-2
changes compare equal on every order column and raises, because an
arbitrary winner silently corrupts the snapshot; pass ``strict=False``
only when upstream guarantees uniqueness and the extra aggregate
matters.

Properties (pytest-pinned): idempotent (re-applying the same changelog
is a no-op) and composable (apply(c1 ++ c2) == apply(apply(c1), c2)
when c2's changes order after c1's per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | str,
    order_cols: list[str] | str,
    *,
    op_col: str = "op",
    delete_op: str = "delete",
    strict: bool = True,
) -> DataFrame:
    """Next snapshot from ``base`` + ``changes``. ``changes`` must carry
    every ``base`` column plus ``op_col``; the output schema is the base
    schema."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    missing = set(base.columns) - set(changes.columns)
    if missing:
        raise ValueError(
            f"changes missing base columns: {sorted(missing)}"
        )
    if op_col not in changes.columns:
        raise ValueError(f"changes lacks op column {op_col!r}")

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order]
    )
    ranked = changes.withColumn("__rn", F.row_number().over(w))
    if strict:
        # a tie on every order column between the top-2 changes of a key
        # means the winner is arbitrary — fail loudly instead. Only
        # RANK-1 ties matter: rank() (unlike row_number) assigns 1 to
        # every row tied at the top, so a key is ambiguous iff it has
        # >1 rank-1 row; ties among already-superseded changes (ranks
        # 3/4) never pick the winner and must not abort the merge.
        dup = (
            changes.withColumn("__rk", F.rank().over(w))
            .where(F.col("__rk") == 1)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("__c"),
                *[F.first(F.col(c)).alias(c) for c in order],
            )
            .where(F.col("__c") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            vals = {c: dup[0][c] for c in keys + order}
            raise ValueError(
                "changelog has order-column ties on a key's LATEST "
                "change (arbitrary winner would corrupt the snapshot), "
                f"e.g. {vals}; add a sequence column to order_cols or "
                "pass strict=False"
            )
    latest = ranked.where(F.col("__rn") == 1).drop("__rn")
    upserts = latest.where(F.col(op_col) != F.lit(delete_op)).select(
        *base.columns
    )
    untouched = base.join(latest.select(*keys), on=keys, how="left_anti")
    return untouched.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    *,
    op_col: str = "op",
    include_old: bool = False,
) -> DataFrame:
    """The changelog BETWEEN two snapshots — :func:`apply_changes`'s
    inverse: one row per key that differs, carrying the NEW payload
    (old payload for deletes, so the row is self-describing) and
    ``op_col`` in {'insert', 'update', 'delete'}. Unchanged keys are
    absent. Round trip (pytest-pinned):
    ``apply_changes(old, snapshot_diff(old, new), ...) == new``.

    ``include_old=True`` additionally emits ``old_<c>`` for every payload
    column (NULL on inserts) — the form downstream incremental consumers
    need to RETRACT an update's previous contribution (see
    :func:`incremental_agg`).

    One full-outer shuffle join on the keys — the honest cost of
    diffing two snapshots — then pure codegen null-safe comparison
    (``eqNullSafe`` per payload column; NULL == NULL is "unchanged",
    matching SQL's IS NOT DISTINCT FROM). Both inputs must share a
    schema and be key-unique (a duplicated key makes "the" diff
    ill-defined; the join would fan out and the caller's snapshot
    invariant is already broken upstream)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    payload = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in payload],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in payload],
        F.lit(True).alias("__in_n"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, on=cond, how="full_outer")
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_o").isNull(), F.lit("insert"))
        .when(F.col("__in_n").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    out = j.withColumn(op_col, op).where(F.col(op_col).isNotNull())
    old_cols = (
        [F.col(f"__o_{c}").alias(f"old_{c}") for c in payload]
        if include_old
        else []
    )
    return out.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        *[
            F.when(
                F.col(op_col) == "delete", F.col(f"__o_{c}")
            ).otherwise(F.col(f"__n_{c}")).alias(c)
            for c in payload
        ],
        *old_cols,
        op_col,
    )


def full_agg(
    df: DataFrame,
    group_cols: list[str] | str,
    sum_cols: list[str] | str,
    *,
    count_col: str = "n",
) -> DataFrame:
    """The maintainable aggregate state over a snapshot: per group, the
    row count plus (non-null count, sum) per value column — exactly the
    algebra :func:`incremental_agg` can keep current from a changelog
    without touching the snapshot again. Output:
    ``[*group_cols, count_col, nn_<c>..., sum_<c>...]``."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    sums = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    return df.groupBy(*groups).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.count(F.col(c)).alias(f"nn_{c}") for c in sums],
        *[F.sum(F.col(c)).alias(f"sum_{c}") for c in sums],
    )


def incremental_agg(
    state: DataFrame,
    changes: DataFrame,
    group_cols: list[str] | str,
    sum_cols: list[str] | str,
    *,
    count_col: str = "n",
    op_col: str = "op",
    key_cols: list[str] | str | None = None,
) -> DataFrame:
    """Maintain a count/sum aggregate from a changelog — never rescan the
    base snapshot.

    ``state`` is :func:`full_agg`'s output over the old snapshot;
    ``changes`` is :func:`snapshot_diff(old, new, include_old=True)``
    (or any changelog with the same shape: new payload in the value
    columns, previous payload in ``old_<c>``, ``op`` in
    insert/update/delete). Each change decomposes into retractions:

    - insert  -> +1 row at the NEW group with the new values
    - delete  -> -1 row at the OLD group with the old values
    - update  -> both (so a row MOVING between groups is handled)

    The retraction stream aggregates map-side to one tiny delta row per
    touched group (shuffle is changelog-sized, never snapshot-sized),
    then merges into the state with one full-outer join on the group
    keys (null-safe: NULL is a real group). Groups whose count reaches
    zero disappear; sums revert to NULL when their non-null count does
    (matching a fresh ``full_agg`` over the new snapshot EXACTLY for
    integer/decimal columns — pytest-pinned; float sums agree up to
    reassociation). min/max are NOT maintainable from a changelog
    without the full value multiset and are deliberately absent.

    A group/sum column with no ``old_<c>`` in ``changes`` is assumed to
    be one of the diff's KEY columns (keys never change, so the current
    value is its own retraction). Declare ``key_cols`` to have that
    assumption enforced — any non-key column lacking ``old_<c>`` then
    raises instead of silently retracting at the new value; without
    ``key_cols`` the fallback is accepted for GROUP columns only (sum
    columns are payload by construction and always raise).

    The 100 TB story: a daily 0.1% churn changelog updates a 10^12-row
    rollup with work proportional to the CHURN; the state table is the
    only other input and it is group-cardinality-sized.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    sums = [sum_cols] if isinstance(sum_cols, str) else list(sum_cols)
    keys = (
        None
        if key_cols is None
        else ([key_cols] if isinstance(key_cols, str) else list(key_cols))
    )

    has_old = any(c.startswith("old_") for c in changes.columns)

    def old_side(c: str):
        # payload columns carry their retraction value in old_<c>; diff
        # KEY columns never change so they have no old_<c> and the current
        # value IS the old value. Without ANY old_* column the changelog
        # cannot retract updates at all — refuse instead of silently
        # subtracting the new value.
        if f"old_{c}" in changes.columns:
            return F.col(f"old_{c}")
        if not has_old or c not in changes.columns:
            raise ValueError(
                f"changes lacks old_{c}: build them with "
                "snapshot_diff(..., include_old=True)"
            )
        # the current value is a valid retraction ONLY when c is a diff
        # key (keys never change between snapshots). With key_cols
        # declared, enforce that exactly; without it, keep the documented
        # fallback for GROUP columns but refuse SUM columns — a sum
        # column is payload by construction (its value changes on
        # updates), so retracting the NEW value would corrupt the state.
        if keys is not None:
            if c in keys:
                return F.col(c)
            raise ValueError(
                f"changes lacks old_{c} and {c!r} is not in key_cols: a "
                "hand-built changelog must carry old_* for every payload "
                "column it groups or sums on"
            )
        if c in sums:
            raise ValueError(
                f"changes lacks old_{c} for sum column {c!r}: build the "
                "changelog with snapshot_diff(..., include_old=True), or "
                f"declare key_cols=[...] if {c!r} is a diff-key column"
            )
        return F.col(c)

    minus = changes.where(F.col(op_col).isin("update", "delete")).select(
        *[old_side(g).alias(g) for g in groups],
        *[old_side(c).alias(c) for c in sums],
        F.lit(-1).alias("__w"),
    )
    plus = changes.where(F.col(op_col).isin("update", "insert")).select(
        *groups, *sums, F.lit(1).alias("__w")
    )
    delta = (
        minus.unionByName(plus)
        .groupBy(*groups)
        .agg(
            F.sum("__w").alias("__dn"),
            *[
                F.sum(
                    F.when(F.col(c).isNotNull(), F.col("__w")).otherwise(F.lit(0))
                ).alias(f"__dnn_{c}")
                for c in sums
            ],
            *[F.sum(F.col("__w") * F.col(c)).alias(f"__ds_{c}") for c in sums],
        )
    )

    s = state.select(
        *[F.col(g).alias(f"__sg_{g}") for g in groups],
        F.col(count_col).alias("__sn"),
        *[F.col(f"nn_{c}").alias(f"__snn_{c}") for c in sums],
        *[F.col(f"sum_{c}").alias(f"__ss_{c}") for c in sums],
    )
    cond = None
    for g in groups:
        c = F.col(f"__sg_{g}").eqNullSafe(F.col(g))
        cond = c if cond is None else (cond & c)
    j = s.join(delta, on=cond, how="full_outer")

    def z(col):  # missing side contributes zero
        return F.coalesce(col, F.lit(0))

    n_new = z(F.col("__sn")) + z(F.col("__dn"))
    out_cols = [
        F.coalesce(F.col(f"__sg_{g}"), F.col(g)).alias(g) for g in groups
    ]
    out_cols.append(n_new.alias(count_col))
    for c in sums:
        nn_new = z(F.col(f"__snn_{c}")) + z(F.col(f"__dnn_{c}"))
        out_cols.append(nn_new.alias(f"nn_{c}"))
        out_cols.append(
            F.when(
                nn_new > 0, z(F.col(f"__ss_{c}")) + z(F.col(f"__ds_{c}"))
            ).alias(f"sum_{c}")
        )
    return j.select(*out_cols).where(F.col(count_col) > 0)
