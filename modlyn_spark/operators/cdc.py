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
        # means the winner is arbitrary — fail loudly instead
        dup = (
            changes.groupBy(*keys, *order)
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            vals = {c: dup[0][c] for c in keys + order}
            raise ValueError(
                "changelog has order-column ties (arbitrary winner would "
                f"corrupt the snapshot), e.g. {vals}; add a sequence "
                "column to order_cols or pass strict=False"
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
) -> DataFrame:
    """The changelog BETWEEN two snapshots — :func:`apply_changes`'s
    inverse: one row per key that differs, carrying the NEW payload
    (old payload for deletes, so the row is self-describing) and
    ``op_col`` in {'insert', 'update', 'delete'}. Unchanged keys are
    absent. Round trip (pytest-pinned):
    ``apply_changes(old, snapshot_diff(old, new), ...) == new``.

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
        op_col,
    )
