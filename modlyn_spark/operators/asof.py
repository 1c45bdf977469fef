"""Point-in-time (as-of) join.

For each left row ``(key, left_ts)``, attach the payload of the latest right
row with ``right.ts <= left_ts`` (strictly ``<`` when
``allow_exact_matches=False``) for the same key — never a future row (zero
temporal leakage).

The reference engine (laminlabs/modlyn) has no such operator: it assumes the
AnnData count matrix is already aligned to its labels positionally
(reference: modlyn/models/_simple_logreg_datamodule.py:93-99). This operator
is the distributed substrate that produces that alignment from raw
event-state tables (BASELINE.json north_rule).

Three physical strategies, all pure PySpark:

``union``
    Single-shuffle, whole-stage-codegen path. Left and right are unioned with
    a side tag, shuffled once by key, and the right payload is carried
    forward with ``last(payload, ignorenulls=True)`` over a
    ``(key) ORDER BY (ts, side)`` running window. Catalyst/Tungsten handle
    everything; AQE coalesces the shuffle. Best general-purpose plan.

``merge``
    The explicit merge-scan recipe: both sides are co-bucketed by key hash
    (optionally salted for hot keys), cogrouped, and merged per bucket with a
    vectorized Arrow UDF running ``pandas.merge_asof``. Hot keys (detected or
    supplied) are salted: the left side's hot rows are scattered across
    ``salt_factor`` shards by a hash of their timestamp, and the right side's
    hot-key history is replicated into every shard, so no single task
    serializes a skewed entity.

``broadcast``
    Zero-shuffle path for a small right side: the right table is collected,
    sorted once, broadcast to every executor, and each left partition is
    merged against it with ``mapInPandas``. The left side is never shuffled.

Scale notes (100 TB design point): ``union`` shuffles left+right once on the
join key — the minimum possible data movement for a sort-based as-of join;
``merge`` shuffles the same volume but exchanges whole-stage codegen for
explicit skew control; ``broadcast`` moves only the right side (driver +
executor memory bound, guarded by ``broadcast_max_rows``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_BUCKET = "__asof_bucket"
_SIDE = "__asof_side"
_TS = "__asof_ts"
_RTS = "__asof_right_ts"


def _right_payload_cols(
    right: DataFrame, on: list[str], right_ts: str, right_cols: list[str] | None
) -> list[str]:
    if right_cols is not None:
        return list(right_cols)
    return [c for c in right.columns if c not in set(on) | {right_ts}]


def _merged_schema(
    left: DataFrame,
    right: DataFrame,
    payload: list[str],
    matched_ts_col: str | None,
    right_ts: str,
) -> StructType:
    fields = list(left.schema.fields)
    right_fields = {f.name: f for f in right.schema.fields}
    for c in payload:
        f = right_fields[c]
        fields.append(StructField(c, f.dataType, nullable=True))
    if matched_ts_col:
        fields.append(
            StructField(matched_ts_col, right_fields[right_ts].dataType, nullable=True)
        )
    return StructType(fields)


def _denanify(pdf: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """pd.merge_asof fills unmatched payload cells with float NaN. For
    scalar payloads Arrow maps NaN -> NULL, but for NESTED payload types
    (array/struct columns — e.g. a rolling-history array riding through
    the as-of) Arrow refuses to coerce a float into a list ("'float'
    object is not iterable"). Normalize NaN to None on object-dtype
    payload columns so unmatched rows serialize as NULL for any type."""
    for c in cols:
        if c in pdf.columns and pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda x: None
                if x is None or (isinstance(x, float) and np.isnan(x))
                else x
            )
    return pdf


def _check_no_clash(left: DataFrame, payload: list[str], matched_ts_col: str | None):
    clash = (set(payload) | ({matched_ts_col} if matched_ts_col else set())) & set(
        left.columns
    )
    if clash:
        raise ValueError(
            f"right payload columns {sorted(clash)} clash with left columns; "
            "rename them (right.withColumnRenamed) or pass right_cols"
        )


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimizer size estimate (no job launched)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62  # unknown -> treat as large


def _broadcast_threshold(df: DataFrame) -> int:
    """Same knob Catalyst's broadcast-join selection uses."""
    v = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    v = v.lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix):
            v, mult = v[:-1], m
            break
    try:
        n = int(v) * mult
    except ValueError:
        n = 10 << 20
    return n if n > 0 else 0  # -1 disables broadcast


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    *,
    allow_exact_matches: bool = True,
    tolerance: Column | None = None,
    strategy: str = "auto",
    num_buckets: int | None = None,
    hot_keys: list | None = None,
    hot_key_threshold: int | None = None,
    salt_factor: int = 8,
    broadcast_max_rows: int = 2_000_000,
    matched_ts_col: str | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Point-in-time join: latest right state at each left timestamp.

    Args:
        left: probe side; one output row per left row.
        right: state side (entity history).
        on: equi-join key column(s), present in both sides.
        left_ts: timestamp column on the left ("feature timestamp").
        right_ts: timestamp column on the right (default: same name as left_ts).
        right_cols: right payload columns to attach (default: all right columns
            except the key(s) and right_ts). Must not clash with left names.
        allow_exact_matches: if True (default) a right row at exactly
            ``left_ts`` matches (``<=``); if False, strictly earlier (``<``).
        tolerance: optional max age as a Column interval (e.g.
            ``F.expr("INTERVAL 1 HOUR")``): matches older than
            ``left_ts - tolerance`` are nulled out.
        strategy: "auto" | "union" | "merge" | "broadcast".
        num_buckets: bucket count for the merge strategy (default: auto —
            sized to the Catalyst input-size estimate at ~64 MB per
            bucket, floored at spark.sql.shuffle.partitions; see
            _auto_num_buckets).
        hot_keys: explicit list of skewed key values to salt (merge strategy).
        hot_key_threshold: if set, hot keys are detected with a right-side
            count: keys with more than this many rows are salted.
        salt_factor: number of salt shards per hot key.
        broadcast_max_rows: safety bound for the broadcast strategy.
        matched_ts_col: if set, also emit the matched right timestamp under
            this name (useful for age features / tolerance audits).
        right_tiebreak: extra right columns ordering ties among right rows with
            identical (key, ts) — last wins (union strategy only; the merge
            strategy resolves ties by right-frame order like pandas).
    """
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload = _right_payload_cols(right, on, right_ts, right_cols)
    _check_no_clash(left, payload, matched_ts_col)

    if strategy == "auto":
        if hot_keys or hot_key_threshold:
            strategy = "merge"
        else:
            strategy = (
                "broadcast"
                if _estimated_bytes(right) <= _broadcast_threshold(left)
                else "union"
            )

    if strategy == "union":
        return _asof_union(
            left, right, on, left_ts, right_ts, payload,
            allow_exact_matches, tolerance, matched_ts_col, right_tiebreak,
        )
    if strategy == "merge":
        return _asof_merge(
            left, right, on, left_ts, right_ts, payload,
            allow_exact_matches, tolerance, matched_ts_col,
            num_buckets, hot_keys, hot_key_threshold, salt_factor,
        )
    if strategy == "broadcast":
        return _asof_broadcast(
            left, right, on, left_ts, right_ts, payload,
            allow_exact_matches, tolerance, matched_ts_col, broadcast_max_rows,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


# ---------------------------------------------------------------------------
# union strategy: one shuffle, window carry-forward, full codegen
# ---------------------------------------------------------------------------


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    allow_exact: bool,
    tolerance: Column | None,
    matched_ts_col: str | None,
    right_tiebreak: list[str] | None,
) -> DataFrame:
    left_other = [c for c in left.columns if c not in on]
    left_types = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))
    right_types = dict(zip(right.columns, [f.dataType for f in right.schema.fields]))
    tiebreak = right_tiebreak or []

    # right rows must sort before left rows at equal ts for <= semantics,
    # after them for < semantics.
    side_right, side_left = (0, 1) if allow_exact else (1, 0)

    # the right payload rides in ONE struct per right row: the struct is
    # non-null on every right row even when individual payload fields are
    # null, so last(..., ignorenulls=True) tracks row presence, not field
    # non-nullness (a null caption update must not resurrect the previous
    # caption).
    from pyspark.sql.types import StructField as _SF, StructType as _ST

    payload_struct_t = _ST(
        [_SF(c, right_types[c], True) for c in payload]
        + [_SF("__rts", right_types[right_ts], True)]
    )
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(side_left).alias(_SIDE),
        *[F.col(c) for c in left_other],
        F.lit(None).cast(payload_struct_t).alias("__r_struct"),
        *[F.lit(None).cast(right_types[c]).alias(f"__tb_{c}") for c in tiebreak],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(side_right).alias(_SIDE),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_other],
        F.struct(
            *[F.col(c) for c in payload], F.col(right_ts).alias("__rts")
        ).alias("__r_struct"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak],
    )

    order = [F.col(_TS).asc_nulls_first(), F.col(_SIDE)]
    if allow_exact:
        # among right rows at identical ts, last-by-tiebreak wins
        order += [F.col(f"__tb_{c}") for c in tiebreak]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    u = l_tagged.unionByName(r_tagged)
    m = F.last("__r_struct", ignorenulls=True).over(w)
    u = (
        u.select("*", m.alias("__m"))
        .where(F.col(_SIDE) == side_left)
        .select(
            "*",
            *[F.col("__m").getField(c).alias(f"__m_{c}") for c in payload],
            F.col("__m").getField("__rts").alias("__m_ts"),
        )
    )

    if tolerance is not None:
        ok = F.col("__m_ts") >= (F.col(_TS) - tolerance)
        sel_payload = [
            F.when(ok, F.col(f"__m_{c}")).otherwise(F.lit(None)).alias(c)
            for c in payload
        ]
        m_ts = F.when(ok, F.col("__m_ts")).otherwise(F.lit(None))
    else:
        sel_payload = [F.col(f"__m_{c}").alias(c) for c in payload]
        m_ts = F.col("__m_ts")

    out_cols = (
        [F.col(c) for c in on]
        + [F.col(_TS).alias(left_ts)]
        + [F.col(c) for c in left_other if c != left_ts]
        + sel_payload
    )
    if matched_ts_col:
        out_cols.append(m_ts.alias(matched_ts_col))
    # restore the left column order
    result = u.select(*out_cols)
    ordered = [c for c in left.columns] + payload + ([matched_ts_col] if matched_ts_col else [])
    return result.select(*ordered)


# ---------------------------------------------------------------------------
# merge strategy: co-bucketed cogroup + vectorized merge_asof, salted for skew
# ---------------------------------------------------------------------------


def _detect_hot_keys(right: DataFrame, on: list[str], threshold: int) -> list:
    """Cheap hot-key scan: right-side key histogram, keys above threshold.

    At cluster scale this is a map-side-combined count over the state table —
    tiny output (one row per distinct key above threshold).
    """
    rows = (
        right.groupBy(*on)
        .count()
        .where(F.col("count") > threshold)
        .select(*on)
        .limit(10_000)
        .collect()
    )
    if len(on) == 1:
        return [r[0] for r in rows]
    return [tuple(r) for r in rows]


def _bucket_expr(on: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in on]), F.lit(n)).cast("int")


_TARGET_BUCKET_BYTES = 64 << 20  # ~64 MB of (estimated) input per bucket


def _auto_num_buckets(
    left: DataFrame,
    right: DataFrame,
    *,
    target_bytes: int = _TARGET_BUCKET_BYTES,
) -> int:
    """Size merge buckets to the DATA, not the cluster.

    Each merge bucket is materialized as one pandas frame inside one
    executor task, so the bucket count must scale with input volume:
    defaulting to spark.sql.shuffle.partitions puts data/n rows in one
    frame — fine at bench scale, an OOM at 100 TB. Derive n from the
    Catalyst optimizer size estimate at ~64 MB of estimated input per
    bucket (the same sizing rule the scaling run validated for shuffle
    partitions), floored at shuffle.partitions (never LESS parallel than
    the session default) and capped at 2^20 buckets. Falls back to
    shuffle.partitions when Catalyst has no estimate.
    """
    spark = left.sparkSession
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    est = _estimated_bytes(left) + _estimated_bytes(right)
    if est >= 1 << 61:  # no usable estimate
        return base
    need = (est + target_bytes - 1) // target_bytes
    return int(min(max(base, need), 1 << 20))


def _asof_merge(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    allow_exact: bool,
    tolerance: Column | None,
    matched_ts_col: str | None,
    num_buckets: int | None,
    hot_keys: list | None,
    hot_key_threshold: int | None,
    salt_factor: int,
) -> DataFrame:
    spark = left.sparkSession
    n = num_buckets or _auto_num_buckets(left, right)

    if hot_keys is None and hot_key_threshold is not None:
        hot_keys = _detect_hot_keys(right, on, hot_key_threshold)
    hot_keys = hot_keys or []

    lsel = left.select("*", _bucket_expr(on, n).alias(_BUCKET))
    rsel = right.select(
        *on, F.col(right_ts), *payload, _bucket_expr(on, n).alias(_BUCKET)
    )

    if hot_keys:
        # hot-key salting: left hot rows scatter by hash(ts); right hot
        # history replicates into every salt shard. Shard buckets live above
        # the normal bucket range: n + hot_index * salt_factor + salt.
        # Composite keys are matched on their null-safe concatenation.
        if len(on) == 1:
            lookup = F.col(on[0]).cast("string")
            key_of = lambda k: str(k)  # noqa: E731
        else:
            lookup = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])
            key_of = lambda k: "\x1f".join(str(p) for p in k)  # noqa: E731
        hot_map = {key_of(k): i for i, k in enumerate(hot_keys)}
        hot_idx = F.create_map(
            *[x for k, i in hot_map.items() for x in (F.lit(k), F.lit(i))]
        )[lookup]
        l_salt = F.pmod(
            F.xxhash64(F.col(left_ts).cast("string")), F.lit(salt_factor)
        ).cast("int")
        lsel = lsel.withColumn(
            _BUCKET,
            F.when(
                hot_idx.isNotNull(),
                F.lit(n) + hot_idx * F.lit(salt_factor) + l_salt,
            ).otherwise(F.col(_BUCKET)),
        )
        salts = F.explode(
            F.when(hot_idx.isNotNull(), F.sequence(F.lit(0), F.lit(salt_factor - 1)))
            .otherwise(F.array(F.lit(-1)))
        ).alias("__salt")
        rsel = rsel.select("*", salts).withColumn(
            _BUCKET,
            F.when(
                F.col("__salt") >= 0,
                F.lit(n) + hot_idx * F.lit(salt_factor) + F.col("__salt"),
            ).otherwise(F.col(_BUCKET)),
        ).drop("__salt")

    out_schema = _merged_schema(left, right, payload, matched_ts_col, right_ts)
    left_cols = list(left.columns)
    direction = "backward"
    tol = tolerance

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=[_BUCKET])
        rpdf = rpdf.drop(columns=[_BUCKET])
        out_names = left_cols + payload + ([matched_ts_col] if matched_ts_col else [])
        if lpdf.empty:
            return pd.DataFrame(columns=out_names)
        rname = right_ts if right_ts not in lpdf.columns else "__rts_tmp"
        if rname != right_ts:
            rpdf = rpdf.rename(columns={right_ts: rname})
        if matched_ts_col:
            rpdf = rpdf.assign(**{matched_ts_col: rpdf[rname]})
        if rpdf.empty:
            out = lpdf.copy()
            for c in payload + ([matched_ts_col] if matched_ts_col else []):
                out[c] = None
            return out[out_names]
        # merge_asof needs a global sort on the "on" column, stable so that
        # right-frame order breaks (key, ts) ties exactly like pandas.
        lpdf = lpdf.assign(__ord=range(len(lpdf))).sort_values(
            left_ts, kind="mergesort"
        )
        rpdf = rpdf.sort_values(rname, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=rname,
            by=on,
            direction=direction,
            allow_exact_matches=allow_exact,
        )
        merged = merged.sort_values("__ord").drop(columns=["__ord"] + (
            [rname] if rname != left_ts else []
        ))
        return _denanify(
            merged,
            payload + ([matched_ts_col] if matched_ts_col else []),
        )[out_names]

    grouped = lsel.groupBy(_BUCKET).cogroup(rsel.groupBy(_BUCKET))
    result = grouped.applyInPandas(merge, schema=out_schema)

    if tol is not None:
        # tolerance applied post-merge (needs the matched ts)
        mts = matched_ts_col or "__m_ts_tmp"
        if not matched_ts_col:
            raise ValueError("tolerance with strategy='merge' requires matched_ts_col")
        ok = F.col(mts) >= (F.col(left_ts) - tol)
        result = result.select(
            *left_cols,
            *[F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload],
            F.when(ok, F.col(mts)).otherwise(F.lit(None)).alias(mts),
        )
    return result


# ---------------------------------------------------------------------------
# broadcast strategy: small right side, zero shuffle on the left
# ---------------------------------------------------------------------------


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    allow_exact: bool,
    tolerance: Column | None,
    matched_ts_col: str | None,
    broadcast_max_rows: int,
) -> DataFrame:
    spark = left.sparkSession
    rpdf = (
        right.select(*on, right_ts, *payload)
        .limit(broadcast_max_rows + 1)
        .toPandas()
    )
    if len(rpdf) > broadcast_max_rows:
        raise ValueError(
            f"right side exceeds broadcast_max_rows={broadcast_max_rows}; "
            "use strategy='union' or 'merge'"
        )
    rname = right_ts if right_ts not in left.columns else "__rts_tmp"
    if rname != right_ts:
        rpdf = rpdf.rename(columns={right_ts: rname})
    if matched_ts_col:
        rpdf = rpdf.assign(**{matched_ts_col: rpdf[rname]})
    rpdf = rpdf.sort_values(rname, kind="mergesort")
    bc = spark.sparkContext.broadcast(rpdf)

    out_schema = _merged_schema(left, right, payload, matched_ts_col, right_ts)
    left_cols = list(left.columns)
    out_names = left_cols + payload + ([matched_ts_col] if matched_ts_col else [])

    def merge_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rp = bc.value
        for lpdf in batches:
            if lpdf.empty:
                continue
            lp = lpdf.assign(__ord=range(len(lpdf))).sort_values(
                left_ts, kind="mergesort"
            )
            if rp.empty:
                out = lp.drop(columns=["__ord"]).copy()
                for c in out_names[len(left_cols):]:
                    out[c] = None
                yield out[out_names]
                continue
            merged = pd.merge_asof(
                lp,
                rp,
                left_on=left_ts,
                right_on=rname,
                by=on,
                direction="backward",
                allow_exact_matches=allow_exact,
            )
            merged = merged.sort_values("__ord").drop(
                columns=["__ord"] + ([rname] if rname != left_ts else [])
            )
            yield _denanify(
                merged,
                payload + ([matched_ts_col] if matched_ts_col else []),
            )[out_names]

    result = left.mapInPandas(merge_iter, schema=out_schema)
    if tolerance is not None:
        if not matched_ts_col:
            raise ValueError(
                "tolerance with strategy='broadcast' requires matched_ts_col"
            )
        ok = F.col(matched_ts_col) >= (F.col(left_ts) - tolerance)
        result = result.select(
            *left_cols,
            *[F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload],
            F.when(ok, F.col(matched_ts_col)).otherwise(F.lit(None)).alias(
                matched_ts_col
            ),
        )
    return result
