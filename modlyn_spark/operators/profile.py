"""Table profiling and Deequ-style expectation checks.

A training-data platform gates every ingested snapshot on data-quality
contracts before it reaches curation or feature assembly: null budgets,
uniqueness of keys, value domains, regex shape of identifiers, row-count
floors. The reference validates its inputs implicitly (AnnData schema +
pandas dtype coercion, reference modlyn/_load.py semantics); at engine
scale the equivalent primitive is a declarative constraint suite compiled
into ONE aggregate pass.

Design (both entry points):

- every statistic / constraint becomes a single Catalyst aggregate
  expression; the whole suite fuses into one ``df.agg(...)`` — one scan,
  map-side partial aggregation, whole-stage codegen, output is ONE row
  that is then unpivoted driver-side-free via ``stack`` (the unpivot runs
  over the 1-row aggregate, not the data);
- exact distinct counts use Spark's native multi-``count(distinct)``
  planning (an Expand of the scanned rows, one per distinct aggregate).
  That is the correct exact plan but costs ``O(columns)`` row expansion;
  at 100 TB pass ``exact_distinct=False`` to use HLL++
  (``approx_count_distinct``) — single pass, mergeable sketches, ~2%
  relative error. The oracle gates run exact at small SF;
- NULL semantics are explicit and engine-portable: for ``in_set`` /
  ``in_range`` / ``matches``, a NULL value FAILS the predicate (it is not
  in the set); ``not_null`` measures NULLs directly; ``unique`` compares
  distinct non-null values to non-null rows (no duplicated non-null key).

The DuckDB oracle is GENERATED from the same spec objects
(`duckdb_profile_sql` / `duckdb_expectations_sql`), the same pattern as
functions/pii.py: one source of truth, two engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_ROUND = 6  # float statistics rounded identically in both engines


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------

def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile in one aggregate pass.

    Output (one row per profiled column, ordered by column name):

    ``column, n_rows, n_null, n_distinct, min_num, max_num, mean, stddev,
    min_len, max_len``

    - numeric columns fill ``min_num/max_num/mean/stddev`` (sample
      stddev; NULL when < 2 non-null values), string columns fill
      ``min_len/max_len``; the other family is NULL — typed columns
      instead of stringified min/max so the cross-engine compare never
      depends on float formatting;
    - ``n_distinct`` counts distinct NON-NULL values (both engines'
      ``count(distinct)`` semantics);
    - float statistics are rounded to 6 digits (portable hash compare).
    """
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields
    ]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c]
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            d = F.col(c).cast("double")
            aggs += [
                F.round(F.min(d), _ROUND).alias(f"__min_{c}"),
                F.round(F.max(d), _ROUND).alias(f"__max_{c}"),
                F.round(F.avg(d), _ROUND).alias(f"__mean_{c}"),
                F.round(F.stddev_samp(d), _ROUND).alias(f"__std_{c}"),
            ]
        elif isinstance(dt, T.StringType):
            ln = F.length(F.col(c))
            aggs += [
                F.min(ln).cast("long").alias(f"__minl_{c}"),
                F.max(ln).cast("long").alias(f"__maxl_{c}"),
            ]
    one = df.agg(*aggs)

    # Unpivot the 1-row aggregate into one row per column (tiny).
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    rows = []
    for c in cols:
        dt = by_name[c]
        num = isinstance(dt, _NUMERIC)
        s = isinstance(dt, T.StringType)
        rows.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"__min_{c}") if num else null_d).alias("min_num"),
            (F.col(f"__max_{c}") if num else null_d).alias("max_num"),
            (F.col(f"__mean_{c}") if num else null_d).alias("mean"),
            (F.col(f"__std_{c}") if num else null_d).alias("stddev"),
            (F.col(f"__minl_{c}") if s else null_l).alias("min_len"),
            (F.col(f"__maxl_{c}") if s else null_l).alias("max_len"),
        ))
    return (
        one.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def duckdb_profile_sql(
    table: str,
    columns: Sequence[str],
    numeric: Sequence[str],
    strings: Sequence[str],
) -> str:
    """DuckDB twin of :func:`profile_table` (exact mode), generated from
    the same column lists. One UNION ALL branch per column over shared
    aggregate arithmetic."""
    numeric, strings = set(numeric), set(strings)
    parts = []
    for c in columns:
        if c in numeric:
            mn = f"round(min(CAST({c} AS DOUBLE)), {_ROUND})"
            mx = f"round(max(CAST({c} AS DOUBLE)), {_ROUND})"
            mean = f"round(avg(CAST({c} AS DOUBLE)), {_ROUND})"
            std = f"round(stddev_samp(CAST({c} AS DOUBLE)), {_ROUND})"
            minl = maxl = "CAST(NULL AS BIGINT)"
        elif c in strings:
            mn = mx = mean = std = "CAST(NULL AS DOUBLE)"
            minl = f"CAST(min(length({c})) AS BIGINT)"
            maxl = f"CAST(max(length({c})) AS BIGINT)"
        else:
            mn = mx = mean = std = "CAST(NULL AS DOUBLE)"
            minl = maxl = "CAST(NULL AS BIGINT)"
        parts.append(f"""
          SELECT '{c}' AS "column", count(*) AS n_rows,
                 count(*) - count({c}) AS n_null,
                 count(DISTINCT {c}) AS n_distinct,
                 {mn} AS min_num, {mx} AS max_num,
                 {mean} AS mean, {std} AS stddev,
                 {minl} AS min_len, {maxl} AS max_len
          FROM {table}""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------

_TYPES = {"not_null", "unique", "in_set", "in_range", "matches", "row_count"}


def _predicate(exp: dict):
    """Spark boolean column: does a row satisfy the expectation's
    row-level predicate? NULL values FAIL (see module docstring)."""
    c = F.col(exp["column"])
    t = exp["type"]
    if t == "not_null":
        return c.isNotNull()
    if t == "in_set":
        return c.isNotNull() & c.isin(list(exp["values"]))
    if t == "in_range":
        p = c.isNotNull()
        if "min" in exp:
            p = p & (c >= F.lit(exp["min"]))
        if "max" in exp:
            p = p & (c <= F.lit(exp["max"]))
        return p
    if t == "matches":
        # Java-regex/RE2-common subset, same contract as functions/pii.py,
        # so the generated DuckDB twin compiles the identical pattern.
        return c.isNotNull() & c.rlike(exp["pattern"])
    raise ValueError(f"no row predicate for {t!r}")


def check_expectations(df: DataFrame, expectations: Sequence[dict]) -> DataFrame:
    """Validate a list of expectation specs in ONE aggregate pass.

    Spec dicts (``type`` + fields):

    - ``{"type": "not_null", "column": c[, "min_fraction": f]}``
    - ``{"type": "unique", "column": c}`` — no duplicated non-null value
    - ``{"type": "in_set", "column": c, "values": [...][, "min_fraction": f]}``
    - ``{"type": "in_range", "column": c, "min": x, "max": y[, "min_fraction": f]}``
    - ``{"type": "matches", "column": c, "pattern": p[, "min_fraction": f]}``
    - ``{"type": "row_count", "min": n[, "max": m]}``

    ``min_fraction`` defaults to 1.0 (every row must satisfy). Output one
    row per expectation, in spec order:

    ``idx, expectation, column, observed, threshold, passed``

    ``observed`` is the satisfied fraction (rounded to 6; ``row_count``
    reports the row count itself), NULL-guarded for empty inputs (an
    empty table passes fraction constraints vacuously and fails
    ``row_count`` floors > 0).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, exp in enumerate(expectations):
        t = exp["type"]
        if t not in _TYPES:
            raise ValueError(f"unknown expectation type {t!r}")
        if t == "row_count":
            continue
        if t == "unique":
            c = F.col(exp["column"])
            aggs.append(F.count(c).alias(f"__nn_{i}"))
            aggs.append(F.count_distinct(c).alias(f"__nd_{i}"))
        else:
            aggs.append(
                F.sum(F.when(_predicate(exp), 1).otherwise(0)).alias(f"__s_{i}")
            )
    one = df.agg(*aggs)

    n = F.col("__n")
    rows = []
    for i, exp in enumerate(expectations):
        t = exp["type"]
        col_name = exp.get("column", "")
        if t == "row_count":
            observed = n.cast("double")
            passed = n >= F.lit(int(exp.get("min", 0)))
            if "max" in exp:
                passed = passed & (n <= F.lit(int(exp["max"])))
            threshold = F.lit(float(exp.get("min", 0)))
        elif t == "unique":
            nn = F.col(f"__nn_{i}")
            observed = F.round(
                F.when(nn > 0, F.col(f"__nd_{i}") / nn).otherwise(F.lit(1.0)), _ROUND
            )
            passed = F.col(f"__nd_{i}") == nn
            threshold = F.lit(1.0)
        else:
            frac = float(exp.get("min_fraction", 1.0))
            observed = F.round(
                F.when(n > 0, F.col(f"__s_{i}") / n).otherwise(F.lit(1.0)), _ROUND
            )
            passed = observed >= F.lit(frac)
            threshold = F.lit(frac)
        rows.append(F.struct(
            F.lit(i).alias("idx"),
            F.lit(t).alias("expectation"),
            F.lit(col_name).alias("column"),
            observed.cast("double").alias("observed"),
            threshold.cast("double").alias("threshold"),
            passed.alias("passed"),
        ))
    return (
        one.select(F.explode(F.array(*rows)).alias("e"))
        .select("e.*")
        .orderBy("idx")
    )


def _duckdb_predicate(exp: dict) -> str:
    c = exp["column"]
    t = exp["type"]
    if t == "not_null":
        return f"{c} IS NOT NULL"
    if t == "in_set":
        vals = ", ".join(
            f"'{v}'" if isinstance(v, str) else repr(v) for v in exp["values"]
        )
        return f"{c} IS NOT NULL AND {c} IN ({vals})"
    if t == "in_range":
        parts = [f"{c} IS NOT NULL"]
        if "min" in exp:
            parts.append(f"{c} >= {exp['min']!r}")
        if "max" in exp:
            parts.append(f"{c} <= {exp['max']!r}")
        return " AND ".join(parts)
    if t == "matches":
        pat = exp["pattern"].replace("'", "''")
        return f"{c} IS NOT NULL AND regexp_matches({c}, '{pat}')"
    raise ValueError(t)


def duckdb_expectations_sql(table: str, expectations: Sequence[dict]) -> str:
    """DuckDB twin of :func:`check_expectations`, generated from the SAME
    spec list (single source of truth for both engines)."""
    parts = []
    for i, exp in enumerate(expectations):
        t = exp["type"]
        col_name = exp.get("column", "")
        if t == "row_count":
            lo = int(exp.get("min", 0))
            cond = f"count(*) >= {lo}"
            if "max" in exp:
                cond += f" AND count(*) <= {int(exp['max'])}"
            obs, thr = "CAST(count(*) AS DOUBLE)", f"CAST({lo} AS DOUBLE)"
        elif t == "unique":
            c = exp["column"]
            obs = (f"round(CASE WHEN count({c}) > 0 THEN "
                   f"count(DISTINCT {c}) * 1.0 / count({c}) ELSE 1.0 END, {_ROUND})")
            cond = f"count(DISTINCT {c}) = count({c})"
            thr = "1.0"
        else:
            frac = float(exp.get("min_fraction", 1.0))
            pred = _duckdb_predicate(exp)
            obs = (f"round(CASE WHEN count(*) > 0 THEN "
                   f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END) * 1.0 / count(*) "
                   f"ELSE 1.0 END, {_ROUND})")
            cond = f"{obs} >= {frac!r}"
            thr = repr(frac)
        parts.append(f"""
          SELECT CAST({i} AS INT) AS idx, '{t}' AS expectation,
                 '{col_name}' AS "column", CAST({obs} AS DOUBLE) AS observed,
                 CAST({thr} AS DOUBLE) AS threshold,
                 CAST({cond} AS BOOLEAN) AS passed
          FROM {table}""")
    return " UNION ALL ".join(parts) + " ORDER BY idx"
