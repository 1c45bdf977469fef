"""Z-order (Morton) layout keys for multi-dimensional data skipping.

At 100 TB the scan you never do is the fastest one: parquet/Iceberg
prune row groups by per-file min/max, which only works for columns the
data is SORTED by. A lexicographic sort serves exactly one leading
column; interleaving the BITS of several rank-normalized columns (the
Morton / Z-order curve — what Delta's OPTIMIZE ZORDER BY computes)
gives every interleaved column partially-clustered min/max ranges, so
selective predicates on ANY of them prune files.

Two layers:

- :func:`zorder_key` — the pure bit-interleave column expression over
  non-negative integer inputs: bit b of column i lands at position
  ``b * ncols + i``. Built from literal shift counts only
  (``shiftleft``'s count must be a literal), ``bits * ncols`` codegen
  terms, no UDF, exactly replayable in SQL (:func:`zorder_sql`).
- :func:`with_zorder` — end-to-end: per-column [min, max] from ONE
  aggregate (driver holds 2 numbers per column), linear rank scaling to
  ``bits`` bits (the range-based normalization Delta uses), appended
  interleaved key. Write the layout with
  ``df.repartitionByRange(n, "zkey").sortWithinPartitions("zkey")``.

Locality is pytest-pinned quantitatively: range-bucketing by the
z-key yields per-bucket bounding boxes whose per-dimension extent is
~sqrt(1/buckets) of the domain in BOTH dimensions, versus one narrow /
one full-width dimension for a lexicographic layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list, *, bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of each non-negative integer
    column (values clamped into [0, 2^bits)); ``bits * len(cols)`` must
    fit a signed long (<= 63)."""
    n = len(cols)
    if n == 0:
        raise ValueError("need at least one column")
    if bits * n > 63:
        raise ValueError(f"bits * ncols = {bits * n} > 63 overflows long")
    out = F.lit(0).cast("long")
    mask = (1 << bits) - 1
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long")
        # greatest/least SKIP nulls in Spark (a NULL input would clamp
        # to 0 and silently cluster with real zeros) — gate explicitly
        v = F.when(
            v.isNotNull(), F.least(F.greatest(v, F.lit(0)), F.lit(mask))
        )
        for b in range(bits):
            # shiftleft/shiftright take literal counts only (Spark 4)
            out = out + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return out


def zorder_sql(exprs: list[str], *, bits: int = 21) -> str:
    """The identical interleave as a SQL expression over the given
    non-negative integer SQL expressions — the cross-engine oracle
    twin of :func:`zorder_key`."""
    n = len(exprs)
    mask = (1 << bits) - 1
    terms = []
    for i, e in enumerate(exprs):
        ce = f"least(greatest(CAST({e} AS BIGINT), 0), {mask})"
        for b in range(bits):
            terms.append(f"((({ce} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def with_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 21,
    out_col: str = "zkey",
) -> DataFrame:
    """Append ``out_col``: the Morton key of the given numeric/temporal
    columns after linear [min, max] -> [0, 2^bits) rank scaling
    (timestamps go through the epoch hop). Constant columns rank to 0.
    NULLs in any ranked column yield a NULL key (such rows sort last in
    the layout write — they carry no skipping information)."""
    from modlyn_spark.operators.windows import _epoch

    def num(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        return _epoch(col) if dt.startswith("timestamp") else col.cast(
            "double"
        )

    stats = df.agg(
        *[
            x
            for c in cols
            for x in (
                F.min(num(c)).alias(f"mn_{c}"),
                F.max(num(c)).alias(f"mx_{c}"),
            )
        ]
    ).collect()[0]
    mask = (1 << bits) - 1
    ranked = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            ranked.append(F.lit(0).cast("long"))
        else:
            ranked.append(
                F.floor(
                    (num(c) - F.lit(float(mn)))
                    / F.lit(float(mx) - float(mn))
                    * F.lit(float(mask))
                ).cast("long")
            )
    return df.withColumn(out_col, zorder_key(ranked, bits=bits))


def write_zorder_table(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    files: int,
    bits: int = 21,
    mode: str = "error",
    keep_key: bool = False,
) -> None:
    """Write ``df`` as a z-ordered parquet table: Morton key ->
    ``repartitionByRange(files, zkey)`` -> ``sortWithinPartitions(zkey)``
    -> parquet. Every output file then covers a compact Morton range, so
    its parquet footer min/max on EACH ranked dimension is tight — the
    multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
    ZORDER BY shape, done with plain Spark primitives):

    - a predicate on ANY single ranked dimension prunes ~files^(1-1/d)
      of the files (a lexicographic sort prunes only its leading column);
    - a d-dimensional box prunes all files outside the box's Morton
      cells.

    The pruning is quantified (not assumed) in
    ``tests/test_layout.py::test_written_files_prune_boxes`` via the
    written footer statistics. ``files`` sizes the layout: one range
    partition = one file = the skipping granule (pick data_size /
    ~128 MB; at 100 TB that is ~800k granules, written by the same one
    range shuffle). ``keep_key`` retains the zkey column for debugging;
    the footer stats carry the skipping information either way.
    """
    z = with_zorder(df, cols, bits=bits)
    out = z.repartitionByRange(int(files), F.col("zkey")).sortWithinPartitions(
        "zkey"
    )
    if not keep_key:
        out = out.drop("zkey")
    out.write.mode(mode).parquet(path)
