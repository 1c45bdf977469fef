"""Deterministic sampling and splitting for training-data curation.

Spark's built-in ``df.sample`` / ``sampleBy`` draw from a per-partition
RNG seeded by partition id: the selected ROWS change whenever the input
splits differently (file layout, AQE, cluster size), which breaks
reproducible corpus construction and train/test hygiene at 10^12 scale.

Everything here is a PURE COLUMN FUNCTION of the row key instead:
``u = md5(key)[:8 hex] / 2^32`` is a uniform-[0,1) hash draw, so

- the same row gets the same verdict on ANY cluster, partitioning, or
  engine (md5 is portable: DuckDB/Trino/pandas reproduce the row set
  bit-for-bit — same family as sources/checkpoint.py's portable mode);
- sampling is a narrow map (no shuffle, full predicate pushdown stays
  available on other columns);
- changing ``salt`` redraws independently (epoch-versioned corpora);
- ``split_column`` assigns EVERY key to exactly one split, so a key can
  never leak across train/test no matter how often it recurs.

Reference context: modlyn subsets AnnData in-memory (reference
modlyn/datasets semantics); at engine scale the equivalent primitive must
be a distributed, storage-order-independent decision per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def _hash_unit(key_cols: list[str], salt: str) -> Column:
    """Uniform [0, 1) draw as a pure function of (key, salt): first 8 hex
    digits of md5 -> int -> / 2^32. Portable to any SQL engine.

    NULL key components are encoded explicitly (``concat_ws`` SKIPS
    nulls, so composite keys (NULL,'a') and ('a',NULL) — and NULL vs ''
    — would otherwise build the same key string and correlate their
    draws/folds/splits). The NUL-delimited sentinel is not a value any
    real key column produces, and non-null keys build the exact same
    string as plain concat_ws — every existing oracle's
    ``md5('<key>|<salt>')`` replication still matches bit-for-bit."""
    key = _key_string(key_cols, salt)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") / F.lit(_U32)


def _key_string(key_cols: list[str], salt: str) -> Column:
    """The canonical '<k1>|<k2>|<salt>' draw-key string (NULL components
    encoded with the NUL sentinel — see _hash_unit)."""
    return F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
            for c in key_cols
        ],
        F.lit(salt),
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, *, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps exactly the rows whose hash
    draw falls under ``fraction``. Identical row set under any
    partitioning/engine; no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(_hash_unit(key_cols, salt) < fraction)


def stratified_sample(
    df: DataFrame,
    label_col: str,
    fractions: dict,
    key_cols: list[str],
    *,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (Spark ``sampleBy``
    semantics, minus the partitioning-dependent RNG): row kept iff its
    hash draw < fractions[label] (``default`` for unlisted labels).
    Labels are compared as strings. The class-balancing primitive:
    downsample the template-heavy strata, keep the rare ones whole."""
    u = _hash_unit(key_cols, salt)
    frac = F.lit(float(default))
    for lab, f in fractions.items():
        frac = F.when(F.col(label_col).cast("string") == str(lab),
                      F.lit(float(f))).otherwise(frac)
    return df.where(u < frac)


def stratified_take(
    df: DataFrame,
    label_col: str,
    n_per_label: int,
    key_cols: list[str],
    *,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``n_per_label`` rows per stratum (or all rows of smaller
    strata), chosen by smallest hash draw — a deterministic reservoir.
    Ties are impossible up to md5 collisions. Equivalent SQL:
    row_number() over (partition by label order by md5(key)) <= n.

    Skew shape: the exact per-label window serializes each stratum
    through ONE task, so a label holding half the corpus would funnel
    half the rows onto one reducer. The window is therefore preceded by
    an approximate hash-threshold PRE-FILTER: md5 draws are uniform on
    [0, 1), so a stratum of c rows has its n-th smallest draw near n/c —
    keeping draws under (n + 10*sqrt(n) + 50)/c passes ~n rows per label
    into the window while bounding the miss probability (the true n-th
    draw exceeding the cutoff) below a Chernoff tail of ~e^-25. The
    per-label count is one map-side-combinable aggregate; the count
    table joins back broadcast (strata counts are aggregate-sized).
    Output is IDENTICAL to the unfiltered window whenever the pre-filter
    keeps the n smallest draws — which it does up to that negligible
    tail, and md5 cannot be adversarially seeded by data placement."""
    if n_per_label <= 0:
        raise ValueError("n_per_label must be positive")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols],
                      F.lit(salt))
    u = _hash_unit(key_cols, salt)
    # null-safe string join key so a NULL-labelled stratum still counts
    lk = F.coalesce(F.col(label_col).cast("string"), F.lit("\u0000<null>"))
    tagged = df.withColumn("__lk", lk)
    counts = tagged.groupBy("__lk").agg(F.count(F.lit(1)).alias("__c"))
    n = float(n_per_label)
    cutoff = F.least(
        F.lit(1.0), (F.lit(n + 10.0 * n ** 0.5 + 50.0)) / F.col("__c")
    )
    pre = tagged.join(F.broadcast(counts), "__lk").where(u < cutoff)
    w = Window.partitionBy(label_col).orderBy(F.md5(key), *key_cols)
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_label)
        .select(*df.columns)
    )


def source_mix_plan(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    *,
    token_budget: int,
    weights: dict | None = None,
    default_weight: float = 1.0,
) -> DataFrame:
    """Per-source sampling plan for a target token MIXTURE — the domain-
    mixing step (Pile/DoReMi style) between curation and packing: given
    per-source mixture ``weights`` (uniform over observed sources when
    None) and a total ``token_budget``, compute for every source its
    available tokens, its target share, and the deterministic sampling
    ``fraction`` = min(1, target / available) that
    ``apply_source_mix`` feeds into the hash sampler.

    Sources whose corpus cannot fill their target keep fraction 1.0 and
    report the shortfall in ``deficit_tokens`` (single pass — callers
    re-weight and re-plan if they want redistribution; an implicit
    redistribution would silently change the mixture, the one thing this
    step exists to control).

    One map-side-combinable groupBy; the plan is aggregate-sized.
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    w = F.lit(float(default_weight))
    for src, wt in (weights or {}).items():
        w = F.when(F.col(source_col).cast("string") == str(src),
                   F.lit(float(wt))).otherwise(w)
    per = (
        df.select(
            F.col(source_col).alias("source"),
            F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("__n"),
        )
        .groupBy("source")
        .agg(F.sum("__n").alias("available_tokens"))
        .withColumn("weight", w.alias("weight"))
    )
    # normalize over the OBSERVED sources (sum_w is exact for integral
    # weights; the arithmetic below is replicated verbatim by the oracle)
    tot = per.agg(F.sum("weight").alias("__sw")).select("__sw")
    plan = per.crossJoin(F.broadcast(tot))
    target = F.lit(float(token_budget)) * (F.col("weight") / F.col("__sw"))
    frac = F.least(F.lit(1.0), target / F.col("available_tokens"))
    return plan.select(
        "source",
        "available_tokens",
        "weight",
        target.alias("target_tokens"),
        F.when(F.col("available_tokens") > 0, frac)
        .otherwise(F.lit(0.0))
        .alias("fraction"),
        F.greatest(
            F.lit(0.0), target - F.col("available_tokens")
        ).alias("deficit_tokens"),
    )


def apply_source_mix(
    df: DataFrame,
    plan: DataFrame,
    source_col: str,
    key_cols: list[str],
    *,
    salt: str = "",
) -> DataFrame:
    """Materialize a ``source_mix_plan``: keep each row iff its hash draw
    falls under its source's fraction. The plan is aggregate-sized and
    broadcast; the decision is a pure function of (key, salt, plan) —
    identical row set on any cluster/partitioning/engine."""
    u = _hash_unit(key_cols, salt)
    p = F.broadcast(plan.select(F.col("source").alias("__src"), "fraction"))
    out = df.join(p, df[source_col] == F.col("__src"), "left").where(
        u < F.coalesce(F.col("fraction"), F.lit(0.0))
    )
    return out.select(*df.columns)


def split_column(
    df: DataFrame,
    key_cols: list[str],
    splits: dict,
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash range, e.g.
    ``{"train": 0.8, "val": 0.1, "test": 0.1}`` (must sum to ~1; the last
    split absorbs rounding). The assignment is a pure function of the KEY,
    so every occurrence of a key lands in the same split — the zero-leakage
    property train/test hygiene needs when keys recur across rows."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    u = _hash_unit(key_cols, salt)
    names = list(splits)
    edges = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        edges.append((name, acc))
    expr = F.lit(names[-1])
    for name, edge in reversed(edges):
        expr = F.when(u < edge, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def time_split(
    df: DataFrame,
    ts_col: str,
    test_start,
    *,
    embargo: Column | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Temporal train/test split with an optional embargo gap.

    Rows strictly before ``test_start`` are ``train``; rows inside
    ``[test_start, test_start + embargo)`` are ``embargo`` (discard them —
    they are the leakage buffer for features computed over trailing
    windows: a rolling feature at test time must not overlap raw rows the
    training set saw); rows at/after the embargo end are ``test``. With no
    embargo, ``test`` starts exactly at ``test_start``.

    This is the temporal counterpart of :func:`split_column`: that one
    guarantees a KEY never crosses splits, this one guarantees a TIME
    never does — chronological evaluation for the point-in-time feature
    pipeline (BASELINE.json north_rule: zero temporal leakage). A pure
    column expression: no shuffle, full pushdown on other predicates.

    Args:
        test_start: a literal/Column boundary comparable to ``ts_col``
            (e.g. ``F.lit("2024-06-01").cast("timestamp")``).
        embargo: optional gap width as an INTERVAL Column, e.g.
            ``F.expr("INTERVAL 7 DAYS")``.
    """
    lo = test_start if isinstance(test_start, Column) else F.lit(test_start)
    ts = F.col(ts_col)
    if embargo is None:
        expr = F.when(ts < lo, "train").otherwise("test")
    else:
        hi = lo + embargo
        expr = (
            F.when(ts < lo, "train")
            .when(ts < hi, "embargo")
            .otherwise("test")
        )
    return df.withColumn(out_col, expr)


def weighted_take(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_cols: list[str],
    *,
    by: str | list[str] | None = None,
    salt: str = "",
    shards: int = 64,
) -> DataFrame:
    """EXACTLY ``n`` rows drawn without replacement with probability
    proportional to ``weight_col`` — per group when ``by`` is given,
    globally otherwise — as a PURE FUNCTION of (key, salt).

    Efraimidis–Spirakis A-ES (Inf. Proc. Letters 97(5), 2006,
    implemented from the paper's statement): give every row the key
    ``k = -ln(u) / w`` with ``u`` the portable md5 unit draw, keep the
    ``n`` smallest keys. ``k`` is an Exp(w) variate, so the first
    arrival of the exponential race wins with probability w_i / W —
    the weighted-reservoir classic, here with the RNG replaced by the
    hash draw so the selected row SET is identical on any cluster,
    partitioning, or engine. ``u`` is offset to ``(h + 0.5) / 2^32`` so
    it can never be exactly 0 (ln(0)). Rows with NULL or non-positive
    weight are never selected.

    Physical plan: the global form is one ``orderBy(key).limit(n)`` —
    Catalyst's TakeOrderedAndProject (per-partition partial top-n +
    one driver merge), never a full sort. The per-group form would
    serialize each group through one window task, so it first takes the
    per-(group, md5-shard) top-n — bounding every task at shard size —
    and only the surviving ``<= n * shards`` rows per group meet the
    exact per-group window. The final row set is IDENTICAL to the plain
    per-group window for ANY weights (each group's true top-n survives
    its shard cut by construction — rank within a subset can only
    shrink), unconditionally — unlike a draw-threshold prefilter, this
    needs no balance assumption on the weights.

    Equivalent SQL (the oracle form)::

        row_number() OVER (PARTITION BY <by> ORDER BY
            -ln((CAST('0x' || substr(md5(key||'|'||salt), 1, 8) AS BIGINT)
                 + 0.5) / 4294967296.0) / w,
            key) <= n
    """
    if n <= 0:
        raise ValueError("n must be positive")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(
            F.substring(F.md5(_key_string(key_cols, salt)), 1, 8), 16, 10
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_U32)
    key = -F.log(u) / w
    tie = _key_string(key_cols, salt)
    cand = df.where(w.isNotNull() & (w > 0)).withColumn(
        "__es_key", key
    ).withColumn("__es_tie", tie)

    group = [by] if isinstance(by, str) else list(by or [])
    if not group:
        out = (
            cand.orderBy("__es_key", "__es_tie")
            .limit(n)
            .drop("__es_key", "__es_tie")
        )
        return out
    shard = F.conv(
        F.substring(F.md5(F.concat(tie, F.lit("\x00shard"))), 1, 8), 16, 10
    ).cast("long") % shards
    pre = Window.partitionBy(*group, "__es_shard").orderBy(
        "__es_key", "__es_tie"
    )
    exact = Window.partitionBy(*group).orderBy("__es_key", "__es_tie")
    return (
        cand.withColumn("__es_shard", shard)
        .withColumn("__es_pr", F.row_number().over(pre))
        .where(F.col("__es_pr") <= n)
        .withColumn("__es_rn", F.row_number().over(exact))
        .where(F.col("__es_rn") <= n)
        .drop("__es_key", "__es_tie", "__es_shard", "__es_pr", "__es_rn")
    )


def rebalance_fractions(
    df: DataFrame,
    label_col: str,
    target: dict | None = None,
) -> dict:
    """Per-class keep fractions for the LARGEST subsample whose label
    distribution matches ``target`` (default: uniform over the classes
    present) without oversampling any class.

    Math: with class counts n_c and target shares t_c (normalized over
    the classes present in BOTH the data and the target), the largest
    feasible total is ``M = min_c n_c / t_c`` and the keep fraction is
    ``p_c = t_c * M / n_c`` (= 1 for the binding class). Classes not in
    the target get 0.0 — they are dropped.

    Feed the result to :func:`stratified_sample` for the deterministic
    hash draw; the expected output distribution is exactly ``target``.
    ONE count aggregate (class-cardinality-sized, collected)."""
    counts = {
        r[0]: r[1]
        for r in df.where(F.col(label_col).isNotNull())
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return {}
    if target is None:
        target = {c: 1.0 for c in counts}
    shared = {c: float(target[c]) for c in counts if target.get(c, 0) > 0}
    if not shared:
        raise ValueError("target shares no classes with the data")
    z = sum(shared.values())
    t = {c: v / z for c, v in shared.items()}
    m = min(counts[c] / t[c] for c in t)
    out = {c: 0.0 for c in counts}
    for c in t:
        out[c] = min(1.0, t[c] * m / counts[c])
    return out
