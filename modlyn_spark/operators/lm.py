"""Corpus unigram language-model scoring — the perplexity-style quality
signal (CCNet used a KenLM 5-gram; the unigram form is its portable,
SQL-checkable core): documents whose tokens are systematically RARE in
the corpus (gibberish, encoding garbage, exotic boilerplate) score a low
average token log-probability, and curation gates on that score.

Two-step shape, matching how pipelines actually run it:

1. ``unigram_counts`` — one tokenize-explode + map-side-combinable
   groupBy over the (training) corpus: (token, count). Fit ONCE, reuse.
2. ``unigram_doc_logprob`` — join each document's tokens against the
   count table (plain shuffle join on token; the vocabulary is usually
   small enough that AQE broadcasts it) and average
   log(p(w)) per document, with add-alpha smoothing
   ``p(w) = (count + alpha) / (total + alpha * (vocab + 1))`` so
   out-of-vocabulary tokens score the reserved-unseen mass instead of
   -inf.

Everything is codegen column expressions after the tokenize explode —
no UDFs — so the whole scorer has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the same word tokenizer as functions.text.words / lang_id: lowercased
# [a-z0-9]+ runs
_WORD_RE = "[a-z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def unigram_counts(
    df: DataFrame, text_col: str, *, id_col: str | None = None
) -> DataFrame:
    """(token, count) over the corpus — the fitted unigram model.
    ``id_col`` is only used to carry a projection; counts are global."""
    cols = [text_col] if id_col is None else [id_col, text_col]
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    return (
        df.select(*cols)
        .select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def unigram_doc_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    counts: DataFrame | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document average token log-probability under the corpus
    unigram model. Returns (id, n_tokens, avg_logprob); documents with
    zero tokens keep a row with n_tokens 0 and NULL avg_logprob.

    ``counts`` defaults to fitting on ``df`` itself (self-scoring — the
    usual first pass); pass a pre-fitted table to score a new corpus
    under a reference model (then unseen tokens take the smoothed
    unseen mass).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if counts is None:
        counts = unigram_counts(df, text_col)
    totals = counts.agg(
        F.sum("count").alias("__total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    toks = _tokens(df, id_col, text_col)
    scored = (
        toks.join(counts, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("count"), F.lit(0)) + F.lit(float(alpha)))
                / (F.col("__total") + F.lit(float(alpha)) * (F.col("__vocab") + 1))
            ).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("__lp").alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            "avg_logprob",
        )
    )


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2, count) over the corpus — the fitted bigram table. One
    tokenize map + one map-side-combinable groupBy; at corpus scale this
    table is the model artifact you persist (KenLM's role), bucketed by
    (w1, w2) for the scoring join."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    pairs = F.zip_with(
        F.expr(f"slice({'__t'}, 1, size(__t) - 1)"),
        F.expr(f"slice({'__t'}, 2, size(__t) - 1)"),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(toks.alias("__t"))
        .where(F.size("__t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bigram_doc_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    unigram: DataFrame | None = None,
    bigram: DataFrame | None = None,
    lam: float = 0.75,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document average INTERPOLATED bigram log-probability — the
    order-2 step from ``unigram_doc_logprob`` toward CCNet's KenLM gate:

        p(w2 | w1) = lam * c(w1,w2)/c(w1)  +  (1-lam) * p_uni(w2)

    with ``p_uni`` the add-alpha-smoothed unigram (so unseen bigrams and
    unseen words both score the reserved mass instead of -inf; lam < 1
    keeps the log finite). Returns (id, n_bigrams, avg_logprob); docs
    with < 2 tokens keep a row with n_bigrams 0 and NULL score.

    ``unigram``/``bigram`` default to self-fitting; pass pre-fitted
    tables to score under a reference model. Plan shape: tokenize map ->
    bigram explode -> two count joins (AQE broadcasts small vocabularies;
    plain shuffle joins at corpus scale, co-bucketable with the fitted
    tables) -> one per-doc aggregate. All codegen after the explode.
    The default lam is an exact binary float (0.75) so SQL oracles
    reproduce the arithmetic bit-for-bit.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError("lam must be in (0, 1)")
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if unigram is None:
        unigram = unigram_counts(df, text_col)
    if bigram is None:
        bigram = bigram_counts(df, text_col)
    totals = unigram.agg(
        F.sum("count").alias("__total"),
        F.count(F.lit(1)).alias("__vocab"),
    )
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    pairs = F.zip_with(
        F.expr("slice(__t, 1, size(__t) - 1)"),
        F.expr("slice(__t, 2, size(__t) - 1)"),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        df.select(F.col(id_col), toks.alias("__t"))
        .where(F.size("__t") >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(F.col(id_col), "p.w1", "p.w2")
    )
    u1 = unigram.select(F.col("token").alias("w1"), F.col("count").alias("__c1"))
    u2 = unigram.select(F.col("token").alias("w2"), F.col("count").alias("__c2"))
    bc = bigram.select("w1", "w2", F.col("count").alias("__cb"))
    lam = float(lam)
    a = float(alpha)
    scored = (
        bg.join(bc, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log(
                F.lit(lam)
                * F.when(
                    F.coalesce(F.col("__c1"), F.lit(0)) > 0,
                    F.coalesce(F.col("__cb"), F.lit(0)).cast("double")
                    / F.col("__c1"),
                ).otherwise(F.lit(0.0))
                + F.lit(1.0 - lam)
                * (
                    (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(a))
                    / (F.col("__total") + F.lit(a) * (F.col("__vocab") + 1))
                )
            ).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("__lp").alias("avg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            "avg_logprob",
        )
    )


def collocations(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 5,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Pointwise-mutual-information collocation table over adjacent
    word pairs — the phrase detector (word2vec/gensim "Phrases") that
    turns "new york" into a unit before tokenizer training:
    ``(w1, w2, n_pair, n_w1, n_w2, pmi, npmi)``.

    All probabilities live in the SAME sample space — the corpus's
    bigram occurrences (the NLTK contingency-table convention, Bouma
    2009): ``n_w1``/``n_w2`` are the first-/second-POSITION marginals
    (sum of pair counts with that word on that side), so with
    N = total bigrams, ``pmi = ln((n_pair/N) / ((n_w1/N)*(n_w2/N)))``
    and ``npmi = pmi / -ln(n_pair/N)`` is STRICTLY in (-1, 1]
    (``n_pair <= n_w1, n_w2`` with one shared denominator; NULL when
    the corpus has a single distinct pair: -ln(1) = 0). Mixing token-
    count marginals with a pair-count joint — the textbook shortcut —
    breaks that bound (doc "a b c d" gives npmi 1.52).

    Scale shape: everything derives from the fitted bigram table (one
    tokenize + map-side-combinable groupBy) — pass a persisted
    ``counts`` (``bigram_counts`` output, the model artifact) to avoid
    re-fitting it per consumer (marginals, total, pairs). ``min_count``
    prunes the pair long-tail BEFORE the two marginal joins (the
    marginal sides are vocabulary-sized — AQE broadcasts them); the
    corpus total is a one-row broadcast scalar. No UDFs, exact SQL
    oracle."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    big = counts if counts is not None else bigram_counts(df, text_col)
    left = big.groupBy("w1").agg(F.sum("count").alias("n_w1"))
    right = big.groupBy("w2").agg(F.sum("count").alias("n_w2"))
    total = big.agg(F.sum("count").alias("__n_pair"))
    pairs = (
        big.where(F.col("count") >= min_count)
        .withColumnRenamed("count", "n_pair")
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
    )
    n = F.col("__n_pair")
    p_pair = F.col("n_pair") / n
    pmi = F.log(p_pair / ((F.col("n_w1") / n) * (F.col("n_w2") / n)))
    return pairs.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        pmi.alias("pmi"),
        F.when(-F.log(p_pair) > 0, pmi / -F.log(p_pair)).alias("npmi"),
    )
