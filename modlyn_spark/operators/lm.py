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
