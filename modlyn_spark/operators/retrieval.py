"""BM25 lexical retrieval — the inverted-index complement to the vector
ANN tier (operators/similarity.py). Training-data pipelines use it for
eval-set decontamination probes, nearest-neighbor quality auditing, and
retrieval-augmented filtering; the engine otherwise had only embedding
search.

Model: Robertson/Spärck Jones BM25 (the Okapi formulation):

    score(q, d) = sum_{t in q} idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * len(d) / avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Tokens are the engine's standard lowercased ``[a-z0-9]+`` words (same
tokenizer as lm.py / lang_id / the hashed featurizer), so every layer of
the text tier shares one vocabulary.

Plan shape — classic distributed inverted index, everything codegen
after the tokenize explode:

- ``build_index``: ONE tokenize explode + groupBy(doc, token) for the
  postings (token, doc_id, tf, dl), a second groupBy(token) for the
  document frequencies, and a 2-scalar aggregate (N, avgdl). At corpus
  scale the postings table is the persisted artifact, bucketed by token
  so the query join is exchange-free on the index side.
- ``bm25_topk``: query terms (deduplicated per query — standard BM25
  treats the query as a set) join postings on token, one
  groupBy(query, doc) partial-aggregated sum, one per-query top-k
  window. Queries are usually a tiny probe set, so AQE broadcasts the
  term side into the postings scan; candidates travel as
  (query_id, doc_id, partial score) only.

Skew note: stop-words produce the hottest postings lists. BM25's own
idf already collapses their SCORE contribution to ~0, but not the join
volume; production indexes cap df (``max_df_frac``) exactly the way
Lucene drops nothing but search engines skip stop-postings — dropped
tokens are recorded in the index manifest, never silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORD_RE = "[a-z0-9]+"


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_df_frac: float | None = None,
    cache: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (postings, dfreq, stats):

    - postings: (token, doc_id, tf, dl) — dl is the document length in
      tokens, carried on the posting so scoring needs no extra join;
    - dfreq: (token, df) document frequencies;
    - stats: one row (n_docs, avgdl).

    ``max_df_frac`` drops tokens occurring in more than that fraction of
    documents from the POSTINGS (the stop-postings cap); their rows in
    ``dfreq`` remain, flagged ``dropped = true``, so the cap is auditable.
    """
    from modlyn_spark.session import ensure_parallelism

    # single-row-group sources scan as ONE partition and serialize the
    # tokenize explode (the recorded trap); no-op on well-split inputs
    docs = ensure_parallelism(docs.select(id_col, text_col))
    tok = _doc_tokens(docs, id_col, text_col)
    postings = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if cache:
        # three consumers read the postings (dl, dfreq, the scoring
        # join) — uncached, the tokenize+groupBy subtree executes three
        # times. Measured A/B (sf0.1, fresh JVM): for a ONE-SHOT query
        # the pipelined recompute is cheaper than materializing the
        # columnar cache (6.6s vs 17.1s), so the default is OFF; turn it
        # on when the same in-session index serves repeated query
        # batches. In production the index is a PERSISTED token-bucketed
        # parquet artifact and this knob is moot. Caller owns
        # unpersisting.
        postings = postings.cache()
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = postings.join(dl, id_col)
    dfreq = postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    if max_df_frac is not None:
        n_docs = stats.collect()[0]["n_docs"]  # one scalar, bounded
        cap = float(max_df_frac) * n_docs
        dfreq = dfreq.withColumn("dropped", F.col("df") > cap)
        keep = dfreq.where(~F.col("dropped")).select("token")
        postings = postings.join(keep, "token", "left_semi")
    else:
        dfreq = dfreq.withColumn("dropped", F.lit(False))
    return postings, dfreq, stats


def bm25_topk(
    queries: DataFrame,
    postings: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    *,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    doc_id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — BM25 top-k per query, ranked by
    descending score with ascending doc_id tie-break (the deterministic
    rank every oracle can replay)."""
    terms = _doc_tokens(queries, query_id_col, query_text_col).distinct()
    scored = (
        terms.join(postings, "token")
        .join(dfreq.where(~F.col("dropped")).select("token", "df"), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(query_id_col),
            F.col(doc_id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - b)
                        + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("__s"),
        )
    )
    agg = scored.groupBy(query_id_col, doc_id_col).agg(
        F.sum("__s").alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(doc_id_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(query_id_col, doc_id_col, "score", "rank")
    )


def rrf_fuse(
    runs: list[DataFrame],
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k0: float = 60.0,
    weights: list[float] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval runs:
    ``rrf(q, d) = Σ_runs w_i / (k0 + rank_i(q, d))`` with a document
    absent from a run contributing nothing (Cormack et al., SIGIR 2009 —
    the standard hybrid-retrieval combiner for BM25 + dense runs, and for
    multi-query reformulation fusion).

    Each run needs (query_col, doc_col, rank_col) with rank 1-based —
    the shape :func:`bm25_topk`, ``similarity.cosine_topk`` and
    ``similarity.hamming_topk`` already emit. Output:
    (query, doc, rrf, rank), ranked by descending rrf with ascending doc
    tie-break; ``k`` truncates per query.

    Scale: a union of the (already tiny, ≤ queries×k rows) run tables and
    ONE map-side-combinable groupBy — fusion cost is proportional to the
    result lists, never to the corpus.
    """
    if not runs:
        raise ValueError("need at least one run")
    w = [1.0] * len(runs) if weights is None else [float(x) for x in weights]
    if len(w) != len(runs):
        raise ValueError("weights must match runs")
    tagged = [
        r.select(
            F.col(query_col),
            F.col(doc_col),
            (F.lit(wi) / (F.lit(float(k0)) + F.col(rank_col))).alias("__c"),
        )
        for r, wi in zip(runs, w)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(query_col, doc_col).agg(F.sum("__c").alias("rrf"))
    win = Window.partitionBy(query_col).orderBy(
        F.col("rrf").desc(), F.col(doc_col).asc()
    )
    out = fused.withColumn("rank", F.row_number().over(win))
    if k is not None:
        out = out.where(F.col("rank") <= int(k))
    return out.select(query_col, doc_col, "rrf", "rank")


def tfidf_vectors(
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    min_df: int = 1,
    max_df_frac: float | None = None,
    l2_norm: bool = True,
) -> DataFrame:
    """Smoothed TF-IDF document vectors in long form
    ``(id, token, tfidf)`` — sklearn ``TfidfVectorizer`` semantics:

        idf(t)     = ln((1 + N) / (1 + df(t))) + 1      (smooth_idf)
        tfidf(t,d) = tf(t,d) · idf(t)                    (raw-count tf)

    then (default) L2-normalized per document. ``N`` counts documents
    that produced at least one token (the docs visible to the index).

    Reuses the BM25 inverted index verbatim — pass ``index=`` the
    triple from :func:`build_index` to serve BM25 AND TF-IDF from one
    build; otherwise the index is built from ``docs``. ``min_df`` /
    ``max_df_frac`` prune rare / stop tokens (the cap stays auditable in
    ``dfreq``, see :func:`build_index`).

    Plan: the postings/dfreq groupBys are the only data shuffles
    (map-side combinable); the idf join is token-keyed (AQE broadcasts
    small vocabularies); L2 is one window over the postings keyed by
    document. The output composes directly with
    ``operators.similarity`` cosine via ``(token, tfidf)`` pairs.
    """
    if index is None:
        if docs is None:
            raise ValueError("pass docs or a prebuilt index")
        index = build_index(
            docs, id_col, text_col, max_df_frac=max_df_frac
        )
    postings, dfreq, stats = index
    n_docs = stats.collect()[0]["n_docs"]  # one scalar, bounded
    keep = dfreq.where(
        (F.col("df") >= int(min_df)) & ~F.col("dropped")
    ).select("token", "df")
    idf = F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0
    raw = postings.join(keep, "token").select(
        id_col, "token", (F.col("tf") * idf).alias("__raw")
    )
    if not l2_norm:
        return raw.withColumnRenamed("__raw", "tfidf")
    w = Window.partitionBy(id_col)
    return raw.select(
        id_col,
        "token",
        (
            F.col("__raw")
            / F.sqrt(F.sum(F.col("__raw") * F.col("__raw")).over(w))
        ).alias("tfidf"),
    )
