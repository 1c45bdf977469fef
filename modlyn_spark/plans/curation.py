"""End-to-end corpus curation — the training-data pipeline composed.

One declarative dataflow from raw documents to a training-ready corpus:

0. (optional) corpus-level boilerplate removal (C4-style line dedup,
   BEFORE document-level stages so a shared nav banner cannot make
   distinct pages look like near-duplicates);
1. exact dedup (content-fingerprint groupBy — keep min-id per text);
2. near-duplicate removal (MinHash-LSH star-edge grouping: every doc that
   verifies against a smaller-id representative is dropped);
3. quality + language gating (pure column expressions — codegen), plus
   the optional Gopher repetition-caps gate (one Arrow map);
4. benchmark-contamination removal against an optional probe/eval set
   (cross-corpus MinHash + exact-Jaccard verify — any corpus doc
   near-verbatim in the probe is dropped);
5. leak-free train/val/test assignment (md5-keyed split: every key lands
   in exactly one split under any partitioning).

Scale shape: steps 1/3/5 are narrow or single-aggregate; steps 2/4 are
the banded-join dedup machinery (candidates travel as bare ids, exact
verification bounded by candidate volume). Nothing is collected; the
result is a DataFrame with the surviving rows plus (lang_pred, quality,
split) columns.

Reference context: modlyn curates in-memory matrices (filters,
subsetting); this is the same intent at web scale over text corpora —
the engine surface a 100 TB training-data pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modlyn_spark.functions.repetition import (
    gopher_repetition_ok,
    repetition_signals,
)
from modlyn_spark.functions.text import lang_id, quality_score
from modlyn_spark.operators.dedup import (
    corpus_line_dedup,
    dedup_exact,
    minhash_contamination,
    minhash_dedup_groups,
)
from modlyn_spark.operators.sampling import split_column


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    lang_allow: list[str] | None = None,
    near_dup_threshold: float = 0.9,
    near_dup_mode: str = "star",
    contamination_probe: DataFrame | None = None,
    contamination_threshold: float = 0.8,
    contamination_span_tokens: int | None = None,
    repetition_gate: bool = False,
    min_avg_logprob: float | None = None,
    boilerplate_delim: str | None = None,
    boilerplate_min_count: int = 3,
    pii_scrub: bool = False,
    domain_blocklist: DataFrame | None = None,
    splits: dict | None = None,
    salt: str = "",
) -> DataFrame:
    """Returns the curated corpus: original columns + lang_pred, quality,
    split. Deterministic end to end (hash-keyed decisions only).

    Optional stages (off by default to keep the minimal pipeline cheap):
    ``pii_scrub`` redacts PII FIRST (so docs differing only in redacted
    PII fingerprint as the duplicates they are); ``domain_blocklist``
    drops documents citing a blocked registered domain (functions/web);
    ``boilerplate_delim`` runs C4-style corpus-level line dedup BEFORE the
    document-level stages (so a shared nav bar doesn't make distinct pages
    look like near-dups); ``repetition_gate`` drops documents failing the
    Gopher Table A1 repetition caps alongside the quality gate.

    ``near_dup_mode`` picks the near-duplicate drop policy:

    - ``"star"`` (default): MinHash star-edge grouping — only docs that
      exactly-verify against their bucket's min-id representative drop.
      Cheapest (verify volume ~ bucket edges), but WHICH docs drop
      depends on the banding layout; use for throughput.
    - ``"pairs"``: drop every doc having ANY smaller-id verified
      near-dup neighbor (jaccard >= threshold). Banding-independent,
      fully specified by the exact pair set — the policy the external
      correctness gate checks against a pure-SQL oracle — at the cost of
      verifying all candidate pairs instead of star edges.
    """
    if pii_scrub:
        # scrub BEFORE any fingerprint/dedup stage (C4 order): two docs
        # differing only in redacted PII ARE duplicates and must
        # fingerprint identically; the scrub is one codegen map
        from modlyn_spark.functions.pii import scrub_pii as _scrub

        docs = docs.withColumn(text_col, _scrub(F.col(text_col)))
    if domain_blocklist is not None:
        # provenance gate on the ORIGINAL (pre-dedup) corpus: only
        # (id, domain) pairs shuffle, the text never moves
        from modlyn_spark.functions.web import domain_blocklist_filter

        docs = domain_blocklist_filter(
            docs, id_col, text_col, domain_blocklist
        )
    if boilerplate_delim is not None:
        docs = corpus_line_dedup(
            docs,
            id_col,
            text_col,
            delim=boilerplate_delim,
            min_count=boilerplate_min_count,
        ).drop("n_units_kept", "n_units_removed")
        docs = docs.where(F.length(F.col(text_col)) > 0)
    out = dedup_exact(docs, id_col, text_col)

    if near_dup_mode == "star":
        dup = minhash_dedup_groups(
            out, id_col, text_col, threshold=near_dup_threshold
        ).select(F.col("doc_id").alias(id_col))
    elif near_dup_mode == "pairs":
        from modlyn_spark.operators.dedup import minhash_near_dup_pairs

        dup = (
            minhash_near_dup_pairs(
                out, id_col, text_col, threshold=near_dup_threshold
            )
            .select(F.col("id2").alias(id_col))
            .distinct()
        )
    else:
        raise ValueError(f"unknown near_dup_mode {near_dup_mode!r}")
    out = out.join(dup, id_col, "left_anti")

    out = out.withColumn("lang_pred", lang_id(F.col(text_col))).withColumn(
        "quality", quality_score(F.col(text_col))
    )
    out = out.where(F.col("quality") >= min_quality)
    if lang_allow is not None:
        out = out.where(F.col("lang_pred").isin(list(lang_allow)))
    if repetition_gate:
        before = set(out.columns)
        out = repetition_signals(out, text_col, prefix="__rep_")
        sig_cols = [c for c in out.columns if c not in before]
        out = out.where(gopher_repetition_ok(prefix="__rep_")).drop(*sig_cols)
    if min_avg_logprob is not None:
        # perplexity-style gate (operators/lm.py): docs whose tokens are
        # systematically rare under the surviving corpus's own unigram
        # model (gibberish, encoding garbage) drop; the score stays as an
        # annotation column like quality
        from modlyn_spark.operators.lm import unigram_doc_logprob

        lp = unigram_doc_logprob(out, id_col, text_col).select(
            id_col, "avg_logprob"
        )
        out = out.join(lp, id_col, "left").where(
            F.col("avg_logprob") >= float(min_avg_logprob)
        )

    if contamination_probe is not None:
        # eager=False: the corpus side is the whole upstream curated plan
        dirty = minhash_contamination(
            out,
            contamination_probe,
            id_col,
            text_col,
            threshold=contamination_threshold,
            eager=False,
        ).select(F.col("corpus_id").alias(id_col))
        if contamination_span_tokens is not None:
            # near-whole-doc similarity misses an eval item QUOTED inside a
            # long document; the verbatim-span check catches it
            from modlyn_spark.operators.spans import span_contamination

            # eager=False: the corpus side here is the whole upstream
            # curated plan — materializing it inside construction would
            # run the dedup stages twice
            dirty = dirty.unionByName(
                span_contamination(
                    out,
                    contamination_probe,
                    id_col,
                    text_col,
                    span_tokens=contamination_span_tokens,
                    eager=False,
                ).select(F.col("corpus_id").alias(id_col))
            )
        out = out.join(dirty.distinct(), id_col, "left_anti")

    return split_column(
        out,
        [id_col],
        splits or {"train": 0.9, "val": 0.05, "test": 0.05},
        salt=salt,
    )


def source_quality_rollup(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source curation decision table — the aggregate view pipelines
    use to keep or drop whole domains/feeds (C4 dropped sources wholesale;
    RefinedWeb curates per-domain): document count, within-source
    exact-duplicate fraction (1 - distinct fingerprints / docs), mean
    quality score and mean length.

    Plan shape: ONE map-side-combinable groupBy over per-row column
    expressions (fingerprint + quality are codegen; no UDFs, no second
    pass) — the cheapest aggregate in the curation family.
    """
    from modlyn_spark.functions.text import doc_fingerprint

    per_doc = docs.select(
        F.col(source_col).alias("source"),
        quality_score(F.col(text_col)).alias("__q"),
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        F.length(F.col(text_col)).alias("__n"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("__fp").alias("n_distinct"),
        F.round(F.avg("__q"), 4).alias("avg_quality"),
        F.round(F.avg("__n"), 4).alias("avg_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.round(
            1.0 - F.col("n_distinct") / F.col("n_docs"), 4
        ).alias("dup_frac"),
        "avg_quality",
        "avg_chars",
    )
