"""Token-window document chunking — the inverse of operators/packing.py:
where packing concatenates short documents into fixed training sequences,
chunking splits LONG documents into bounded token windows (with optional
overlap), the standard long-document step for both training-sequence prep
and retrieval indexing.

Semantics: tokens are whitespace-delimited words (the same family as the
packing/span tokenizers — original word forms, no lowercasing); chunk i
covers tokens [i*stride, i*stride + max_tokens) and renders as the words
joined by single spaces (whitespace runs normalize — documented, same
contract as corpus_line_dedup's reassembly). A document with n tokens
yields ceil((n - max_tokens) / stride) + 1 chunks (1 if n <= max_tokens,
0 if n == 0); with stride < max_tokens consecutive chunks overlap by
max_tokens - stride tokens (the boundary-context trick), and every token
is covered by at least one chunk for any 0 < stride <= max_tokens.

Plan shape: ENTIRELY whole-stage-codegen column expressions — tokenize
(split/filter), per-row chunk-index sequence, slice + array_join per
index, one posexplode. No UDF, no shuffle: chunking pipelines into the
scan of whatever consumes it. That is also what makes it exactly
SQL-checkable (DuckDB replays it with range()/list slicing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk) — one row per token window.

    ``stride`` defaults to ``max_tokens`` (non-overlapping); smaller
    strides overlap consecutive chunks by ``max_tokens - stride``.
    """
    C = int(max_tokens)
    S = int(stride) if stride is not None else C
    if C < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 < S <= C:
        raise ValueError("stride must be in (0, max_tokens]")

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= C, F.lit(1))
        .otherwise(F.ceil((n - F.lit(C)) / F.lit(S)).cast("long") + 1)
    )

    def piece(i: Column) -> Column:
        sl = F.slice(toks, i * S + 1, C)
        return F.struct(
            F.size(sl).cast("long").alias("n_tokens"),
            F.array_join(sl, " ").alias("chunk"),
        )

    chunks = F.when(
        n_chunks > 0,
        F.transform(F.sequence(F.lit(0), n_chunks.cast("int") - 1), piece),
    ).otherwise(F.array().cast("array<struct<n_tokens:bigint,chunk:string>>"))
    return (
        df.select(F.col(id_col), chunks.alias("__c"))
        .select(id_col, F.posexplode("__c").alias("chunk_id", "p"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("p.n_tokens").alias("n_tokens"),
            F.col("p.chunk").alias("chunk"),
        )
    )
