"""Distributed BPE tokenizer training and encoding.

A training-data platform does not just COUNT tokens — it FITS the
tokenizer on the corpus it curated. This is byte-pair encoding in its
original subword form (Sennrich, Haddow & Birch, ACL'16): start from
characters (with an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair, emit the ranked merge table that IS the
tokenizer.

Distributed shape (the standard two-level factoring):

1. The corpus collapses to the DISTINCT-WORD table ``(syms, count)``
   first — one map-side-combinable groupBy. All merge statistics are
   linear functions of word counts, so the 100 TB corpus is touched
   ONCE; every iteration afterwards runs over the vocabulary table
   (bounded by distinct words, not corpus size).
2. Each merge iteration: one Arrow-batched pass computes per-batch
   pre-aggregated pair counts (map-side combine in Python — pair rows
   shuffled are ~distinct pairs per batch, not occurrences), one
   groupBy sums them, the argmax pair (count DESC, then lexicographic —
   fully deterministic) is collected, and one Arrow map rewrites the
   vocabulary. The vocabulary is localCheckpoint'ed per round
   (iterative-loop lineage rule, same as connected_components).
3. ``bpe_encode`` applies the learned merge ranks greedily
   (lowest-rank-first, the GPT-2 ``bpe()`` loop) inside one Arrow map,
   memoizing per distinct word within each batch.

Integer counts only — results are bit-identical at any parallelism, and
the single-node twin (oracle/pandas_oracle.oracle_bpe) reproduces the
merge table exactly for the fixture-backed correctness gate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EOW = "</w>"

_VOCAB_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(StringType())),
        StructField("count", LongType()),
    ]
)
_PAIR_SCHEMA = StructType(
    [
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("cnt", LongType()),
    ]
)


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the corpus — lowercased [a-z0-9]+ runs, the
    same word tokenizer as lang_id / the unigram LM."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_word(syms: list, left: str, right: str, joined: str) -> list:
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int,
    min_word_count: int = 1,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges on the corpus. Returns the ranked
    merge table as a small pandas DataFrame (rank, left, right) — the
    tokenizer artifact. Stops early when no adjacent pair remains.

    ``min_word_count`` drops hapax noise from the vocabulary before
    training (web-scale practice; 1 keeps everything).
    """
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    words = word_vocab(df, text_col)
    if min_word_count > 1:
        words = words.where(F.col("count") >= min_word_count)
    vocab = words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
        F.col("count"),
    ).localCheckpoint(eager=True)

    def pair_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        acc: Counter = Counter()
        for pdf in batches:
            for syms, cnt in zip(pdf["syms"], pdf["count"]):
                for i in range(len(syms) - 1):
                    acc[(syms[i], syms[i + 1])] += int(cnt)
        if acc:
            yield pd.DataFrame(
                {
                    "left": [k[0] for k in acc],
                    "right": [k[1] for k in acc],
                    "cnt": list(acc.values()),
                }
            )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            vocab.mapInPandas(pair_partials, schema=_PAIR_SCHEMA)
            .groupBy("left", "right")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))
        joined = left + right

        def apply_merge(
            batches: Iterator[pd.DataFrame],
            left=left,
            right=right,
            joined=joined,
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_word(list(s), left, right, joined)
                    for s in pdf["syms"]
                ]
                yield pdf

        new_vocab = vocab.mapInPandas(
            apply_merge, schema=_VOCAB_SCHEMA
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return pd.DataFrame(
        {
            "rank": range(len(merges)),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: pd.DataFrame,
    *,
    out_col: str = "bpe_n_tokens",
    tokens_col: str | None = None,
) -> DataFrame:
    """Tokenize with a learned merge table: per word, greedily apply the
    LOWEST-RANK applicable merge until none applies (the reference BPE
    encode loop), memoized per distinct word within each Arrow batch.
    Appends ``out_col`` (token count, long) and optionally ``tokens_col``
    (array<string>)."""
    ranks = {
        (r.left, r.right): int(r.rank) for r in merges.itertuples(index=False)
    }
    fields = df.schema.fields + [StructField(out_col, LongType())]
    if tokens_col:
        fields = fields + [StructField(tokens_col, ArrayType(StringType()))]
    schema = StructType(fields)

    def encode_word(word: str) -> list:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms = _merge_word(
                syms, syms[best_i], syms[best_i + 1],
                syms[best_i] + syms[best_i + 1],
            )
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        word_re = re.compile(r"[a-z0-9]+")
        memo: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            counts, toks_out = [], []
            for t in pdf[text_col]:
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    counts.append(0)
                    toks_out.append([])
                    continue
                toks: list = []
                for w in word_re.findall(str(t).lower()):
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w)
                        memo[w] = enc
                    toks.extend(enc)
                counts.append(len(toks))
                toks_out.append(toks)
            out = pdf.copy()
            out[out_col] = pd.array(counts, dtype="int64")
            if tokens_col:
                out[tokens_col] = toks_out
            yield out

    return df.mapInPandas(run, schema=schema)
