"""Text analysis functions for large-scale training-data pipelines.

All hot-path functions are JVM-side column expressions (whole-stage
codegen, zero Python): token counting, quality scoring, language-ID
heuristic, fingerprinting, character shingles, minhash signatures. Only
simhash uses a (vectorized) pandas UDF, because its 64-lane bit-vote
accumulator has no clean higher-order-function form.

Semantics are deliberately expressible in ANSI SQL so DuckDB can serve as
the correctness oracle for each (same regexes, same stopword lists).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

# word-ish tokens: letter runs, digit runs, single other non-space symbols
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
PUNCT_PATTERN = "[^A-Za-z0-9\\s]"

# tiny public stopword lists (top function words) for the n-gram/stopword
# language heuristic — deliberately small and hard-coded so Spark and the
# SQL oracle share them verbatim
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "por"],
}


def token_count(col: Column) -> Column:
    """Number of TOKEN_PATTERN matches — a BPE-ish proxy token count."""
    return F.regexp_count(col, F.lit(TOKEN_PATTERN))


def words(col: Column) -> Column:
    """Lowercased word tokens (letter/digit runs)."""
    w = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(w, lambda t: t != "")


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / digit / uppercase ratio features."""
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_punct = F.regexp_count(col, F.lit(PUNCT_PATTERN))
    n_digits = F.regexp_count(col, F.lit("[0-9]"))
    n_upper = F.regexp_count(col, F.lit("[A-Z]"))
    toks = words(col)
    n_words = F.size(toks)
    en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)  # noqa: E731
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": safe(n_punct, n_chars),
        "digit_ratio": safe(n_digits, n_chars),
        "upper_ratio": safe(n_upper, n_chars),
        "stopword_ratio": safe(n_stop, n_words),
        "mean_word_len": safe(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)),
            n_words,
        ),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, sane punctuation,
    healthy stopword density (garbage text scores low on all three)."""
    q = quality_features(col)
    len_ok = F.least(q["n_chars"] / F.lit(200.0), F.lit(1.0))
    punct_ok = F.greatest(F.lit(1.0) - q["punct_ratio"] * 4.0, F.lit(0.0))
    stop_ok = F.least(q["stopword_ratio"] * 4.0, F.lit(1.0))
    return (len_ok + punct_ok + stop_ok) / 3.0


def lang_scores(col: Column) -> dict[str, Column]:
    toks = words(col)
    out = {}
    for lang, stops in STOPWORDS.items():
        arr = F.array(*[F.lit(s) for s in stops])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column, min_hits: int = 1) -> Column:
    """Stopword-vote language ID: argmax language, ties broken by the fixed
    language order en>de>fr>es (greatest-first chain); 'und' if no hits."""
    s = lang_scores(col)
    best = F.greatest(*[s[lang] for lang in STOPWORDS])
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        expr = F.when((s[lang] == best) & (best >= min_hits), F.lit(lang)).otherwise(
            expr
        )
    return expr


def doc_fingerprint(col: Column) -> Column:
    """Canonical-content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text (exact-dedup key)."""
    norm = F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))
    return F.md5(norm)


def char_shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text, JVM-side
    (transform over a sequence of offsets).

    Texts shorter than ``n`` have NO shingles (empty array): without the
    guard, F.sequence(1, 0) auto-steps to a DESCENDING [1, 0] sequence and
    short/empty texts would get a bogus non-empty shingle set — diverging
    from both the numpy minhash path and the SQL oracle's generate_series.
    """
    lowered = F.lower(col)
    return F.when(F.length(lowered) >= n, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(lowered) - (n - 1)),
            lambda i: lowered.substr(i, F.lit(n)),
        )
    )).otherwise(F.array().cast("array<string>"))


_MERSENNE31 = 2_147_483_647  # 2^31 - 1


def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_j, b_j), a_j != 0."""
    import random

    rng = random.Random(0xC0FFEE)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(k)
    ]


def minhash_signature(col: Column, k: int = 32, n: int = 3) -> Column:
    """k-lane minhash over character n-gram shingles.

    One xxhash64 per shingle, then k universal-hash mixes
    ``(a_j * h + b_j) mod (2^31-1)`` — k multiply-mods instead of k full
    hash evaluations per shingle (the standard MinHash construction).
    Entirely JVM-side; products stay under 2^62 so ANSI mode never
    overflows. Two documents' estimated Jaccard = fraction of equal lanes.
    """
    sh = char_shingles(col, n)
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31)))

    def lane(a: int, b: int) -> Column:
        # closure factory: PySpark infers lambda arity from the signature,
        # so default-arg capture (lambda h, a=a: ...) would read as 2-ary.
        # coalesce: empty shingle set (text shorter than n) -> the same
        # sentinel lane value the numpy path emits, instead of NULL
        return F.coalesce(
            F.array_min(
                F.transform(
                    base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))
                )
            ),
            F.lit(_MERSENNE31),
        )

    return F.array(*[lane(a, b) for (a, b) in _minhash_params(k)])


def minhash_signature_udf(
    df: DataFrame, text_col: str, out_col: str = "sig", k: int = 32, n: int = 3
) -> DataFrame:
    """Vectorized numpy MinHash (the fast path used by the dedup operators).

    The JVM expression variant (``minhash_signature``) allocates one string
    object per shingle per row inside higher-order functions — fine for
    small corpora, allocation-bound at scale. Here each text's byte
    n-grams are packed into integers directly (for n<=7 the packed value IS
    the shingle — a perfect hash, zero collisions), deduplicated with
    np.unique, and all k universal-hash lanes are computed as one
    (shingles x k) matrix min. Arrow-batched; no per-row Python beyond the
    packing loop over documents.
    """
    if n > 7:
        raise ValueError("packed byte n-grams support n <= 7")
    params = _minhash_params(k)
    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)

    schema = StructType(
        df.schema.fields + [StructField(out_col, __import__("pyspark").sql.types.ArrayType(LongType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(n - 1, -1, -1, dtype=np.int64) * 8
        empty_sig = [int(_MERSENNE31)] * k
        for pdf in batches:
            if pdf.empty:
                continue
            sigs = []
            for t in pdf[text_col]:
                # NULL guard BEFORE str(): str(None) would fabricate the
                # literal token "none" and make every pair of NULL-text
                # docs an est-Jaccard-1.0 duplicate. NULL packs to the
                # sentinel signature, exactly like text shorter than n
                # (char_shingles: NULL -> empty set).
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    sigs.append(empty_sig)
                    continue
                b = np.frombuffer(str(t).lower().encode("utf-8"), dtype=np.uint8)
                if len(b) < n:
                    sigs.append(empty_sig)
                    continue
                # pack each byte n-gram into one integer (exact, collision-free)
                windows = np.lib.stride_tricks.sliding_window_view(b, n).astype(
                    np.int64
                )
                packed = (windows << shifts).sum(axis=1)
                u = np.unique(packed) % _MERSENNE31
                lanes = (u[:, None] * A[None, :] + B[None, :]) % _MERSENNE31
                sigs.append(lanes.min(axis=0).tolist())
            out = pdf.copy()
            out[out_col] = sigs
            yield out

    return df.mapInPandas(run, schema=schema)


def _fnv1a64_batch(tokens: list[bytes]) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a token batch: tokens padded into one
    (n_tokens x max_len) byte matrix, the hash chain iterated over CHAR
    POSITIONS (a dozen-odd vectorized uint64 ops) instead of per token —
    bit-identical to the scalar loop (uint64 arithmetic wraps mod 2^64)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    lens = np.array([len(t) for t in tokens])
    max_len = int(lens.max()) if len(lens) else 0
    M = np.zeros((len(tokens), max_len), dtype=np.uint8)
    for i, t in enumerate(tokens):
        M[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
    h = np.full(len(tokens), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(max_len):
            active = lens > j
            h[active] = (h[active] ^ M[active, j].astype(np.uint64)) * prime
    return h


def simhash64_udf(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """64-bit simhash over word tokens (Arrow-batched pandas UDF; the
    64-lane bit-vote has no tidy built-in form). Deterministic: tokens
    hashed with a fixed 64-bit FNV-1a, bit votes +-1, sign -> bit.

    Fully vectorized per batch: each batch's DISTINCT tokens are hashed
    once with ``_fnv1a64_batch`` (shared vocabulary across documents is
    hashed once, not once per occurrence), bits expanded to a
    (n_unique x 64) matrix, and per-document votes accumulated with one
    ``np.add.at`` over the occurrence->document segment index — no
    per-token Python in the loop.

    NULL text and token-less text (no [a-z0-9] runs) hash to NULL, not to
    a shared value: str(None) would fabricate a "none" token, and an
    all-zero vote vector collapses every empty doc onto simhash 0 — either
    way two contentless docs would look like hamming-0 duplicates.
    ``simhash_pairs`` filters the NULLs before bucketing."""

    schema = StructType(df.schema.fields + [StructField(out_col, LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        tok = re.compile("[a-z0-9]+")
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            if pdf.empty:
                continue
            per_doc = [
                []
                if t is None or (isinstance(t, float) and pd.isna(t))
                else [w.encode("utf-8") for w in tok.findall(str(t).lower())]
                for t in pdf[text_col]
            ]
            counts = np.array([len(ts) for ts in per_doc])
            flat = [w for ts in per_doc for w in ts]
            votes = np.zeros((len(per_doc), 64), dtype=np.int64)
            if flat:
                uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
                hashes = _fnv1a64_batch(list(uniq))
                bits = (
                    (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int32)
                contrib = 2 * bits - 1  # (n_unique, 64), votes +-1
                # per-doc vote sums via np.add.reduceat over the
                # document-contiguous occurrence matrix: occurrences are
                # laid out doc-by-doc already, so each non-empty doc is
                # one contiguous run starting at its cumulative-count
                # offset (empty docs occupy zero rows and stay all-zero).
                # Replaces np.add.at, whose unbuffered scatter was 30-40x
                # slower (measured 4.4s -> ~0.1s on the sf0.1 batch) —
                # identical exact integer sums.
                nz = counts > 0
                starts = np.zeros(len(per_doc), dtype=np.int64)
                starts[1:] = np.cumsum(counts)[:-1]
                votes[nz] = np.add.reduceat(
                    contrib[inv], starts[nz], axis=0
                ).astype(np.int64)
            sig = ((votes > 0).astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
            pdf = pdf.copy()
            vals = pd.array(sig.view(np.int64), dtype="Int64")
            vals[counts == 0] = pd.NA  # contentless docs -> NULL simhash
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(run, schema=schema)
