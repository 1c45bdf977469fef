"""Gopher-style repetition signals for web-corpus quality filtering.

Implements the "repetitious text" measures from Rae et al. 2021 (Gopher,
Table A1), the standard gate used by large-scale training-data pipelines
(C4 / Gopher / RefinedWeb / Dolma all apply variants of it):

- duplicate line / paragraph fraction (count- and character-weighted),
- top word-n-gram character coverage (n = 2, 3, 4),
- duplicated word-n-gram character coverage (n = 5..10, overlapping
  spans counted once via position marking).

The per-document computation has no tidy JVM higher-order-function form
(it needs hash-grouped n-gram counting plus interval marking), so it runs
as ONE Arrow-batched ``mapInPandas`` — numpy-vectorized inside the batch:
the batch's distinct words are coded once with ``np.unique`` (shared
vocabulary is coded once, not once per occurrence), n-grams become rows of
a strided code matrix grouped by ``np.unique(axis=0)``, and span marking
is a cumsum over a difference array. No per-token Python in the loop.

Scale shape: embarrassingly parallel map over documents — zero shuffles,
zero state; the one operator in the curation family that costs exactly
one pass over the bytes.

Signals are defined so that an ANSI-SQL oracle (DuckDB) reproduces the
word-n-gram measures exactly: words are whitespace-split lowercased
tokens, gram character mass excludes separators, and the top-gram tie
break is lexicographic on the space-joined gram (for non-empty words with
no chars <= 0x20, space-joined string order equals word-tuple order, so
numpy's sorted-unique row order and SQL's ORDER BY gram agree).

Reference scope note: modlyn (the reference) has no corpus-curation
surface; this module exists for the training-data-pipeline tier mandated
by the build brief.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

SIGNAL_COLS = (
    "dup_line_frac",
    "dup_line_char_frac",
    "dup_para_frac",
    "dup_para_char_frac",
    *[f"top_{n}gram_char_frac" for n in TOP_NS],
    *[f"dup_{n}gram_char_frac" for n in DUP_NS],
)

# Gopher Table A1 thresholds: a document is repetition-clean iff every
# signal is at or below its cap.
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _dup_fracs(units: list[str]) -> tuple[float, float]:
    """(fraction of units whose value occurs >=2, char-weighted ditto)."""
    if not units:
        return 0.0, 0.0
    arr = np.array(units, dtype=object)
    uniq, inv, cnt = np.unique(arr, return_inverse=True, return_counts=True)
    dup_mask = (cnt >= 2)[inv]
    lens = np.array([len(u) for u in units], dtype=np.int64)
    total = int(lens.sum())
    dup_frac = float(dup_mask.sum()) / len(units)
    dup_char = float(lens[dup_mask].sum()) / total if total else 0.0
    return dup_frac, dup_char


def _doc_gram_signals(codes: np.ndarray, wl: np.ndarray) -> list[float]:
    """top-n (n=2,3,4) and dup-n (n=5..10) char fractions for one doc.

    codes: int codes of the doc's words (sorted-unique rank codes so
    lexicographic row order matches word-string order); wl: word lengths.
    """
    m = len(codes)
    total = int(wl.sum())
    out: list[float] = []
    if total == 0:
        return [0.0] * (len(TOP_NS) + len(DUP_NS))
    cs = np.concatenate(([0], np.cumsum(wl)))  # prefix char mass
    for n in TOP_NS:
        if m < n:
            out.append(0.0)
            continue
        G = np.lib.stride_tricks.sliding_window_view(codes, n)
        uniq, inv, cnt = np.unique(
            G, axis=0, return_inverse=True, return_counts=True
        )
        inv = inv.ravel()  # numpy>=2 returns the original (1-d) shape anyway
        glen = cs[n:] - cs[:-n]  # char mass per occurrence (equal per gram)
        glen_u = np.zeros(len(uniq), dtype=np.int64)
        glen_u[inv] = glen
        top = int(np.argmax(cnt))  # first max = lexicographically smallest
        out.append(float(cnt[top] * glen_u[top]) / total)
    for n in DUP_NS:
        if m < n:
            out.append(0.0)
            continue
        G = np.lib.stride_tricks.sliding_window_view(codes, n)
        _, inv, cnt = np.unique(G, axis=0, return_inverse=True, return_counts=True)
        occ_dup = (cnt >= 2)[inv.ravel()]
        starts = np.flatnonzero(occ_dup)
        if len(starts) == 0:
            out.append(0.0)
            continue
        # mark covered word positions once (interval union via diff array)
        d = np.zeros(m + 1, dtype=np.int64)
        np.add.at(d, starts, 1)
        np.add.at(d, starts + n, -1)
        covered = np.cumsum(d[:-1]) > 0
        out.append(float(wl[covered].sum()) / total)
    return out


def repetition_signals(
    df: DataFrame,
    text_col: str,
    *,
    line_delim: str = "\n",
    para_delim: str = "\n\n",
    prefix: str = "",
) -> DataFrame:
    """Append the 13 Gopher repetition signals as double columns.

    NULL text yields all-zero signals (an empty document repeats nothing —
    length gates, not repetition gates, are responsible for dropping it).
    """
    cols = [f"{prefix}{c}" for c in SIGNAL_COLS]
    schema = StructType(
        df.schema.fields + [StructField(c, DoubleType()) for c in cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        ws = re.compile(r"\s+")
        for pdf in batches:
            if pdf.empty:
                continue
            per_doc_words: list[list[str]] = []
            rows: list[list[float]] = []
            texts = [
                ""
                if t is None or (isinstance(t, float) and pd.isna(t))
                else str(t)
                for t in pdf[text_col]
            ]
            for t in texts:
                paras = [p for p in t.split(para_delim) if p.strip()]
                lines = [l for l in t.split(line_delim) if l.strip()]
                dlf, dlcf = _dup_fracs(lines)
                dpf, dpcf = _dup_fracs(paras)
                rows.append([dlf, dlcf, dpf, dpcf])
                per_doc_words.append(
                    [w for w in ws.split(t.lower()) if w != ""]
                )
            # code the batch vocabulary once; rank codes preserve
            # lexicographic order (np.unique sorts), which the top-gram
            # tie break relies on
            counts = np.array([len(wds) for wds in per_doc_words])
            flat = [w for wds in per_doc_words for w in wds]
            if flat:
                _, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
                lens = np.array([len(w) for w in flat], dtype=np.int64)
            else:
                inv = np.zeros(0, dtype=np.int64)
                lens = np.zeros(0, dtype=np.int64)
            offs = np.concatenate(([0], np.cumsum(counts)))
            for i in range(len(rows)):
                codes = inv[offs[i] : offs[i + 1]]
                wl = lens[offs[i] : offs[i + 1]]
                rows[i].extend(_doc_gram_signals(codes, wl))
            sig = pd.DataFrame(rows, columns=cols, dtype="float64")
            yield pd.concat(
                [pdf.reset_index(drop=True), sig], axis=1
            )

    from modlyn_spark.session import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema=schema)


def gopher_repetition_ok(prefix: str = "") -> Column:
    """Boolean gate over repetition_signals output: True iff every signal
    is at or below its Gopher Table A1 cap."""
    cond = F.lit(True)
    for name, cap in GOPHER_THRESHOLDS.items():
        cond = cond & (F.col(f"{prefix}{name}") <= F.lit(cap))
    return cond
