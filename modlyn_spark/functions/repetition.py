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
        # count x len is the standard shortcut (DataTrove/Dolma); a
        # self-overlapping gram ("b b b" -> 2-gram (b,b) twice over 3
        # chars) can push it past 1, so cap to keep it a fraction
        out.append(min(1.0, float(cnt[top] * glen_u[top]) / total))
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


def _group_rows(rows: np.ndarray):
    """Exact row grouping in lexicographic order — np.unique(axis=0)
    semantics via column-wise lexsort + boundary diff (the void-view row
    sort behind unique(axis=0) memcmp-compares packed rows and measured
    ~8x slower on the batch gram matrices).

    Returns (first_idx_sorted, inv, cnt): index of each group's first
    occurrence with groups in lexicographic row order, group id per input
    row, and group sizes."""
    n = len(rows)
    # bijectively pack triples of columns into single int64 keys when the
    # value range allows (it always does for rank codes of a batch
    # vocabulary) — 11-key lexsorts collapse to 4-key ones, exactly
    V = int(rows.max()) + 1 if n else 1
    if 0 < V and V ** 3 < 2 ** 62:
        ncol = rows.shape[1]
        pad = (-ncol) % 3
        if pad:
            rows_p = np.concatenate(
                (rows, np.zeros((n, pad), dtype=rows.dtype)), axis=1
            )
        else:
            rows_p = rows
        V64 = np.int64(V)
        packed = (
            rows_p[:, 0::3] * (V64 * V64)
            + rows_p[:, 1::3] * V64
            + rows_p[:, 2::3]
        )
        keys = packed
    else:
        keys = rows
    order = np.lexsort(tuple(keys[:, c] for c in range(keys.shape[1] - 1, -1, -1)))
    sr = keys[order]
    new = np.concatenate(([True], np.any(sr[1:] != sr[:-1], axis=1)))
    gid_sorted = np.cumsum(new) - 1
    inv = np.empty(n, dtype=np.int64)
    inv[order] = gid_sorted
    cnt = np.bincount(gid_sorted)
    first_idx = order[new]
    return first_idx, inv, cnt


def _batch_gram_signals(
    codes: np.ndarray,
    wl: np.ndarray,
    offs: np.ndarray,
) -> np.ndarray:
    """All docs' gram signals in ONE pass per n: (n_docs, 9) array.

    Same values as ``_doc_gram_signals`` per doc (asserted by the test
    suite), but the batch's grams are grouped with a single
    ``np.unique(axis=0)`` over [doc_idx | gram codes] rows per n instead
    of 9 numpy calls per document — the per-doc fixed overhead dominated
    on short web documents (~1ms/doc -> ~0.1ms/doc)."""
    n_docs = len(offs) - 1
    out = np.zeros((n_docs, len(TOP_NS) + len(DUP_NS)), dtype=np.float64)
    m = len(codes)
    counts = np.diff(offs)
    totals = np.zeros(n_docs, dtype=np.int64)
    np.add.at(totals, np.repeat(np.arange(n_docs), counts), wl)
    if m == 0:
        return out
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    cs = np.concatenate(([0], np.cumsum(wl)))
    col = 0
    for n in TOP_NS + DUP_NS:
        is_top = n in TOP_NS
        if m < n:
            col += 1
            continue
        starts_all = np.arange(m - n + 1)
        valid = doc_of[starts_all] == doc_of[starts_all + n - 1]
        starts = starts_all[valid]
        if len(starts) == 0:
            col += 1
            continue
        G = np.lib.stride_tricks.sliding_window_view(codes, n)[valid]
        rows = np.column_stack((doc_of[starts], G))
        first_idx, inv, cnt = _group_rows(rows)
        glen = cs[starts + n] - cs[starts]
        d_tot = totals[doc_of[starts]].astype(np.float64)
        if is_top:
            glen_u = np.zeros(len(cnt), dtype=np.int64)
            glen_u[inv] = glen
            doc_u = rows[first_idx, 0]
            # per doc: max count, lexicographically-smallest gram first —
            # uniq rows are sorted by (doc, gram), so stable-sort by
            # (doc, -cnt) keeps gram order within equal counts
            order = np.lexsort((np.arange(len(cnt)), -cnt, doc_u))
            docs_sorted = doc_u[order]
            first = np.unique(docs_sorted, return_index=True)[1]
            top_rows = order[first]
            vals = cnt[top_rows] * glen_u[top_rows] / np.maximum(
                totals[doc_u[top_rows]], 1
            )
            out[doc_u[top_rows], col] = np.minimum(1.0, vals)
        else:
            occ_dup = (cnt >= 2)[inv]
            dup_starts = starts[occ_dup]
            if len(dup_starts):
                d = np.zeros(m + 1, dtype=np.int64)
                np.add.at(d, dup_starts, 1)
                np.add.at(d, dup_starts + n, -1)
                covered = np.cumsum(d[:-1]) > 0
                mass = np.zeros(n_docs, dtype=np.int64)
                np.add.at(mass, doc_of[covered], wl[covered])
                nz = totals > 0
                out[nz, col] = mass[nz] / totals[nz]
        col += 1
    # docs with zero word mass stay all-zero
    out[totals == 0, :] = 0.0
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
            gram_sig = _batch_gram_signals(inv, lens, offs)
            for i in range(len(rows)):
                rows[i].extend(gram_sig[i].tolist())
            sig = pd.DataFrame(rows, columns=cols, dtype="float64")
            yield pd.concat(
                [pdf.reset_index(drop=True), sig], axis=1
            )

    from modlyn_spark.session import ensure_parallelism

    # heavier per byte than the signature UDFs (9 gram groupings per
    # batch): parallelize from ~64KB of source instead of the default 1MB
    return ensure_parallelism(df, min_bytes=64 << 10).mapInPandas(
        run, schema=schema
    )


def gopher_repetition_ok(prefix: str = "") -> Column:
    """Boolean gate over repetition_signals output: True iff every signal
    is at or below its Gopher Table A1 cap."""
    cond = F.lit(True)
    for name, cap in GOPHER_THRESHOLDS.items():
        cond = cond & (F.col(f"{prefix}{name}") <= F.lit(cap))
    return cond
