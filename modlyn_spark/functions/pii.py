"""PII detection and redaction — the privacy-scrub stage of a training-data
pipeline (the C4/Dolma/FineWeb pipelines all carry one before release).

Reference scope note: laminlabs/modlyn has no text-curation surface at all
(its core is the AnnData scoring loop); this module is part of the
LLM-data-pipeline tier the engine adds on top, same as dedup/quality/lang.

Design: every detector is a single JVM ``regexp_count`` / ``regexp_replace``
column expression — whole-stage codegen, zero Python, zero shuffle. The
scrub is a fixed-order chain of replaces; order matters only in that a
longer structured pattern (credit card, 4-4-4-4) must run before shorter
digit-group patterns could in principle nibble at it, so the chain applies
patterns in the PII_PATTERNS order. The patterns deliberately restrict to
the regex subset with identical semantics in Java regex (Spark) and RE2
(DuckDB): character classes, bounded quantifiers, ``\\b`` word boundaries,
non-capturing alternation — no backreferences, no lookaround. That keeps
the operator exactly oracle-able: the DuckDB side is generated from the
same PII_PATTERNS table (``duckdb_scrub_sql`` / ``duckdb_count_sql``).

At 100 TB this is a pure map stage: it pipelines into whatever scan or
curation plan feeds it and adds no exchange. Patterns are applied to the
raw text for counting (kinds never overlap by construction: the card /
ssn / phone / ip shapes are mutually exclusive and the email pattern
requires ``@``), so per-kind counts are order-independent even though the
scrub itself is sequential.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement-token) — scrub applies in this order.
# Patterns are valid and equivalent in Java regex AND RE2 (see module doc).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}|\+\d{1,2} \d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]

PII_KINDS = [k for k, _, _ in PII_PATTERNS]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts on the RAW text (long; 0 for NULL text)."""
    return {
        kind: F.coalesce(
            F.regexp_count(col, F.lit(pat)).cast("long"), F.lit(0).cast("long")
        )
        for kind, pat, _ in PII_PATTERNS
    }


def scrub_pii(col: Column) -> Column:
    """Text with every PII match replaced by its kind token.

    NULL text stays NULL (no fabrication — same contract as the signature
    functions in functions/text.py).
    """
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_documents(
    df: DataFrame, text_col: str = "text", *, keep_text: bool = False
) -> DataFrame:
    """Add ``<kind>_count`` columns, a total ``pii_count``, and the scrubbed
    text as ``{text_col}_scrubbed`` (replacing the raw column unless
    ``keep_text``). One codegen'd map stage, no exchange."""
    counts = pii_counts(F.col(text_col))
    out = df
    for kind in PII_KINDS:
        out = out.withColumn(f"{kind}_count", counts[kind])
    total = None
    for kind in PII_KINDS:
        c = F.col(f"{kind}_count")
        total = c if total is None else total + c
    out = out.withColumn("pii_count", total)
    out = out.withColumn(f"{text_col}_scrubbed", scrub_pii(F.col(text_col)))
    if not keep_text:
        out = out.drop(text_col)
    return out


# --- oracle-side SQL generators (DuckDB / RE2) -----------------------------


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def duckdb_scrub_sql(text_expr: str) -> str:
    """DuckDB expression applying the same scrub chain to ``text_expr``."""
    out = text_expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{_sql_quote(pat)}', '{token}', 'g')"
    return out


def duckdb_count_sql(text_expr: str, kind: str) -> str:
    """DuckDB expression counting ``kind`` matches in ``text_expr``."""
    pat = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return (
        f"coalesce(len(regexp_extract_all({text_expr}, '{_sql_quote(pat)}')), 0)"
    )
