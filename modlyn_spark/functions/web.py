"""URL / domain analysis — the web-provenance stage of corpus curation
(C4/RefinedWeb/FineWeb all gate on URL blocklists and per-domain stats).

Reference scope note: like functions/pii.py this is engine surface beyond
laminlabs/modlyn (which has no text/web tier); it completes the curation
story: provenance extraction -> blocklist gate -> per-domain rollups.

Everything is JVM column expressions (codegen, zero Python): URL
extraction is one ``regexp_extract_all``, domain normalization a chain of
string expressions. The URL regex sticks to the Java-regex/RE2-common
subset (same contract as PII_PATTERNS) so DuckDB replays it verbatim.

``registered_domain`` is the NAIVE last-two-labels rule, deliberately:
the real public-suffix list is a data file, not an algorithm — at scale
you broadcast-join the PSL table instead (the operator's join shape is
identical); the naive rule keeps the function dependency-free and the
oracle exact, and is documented as wrong for ccSLDs like .co.uk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port][/path] — Java-regex/RE2-common subset
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\s]*)?"
# capture just the host
HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(col: Column) -> Column:
    """array<string> of URL matches (empty array for NULL/no-match)."""
    return F.coalesce(
        F.regexp_extract_all(col, F.lit(URL_PATTERN), 0),
        F.array().cast("array<string>"),
    )


def extract_hosts(col: Column) -> Column:
    """array<string> of lowercased URL hosts."""
    hosts = F.regexp_extract_all(col, F.lit(HOST_PATTERN), 1)
    return F.coalesce(
        F.transform(hosts, lambda h: F.lower(h)),
        F.array().cast("array<string>"),
    )


def registered_domain(host: Column) -> Column:
    """Naive registered domain: the last two dot-labels of the host
    (see module docstring for the PSL caveat)."""
    return F.regexp_extract(host, r"([A-Za-z0-9-]+\.[A-Za-z0-9-]+)$", 1)


def doc_domains(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, domain) — one row per DISTINCT registered domain per doc.
    One map + explode; no shuffle (the consumer aggregates/joins)."""
    return (
        df.select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(
                    F.transform(
                        extract_hosts(F.col(text_col)),
                        lambda h: registered_domain(h),
                    )
                )
            ).alias("domain"),
        )
        .where(F.col("domain").isNotNull() & (F.col("domain") != ""))
    )


def domain_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(domain, n_docs) — per-domain doc counts (map-side-combinable)."""
    return (
        doc_domains(df, id_col, text_col)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def domain_blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocked: DataFrame,
    *,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every document citing a blocked registered domain.

    ``blocked`` is a (domain) DataFrame — a curated blocklist table.
    Plan: per-doc distinct domains (map+explode) -> semi-join against the
    blocklist (AQE broadcasts a small list; shuffle join scales to a
    multi-million-entry one) -> anti-join the doc ids back. The corpus
    text never moves: only (id, domain) pairs shuffle."""
    bl = blocked.select(F.col(domain_col).alias("domain")).distinct()
    hit = (
        doc_domains(df, id_col, text_col)
        .join(bl, "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(hit, id_col, "left_anti")
