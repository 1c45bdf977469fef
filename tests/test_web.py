from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from modlyn_spark.functions.web import (
    domain_blocklist_filter,
    domain_counts,
    doc_domains,
    extract_hosts,
    extract_urls,
)

TEXTS = [
    "see https://news.example.com/a/b and http://cdn.example.com:8080/x",
    "plain text no urls at all",
    "dup domains https://a.spam.net/1 https://b.spam.net/2 end",
    "trailing dot-ish https://Sub.Mixed-Case.ORG/path?q=1 ok",
    None,
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )


def test_extract_urls_and_hosts(spark):
    out = (
        _df(spark)
        .select(
            "doc_id",
            extract_urls(F.col("text")).alias("u"),
            extract_hosts(F.col("text")).alias("h"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(out.loc[0, "u"]) == [
        "https://news.example.com/a/b",
        "http://cdn.example.com:8080/x",
    ]
    assert list(out.loc[0, "h"]) == ["news.example.com", "cdn.example.com"]
    assert list(out.loc[1, "u"]) == []
    assert list(out.loc[3, "h"]) == ["sub.mixed-case.org"]
    assert list(out.loc[4, "u"]) == []  # NULL text -> empty, no fabrication


def test_doc_domains_distinct_registered(spark):
    out = doc_domains(_df(spark), "doc_id", "text").toPandas()
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [
        (0, "example.com"),
        (2, "spam.net"),
        (3, "mixed-case.org"),
    ]


def test_domain_counts(spark):
    out = domain_counts(_df(spark), "doc_id", "text").toPandas()
    assert dict(zip(out["domain"], out["n_docs"])) == {
        "example.com": 1, "spam.net": 1, "mixed-case.org": 1,
    }


def test_blocklist_filter(spark):
    df = _df(spark)
    bl = spark.createDataFrame(pd.DataFrame({"domain": ["spam.net"]}))
    kept = domain_blocklist_filter(df, "doc_id", "text", bl).toPandas()
    assert sorted(kept["doc_id"]) == [0, 1, 3, 4]


def test_matches_duckdb(spark):
    pdf = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    got = (
        doc_domains(spark.createDataFrame(pdf), "doc_id", "text")
        .orderBy("doc_id", "domain")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(
        r"""
        SELECT doc_id, domain FROM (
          SELECT DISTINCT doc_id,
                 regexp_extract(lower(h), '([a-z0-9-]+\.[a-z0-9-]+)$', 1)
                     AS domain
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(text,
                           'https?://([A-Za-z0-9.-]+)', 1)) AS h
                FROM t))
        WHERE domain IS NOT NULL AND domain != ''
        ORDER BY doc_id, domain
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
