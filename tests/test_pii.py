from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modlyn_spark.functions.pii import (
    PII_KINDS,
    duckdb_count_sql,
    duckdb_scrub_sql,
    pii_counts,
    scrub_documents,
    scrub_pii,
)

CASES = [
    # (raw, scrubbed)
    ("mail me at jo.doe+x@sub.example.co.uk today", "mail me at <EMAIL> today"),
    ("server 10.0.0.1 and 192.168.255.3 up", "server <IP> and <IP> up"),
    ("card 4111-1111-1111-1234 on file", "card <CARD> on file"),
    ("ssn 078-05-1120 ref", "ssn <SSN> ref"),
    ("call (415) 867-5309 or +1 555-123-4567", "call <PHONE> or <PHONE>"),
    # card must NOT be nibbled by ssn/phone; ip needs dots; no cross-talk
    ("4111 1111 1111 1234 then 1.2.3.4", "<CARD> then <IP>"),
    ("no pii here at all", "no pii here at all"),
    # version-ish dotted numbers: 1.2.3.4 shape IS an ipv4 hit (documented)
    ("v1.2.3 stays, 1.2.3.4 goes", "v1.2.3 stays, <IP> goes"),
]


def test_scrub_cases(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "text": [c[0] for c in CASES]})
    )
    got = (
        df.select("i", scrub_pii(F.col("text")).alias("s"))
        .orderBy("i")
        .toPandas()["s"]
        .tolist()
    )
    assert got == [c[1] for c in CASES]


def test_counts_match_duckdb(spark):
    texts = [c[0] for c in CASES] + ["a@b.co b@c.io 1.2.3.4 078-05-1120"]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    cnts = pii_counts(F.col("text"))
    got = (
        df.select("i", *[cnts[k].alias(k) for k in PII_KINDS])
        .orderBy("i")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    sel = ", ".join(
        f"CAST({duckdb_count_sql('text', k)} AS BIGINT) AS {k}" for k in PII_KINDS
    )
    exp = con.sql(f"SELECT i, {sel} FROM t ORDER BY i").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_scrub_matches_duckdb(spark):
    pdf = pd.DataFrame({"i": range(len(CASES)), "text": [c[0] for c in CASES]})
    df = spark.createDataFrame(pdf)
    got = (
        df.select("i", scrub_pii(F.col("text")).alias("s"))
        .orderBy("i")
        .toPandas()["s"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(
        f"SELECT {duckdb_scrub_sql('text')} AS s FROM t ORDER BY i"
    ).df()["s"].tolist()
    assert got == exp


def test_null_text_no_fabrication(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1], "text": [None, "a@b.co"]})
    )
    out = scrub_documents(df, keep_text=True).orderBy("i").toPandas()
    assert out.loc[0, "text_scrubbed"] is None or pd.isna(out.loc[0, "text_scrubbed"])
    assert out.loc[0, "pii_count"] == 0
    assert out.loc[1, "email_count"] == 1 and out.loc[1, "pii_count"] == 1


def test_scrub_documents_is_single_map_stage(spark):
    df = spark.createDataFrame(pd.DataFrame({"i": [1], "text": ["a@b.co"]}))
    plan = (
        scrub_documents(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


@pytest.mark.parametrize("kind", PII_KINDS)
def test_every_kind_has_a_case(kind):
    hits = {
        "email": CASES[0][0],
        "ipv4": CASES[1][0],
        "card": CASES[2][0],
        "ssn": CASES[3][0],
        "phone": CASES[4][0],
    }
    assert kind in hits
