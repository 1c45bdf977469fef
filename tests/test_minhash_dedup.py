"""minhash_dedup_groups: planted duplicate groups collapse to their min-id
representative; dissimilar docs survive."""

from __future__ import annotations

from modlyn_spark.operators.dedup import minhash_dedup_groups


def test_groups_collapse_to_min_representative(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = docs.limit(4).toPandas()
    planted = []
    for r in src.itertuples():
        # two near-copies per source doc -> group of 3
        planted.append((int(r.doc_id) + 1_000_000, r.text + " x"))
        planted.append((int(r.doc_id) + 2_000_000, r.text + " yy"))
    base = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(planted, ["doc_id", "text"])
    )
    groups = minhash_dedup_groups(
        base, "doc_id", "text", k=32, bands=8, threshold=0.8
    ).toPandas()
    got = dict(zip(groups["doc_id"], groups["keep_id"]))
    for r in src.itertuples():
        # both planted copies must point at a smaller-id representative
        assert got.get(int(r.doc_id) + 1_000_000) is not None
        assert got.get(int(r.doc_id) + 2_000_000) is not None
        assert got[int(r.doc_id) + 1_000_000] < int(r.doc_id) + 1_000_000
    assert (groups["keep_id"] < groups["doc_id"]).all()
    assert groups["est_jaccard"].between(0.8, 1.0).all()
    assert not groups["doc_id"].duplicated().any()  # one keeper per doc
