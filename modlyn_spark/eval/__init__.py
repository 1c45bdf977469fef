from modlyn_spark.eval.jaccard import CompareScores, topn_jaccard  # noqa: F401
