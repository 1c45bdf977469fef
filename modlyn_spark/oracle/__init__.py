from modlyn_spark.oracle.pandas_oracle import (  # noqa: F401
    oracle_asof,
    oracle_backfill,
    oracle_class_feature_stats,
    oracle_f_statistic,
    oracle_jaccard,
    oracle_lag_lead,
    oracle_logreg,
    oracle_rolling_stats,
    oracle_sessionize,
)
