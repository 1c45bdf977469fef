from modlyn_spark.operators.asof import asof_join  # noqa: F401
from modlyn_spark.operators.windows import (  # noqa: F401
    backfill,
    rolling_stats,
    session_stats,
    sessionize,
    with_lag_lead,
)
