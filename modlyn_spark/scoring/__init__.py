from modlyn_spark.scoring.stats import (  # noqa: F401
    class_feature_stats,
    f_statistic,
    label_encode,
)
from modlyn_spark.scoring.logreg import DistributedLogReg, assign_batches  # noqa: F401
