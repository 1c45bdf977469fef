from modlyn_spark.plans.pipeline import (  # noqa: F401
    events_feature_pipeline,
    image_feature_pipeline,
)
