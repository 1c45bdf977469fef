from modlyn_spark.sources.images import (  # noqa: F401
    generate_images_df,
    reference_caption,
    reference_pixels,
    synth_feature_requests,
)
