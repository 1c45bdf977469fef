from modlyn_spark.functions.image import (  # noqa: F401
    decode_image_stats,
    png_decode,
    png_encode,
    psnr,
    verify_images,
)
from modlyn_spark.functions.phash import average_hash, hamming64  # noqa: F401
