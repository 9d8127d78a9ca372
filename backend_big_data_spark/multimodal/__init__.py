from backend_big_data_spark.multimodal.binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_batch,
    fingerprint_binary,
    to_media_table,
)
