from firmwarescraper_spark.multimodal.binary import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_image_batches,
    extract_image_features,
    frame_sample_video,
    resize_images,
    sniff_media_type,
)
