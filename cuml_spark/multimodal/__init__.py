from cuml_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_audio,
    decode_image,
    extract_audio_features,
    extract_features,
    frame_sample,
    resize_image,
    with_media_metadata,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_audio",
    "decode_image",
    "extract_audio_features",
    "extract_features",
    "frame_sample",
    "resize_image",
    "with_media_metadata",
]
