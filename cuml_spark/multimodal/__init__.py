from cuml_spark.multimodal.audio import (
    build_adts,
    build_flac,
    build_mp3,
    build_ogg,
    probe_audio,
    probe_stream,
)
from cuml_spark.multimodal.h264 import (
    build_h264,
    parse_h264,
    probe_h264,
)
from cuml_spark.multimodal.image_probe import (
    probe_image,
    probe_image_bytes,
)
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
    "build_adts",
    "build_flac",
    "build_h264",
    "build_mp3",
    "build_ogg",
    "parse_h264",
    "probe_h264",
    "probe_image",
    "probe_image_bytes",
    "probe_audio",
    "probe_stream",
    "decode_audio",
    "decode_image",
    "extract_audio_features",
    "extract_features",
    "frame_sample",
    "resize_image",
    "with_media_metadata",
]
