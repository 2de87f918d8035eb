from cuml_spark.streaming.kalman_stream import streaming_local_level_filter
from cuml_spark.streaming.pipeline import (streaming_clean_corpus,
                                           streaming_dedup,
                                           streaming_windowed_stats)

__all__ = [
    "streaming_local_level_filter",
    "streaming_clean_corpus",
    "streaming_dedup",
    "streaming_windowed_stats",
]
