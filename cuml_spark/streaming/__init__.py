from cuml_spark.streaming.kalman_stream import streaming_local_level_filter

__all__ = ["streaming_local_level_filter"]
