"""Harness queries: multimodal plumbing over binary media columns.

The decode kernel is the deterministic fake (byte-tiling — codecs are not
in this container), so the Spark-side plumbing is D-checkable: pixel 0 is
the first payload byte (ascii of the first char for ASCII text) and frame
counts are pure functions of octet_length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.multimodal import decode_image, frame_sample, with_media_metadata


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return with_media_metadata(payload, width=8, height=8)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_image(_media(spark, sf_dir))
    return decoded.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.element_at("pixels", 1).alias("p0"),
    )


_SQL_MEDIA_DECODE = """
SELECT doc_id, 8 AS w, 8 AS h, ascii(substring(text, 1, 1)) AS p0
FROM documents
"""


def q_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_media(spark, sf_dir), every_n=2, frame_bytes=64)
    return frames.groupBy(F.col("media_id").alias("doc_id")).agg(
        F.count("*").alias("n_frames_sampled")
    )


_SQL_FRAME_COUNTS = """
SELECT doc_id,
       (greatest(octet_length(encode(text)) // 64, 1) + 1) // 2 AS n_frames_sampled
FROM documents
"""


QUERIES_MEDIA = {
    "media_decode": q_media_decode,
    "frame_counts": q_frame_counts,
}

ORACLES_MEDIA = {
    "media_decode": _SQL_MEDIA_DECODE,
    "frame_counts": _SQL_FRAME_COUNTS,
}
