"""Streaming training-data pipeline operators.

The batch dedup/quality layer (cuml_spark.text) has streaming twins here:
a 100 TB/day ingest pipeline dedups and profiles documents AS THEY ARRIVE,
not in nightly batches.  Both operators are plain Structured Streaming
compositions — no custom state handler needed (contrast kalman_stream.py,
which genuinely needs ``applyInPandasWithState``):

* ``streaming_dedup``  — exact near-exact dedup on the normalized content
  fingerprint (text/dedup.py:60 semantics, identical md5 rule).  With an
  event-time column the state store is bounded by
  ``dropDuplicatesWithinWatermark`` (idempotent re-delivery inside the
  watermark horizon is absorbed, state older than the horizon is evicted);
  without one it falls back to unbounded-state ``dropDuplicates`` — fine
  for availableNow backfills, documented as non-evicting.
* ``streaming_windowed_stats`` — watermarked tumbling-window aggregation
  (count / mean / min / max) per key column: the streaming profile of an
  event firehose.  One shuffle per micro-batch on (window, key); state is
  one row per open window×key.

Both run identically under ``trigger(availableNow=True)`` for backfill
(that is how the harness checks them against a batch SQL oracle: the
streaming result over a static directory must equal the batch answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream → stream with exactly one surviving row per content
    fingerprint (whitespace/case-normalized md5, matching the batch
    ``normalized_fingerprint``).

    Which physical row survives is whichever the engine sees first — the
    fingerprint SET is deterministic, the survivor ids are not (same
    contract as any streaming dedup).  Downstream aggregates over the
    fingerprint column are therefore replayable; per-row ids are not.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    out = stream_df.withColumn("fingerprint", F.md5(norm.cast("binary")))
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])


def streaming_windowed_stats(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window stats per key →
    (window_start, key, n, avg_value, min_value, max_value).

    Append-mode safe: windows finalize when the watermark passes their end,
    so each (window, key) row is emitted exactly once with its final value.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count("*").alias("n"),
            F.avg(value_col).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "key", "n", "avg_value", "min_value", "max_value",
        )
    )
