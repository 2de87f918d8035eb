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


def streaming_clean_corpus(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    mtl_lo: float = 4.2,
    mtl_hi: float = 5.2,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the batch corpus cleaner (harness
    ``pipeline_clean_corpus``): exact dedup on md5(text) → quality gate →
    language ID, per arriving document.

    → stream of (id, n_tokens, n_bpe_tokens, pred_lang, score) survivors.
    WHICH physical duplicate survives is engine-dependent, but exact dedup
    keys on the full text, so every survivor's text — hence its token
    counts and language — is identical across choices: any aggregate over
    this stream's non-id columns is deterministic and equals the batch
    pipeline's answer.  One stateful op (the dedup; watermark-bounded when
    ``ts_col`` is given), then pure maps — no second shuffle in-stream.
    """
    from cuml_spark.text.quality import (bpe_ish_token_count, language_id,
                                         token_count)

    fp = stream_df.withColumn("__fp", F.md5(F.col(text_col).cast("binary")))
    if ts_col is not None:
        fp = fp.withWatermark(ts_col, watermark)
        deduped = fp.dropDuplicatesWithinWatermark(["__fp"])
    else:
        deduped = fp.dropDuplicates(["__fp"])
    t = F.col(text_col)
    n_tokens = token_count(t)
    mtl = F.length(F.regexp_replace(t, "\\s", "")) / F.greatest(n_tokens, F.lit(1))
    gated = deduped.where(
        (n_tokens >= min_tokens) & (mtl >= mtl_lo) & (mtl <= mtl_hi)
    ).select(
        F.col(id_col), F.col(text_col),
        n_tokens.cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
    )
    return language_id(gated, text_col=text_col, id_col=id_col,
                       keep_cols=("n_tokens", "n_bpe_tokens"))


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


def streaming_hll_registers(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window: str = "1 day",
    watermark: str = "1 day",
    b: int = 10,
) -> DataFrame:
    """Per-window HyperLogLog registers on a STREAM →
    (window_start, bucket, max_rho): distinct-cardinality state that is
    CONSTANT-SIZE per window (≤ 2^b rows) no matter how many events the
    window sees — the streaming "distinct users per day" shape that an
    exact count-distinct cannot sustain (its state grows with the
    distinct set; Spark refuses streaming count_distinct outright).
    The register max is an associative, monotone aggregate, so
    incremental micro-batch updates converge to the batch answer;
    finalizing the estimate (ops/hll.py fold) runs batch-side over the
    tiny register table."""
    from cuml_spark.ops.hll import hll_bucket_rho

    bucket, rho = hll_bucket_rho(value_col, b=b)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(value_col).isNotNull())
        .select(F.col(ts_col), bucket.alias("bucket"), rho.alias("__rho"))
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("bucket"))
        .agg(F.max("__rho").alias("max_rho"))
        .select(F.col("w.start").alias("window_start"), "bucket", "max_rho")
    )
