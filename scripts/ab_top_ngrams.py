"""Interleaved same-session A/B for top_ngrams_corpus volatility
(VERDICT r11 ask #2): same code measured 0.89-15.2s across six r11-era
sessions — the round's only >2x driver-to-driver move — with a clean
TakeOrdered plan and a sub-second quiet control.  This script runs the
three candidate shapes INTERLEAVED in one session (the only perf
evidence this host supports; BASELINE.md measurement bands):

  A  current      ensure_parallelism -> in-row grams -> map-side-combined
                  groupBy -> orderBy().limit(k)  (TakeOrderedAndProject)
  B  raw-scan     identical but WITHOUT ensure_parallelism (the sf0.1
                  documents table is one parquet split -> one task builds
                  all grams)
  C  two-stage    explicit per-partition partial count
                  (spark_partition_id, ngram) -> final sum -> TakeOrdered
                  (adds an exchange; tests whether the single shuffle's
                  skew/steal sensitivity is the spike source)

If all variants co-spike in a noisy session, the volatility is host
state, not plan choice — record the adjudication rule in BASELINE.md
and stop re-litigating per round.

Usage: python scripts/ab_top_ngrams.py [reps=3] 2>/dev/null
Prints one JSON line: {"variant": [per-rep seconds...], ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cuml_spark.core.session import ensure_parallelism, get_spark  # noqa: E402
from cuml_spark.text.lm import _token_array  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N, K = 3, 25


def _grams(df):
    toks = _token_array("text", " ")
    sz = F.size(toks)
    grams = F.when(
        sz >= N,
        F.transform(
            F.sequence(F.lit(1), sz - N + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.explode(grams).alias("ngram"))


def variant_a(spark):
    from cuml_spark.text.ngrams import top_ngrams

    docs = ensure_parallelism(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    return top_ngrams(docs, n=N, k=K)


def variant_b(spark):
    from cuml_spark.text.ngrams import top_ngrams

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return top_ngrams(docs, n=N, k=K)


def variant_c(spark):
    docs = ensure_parallelism(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    partial = (
        _grams(docs)
        .groupBy(F.spark_partition_id().alias("pid"), "ngram")
        .agg(F.count("*").alias("c"))
    )
    return (
        partial.groupBy("ngram").agg(F.sum("c").alias("count"))
        .orderBy(F.col("count").desc(), F.col("ngram").asc())
        .limit(K)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"a_current": variant_a, "b_raw_scan": variant_b,
                "c_two_stage": variant_c}
    # one warm rep each (plan compile/codegen), then interleaved timing:
    # a-b-c a-b-c ... so host-state drift hits every variant equally
    for fn in variants.values():
        fn(spark).collect()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.monotonic()
            rows = fn(spark).collect()
            times[name].append(round(time.monotonic() - t0, 3))
            assert len(rows) == K
    print(json.dumps({"reps": reps, "sf_dir": SF_DIR, **times}))


if __name__ == "__main__":
    main()
