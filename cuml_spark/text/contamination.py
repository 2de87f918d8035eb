"""Benchmark-contamination detection for pretraining corpora.

The training-data-pipeline op that checks a corpus for eval-set leakage:
a document is contaminated when it shares character k-grams with any
document of a (small) evaluation set — the published methodology for
pretraining-data hygiene (n-gram overlap against benchmark text, as in the
GPT-3 appendix and The Pile's decontamination tooling).

Not in the cuML reference (dense-matrix data model); first-class here like
the dedup tier (text/dedup.py).

Scale shape (the part that must survive 100 TB):
- the EVAL side is benchmark-sized by construction (MBs, not TBs): its
  distinct gram set is computed once and **broadcast** — no shuffle;
- the CORPUS side is scanned ONCE: one projection builds the gram array
  in-row (same codegen'd sequence/transform as text/dedup.shingles) and
  feeds BOTH ``size(grams)`` (the per-doc total) and the explode that
  left-joins the broadcast eval set map-side — matches are counted as a
  sum over the join's hit indicator;
- the only shuffle is the per-doc aggregation, and map-side partial
  aggregation collapses each doc's grams to ONE row before it (a doc's
  text lives in one scan row, so its exploded grams stay in one
  partition) — shuffle volume is O(n_docs), independent of text size.

The join key is the gram STRING, not a hash: a 32-bit hash would produce
~|corpus_grams|·|eval_grams|/2³² false matches (tens at even sf0.1 scale),
which both poisons the contamination ratio and breaks oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_array(text_col: str, k: int):
    """Distinct character k-gram array, built inside the row (no shuffle).
    Same construction as text/dedup.shingles — docs shorter than ``k``
    contribute their whole text as the single gram."""
    return F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(1, length({text_col}) - {k - 1})), "
        f"i -> substring({text_col}, i, {k}))"
    ))


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: distinct k-gram overlap with the eval set.

    → (id_col, n_grams, n_matched, contamination) where ``contamination`` =
    n_matched / n_grams ∈ [0, 1].  Filter ``contamination > 0`` (any shared
    gram) or a ratio threshold downstream; the raw counts are returned so
    the policy stays with the caller.
    """
    ev = (
        eval_df.select(F.explode(_gram_array(text_col, k)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus scan: the gram array is built once per row and feeds both
    # the total (size) and the exploded join input; a broadcast LEFT join
    # marks eval grams, so unmatched docs keep their row (n_matched = 0)
    # without a second scan-and-join against a totals frame
    sh = (
        corpus.select(
            F.col(id_col), _gram_array(text_col, k).alias("__grams")
        )
        .select(
            F.col(id_col),
            F.size("__grams").alias("n_grams"),
            F.explode("__grams").alias("__g"),
        )
    )
    per_doc = (
        sh.join(F.broadcast(ev), "__g", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_matched"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_matched"),
        (F.col("n_matched") / F.col("n_grams")).alias("contamination"),
    )
