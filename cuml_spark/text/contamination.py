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
- the CORPUS side explodes to (doc_id, gram) map-side (same codegen'd
  sequence/transform as text/dedup.shingles) and joins the broadcast set
  map-side, so only the MATCHED grams (a vanishing fraction of a clean
  corpus) ever enter the per-doc aggregation shuffle;
- per-doc total gram counts come from ``size(array_distinct(...))`` inside
  the row — exact, zero shuffle.

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
    )
    sh = corpus.select(
        F.col(id_col), F.explode(_gram_array(text_col, k)).alias("__g")
    )
    matched = (
        sh.join(F.broadcast(ev), "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched"))
    )
    totals = corpus.select(
        F.col(id_col), F.size(_gram_array(text_col, k)).alias("n_grams")
    )
    return totals.join(matched, id_col, "left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        (F.coalesce("n_matched", F.lit(0)) / F.col("n_grams"))
        .alias("contamination"),
    )
