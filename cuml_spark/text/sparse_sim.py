"""Sparse TF-IDF cosine similarity join: all-pairs document similarity
over the inverted index — the lexical near-duplicate / related-document
primitive (DISCO/DIMSUM family) that complements embedding near-dup
(similarity/neardup.py) when no embeddings exist, and MinHash
(text/dedup.py) when the caller needs a *graded* similarity, not a
Jaccard threshold.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier.

Spark shape (100 TB):

- The pair space is the POSTINGS SELF-JOIN keyed by term — never doc ×
  doc.  Terms with document frequency above ``max_df`` are dropped
  BEFORE the join (one bounded vocabulary-sized aggregate): the classic
  prefix-filtering simplification, and the skew guard — a stopword term
  in every document would otherwise create an O(N²) bucket.  Pair work
  is ≤ Σ min(df, max_df)² by construction.
- One map-side-combined (doc, term) count shuffle builds postings; the
  df table is vocabulary-sized; per-doc norms are one more bounded
  aggregate.  The final cosine assembles via two doc-keyed equi-joins
  of the norm table (AQE-eligible).

Determinism (the stats_covariance lesson — no fp-association flake):
IDF is INTEGER-SCALED — ``idf_milli = round(1000 * (ln((1+N)/(1+df))
+ 1))`` (sklearn's smooth idf, milli-precision) — so every weight
``tf * idf_milli`` is an exact integer, every dot product and squared
norm is an exact integer SUM (order-free), and the only fp ops are one
sqrt and one division of identical doubles on both engines.  Cosines
round to 6dp for comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array

__all__ = ["tfidf_cosine_pairs", "tfidf_weighted_postings"]


def tfidf_weighted_postings(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
    max_df: int | float = 0.2,
) -> DataFrame:
    """→ (id_col, term, w): integer TF-IDF postings over the kept
    vocabulary (terms with df ≤ ``max_df``), ``w = tf * idf_milli``.
    N counts documents contributing ≥ 1 token.  Weights and norms are
    defined over the KEPT vocabulary only.

    ``max_df`` follows the sklearn convention: a float in (0, 1] is a
    FRACTION of N (cap = ⌊max_df · N⌋), an int ≥ 1 is absolute.  The
    fractional form is the scale-correct default — an absolute cap
    tuned on a small corpus silently empties (or stops pruning) the
    posting list when the corpus grows 100×, which is exactly what a
    cross-scale oracle run caught here (max_df=100 kept ZERO terms at
    10× the fixture size).
    """
    if isinstance(max_df, float) and not 0.0 < max_df <= 1.0:
        raise ValueError(f"fractional max_df must be in (0, 1], got {max_df}")
    if isinstance(max_df, int) and max_df < 1:
        raise ValueError(f"absolute max_df must be >= 1, got {max_df}")
    toks = (
        df.select(F.col(id_col), F.explode(_token_array(text_col, token_sep)).alias("term"))
    )
    # materialize tf ONCE: the n_docs action below and the postings
    # projection both read it — without the checkpoint the corpus would
    # be re-tokenized and re-aggregated for each (review finding)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    n_docs = tf.select(id_col).distinct().count()
    if isinstance(max_df, float):
        max_df = max(1, int(max_df * n_docs))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") <= max_df)
        .withColumn(
            "__idf_milli",
            F.round(
                1000.0
                * (F.log((1.0 + n_docs) / (1.0 + F.col("__df"))) + 1.0)
            ).cast("long"),
        )
        .select("term", "__idf_milli")
    )
    return tf.join(dfreq, "term").select(
        id_col, "term", (F.col("tf") * F.col("__idf_milli")).alias("w")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
    max_df: int | float = 0.2,
) -> DataFrame:
    """→ (doc_a, doc_b, cosine): document pairs with TF-IDF cosine ≥
    ``threshold`` (rounded to 6dp before thresholding, so the cut is
    engine-portable), ``doc_a < doc_b`` canonical.  Pair generation is
    the term-keyed postings self-join over the df-capped vocabulary —
    never all-pairs.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    posts = tfidf_weighted_postings(
        df, text_col=text_col, id_col=id_col, token_sep=token_sep, max_df=max_df
    ).localCheckpoint(eager=False)
    norms = posts.groupBy(id_col).agg(
        F.sum(F.col("w") * F.col("w")).alias("__n2")
    )
    a = posts.select(F.col(id_col).alias("doc_a"), "term", F.col("w").alias("__wa"))
    b = posts.select(F.col(id_col).alias("doc_b"), "term", F.col("w").alias("__wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("__n2").alias("__na2"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("__n2").alias("__nb2"))
    cos = F.round(
        F.col("__dot") / (F.sqrt(F.col("__na2")) * F.sqrt(F.col("__nb2"))), 6
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .where(F.col("cosine") >= float(threshold))
    )
