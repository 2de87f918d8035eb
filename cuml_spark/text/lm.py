"""Count-based bigram LM perplexity scoring — the CCNet-style quality
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document by the per-token
log-probability a language model assigns it, then filter/ bucket on the
score.  CCNet uses a pretrained KenLM; this operator trains the count LM
on the corpus itself (or any reference corpus passed in), which is the
same scoring shape without shipping a model artifact.

Spark-first shape (100 TB):

* tokenization and bigram construction are IN-ROW (``split`` +
  ``zip_with`` over two array slices) — zero shuffle, the corpus text
  never leaves its scan;
* model fitting is two keyed aggregations: bigram counts (one shuffle on
  the bigram key, map-side combined) and context counts derived by
  re-aggregating the already-collapsed bigram table (tiny);
* scoring joins each document's exploded bigrams against the count
  tables — the joins carry (bigram, count) pairs, which AQE broadcasts
  when the vocabulary is small;
* smoothing is add-k over the corpus vocabulary, so every probability is
  a ratio of integers — deterministic and engine-portable (the DuckDB
  oracle reproduces scores to the rounding precision).

Tokens are split on an EXPLICIT single-space separator, not ``\\s`` —
regex whitespace classes diverge between engines (see the oracle-pitfall
notes); callers with tab/newline-separated text normalize first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_array(text_col: str, token_sep: str):
    return F.filter(
        F.split(F.col(text_col), token_sep), lambda x: x != F.lit("")
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    add_k: float = 1.0,
    token_sep: str = " ",
    lm_corpus: DataFrame | None = None,
) -> DataFrame:
    """Per-document average bigram log-probability under an add-k count LM.

    The LM is fit on ``lm_corpus`` (defaults to ``df`` itself — self-scoring,
    the repetition/boilerplate signal) with conditionals
    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)`` where ``c(w1·)`` counts
    w1 in context position and ``V`` is the corpus vocabulary size.

    Returns one row per input row: ``id_col``, ``n_bigrams`` (0 for docs
    with <2 tokens, including null text) and ``avg_logp`` (null when
    ``n_bigrams = 0``).  Lower (more negative) scores = text the LM finds
    surprising; CCNet keeps the middle band.
    """
    src = lm_corpus if lm_corpus is not None else df

    def bigram_rows(frame: DataFrame) -> DataFrame:
        toks = _token_array(text_col, token_sep).alias("__t")
        base = frame.select(F.col(id_col), toks)
        n = F.size("__t")
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice("__t", 1, n - 1),
                F.slice("__t", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(id_col, F.explode(bigrams).alias("__bg"))

    model_pairs = bigram_rows(src)
    bgc = model_pairs.groupBy("__bg").agg(F.count("*").alias("__cbg"))
    # context counts c(w1·) re-aggregate the collapsed bigram table — no
    # second pass over the corpus
    ctx = (
        bgc.groupBy(F.split("__bg", " ")[0].alias("__w1"))
        .agg(F.sum("__cbg").alias("__cw1"))
    )
    vocab_n = (
        src.select(F.explode(_token_array(text_col, token_sep)).alias("__w"))
        .agg(F.countDistinct("__w").alias("__v"))
    )
    k = float(add_k)
    scored = (
        bigram_rows(df)
        .join(bgc, "__bg", "left")
        .join(ctx, F.split(F.col("__bg"), " ")[0] == F.col("__w1"), "left")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("__cbg"), F.lit(0)) + k)
                / (F.coalesce(F.col("__cw1"), F.lit(0)) + k * F.col("__v"))
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("__lp").alias("avg_logp"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_logp"),
        )
    )
