"""Corpus n-gram statistics: the boilerplate/contamination discovery
tool every curation pipeline runs before (and after) filtering — "what
are the most repeated phrases in this crawl?" drives the C4 blocklist,
the span-dedup k choice, and eval-set leak triage.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier (text/dedup.py).

Spark shape (100 TB): n-grams are built IN-ROW (``transform`` over a
start-index ``sequence``, each gram a ``concat_ws`` over an array
``slice`` — text never leaves its scan), then ONE map-side-combined
count shuffle on the gram key; the global top-k is
``orderBy(...).limit(k)`` — Spark plans it as TakeOrderedAndProject
(per-partition top-k merged on the driver, never a global sort), the
same contract as ops/topk.  A boilerplate gram repeated across millions
of documents partial-aggregates inside each scan partition, so no
reducer sees its raw occurrence list.  Ranks are assigned AFTER the
top-k cut over the ≤ k surviving rows (a single-partition window over k
rows, not corpus-scale).

Determinism: ties break lexically on the gram text in both engines;
tokens split on an explicit separator (not ``\\s`` — engine regex
classes diverge, see text/repetition.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    *,
    text_col: str = "text",
    token_sep: str = " ",
    join_sep: str = " ",
) -> DataFrame:
    """→ (ngram, count, rank ≤ k): the ``k`` globally most frequent
    word ``n``-grams, ranked by count descending with ties broken by
    the gram text ascending.  Null/empty/short (< n tokens) documents
    contribute nothing.  ``join_sep`` renders each gram (display
    form; grams are counted on their token sequence, so a ``join_sep``
    that can appear inside tokens cannot merge distinct grams only if
    the caller keeps it out of the token alphabet — use the default
    space with space-split tokens).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = _token_array(text_col, token_sep)
    sz = F.size(toks)
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - n + 1),
            lambda i: F.concat_ws(join_sep, F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("ngram").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("ngram").asc())
    return counted.withColumn("rank", F.row_number().over(w))


def frequency_spectrum(
    df: DataFrame,
    *,
    text_col: str = "text",
    token_sep: str = " ",
    top_ranks: int = 10,
) -> DataFrame:
    """→ one row of corpus vocabulary-health statistics: total token
    count, vocabulary size, hapax/dis legomena counts (frequency-1/-2
    types), type-token ratio, and the probability mass held by the
    ``top_ranks`` most frequent types — the Zipf head/tail report every
    corpus audit starts with (a crawl whose hapax share collapses has
    boilerplate flooding; one whose head mass explodes has template
    spam).

    Spark shape (100 TB): ONE map-side-combined count shuffle on the
    token (the vocabulary aggregation), then a vocabulary-sized
    single-row fold; the top-``top_ranks`` mass rides a TakeOrdered
    (never a global sort).  Exact integers everywhere except the two
    final ratios, which both engines compute from identical integers.
    """
    if top_ranks < 1:
        raise ValueError(f"top_ranks must be >= 1, got {top_ranks}")
    counts = (
        df.select(F.explode(_token_array(text_col, token_sep)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    counts = counts.localCheckpoint(eager=False)
    head = (
        counts.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(top_ranks)
        .agg(F.sum("c").alias("__head"))
    )
    spectrum = counts.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.count_if(F.col("c") == 1).alias("hapax"),
        F.count_if(F.col("c") == 2).alias("dis"),
    )
    # empty/all-null corpus: sums over zero rows are NULL — report a
    # ZEROED audit row (n_tokens 0, ratios 0.0), not a row of nulls
    n_tok = F.coalesce(F.col("n_tokens"), F.lit(0))
    head_c = F.coalesce(F.col("__head"), F.lit(0))
    return spectrum.crossJoin(head).select(
        n_tok.cast("long").alias("n_tokens"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("hapax").cast("long").alias("hapax"),
        F.col("dis").cast("long").alias("dis"),
        F.when(n_tok == 0, F.lit(0.0))
        .otherwise(F.round(F.col("vocab_size") / n_tok, 6))
        .alias("type_token_ratio"),
        F.when(n_tok == 0, F.lit(0.0))
        .otherwise(F.round(head_c / n_tok, 6))
        .alias("head_mass"),
    )
