"""Repetition quality signals for pretraining corpora (Gopher-style).

The repetition filters of Rae et al. 2021 (Gopher, Appendix A1.1), as
re-used by MassiveText/FineWeb-class pipelines: documents dominated by
duplicated lines or by one repeated n-gram are boilerplate/spam and get
filtered before training.  Exact definitions used here (deterministic, so
the DuckDB oracle can replay them):

- ``dup_line_frac``     = (n_lines − n_distinct_lines) / n_lines — the
  fraction of line OCCURRENCES that are repeats of an earlier line.
- ``dup_line_char_frac``= excess characters in repeated lines / total
  line characters (each line weighted by its length).
- ``top_2gram_char_frac`` = min(1, max over word-bigrams g of
  count(g) · chars(g) / total word characters) — the character share of
  the single most dominating bigram (ties resolved by the max of the
  product, which is itself the quantity of interest).  Capped at 1
  because occurrences of a self-overlapping bigram (``"aa aa aa"``)
  can nominally cover more characters than the document holds; the
  filter contract is a fraction in [0, 1].

Words are split on an EXPLICIT whitespace class ``[ \\t\\n\\x0B\\f\\r]``
rather than ``\\s``: Java regex ``\\s`` includes vertical tab while
DuckDB's RE2 ``\\s`` does not, and the oracle must replay the exact
tokenization.

Not in the cuML reference (dense-matrix data model); first-class here like
the dedup tier (text/dedup.py).

Scale shape: lines/bigrams are exploded and aggregated KEYED BY DOC — a
doc's text lives in one row, so map-side partial aggregation collapses
each (doc, token) group within its partition and shuffle volume is
O(sum of per-doc distincts), never O(corpus characters).  Per-row
higher-order-function variants were rejected: counting duplicates in-row
is O(tokens²) per document, which dies on long documents at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id_col, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac).  Empty/whitespace-only texts yield zero lines
    and null fractions (no ratio to take)."""
    # ---- line-level duplicates --------------------------------------
    lines = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
        ).alias("__line"),
    )
    per_line = lines.groupBy(id_col, "__line").agg(
        F.count(F.lit(1)).alias("__c")
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("__c").alias("n_lines"),
        F.count(F.lit(1)).alias("__n_distinct"),
        F.sum(F.col("__c") * F.length("__line")).alias("__chars_all"),
        F.sum(F.length("__line")).alias("__chars_distinct"),
    )
    # ---- dominating word-bigram -------------------------------------
    words = df.select(
        F.col(id_col),
        F.filter(
            # explicit class: Java \s would also eat \x0B, RE2 \s won't
            F.split(F.col(text_col), "[ \\t\\n\\x0B\\f\\r]+"),
            lambda x: x != "",
        ).alias("__w"),
    )
    bigrams = words.select(
        id_col,
        F.aggregate(
            "__w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("__word_chars"),
        F.explode(
            F.zip_with(
                F.slice("__w", 1, F.greatest(F.size("__w") - 1, F.lit(0))),
                F.slice("__w", 2, F.greatest(F.size("__w") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("__g"),
    )
    per_gram = bigrams.groupBy(id_col, "__word_chars", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    gram_stats = per_gram.groupBy(id_col).agg(
        F.first("__word_chars").alias("__word_chars"),
        F.max(
            F.col("__c") * (F.length("__g") - 1)  # chars excl. the joiner
        ).alias("__top_covered"),
    )
    # left-join from the corpus ids so empty/whitespace-only (or null)
    # texts keep their row with n_lines = 0 and null fractions
    base = df.select(id_col)
    return (
        base.join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.try_divide(
                F.col("n_lines") - F.col("__n_distinct"), F.col("n_lines")
            ).alias("dup_line_frac"),
            F.try_divide(
                F.col("__chars_all") - F.col("__chars_distinct"),
                F.col("__chars_all"),
            ).alias("dup_line_char_frac"),
            # clamp the NUMERATOR (not the ratio): least() skips nulls in
            # both engines, so least(1.0, null-ratio) would turn wordless
            # docs into 1.0 instead of the contractual null
            F.try_divide(
                F.least(F.col("__top_covered"), F.col("__word_chars")),
                F.col("__word_chars"),
            ).alias("top_2gram_char_frac"),
        )
    )
