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

Scale shape: everything computes IN-ROW — the doc's line/bigram array is
``array_sort``-ed and duplicate runs are folded with one ``aggregate``
higher-order function, O(t log t) per document, ZERO shuffle: a
repetition pass over 100 TB is a map-only scan, like the quality/PII
tier.  (An earlier version exploded tokens and aggregated keyed-by-doc —
right shuffle volume at scale but a measured 4 s of shuffle machinery at
sf0.1 for work each row can do locally.  A naive in-row count-per-token
WOULD be O(tokens²); the sort-then-run-fold is what makes in-row cheap.)
Only EQUALITY of sorted neighbors matters, so Spark/DuckDB collation
differences in sort order are irrelevant — any total order groups
identical strings adjacently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fold a SORTED string array into (n_distinct, distinct_char_sum,
# best_run_cover): one pass, struct accumulator.  best_run_cover is
# max over runs of run_length · (length(element) − 1) — the bigram
# "covered chars excluding the joiner" objective; line stats ignore it.
_RUN_FOLD = (
    "aggregate({arr}, "
    "named_struct('prev', cast(null as string), 'run', 0L, "
    "             'nd', 0L, 'dchars', 0L, 'best', 0L), "
    "(a, x) -> CASE WHEN a.prev IS NOT NULL AND x = a.prev THEN "
    "  named_struct('prev', x, 'run', a.run + 1L, 'nd', a.nd, "
    "               'dchars', a.dchars, "
    "               'best', greatest(a.best, (a.run + 1L) * (length(x) - 1L))) "
    "ELSE "
    "  named_struct('prev', x, 'run', 1L, 'nd', a.nd + 1L, "
    "               'dchars', a.dchars + length(x), "
    "               'best', greatest(a.best, length(x) - 1L)) END)"
)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id_col, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac).  Empty/whitespace-only texts yield zero lines
    and null fractions (no ratio to take); null texts survive likewise."""
    # Regexes stay Python-side strings handed to the DataFrame API: routing
    # them through an F.expr SQL literal would re-apply SQL escape rules,
    # which silently turn \x0B into the three literal chars 'x0B'.
    lines = F.array_sort(
        F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
    )
    # explicit class: Java \s would also eat \x0B, RE2 \s won't
    words = F.filter(
        F.split(F.col(text_col), "[ \\t\\n\\x0B\\f\\r]+"), lambda x: x != ""
    )
    lf = _RUN_FOLD.format(arr="__sl")
    gf = _RUN_FOLD.format(arr="__sg")
    staged = df.select(
        F.col(id_col),
        lines.alias("__sl"),
        words.alias("__w"),
    ).select(
        F.col(id_col),
        F.col("__sl"),
        F.col("__w"),
        F.array_sort(
            F.zip_with(
                F.slice("__w", 1, F.greatest(F.size("__w") - 1, F.lit(0))),
                F.slice("__w", 2, F.greatest(F.size("__w") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("__sg"),
    ).select(
        F.col(id_col),
        F.coalesce(F.size("__sl"), F.lit(0)).cast("long").alias("n_lines"),
        F.expr(lf).alias("__lr"),
        F.expr(
            "aggregate(__sl, 0L, (a, x) -> a + length(x))"
        ).alias("__chars_all"),
        F.expr(
            "aggregate(__w, 0L, (a, x) -> a + length(x))"
        ).alias("__word_chars"),
        # empty bigram array must yield NULL cover (single-word docs have
        # no bigram share to take), not the fold's 0 initializer
        F.expr(
            f"CASE WHEN size(__sg) > 0 THEN {gf}.best END"
        ).alias("__top_covered"),
    )
    return staged.select(
        F.col(id_col),
        F.col("n_lines"),
        F.try_divide(
            F.col("n_lines") - F.col("__lr.nd"), F.col("n_lines")
        ).alias("dup_line_frac"),
        F.try_divide(
            F.col("__chars_all") - F.col("__lr.dchars"),
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
