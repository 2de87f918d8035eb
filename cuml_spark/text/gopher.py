"""Gopher quality rules (Rae et al. 2021, Appendix A1.1) — the boolean
document gates MassiveText applies before training, reused by
FineWeb-class pipelines.  text/quality.py supplies continuous features;
this module is the RULE bundle: each document gets one flag per rule
plus the composite ``keep`` (AND of all rules), so a pipeline can both
filter and audit WHY documents fell.

All pure column expressions — whole-stage codegen, zero shuffle, one
scan at any corpus size (the same plan class as the C4 line filter).
Deterministic and engine-portable: explicit character classes and
string ops only (no ``\\s`` — engine regex classes diverge, see
text/repetition.py), so the DuckDB oracle replays every rule exactly.

Rule set (thresholds are the paper's, overridable):

1. ``ok_word_count``    — word count in [min_words, max_words]
                          (paper: 50..100,000)
2. ``ok_mean_word_len`` — mean word length in [min_mean_word_len,
                          max_mean_word_len] (paper: 3..10)
3. ``ok_symbol_ratio``  — (# of '#' chars + '...'/'…' sequences) /
                          words <= max_symbol_ratio (paper: 0.1)
4. ``ok_bullet_lines``  — fraction of lines starting with a bullet
                          ('-', '*', '•' after leading spaces)
                          <= max_bullet_line_frac (paper: 0.9)
5. ``ok_ellipsis_lines``— fraction of lines ending with '...' or '…'
                          <= max_ellipsis_line_frac (paper: 0.3)
6. ``ok_alpha_words``   — fraction of words containing >= 1 [A-Za-z]
                          character >= min_alpha_word_frac (paper: 0.8)
7. ``ok_stopwords``     — document contains >= min_stopword_hits
                          DISTINCT words from the paper's list
                          (the, be, to, of, and, that, have, with;
                          paper: 2)

Null/empty documents fail rules 1, 2, 6, 7 (no words: the word-count,
mean-word-length — 0 < min — alpha-word and stopword gates all refuse)
and pass the symbol/bullet/ellipsis ratio rules vacuously — ``keep`` is
false either way, with the flags showing why, matching the
audit-not-just-filter contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring — pure string arithmetic, no
    regex, so both engines count identically."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_quality_flags(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """→ (id_col, n_words, ok_word_count, ok_mean_word_len,
    ok_symbol_ratio, ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words,
    ok_stopwords, keep) — one row per input row, flags as 0/1 ints."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _token_array(text_col, token_sep)
    n_words = F.coalesce(F.size(toks), F.lit(0))
    word_chars = F.coalesce(
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    )
    mean_wl = word_chars / F.greatest(n_words, F.lit(1))
    n_symbols = (
        _count_occurrences(t, "#")
        + _count_occurrences(t, "...")
        + _count_occurrences(t, "…")
    )
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: F.ltrim(x).startswith("-")
            | F.ltrim(x).startswith("*")
            | F.ltrim(x).startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda x: F.rtrim(x).endswith("...")
            | F.rtrim(x).endswith("…"),
        )
    )
    alpha_words = F.coalesce(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))), F.lit(0))
    # count which STOPWORDS are present (iterate the fixed list, not the
    # doc) — intersection-dedup semantics differ between engines, a
    # membership test per stopword does not
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    low_toks = F.transform(toks, F.lower)
    stop_hits = F.coalesce(
        F.size(F.filter(stop_arr, lambda s: F.array_contains(low_toks, s))),
        F.lit(0),
    )

    ok_word_count = (n_words >= min_words) & (n_words <= max_words)
    ok_mean_word_len = (
        (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    )
    ok_symbol_ratio = (
        n_symbols / F.greatest(n_words, F.lit(1))
    ) <= max_symbol_ratio
    ok_bullet = (bullet_lines / n_lines) <= max_bullet_line_frac
    ok_ellipsis = (ellipsis_lines / n_lines) <= max_ellipsis_line_frac
    ok_alpha = (
        alpha_words / F.greatest(n_words, F.lit(1))
    ) >= min_alpha_word_frac
    ok_stop = stop_hits >= min_stopword_hits

    flags = {
        "ok_word_count": ok_word_count,
        "ok_mean_word_len": ok_mean_word_len,
        "ok_symbol_ratio": ok_symbol_ratio,
        "ok_bullet_lines": ok_bullet,
        "ok_ellipsis_lines": ok_ellipsis,
        "ok_alpha_words": ok_alpha,
        "ok_stopwords": ok_stop,
    }
    keep = None
    cols = [F.col(id_col), n_words.cast("long").alias("n_words")]
    for name, expr in flags.items():
        cols.append(expr.cast("int").alias(name))
        keep = expr if keep is None else (keep & expr)
    cols.append(keep.cast("int").alias("keep"))
    return df.select(*cols)
