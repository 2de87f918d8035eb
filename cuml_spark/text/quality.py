"""Text quality scoring, token counting, language ID — training-data-pipeline
operators over a documents table.  All pure column expressions (whole-stage
codegen, no Python, no shuffle) — a quality-filter pass over 100 TB is a
map-only scan.

Every function is engine-agnostic deterministic (simple regex classes + fixed
stopword tables) so the DuckDB oracle can replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed stopword tables for the n-gram-free language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "zu", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count — regexp_count of non-space runs."""
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit("\\S+"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: runs of letters, runs of digits, single others.

    The standard pre-tokenizer shape (letters|digits|punct) — a cheap, purely
    lexical stand-in for a real BPE vocab (which would be a broadcast dict +
    pandas UDF).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: lengths, token stats, character-class ratios,
    stopword ratio — the classic pre-training quality-filter feature set.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    nonspace = F.length(F.regexp_replace(t, "\\s", ""))
    punct = F.length(F.regexp_replace(t, "[^.,!?;:]", ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    stop_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (nonspace / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (digits / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Stopword-vote language ID → (id, [keep_cols...], pred_lang, score).

    Counts per-language stopword hits among tokens; argmax with deterministic
    lexicographic tiebreak ('und' wins over unknown).  Pure expressions —
    map-only at any scale.  ``keep_cols`` pass through unchanged so callers
    composing a pipeline don't need a re-join to recover their columns.
    (On this testdata the corpora share one vocab, so the interesting
    property is determinism, not accuracy.)
    """
    toks = F.expr(f"filter(split({text_col}, '\\\\s+'), x -> x != '')")

    def _counter(arr):
        # PySpark higher-order 2-arg lambdas mean (element, index) — bind the
        # stopword array via closure, keep the lambda single-arg.
        return lambda x: F.array_contains(arr, F.lower(x))

    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(F.size(F.filter(toks, _counter(arr))).alias(f"score_{lang}"))
    scored = df.select(
        F.col(id_col), F.col(text_col),
        *[F.col(c) for c in keep_cols], *scores,
    )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("unknown")
    # reverse order so earlier langs win lexicographic ties via last-wins chain
    for l in reversed(langs):
        pred = F.when((F.col(f"score_{l}") == best) & (best > 0), F.lit(l)).otherwise(pred)
    return scored.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        pred.alias("pred_lang"), best.cast("long").alias("score"),
    )
