"""C4-style corpus cleaning (Raffel et al. 2020, §2.2) — line-quality
filtering and cross-document span deduplication for pretraining corpora.

The published C4 pipeline keeps a line only if it ends in terminal
punctuation and has enough words, drops boilerplate/code lines by phrase
blocklist, discards pages left with too few lines, and removes any
three-sentence span that occurs more than once in the corpus.  Exact
deterministic renditions here (the DuckDB oracle replays them):

- ``c4_line_filter``: a line is kept iff (checked in this order, the
  first failing rule takes the drop attribution)
    1. it ends in ``.``, ``!``, ``?`` or ``"`` (trailing spaces/tabs ok),
    2. it has ≥ ``min_words`` words (explicit whitespace class, see
       text/repetition.py for why not ``\\s``),
    3. its lowercase form contains none of the blocklist phrases and no
       ``{`` (code);
  a page survives iff ≥ ``min_lines`` lines are kept.  Pure column
  expressions over the in-row line array — a 100 TB cleaning pass is a
  map-only scan, zero shuffle, whole-stage codegen.
- ``span_dedup_stats``: C4's "three-sentence span" dedup at LINE
  granularity (deterministic splitting — sentence boundaries are
  ambiguous, line boundaries are not): every consecutive ``n``-line span
  is hashed, and an occurrence is a duplicate iff an identical span
  exists at a smaller ``(doc_id, position)``.  The only shuffle carries
  ``(md5, doc_id, pos)`` — 16-byte keys, never span text — the same
  shape as exact dedup (text/dedup.py); a 128-bit hash makes collisions
  ignorable at corpus scale.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier.
"""

from __future__ import annotations

import operator
import re
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# lowercase phrase blocklist (C4 uses ~400 phrases; the shipped tuple is a
# mechanism demo — pass ``blocklist=`` with a deployment's full list)
C4_BLOCKLIST = ("lorem ipsum", "javascript", "cookie")

# Regex strings built with REAL control characters and handed to the JVM
# via the DataFrame API (Column.rlike / F.split), which passes them through
# py4j verbatim.  Never embed these in a SQL string literal: Spark's SQL
# unescaping has no \x escape and turns '\x0B' into the three literal
# characters 'x0B', silently adding x/0/B to the whitespace class (the
# exact pitfall text/repetition.py documents — and the r7 version of this
# file hit).  \s is avoided because Java \s includes \x0B while DuckDB's
# RE2 \s does not.
_WS_RE = "[ \t\n\x0B\f\r]+"
_TERM_RE = '[.!?"][ \t]*$'

# Above this many phrases the per-phrase contains() OR-chain is folded into
# a single regex alternation so codegen'd expression size stays bounded for
# real C4-scale (~400-phrase) blocklists.  Both forms are substring
# semantics over the lowercased line.
_BLOCKLIST_REGEX_THRESHOLD = 16


def _blocked(x: Column, blocklist: Sequence[str]) -> Column:
    """True iff the lowercase line contains any blocklist phrase."""
    if not blocklist:
        return F.lit(False)
    if len(blocklist) <= _BLOCKLIST_REGEX_THRESHOLD:
        return reduce(
            operator.or_, (F.lower(x).contains(p) for p in blocklist)
        )
    alt = "|".join(re.escape(p) for p in blocklist)
    return F.lower(x).rlike(f"(?:{alt})")


def _word_count(x: Column) -> Column:
    return F.size(F.filter(F.split(x, _WS_RE), lambda w: w != F.lit("")))


def _kept(x: Column, min_words: int, blocklist: Sequence[str]) -> Column:
    """Rules 1–3 over a line ``x`` (first-failing-rule order documented
    in the module docstring)."""
    return (
        x.rlike(_TERM_RE)
        & (_word_count(x) >= min_words)
        & ~(_blocked(x, blocklist) | x.contains("{"))
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    blocklist: Sequence[str] = C4_BLOCKLIST,
) -> DataFrame:
    """→ (id_col, n_lines, n_kept, n_drop_punct, n_drop_short,
    n_drop_blocklist, page_kept, cleaned_text).

    Null texts survive with zero counts, ``page_kept = false`` and a null
    ``cleaned_text``.  Drop attribution is first-failing-rule in the
    documented order, so the three counts sum to ``n_lines - n_kept``.
    ``blocklist`` is caller-extensible; large lists compile to one regex
    alternation so the plan stays a single map-only projection.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: x != F.lit("")
    )
    kept = F.filter(lines, lambda x: _kept(x, min_words, blocklist))
    punct_fail = F.filter(lines, lambda x: ~x.rlike(_TERM_RE))
    # short: passes punct, fails words
    short_fail = F.filter(
        lines,
        lambda x: x.rlike(_TERM_RE) & (_word_count(x) < min_words),
    )
    n_lines = F.coalesce(F.size(lines), F.lit(0))
    n_kept = F.coalesce(F.size(kept), F.lit(0))
    n_punct = F.coalesce(F.size(punct_fail), F.lit(0))
    n_short = F.coalesce(F.size(short_fail), F.lit(0))
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        n_punct.cast("long").alias("n_drop_punct"),
        n_short.cast("long").alias("n_drop_short"),
        (n_lines - n_kept - n_punct - n_short).cast("long").alias(
            "n_drop_blocklist"
        ),
        (n_kept >= min_lines).alias("page_kept"),
        F.when(
            F.col(text_col).isNotNull(),
            F.array_join(kept, "\n"),
        ).alias("cleaned_text"),
    )


def span_dedup_stats(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, n_spans, n_dup_spans): per document, how many of its
    consecutive ``n``-line spans are duplicates of a span occurring
    earlier in the corpus (smaller ``(doc_id, position)`` — the
    deterministic keep-first policy).  Docs with fewer than ``n``
    non-empty lines have zero spans.
    """
    lines = f"filter(split({text_col}, '\\n'), x -> x != '')"
    # CASE-gated: sequence(1, 0) is a DESCENDING two-element sequence in
    # Spark, so a bare greatest(size-2, 0) bound would fabricate phantom
    # spans for docs with < n lines (null text included)
    spans_expr = (
        f"CASE WHEN size({lines}) >= {n} THEN "
        f"transform(sequence(1, size({lines}) - {n - 1}), "
        f"i -> concat_ws('\\n', slice({lines}, i, {n}))) "
        f"ELSE array() END"
    )
    occ = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.expr(spans_expr)).alias("__pos", "__span"),
    ).select(
        "__doc", "__pos", F.md5(F.col("__span").cast("binary")).alias("__h")
    )
    w = Window.partitionBy("__h").orderBy("__doc", "__pos")
    marked = occ.withColumn(
        "__dup", (F.row_number().over(w) > 1).cast("int")
    )
    stats = marked.groupBy("__doc").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("__dup").alias("n_dup_spans"),
    )
    base = df.select(F.col(id_col))
    return base.join(
        stats, base[id_col] == stats["__doc"], "left"
    ).select(
        F.col(id_col),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
    )
