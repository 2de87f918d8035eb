"""ExactSubstr-style cross-document substring deduplication (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"): find
every ``k``-token window that occurs more than once in the corpus and
REMOVE the repeated occurrences from the text, keeping the first
(smallest ``(doc_id, position)``) occurrence — the dedup that line-level
span statistics (text/c4.py ``span_dedup_stats``) only measures.

The reference implementation builds a corpus-wide suffix array; the
deterministic distributed rendition here works at TOKEN granularity
(token boundaries are unambiguous where byte offsets inside a
distributed corpus are not — the same trade span_dedup makes for lines):

1. each document emits its ``k``-token windows IN-ROW as
   ``(position, md5(window))`` — text never leaves the scan.  The
   window hash covers NETSTRING-encoded tokens (``<len>:<token>``),
   never a plain join: length prefixes make the concatenation
   injective, so windows with different token boundaries can never
   collide no matter what characters tokens contain (the
   concatenated-key pitfall text/lm.py documents).  The occurrence
   frame is ``localCheckpoint``-materialized so the O(n·k) in-row
   hashing runs EXACTLY ONCE even though two consumers read it (an
   unmaterialized groupBy-min + self-join re-executes the hashing on
   both join sides: measured 4.5x slower at sf0.1);
2. the global first occurrence per window is ``min(struct(doc_id,
   pos))`` as a keyed AGGREGATION — partial aggregation collapses a
   hot window's occurrences inside each scan partition BEFORE the
   shuffle, so a boilerplate k-gram repeated across millions of
   documents sends at most one row per map task to its reducer (a
   ``Window.partitionBy(h)`` form would funnel every occurrence of
   the hot hash through one reducer — the skew the Lee et al.
   workload is guaranteed to contain);
3. occurrences re-join the first-occurrence table on the 16-byte hash
   to find duplicates — an equi-join AQE's skew-join mitigation can
   split when one hash dominates (enable
   ``spark.sql.adaptive.skewJoin.enabled``, on by default); the
   checkpointed occurrence frame is read, not recomputed, on both
   sides;
4. duplicate occurrences expand to their covered token positions and
   re-aggregate per document — the shuffle carries ``(doc_id, pos)``
   pairs only;
5. the covered-position set joins back to the corpus by id and the
   cleaned text is rebuilt IN-ROW (indexed ``transform`` + ``filter``),
   so document text is never exploded through a shuffle.  Documents
   with nothing removed return their text VERBATIM (no tokenize-rejoin
   normalization).

Step 5 is O(n_tokens · n_covered) per document (``array_contains`` per
token); for typical web documents (≤ ~10k tokens) this is cheap codegen.
Corpora of book-length documents should chunk first
(text/retrieval.py ``chunk_documents``).

The checkpoint lives in executor block storage (memory, spilling to
local disk) for the lifetime of the returned DataFrame and is released
when it is garbage-collected on the driver; an executor loss during the
job fails the job (localCheckpoint trades lineage for speed — Spark's
documented contract), which a retry of the whole operator handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array


def exact_substring_dedup(
    df: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
    join_sep: str = " ",
) -> DataFrame:
    """→ (id_col, n_tokens, n_removed_tokens, cleaned_text).

    A token position is removed iff it is covered by some ``k``-token
    window whose content occurred earlier in the corpus (strictly
    smaller ``(doc_id, position)`` — global keep-first).  Documents with
    NOTHING removed (sub-``k`` docs included) return their text
    verbatim; documents with removals are rebuilt from their kept
    tokens joined by ``join_sep``.  Null text survives with zero counts
    and null ``cleaned_text``.  Exact in-document repeats dedup against
    themselves — note this is MORE aggressive than Lee et al.'s
    keep-one-span on OVERLAPPING in-document repeats: only position 1
    of the first window is guaranteed kept (``"q q q q q q"`` with
    ``k=4`` keeps ``"q"``, because the windows at positions 2 and 3
    duplicate position 1's and their coverage reaches back over tokens
    2..4).  Callers wanting span-preserving behavior should gap-filter
    on ``n_removed_tokens`` instead of using ``cleaned_text``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = _token_array(text_col, token_sep)
    n = F.size(toks)

    # netstring-encode ("<len>:<token>") the k tokens of EACH WINDOW'S
    # slice: length prefixes make the concatenation injective, so windows
    # with different token boundaries can never hash equal no matter what
    # characters tokens contain.  The encoding must live INSIDE the
    # per-window lambda — a whole-array encoded column gets re-inlined at
    # every window use by projection collapse, turning O(n·k) per doc
    # into O(n²) (measured 2.5x slower at sf0.1)
    def _win_hash(i):
        enc = F.transform(
            F.slice(toks, i, k),
            lambda x: F.concat(F.length(x).cast("string"), F.lit(":"), x),
        )
        return F.md5(F.concat_ws("", enc).cast("binary"))

    wins = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.struct(i.alias("pos"), _win_hash(i).alias("h")),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    # materialize the occurrence frame ONCE (lazily, at first job) so the
    # O(n·k) in-row hashing is never recomputed even though both the
    # first-occurrence aggregate and the duplicate join read it; the
    # checkpoint is GC-released with the returned DataFrame
    occ = df.select(F.col(id_col), F.inline(wins)).localCheckpoint(eager=False)
    # global first occurrence per window hash as a keyed aggregation:
    # partial_min collapses a hot hash's occurrences map-side, so no
    # reducer ever receives more than one row per (hash, map task) —
    # unlike a Window.partitionBy(h), which funnels every occurrence of
    # a boilerplate k-gram through a single reducer
    firsts = occ.groupBy("h").agg(
        F.min(F.struct(id_col, "pos")).alias("__first"))
    # duplicates = occurrences differing from their hash's minimum; the
    # equi-join on h is AQE-skew-eligible (a dominant hash's partition is
    # split across tasks at runtime), and both sides read the checkpoint
    dups = (
        occ.join(firsts, "h")
        .where(
            (F.col(id_col) != F.col(f"__first.{id_col}"))
            | (F.col("pos") != F.col("__first.pos"))
        )
        .select(id_col, "pos")
    )
    covered = (
        dups.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__p").alias("__cov"))
    )
    base = df.select(F.col(id_col), F.col(text_col), toks.alias("__t"))
    joined = base.join(covered, [id_col], "left")
    indexed = F.transform(
        F.col("__t"),
        lambda x, i: F.struct((i + 1).alias("p"), x.alias("t")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.coalesce(
            F.array_contains(F.col("__cov"), s["p"]), F.lit(False)
        ),
    )
    n_removed = F.coalesce(F.size("__cov"), F.lit(0))
    return joined.select(
        id_col,
        F.coalesce(F.size("__t"), F.lit(0)).cast("long").alias("n_tokens"),
        n_removed.cast("long").alias("n_removed_tokens"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(n_removed == 0, F.col(text_col))  # untouched: verbatim
        .otherwise(
            F.array_join(F.transform(kept, lambda s: s["t"]), join_sep)
        ).alias("cleaned_text"),
    )
