"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
the MOSS local fingerprinting algorithm): select the minimum k-gram hash
in every w-gram window, so any shared run of at least w + k - 1 tokens
between two documents is GUARANTEED to share a fingerprint, while only
~2/(w+1) of gram hashes are kept.  The standard tool for partial-overlap
detection — quote/boilerplate reuse, license text, plagiarism — where
whole-document MinHash (text/dedup.py) is blind to small shared spans
and ExactSubstr removal (text/substring.py) is the heavier editing pass.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier.

Spark shape (100 TB):

- **Fingerprint selection is IN-ROW**: gram hashes, window minima, and
  the leftmost-min position all compute inside ``transform`` /
  ``array_min`` / ``array_position`` over the token array — text never
  leaves its scan partition, no UDF, and the per-doc output is the
  ~2/(w+1)-density fingerprint list (a few dozen longs per document).
- **Overlap detection is a fingerprint equi-join**, never all-pairs:
  only (doc, fp) rows shuffle (8-byte keys), and fingerprints shared by
  more than ``max_df`` documents are dropped FIRST (one bounded
  aggregate) — the MOSS noise rule, and the skew guard: a boilerplate
  fingerprint in millions of docs would otherwise create a quadratic
  bucket, the same hot-key failure text/substring.py documents.
  ``max_df`` bounds every bucket, so the pair space is
  ≤ Σ min(df, max_df)² — set by the caller to the largest reuse class
  they care about.

Determinism: gram hash = first 8 md5 hex digits of the space-joined
k-token gram (the ``token_bucket`` idiom, text/classifier.py) — engine
portable, so a DuckDB oracle replays selection and overlap exactly.
Window ties select the LEFTMOST minimal gram (``array_position`` returns
the first match), and overlapping windows choosing the same (pos, hash)
occurrence collapse via ``array_distinct`` — the paper's "record each
selected fingerprint once" rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array

__all__ = ["winnow_fingerprints", "winnow_overlap"]


def _gram_hashes(toks, k: int):
    """In-row array of k-gram hashes: first 8 md5 hex digits of each
    space-joined k-token gram, as a long."""
    m = F.size(toks)
    return F.when(
        m >= k,
        F.transform(
            F.sequence(F.lit(1), m - k + 1),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 8),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
) -> DataFrame:
    """→ (id_col, pos, fp): winnowed fingerprints — the minimum gram
    hash of every ``w``-gram window, recorded once per selected
    occurrence.  ``pos`` is the 1-based index of the selected k-gram.
    Documents with fewer than ``k`` tokens emit nothing; documents with
    1 ≤ m < ``w`` grams emit the minimum over all their grams (one
    short window), so every fingerprintable doc is represented.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    toks = _token_array(text_col, token_sep)
    hs = _gram_hashes(toks, k)
    # STAGED projections, deliberately: the gram-hash array must
    # materialize ONCE per document before windows slice it.  A single
    # fused expression re-inlines ``hs`` into every window slice —
    # O(windows × grams) md5 evaluations per doc — measured 78 s vs
    # 3.8 s at sf0.1.  Catalyst's CollapseProject keeps these separate
    # because collapsing would duplicate a non-cheap producer.
    # The emit condition "at least one gram" is size(__hs) >= 1, but
    # filtering on the DERIVED column would substitute the md5-per-gram
    # transform into the predicate, which Catalyst then pushes below the
    # repartition exchange into the (possibly single-split) scan stage —
    # measured: the whole corpus's gram hashing ran TWICE, once of it
    # serialized in a 1-task stage (50 s under load vs the 32-way 10 s
    # stage above the exchange).  size(__hs) >= 1 ⟺ the doc has >= k
    # tokens, so filter on the RAW token count instead: an equivalent,
    # md5-free predicate that is cheap wherever the optimizer places it
    # (r12; guide §4.4's duplicated-evaluation trap, expression form).
    base = df.where(F.col(text_col).isNotNull()).where(
        F.size(toks) >= k
    ).select(F.col(id_col), hs.alias("__hs"))
    m = F.size(F.col("__hs"))
    # window starts 1 .. max(1, m-w+1); slice() tolerates short tails,
    # which only occur in the m < w single-window case
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), m - w + 1))
    wins = base.select(
        id_col,
        F.transform(starts, lambda j: F.slice(F.col("__hs"), j, w)).alias("__wins"),
    )
    # two-arg transform: j is the 0-based window index = start - 1;
    # array_min/array_position now fold over a w-element materialized
    # window, not a rebuilt corpus expression
    sel = F.transform(
        F.col("__wins"),
        lambda win, j: F.struct(
            (j + F.array_position(win, F.array_min(win))).cast("long").alias("pos"),
            F.array_min(win).alias("fp"),
        ),
    )
    return (
        wins.select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("__s"))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))
    )


def winnow_overlap(
    fps: DataFrame,
    *,
    id_col: str = "doc_id",
    max_df: int = 50,
    min_shared: int = 2,
) -> DataFrame:
    """→ (doc_a, doc_b, shared_fps): document pairs ranked by the number
    of DISTINCT shared fingerprints, from a :func:`winnow_fingerprints`
    frame.  Fingerprints appearing in more than ``max_df`` documents are
    dropped before pairing (the MOSS noise rule AND the quadratic-bucket
    skew guard); pairs sharing fewer than ``min_shared`` fingerprints
    are suppressed.  ``doc_a < doc_b`` canonical order.
    """
    if max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    docs_fp = fps.select(F.col(id_col), "fp").distinct()
    # materialize the distinct (doc, fp) table ONCE: it feeds three
    # consumers (df_counts, and both sides of the pair join), and the
    # producer above it is the md5-per-gram fingerprint pass — without
    # this the optimizer evaluates that pass twice (AQE exchange reuse
    # only recovers the third copy; measured plan: two full
    # Scan→Generate→md5 subtrees).  localCheckpoint truncates the
    # lineage to the ~2/(w+1)-density (id, fp) longs — at any scale the
    # checkpoint is orders of magnitude smaller than re-hashing the
    # corpus (guide §3.3/§5: materialise a reused intermediate)
    docs_fp = docs_fp.localCheckpoint(eager=True)
    df_counts = docs_fp.groupBy("fp").agg(F.count("*").alias("__df"))
    kept = docs_fp.join(
        df_counts.where(F.col("__df") <= max_df).select("fp"), "fp"
    )
    a = kept.select(F.col(id_col).alias("doc_a"), "fp")
    b = kept.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
