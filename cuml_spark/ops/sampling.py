"""Deterministic hash-threshold sampling — the engine's 100 TB sample
contract, shared by every sampler (silhouette / trustworthiness
``sample_size``, IVF codebook training rows).

``xxhash64(key, seed) mod 2^32 < frac·2^32`` keeps a row iff a pure
function of (key, seed) says so: no sort, no sample-collect, identical
membership on any partitioning or cluster layout, and O(1) per row.
Contrast ``df.sample`` (partitioning-dependent) and ``orderBy(rand)``
(a full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_MOD = 1 << 32


def hash_sample_pred(key_cols: list[str] | str, frac: float, seed: int) -> Column:
    """Boolean keep-predicate for a deterministic ~``frac`` sample."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    frac = min(max(frac, 0.0), 1.0)
    h = F.pmod(
        F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)),
        F.lit(_HASH_MOD),
    )
    return h < F.lit(int(frac * _HASH_MOD))


def hash_sample(df: DataFrame, key_cols: list[str] | str, frac: float,
                seed: int = 42) -> DataFrame:
    """Filter ``df`` to a deterministic ~``frac`` hash sample."""
    return df.where(hash_sample_pred(key_cols, frac, seed))


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    n_per_group: int | dict,
    *,
    key_cols: list[str] | str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACT-count per-stratum sampling: keep exactly
    ``min(n_g, |group g|)`` rows per group — the fixed-budget quota
    sampler behind per-language corpus caps (UniMax-style budgets),
    per-domain eval-set construction, and balanced fine-tuning mixes,
    where the fractional sampler above cannot promise exact counts.

    ``n_per_group`` is one int for all groups or a ``{group: n}`` dict
    (groups absent from the dict are kept whole).  Selection ranks rows
    within each group by the same pure hash the fractional sampler uses
    (md5 of the ':'-joined key columns + seed — the engine-portable
    token_bucket idiom, so a DuckDB oracle replays the exact selection;
    ties broken by the key columns), so membership is deterministic on
    any partitioning — a reproducible
    "random" quota — and the rank window shares the ONE group-keyed
    shuffle any per-group operation pays.  At 100 TB the window sorts
    each group once; groups are language/domain-sized (thousands), not
    corpus-sized, and a per-group TOP-N never materializes beyond its
    reducer.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if isinstance(n_per_group, int):
        if n_per_group < 1:
            raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
        cap = F.lit(n_per_group)
    else:
        if not n_per_group:
            raise ValueError("n_per_group dict must not be empty")
        if any(int(v) < 1 for v in n_per_group.values()):
            raise ValueError("all n_per_group values must be >= 1")
        mapping = F.create_map(
            *[F.lit(x) for kv in n_per_group.items() for x in kv])
        cap = mapping[F.col(group_col)]  # null for unlisted groups
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols],
                              F.lit(str(seed)))),
            1, 8),
        16, 10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols])
    ranked = df.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.where(cap.isNull() | (F.col("__rk") <= cap))
        .drop("__rk")
    )
