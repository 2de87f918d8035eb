"""Random-number and permutation prims.

Reference mapping (SURVEY.md §2.4):
- Rng::uniform / Rng::normal   src_prims/random/rng.h (Philox counter RNG)
- permute                      src_prims/random/permute.h (row shuffle)
- reduce_cols_by_key           src_prims/linalg/reduce_cols_by_key.h

The reference's Philox counter-based generators are embarrassingly
parallel; Spark's `rand(seed)`/`randn(seed)` are the same design
(per-partition XORShift streams seeded from (seed, partitionId)) — both
give deterministic draws for a fixed seed AND a fixed partitioning.
`permute` avoids `orderBy(rand())`'s nondeterminism by sorting on a hash
of the row key: deterministic for a fixed seed regardless of input
partitioning, one shuffle, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_HASH_RANGE = float(1 << 53)


def _hash_u01(id_cols: list[str], seed: int, salt: int) -> F.Column:
    """U(0,1) as a pure function of (row key, seed): counter-based like the
    reference's Philox (rng.h) — the draw depends ONLY on the key, never on
    partitioning, so results replay identically on any cluster layout."""
    h = F.pmod(
        F.xxhash64(*[F.col(c) for c in id_cols], F.lit(seed), F.lit(salt)),
        F.lit(1 << 53),
    )
    return (h.cast("double") + 0.5) / F.lit(_HASH_RANGE)


def rng_uniform(df: DataFrame, out_col: str, seed: int,
                low: float = 0.0, high: float = 1.0,
                id_cols: list[str] | None = None) -> DataFrame:
    """Append a U(low, high) column (rng.h uniform kernel).

    With ``id_cols`` the draw is keyed (partitioning-independent, exactly
    reproducible anywhere); without, it falls back to ``F.rand`` whose
    stream is fixed only for a fixed seed AND partitioning.
    """
    u = _hash_u01(id_cols, seed, 0) if id_cols else F.rand(seed)
    return df.withColumn(out_col, F.lit(low) + (F.lit(high) - F.lit(low)) * u)


def rng_normal(df: DataFrame, out_col: str, seed: int,
               mu: float = 0.0, sigma: float = 1.0,
               id_cols: list[str] | None = None) -> DataFrame:
    """Append an N(mu, sigma²) column (rng.h normal kernel, Box-Muller)."""
    if id_cols:
        u1 = _hash_u01(id_cols, seed, 1)
        u2 = _hash_u01(id_cols, seed, 2)
        z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    else:
        z = F.randn(seed)
    return df.withColumn(out_col, F.lit(mu) + F.lit(sigma) * z)


def permute(df: DataFrame, key_cols: list[str], seed: int,
            pos_col: str = "pos") -> DataFrame:
    """Deterministic row permutation (permute.h): assign each row the rank
    of ``xxhash64(key, seed)``.  One shuffle (the window sort); the hash
    makes the order independent of input partitioning, so the same seed
    reproduces the same permutation on any cluster layout.  At scale,
    consumers that only need "a shuffled order" should sort by the hash
    column directly instead of materializing dense ranks."""
    from pyspark.sql import Window

    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    w = Window.orderBy(h, *key_cols)
    return df.withColumn(pos_col, F.row_number().over(w))


def reduce_cols_by_key(df: DataFrame, value_cols: list[str],
                       col_keys: list[int], out_prefix: str = "k") -> DataFrame:
    """Sum value columns that share a key (reduce_cols_by_key.h): column j
    contributes to output key ``col_keys[j]``.  Pure Catalyst — the
    per-key sums are literal column additions, no shuffle at all (the
    reference's kernel reduces along the width, not the length)."""
    if len(value_cols) != len(col_keys):
        raise ValueError("value_cols and col_keys must align")
    groups: dict[int, list[str]] = {}
    for c, k in zip(value_cols, col_keys):
        groups.setdefault(k, []).append(c)
    out = df
    for k in sorted(groups):
        expr = None
        for c in groups[k]:
            col = F.col(c).cast("double")
            expr = col if expr is None else expr + col
        out = out.withColumn(f"{out_prefix}{k}", expr)
    return out
