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
