"""Bloom-filter membership gate: the constant-memory "have we seen this
document before?" primitive every at-scale ingest pipeline runs before
paying for a full dedup join — cross-crawl URL/fingerprint suppression
(CCNet keeps per-shard hash filters), benchmark decontamination
pre-screens, and incremental-crawl "new since last snapshot" gates.

Not in the cuML reference (dense-matrix data model); first-class here
like the dedup tier (text/dedup.py).

Spark shape (100 TB):

- **fit** is ONE map-side-combined aggregation keyed by bit position —
  bounded at ≤ ``num_bits`` rows by construction (the DSIR
  ``hashed_bucket_totals`` contract, text/dsir.py): a billion input keys
  collapse to at most one row per filter bit before anything reaches
  the driver, which packs them into a ``num_bits/64``-long word array.
  The driver never holds corpus-scale state.
- **probe** is map-only and ZERO-shuffle: the packed bitmap rides the
  plan as a literal long array; each key computes its ``num_hashes``
  positions and tests bits with ``element_at`` +
  ``shiftrightunsigned`` + ``& 1`` — pure codegen, no UDF, no join.
  Because the expression is stateless it drops unchanged into a
  Structured Streaming query as an ingest-time gate.
- False-positive rate is the standard ``(1 - e^{-kn/m})^k``; false
  negatives are impossible, which the tests pin (every fitted key must
  probe true).

Engine portability: hash ``i`` of a key is the first 8 hex digits of
``md5(key || ':' || i)`` (the ``token_bucket`` idiom,
text/classifier.py), so a DuckDB oracle replays membership *relationally*
(probe positions semi-joined against the fitted corpus' distinct
positions) — same semantics, no bit arithmetic needed on the oracle
side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "bloom_positions", "bloom_probe", "fit_bloom"]

_WORD = 64


def bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` — first 8 md5 hex
    digits of ``key || ':' || i``, mod ``num_bits`` (engine-portable)."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(key, F.lit(f":{i}"))), 1, 8), 16, 10
            ).cast("long")
            % num_bits
        )
        for i in range(num_hashes)
    ]


@dataclass(frozen=True)
class BloomFilter:
    """Packed bloom bitmap: ``words[j]`` holds bits ``64j .. 64j+63``
    (bit ``p`` = ``(words[p // 64] >> (p % 64)) & 1``)."""

    num_bits: int
    num_hashes: int
    words: tuple[int, ...]

    @property
    def bits_set(self) -> int:
        return sum(bin(w & ((1 << _WORD) - 1)).count("1") for w in self.words)

    def false_positive_rate(self, n_keys: int) -> float:
        import math

        return (1.0 - math.exp(-self.num_hashes * n_keys / self.num_bits)) ** (
            self.num_hashes
        )


def fit_bloom(
    df: DataFrame,
    key_col: str = "text",
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> BloomFilter:
    """Build a :class:`BloomFilter` over ``df[key_col]`` (nulls ignored).

    One aggregation keyed by bit position — ≤ ``num_bits`` rows cross
    the shuffle (map-side combined), the driver packs them into
    ``ceil(num_bits / 64)`` longs.  ``num_bits`` must be a multiple of
    64 so word packing is exact.
    """
    if num_bits < _WORD or num_bits % _WORD:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*bloom_positions(key, num_bits, num_hashes))
    ).alias("__pos")
    rows = (
        df.where(key.isNotNull())
        .select(pos)
        .groupBy("__pos")
        .agg(F.count("*"))
        .select("__pos")
        .collect()
    )
    words = [0] * (num_bits // _WORD)
    for r in rows:
        p = int(r["__pos"])
        words[p // _WORD] |= 1 << (p % _WORD)
    # store as SIGNED 64-bit so the literal array round-trips as LongType
    signed = tuple(w - (1 << _WORD) if w >= (1 << 63) else w for w in words)
    return BloomFilter(num_bits=num_bits, num_hashes=num_hashes, words=signed)


def bloom_probe(
    df: DataFrame,
    model: BloomFilter,
    key_col: str = "text",
    *,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``out_col``: true iff ALL ``num_hashes`` bit positions of
    ``df[key_col]`` are set in ``model`` (null keys → false).

    Map-only, zero-shuffle, no UDF: the bitmap is a literal long array
    in the plan; works unchanged inside a Structured Streaming query.
    """
    # ONE array Literal, not CreateArray(n literals) — a wide CreateArray
    # costs one codegen assignment per word per evaluation (the ops/cms.py
    # lesson); a Literal is a single constant reference, so big filters
    # stay cheap.  Built by expression-string parse, not F.lit(list):
    # per-element py4j conversion costs ~0.5 ms/word on the driver at
    # every probe construction (core/exprs.py — the default 1M-bit
    # filter is 16384 words ≈ 8 s of pure F.lit overhead otherwise).
    from cuml_spark.core.exprs import long_array_lit

    words_lit = long_array_lit(model.words)
    key = F.col(key_col)
    checks = []
    for pos in bloom_positions(key, model.num_bits, model.num_hashes):
        word = F.element_at(words_lit, (pos / _WORD).cast("int") + 1)
        # call_function: the python shiftrightunsigned wrapper only takes a
        # literal shift amount; the SQL registry form accepts a column
        shifted = F.call_function(
            "shiftrightunsigned", word, (pos % _WORD).cast("int")
        )
        checks.append(shifted.bitwiseAND(F.lit(1)) == 1)
    hit = checks[0]
    for c in checks[1:]:
        hit = hit & c
    return df.withColumn(out_col, F.when(key.isNotNull(), hit).otherwise(F.lit(False)))
