"""Count-min sketch (Cormode & Muthukrishnan 2005): fixed-memory
approximate frequencies for EVERY key — the heavy-hitter / frequency
lookup companion to the HLL cardinality sketch (ops/hll.py) and the
exact top-k pass (text/ngrams.py).  At 100 TB a full token-frequency
table is itself huge; a d × w CMS is d·w integers no matter how many
distinct keys exist, never undercounts, and overcounts by at most
ε·total with probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Spark shape (100 TB): the fit is ONE map-side-combined aggregation
keyed by (row, bucket) — bounded at d × w rows by construction (the
bounded-fit contract of text/dsir.py and ops/hll.py); a trillion
occurrences of one token collapse inside each scan partition.  The
driver holds only the d × w counter table.  Point queries are pure
python over the fitted model; ``cms_lookup`` joins estimates onto a
DataFrame of keys via a broadcast of the d-row position minima —
map-only on the corpus side.

Engine portability: two hash schemes, both md5-replayable in DuckDB —
integer end to end, no fp anywhere:

- ``sliced`` (default since r11): ONE md5 of ``key``; row ``i`` takes
  hex digits ``[8i, 8i+8)`` of the same digest (md5's 128 bits = four
  independent 32-bit slices, so depth ≤ 4) — cuts the fit's hash work
  d× with identical portability (``substr(md5(key), 8*i+1, 8)`` in
  DuckDB).  Landed default-off in r10; flipped here together with the
  harness query's oracle.
- ``per_row``: row ``i``'s bucket for ``key`` is the first 8 md5 hex
  digits of ``key || ':' || i`` mod ``w`` (the text/bloom.py idiom) —
  d md5 evaluations per key occurrence.  The historical scheme, still
  what a pre-scheme pickle restores to, and the only option for
  depth > 4.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CountMinSketch", "cms_estimate_col", "fit_cms"]

_SCHEMES = ("per_row", "sliced")


def _bucket(key: Column, row: int, width: int) -> Column:
    """per_row bucket: first 8 hex digits of md5(key || ':' || row)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f":{row}"))), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def _sliced_bucket(digest: Column, row: int, width: int) -> Column:
    """sliced bucket: hex digits [8·row, 8·row+8) of ONE md5(key) digest
    — the single definition both the fit and the lookup path use, kept
    in sync with the DuckDB replay ``substr(md5(key), 8*row+1, 8)``."""
    return (
        F.conv(F.substring(digest, 8 * row + 1, 8), 16, 10).cast("long") % width
    )


@dataclass(frozen=True)
class CountMinSketch:
    """d × w counter table: ``counts[i][j]`` = total weight of keys
    hashing to bucket ``j`` in row ``i``."""

    depth: int
    width: int
    total: int
    counts: tuple[tuple[int, ...], ...]
    scheme: str = field(default="per_row")

    def __post_init__(self):
        if self.scheme not in _SCHEMES:
            raise ValueError(
                f"scheme must be one of {_SCHEMES}, got {self.scheme!r}")
        if self.scheme == "sliced" and self.depth > 4:
            raise ValueError(
                "scheme='sliced' derives rows from md5's four 32-bit "
                f"slices — depth must be <= 4, got {self.depth}")

    def _scheme(self) -> str:
        # pre-scheme pickles restore __dict__ without __init__: default
        # them to the historical per_row hashing (both query paths use
        # this accessor, so they cannot disagree)
        return getattr(self, "scheme", "per_row")

    def estimate(self, key: str) -> int:
        """Point query: min over rows — never an undercount."""
        import hashlib

        sliced = self._scheme() == "sliced"
        digest = hashlib.md5(key.encode()).hexdigest() if sliced else None
        est = None
        for i in range(self.depth):
            if sliced:
                j = int(digest[8 * i:8 * i + 8], 16) % self.width
            else:
                j = (
                    int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:8], 16)
                    % self.width
                )
            c = self.counts[i][j]
            est = c if est is None else min(est, c)
        return int(est or 0)

    def error_bound(self) -> float:
        """ε·N additive overcount bound (ε = e / w)."""
        import math

        return math.e / self.width * self.total


def fit_cms(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
    hash_scheme: str = "sliced",
) -> CountMinSketch:
    """Build a :class:`CountMinSketch` over ``df[key_col]`` (nulls
    ignored; ``weight_col`` defaults to count-1-per-row).  ONE
    aggregation keyed by (row, bucket), ≤ depth × width rows.
    The default ``'sliced'`` scheme computes ONE md5 per key occurrence
    and slices the digest per row (depth ≤ 4) — d× less hash work in
    the fit's hot loop, same DuckDB replayability; pass
    ``hash_scheme='per_row'`` for depth > 4 or parity with pre-r11
    sketches (see module docstring)."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if hash_scheme not in _SCHEMES:
        raise ValueError(f"hash_scheme must be one of {_SCHEMES}, got {hash_scheme!r}")
    if hash_scheme == "sliced" and depth > 4:
        raise ValueError(
            "hash_scheme='sliced' (the default) derives rows from md5's "
            f"four 32-bit slices — depth must be <= 4, got {depth}; pass "
            "hash_scheme='per_row' for deeper sketches")
    key = F.col(key_col).cast("string")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    if hash_scheme == "sliced":
        # stage the ONE digest per key in its own projection so codegen
        # computes md5 once and the d bucket slices read a local (the
        # expensive-producer staging lesson — don't lean on
        # subexpression elimination)
        src = df.where(key.isNotNull()).select(
            F.md5(key).alias("__dg"), w.alias("__w"))

        def bucket_of(i: int) -> Column:
            return _sliced_bucket(F.col("__dg"), i, width)
    else:
        src = df.where(key.isNotNull()).select(
            key.alias("__dg"), w.alias("__w"))

        def bucket_of(i: int) -> Column:
            return _bucket(F.col("__dg"), i, width)

    pos = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("row"), bucket_of(i).alias("bucket"))
            for i in range(depth)
        ])
    ).alias("__p")
    rows = (
        src.select(pos, "__w")
        .select("__p.row", "__p.bucket", "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("c"))
        .collect()
    )
    counts = [[0] * width for _ in range(depth)]
    for r in rows:
        counts[int(r["row"])][int(r["bucket"])] = int(r["c"])
    total = sum(counts[0])
    return CountMinSketch(
        depth=depth, width=width, total=total,
        counts=tuple(tuple(c) for c in counts), scheme=hash_scheme,
    )


def cms_estimate_col(model: CountMinSketch, key: Column) -> Column:
    """Column expression estimating ``key``'s frequency from a fitted
    sketch — min over the d plan-literal counter rows, map-only (the
    text/bloom.py literal-bitmap pattern; for sketches past
    literal-array comfort use ``model.estimate`` driver-side or a
    broadcast + pandas_udf with identical semantics)."""
    key = key.cast("string")
    # _scheme() itself defaults pre-scheme pickles to per_row, so it is
    # the single accessor here too (a hasattr guard would be dead code —
    # _scheme is defined on the class, so it is always present)
    sliced = model._scheme() == "sliced"
    # sliced note: the d slice expressions share one F.md5(key) subtree;
    # as a Column function this path CANNOT stage its own projection, so
    # it relies on codegen subexpression elimination for the dedupe —
    # acceptable because lookups run over bounded frames (top-k keys),
    # while the corpus-scale pass is the FIT, which does stage the
    # digest (see fit_cms).  md5 is built only for sliced models.
    digest = F.md5(key) if sliced else None
    ests = []
    for i in range(model.depth):
        # ONE array Literal, not CreateArray(width literals): a w-child
        # CreateArray generates w codegen assignments per evaluation —
        # measured 7.5 s vs 0.5 s at width=1024 — while a Literal is a
        # single constant reference.  Built by expression-string parse,
        # not F.lit(list): per-element py4j conversion cost 2.3 s of
        # every query CONSTRUCTION at d×w=4096 (core/exprs.py; the
        # parsed CreateArray constant-folds to the identical Literal).
        from cuml_spark.core.exprs import long_array_lit

        row_lit = long_array_lit(model.counts[i])
        if sliced:
            b = _sliced_bucket(digest, i, model.width)
        else:
            b = _bucket(key, i, model.width)
        ests.append(F.element_at(row_lit, b.cast("int") + 1))
    return F.least(*ests) if len(ests) > 1 else ests[0]
