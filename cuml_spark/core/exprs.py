"""Plan-expression construction helpers.

The sketch/bitmap operators embed fitted models in the plan as ARRAY
literals (the map-only, zero-shuffle serving shape).  How the literal is
*constructed* matters on the driver: ``F.lit(python_list)`` converts the
list element-by-element through py4j (~0.5 ms/element — measured 2.3 s
for a 4×1024-counter CMS, rebuilt on every query construction), while
parsing ONE ``array(v0,v1,...)`` expression string costs microseconds
and Catalyst's ConstantFolding collapses the parsed CreateArray into the
identical single array ``Literal`` before codegen (verified: optimized
plans are Literal-only and evaluate the same).  This is the driver-side
twin of the ops/cms.py "ONE array Literal, not CreateArray" eval-side
lesson.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["double_array_lit", "int_double_map_lit", "long_array_lit"]


def long_array_lit(values: Iterable[int]) -> Column:
    """``array<bigint>`` literal from ``values`` via one expression-string
    parse instead of per-element py4j conversion.  Values must fit signed
    64-bit (enforced — a silent wrap would corrupt a sketch)."""
    vals = [int(v) for v in values]
    lo, hi = -(1 << 63), (1 << 63) - 1
    for v in vals:
        if not lo <= v <= hi:
            raise ValueError(f"array literal value {v} exceeds signed 64-bit")
    if not vals:
        return F.lit([]).cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def double_array_lit(values: Iterable[float]) -> Column:
    """``array<double>`` literal via one expression-string parse (same
    rationale and round-trip guarantee as :func:`int_double_map_lit`;
    k-center's per-round center vectors cost O(k²·d) driver py4j calls
    through ``F.array(*[F.lit(x)])``).  Non-finite values rejected."""
    import math

    vals = [float(v) for v in values]
    for v in vals:
        if not math.isfinite(v):
            raise ValueError(f"array literal value {v!r} is not finite")
    if not vals:
        return F.lit([]).cast("array<double>")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def int_double_map_lit(d: dict) -> Column:
    """``map<int,double>`` literal from ``d`` via one expression-string
    parse (same rationale as :func:`long_array_lit`; an inline model of
    ~512 weights costs ~0.9 s per construction through
    ``create_map(*[F.lit(...)])``).  ``repr(float)`` round-trips
    shortest-decimal → ``Double.parseDouble`` bit-exactly (verified over
    mixed magnitudes incl. 1e300/1e-15/-0.0); non-finite values are
    rejected — they have no portable literal syntax here."""
    import math

    items = []
    for k in sorted(d):
        v = float(d[k])
        if not math.isfinite(v):
            raise ValueError(f"map literal value for key {k} is {v!r}")
        items.append(f"{int(k)},{v!r}D")
    if not items:
        return F.expr("map()").cast("map<int,double>")
    return F.expr("map(" + ",".join(items) + ")")
