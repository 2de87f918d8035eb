"""Small matrix prims: per-row sort, gather, elementwise math.

Reference mapping (SURVEY.md §2.4 leftovers):
- sort_cols_per_row   src_prims/selection/columnWiseSort.h (per-row value sort)
- Matrix::gather      src_prims/matrix/gather.h:142 (row gather by index map)
- Matrix::math        src_prims/matrix/math.h (seqRoot/power/ratio/reciprocal…)

Each is a thin Catalyst formulation — the CUDA kernels these mirror collapse
to single expressions / one broadcast join under whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_cols_per_row(df: DataFrame, cols: list[str], out_col: str = "sorted",
                      ascending: bool = True) -> DataFrame:
    """Sort each row's values across ``cols`` into an array column
    (columnWiseSort.h semantics, row-major layout)."""
    arr = F.array_sort(F.array(*[F.col(c).cast("double") for c in cols]))
    if not ascending:
        arr = F.reverse(arr)
    return df.withColumn(out_col, arr)


def gather(df: DataFrame, indices: DataFrame, id_col: str,
           index_col: str = "idx") -> DataFrame:
    """Row gather: keep the rows of ``df`` named by ``indices[index_col]``
    (gather.h:142 map semantics).  Duplicated indices duplicate rows, like
    the reference's arbitrary gather map.  The index side is broadcast —
    gather maps are small relative to the matrix."""
    idx = indices.select(F.col(index_col).alias(id_col))
    return df.join(F.broadcast(idx), id_col, "inner")


_UNARY = {
    "sqrt": lambda c: F.sqrt(c),
    "abs": lambda c: F.abs(c),
    "sq": lambda c: c * c,
    "reciprocal": lambda c: F.lit(1.0) / c,
    "log": lambda c: F.log(c),
    "exp": lambda c: F.exp(c),
}

_BINARY = {
    "add": lambda c, s: c + s,
    "sub": lambda c, s: c - s,
    "mul": lambda c, s: c * s,
    "div": lambda c, s: c / s,
    "pow": lambda c, s: c ** s,
}


def matrix_math(df: DataFrame, cols: list[str], op: str,
                scalar: float | None = None) -> DataFrame:
    """Elementwise math over the named columns, in place (math.h kernels:
    seqRoot='sqrt', power='sq'/'pow', ratio='div', reciprocal, …)."""
    if op in _UNARY:
        fn = _UNARY[op]
        exprs = {c: fn(F.col(c).cast("double")) for c in cols}
    elif op in _BINARY:
        if scalar is None:
            raise ValueError(f"op {op!r} needs a scalar")
        fn = _BINARY[op]
        exprs = {c: fn(F.col(c).cast("double"), F.lit(float(scalar)))
                 for c in cols}
    else:
        raise ValueError(
            f"unknown op {op!r}; unary: {sorted(_UNARY)}, "
            f"binary: {sorted(_BINARY)}"
        )
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[exprs[c].alias(c) for c in cols],
    )
