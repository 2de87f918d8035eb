"""Top-k selection (cuML ``warpTopK``, src_prims/selection/kselection.h:335).

Per-group top-k is a window rank bounded by k; Spark's physical plan for
``row_number() <= k`` window + filter is a per-partition sort with map-side
rank-pushdown (WindowGroupLimit in Spark 3.5+/4.x pushes the limit below the
shuffle), so only ≤k rows per group cross the wire.  Global top-k is
``orderBy(...).limit(k)`` = TakeOrderedAndProject, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group, deterministic via tiebreak columns.

    Ties broken by ``tiebreak_cols`` (ascending) — mirrors the reference KNN's
    ties-by-index determinism (SURVEY.md §2.1 op #18).
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    for t in tiebreak_cols or []:
        order.append(F.col(t).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .withColumnRenamed("__rank", "rank")
    )


def global_topk(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (partial top-k per partition, merge on driver)."""
    c = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(c).limit(k)
