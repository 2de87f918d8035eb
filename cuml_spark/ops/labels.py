"""Label utilities (cuML ``src_prims/label/classlabels.h``).

- ``getUniqueLabels`` (classlabels.h:48)  → distinct + sort
- ``make_monotonic``  (classlabels.h:146) → dense re-label 0..k-1 by sorted order
- ``getOvrLabels``    (classlabels.h:95)  → one-vs-rest ±1 relabel
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unique_labels(df: DataFrame, col: str) -> DataFrame:
    """Sorted distinct labels → DataFrame[label]."""
    return df.select(F.col(col).alias("label")).distinct().orderBy("label")


def label_dictionary(df: DataFrame, col: str, out_col: str = "code") -> DataFrame:
    """(label, code) dictionary with dense codes 0..k-1 in sorted-label order.

    This is the LabelEncoder fit result (LabelEncoder.py:122-143 orders
    lexicographically via nvcategory).  k rows — tiny by construction.
    """
    return (
        df.select(F.col(col).alias("label")).distinct()
        .select("label", (F.row_number().over(Window.orderBy("label")) - 1).cast("long").alias(out_col))
    )


def make_monotonic(df: DataFrame, col: str, out_col: str = "label_id") -> DataFrame:
    """Map labels to dense 0..k-1 ids in sorted-label order.

    Implemented as a broadcast join against the (tiny) distinct-label dict —
    NOT dense_rank over the full frame (that would be a single-partition window
    at 100 TB; the dictionary is k rows and broadcasts for free).
    """
    dict_df = (
        df.select(F.col(col)).distinct()
        .select(F.col(col), (F.row_number().over(Window.orderBy(col)) - 1).alias(out_col))
    )
    return df.join(F.broadcast(dict_df), on=col, how="left")


def one_vs_rest_labels(df: DataFrame, col: str, positive, out_col: str = "ovr") -> DataFrame:
    """±1 relabel for one-vs-rest training (classlabels.h:95)."""
    return df.withColumn(
        out_col, F.when(F.col(col) == positive, F.lit(1)).otherwise(F.lit(-1))
    )
