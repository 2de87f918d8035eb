"""train_test_split — cuML python/cuml/preprocessing/model_selection.py:26.

Reference semantics: 4-way (X_train, X_test, y_train, y_test) split with
``train_size`` proportional or absolute, optional shuffle, seeded.  The Spark
frame keeps X and y together, so this returns (train_df, test_df).

Two modes:
- ``exact=False`` (default): seeded Bernoulli split via ``rand(seed)`` —
  one map-only pass, fully scalable, sizes binomially distributed around the
  proportion (the classic ``randomSplit`` trade-off).
- ``exact=True``: exact sizes via seeded rank — a window over ``rand(seed)``
  assigns row numbers; cost is one shuffle.  Mirrors the reference's exact
  row-count contract (model_selection.py computes exact train_size rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_test_split(
    df: DataFrame,
    train_size: float | int = 0.8,
    shuffle: bool = True,
    seed: int = 0,
    exact: bool = False,
) -> tuple[DataFrame, DataFrame]:
    if not shuffle:
        # reference: unshuffled split takes the first train_size rows in order;
        # Spark frames are unordered, so require an explicit ordering column —
        # use a deterministic global row_number over the existing order.
        w = Window.orderBy(F.monotonically_increasing_id())
        total = df.count()
        k = int(train_size * total) if isinstance(train_size, float) else train_size
        numbered = df.withColumn("__rn", F.row_number().over(w))
        train = numbered.filter(F.col("__rn") <= k).drop("__rn")
        test = numbered.filter(F.col("__rn") > k).drop("__rn")
        return train, test
    if exact:
        # rand(seed) is re-evaluated independently in the train and test plans
        # (Spark marks it non-deterministic), which can place a row on both
        # sides.  Instead derive the shuffle key deterministically from row
        # CONTENT: xxhash64 of all columns + seed.  Identical rows tie, but any
        # tie-break among identical rows yields the same multiset split, so
        # disjointness/completeness hold regardless of partitioning.
        #
        # NO global sort: a global row_number window funnels every row through
        # one task.  Two-phase bucketed rank instead: (1) distributed counts
        # per hash bucket, (2) driver finds the cutoff bucket, (3) rows below
        # it → train, above it → test, and only the one boundary bucket
        # (≈ n/n_buckets rows) pays a row_number window.
        total = df.count()
        k = int(train_size * total) if isinstance(train_size, float) else train_size
        cols = [F.col(c) for c in df.columns]
        key = F.xxhash64(*cols, F.lit(seed))
        n_buckets = 1 << 12
        bucketed = df.withColumn("__b", F.pmod(key, F.lit(n_buckets)))
        counts = dict(
            r[0:2] for r in bucketed.groupBy("__b").count().collect()
        )
        cum = 0
        cutoff_bucket, need_in_cutoff = n_buckets, 0
        for b in range(n_buckets):
            c = counts.get(b, 0)
            if cum + c >= k:
                cutoff_bucket, need_in_cutoff = b, k - cum
                break
            cum += c
        below = F.col("__b") < cutoff_bucket
        at = F.col("__b") == cutoff_bucket
        w = Window.partitionBy("__b").orderBy(key, *cols)
        boundary = bucketed.filter(at).withColumn("__rn", F.row_number().over(w))
        train = bucketed.filter(below).drop("__b").unionByName(
            boundary.filter(F.col("__rn") <= need_in_cutoff).drop("__b", "__rn")
        )
        test = bucketed.filter(~below & ~at).drop("__b").unionByName(
            boundary.filter(F.col("__rn") > need_in_cutoff).drop("__b", "__rn")
        )
        return train, test
    p = float(train_size) if isinstance(train_size, float) else train_size / df.count()
    # randomSplit sorts within partitions first, making the seeded sample
    # deterministic and the two sides disjoint by construction.
    train, test = df.randomSplit([p, 1.0 - p], seed=seed)
    return train, test


def group_aware_split(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    *,
    group_key_col: str = "vid",
    group_id_col: str = "group_id",
    test_frac: float = 0.25,
    seed: int = 0,
) -> DataFrame:
    """Leakage-safe split: all members of a group land on the same side.

    The near-dup-aware eval split a training-data pipeline needs — if two
    near-duplicate documents straddle train/test, the eval set leaks into
    training.  ``groups`` is any ``(group_key_col, group_id_col)``
    membership frame (e.g. ``near_dup_groups`` output, an exact-dup hash
    group, a URL domain); rows absent from it form singleton groups keyed
    by their own id.  Assignment hashes the GROUP id (not the row id)
    through the deterministic Weyl mix (text/mixing.py), so the split is
    reproducible, partitioning-invariant and engine-portable, and every
    group is atomic by construction.

    Returns ``df`` plus ``group_id`` (long) and ``split`` ('train'/'test')
    columns.  Scale: one equi-join on the id (AQE broadcasts when the
    membership frame is small — near-dup membership usually is) and a
    map-only assignment; no other shuffle.
    """
    from cuml_spark.text.mixing import mix_uniform_expr

    g = groups.select(
        F.col(group_key_col).alias(id_col), F.col(group_id_col).alias("__gid")
    )
    joined = df.join(g, id_col, "left").withColumn(
        "group_id", F.coalesce(F.col("__gid"), F.col(id_col)).cast("long")
    ).drop("__gid")
    is_test = mix_uniform_expr("group_id", seed) < float(test_frac)
    return joined.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )
