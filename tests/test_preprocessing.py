"""train_test_split / LabelEncoder / scalers — D-class semantics."""

from __future__ import annotations

import numpy as np
import pytest

from cuml_spark.preprocessing import LabelEncoder, MinMaxScaler, StandardScaler, train_test_split


def test_split_exact_sizes(lineitem):
    n = lineitem.count()
    train, test = train_test_split(lineitem, train_size=0.8, seed=3, exact=True)
    assert train.count() == int(0.8 * n)
    assert test.count() == n - int(0.8 * n)


def test_split_disjoint_and_complete(lineitem):
    train, test = train_test_split(lineitem, train_size=0.7, seed=1, exact=True)
    # (l_orderkey, l_linenumber) is NOT unique in the generated data — full
    # rows are.  Disjointness is therefore checked on the full row.
    n_overlap = train.intersect(test).count()
    assert n_overlap == 0
    assert train.count() + test.count() == lineitem.count()
    assert train.union(test).exceptAll(lineitem).count() == 0


def test_split_proportional_mode(lineitem):
    n = lineitem.count()
    train, test = train_test_split(lineitem, train_size=0.8, seed=3)
    frac = train.count() / n
    assert 0.75 < frac < 0.85  # binomial around 0.8


def test_split_absolute_size(lineitem):
    train, test = train_test_split(lineitem, train_size=1000, seed=2, exact=True)
    assert train.count() == 1000


def test_label_encoder_alphabetical(spark):
    df = spark.createDataFrame(
        [("banana",), ("apple",), ("cherry",), ("apple",)], "fruit string"
    )
    le = LabelEncoder().fit(df, "fruit")
    assert le.classes_ == ["apple", "banana", "cherry"]
    out = {r["fruit"]: r["code"] for r in le.transform(df).collect()}
    assert out == {"apple": 0, "banana": 1, "cherry": 2}


def test_label_encoder_unseen_raises(spark):
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    le = LabelEncoder().fit(df, "x")
    new = spark.createDataFrame([("c",)], "x string")
    with pytest.raises(KeyError):
        le.transform(new)


def test_label_encoder_inverse(spark):
    df = spark.createDataFrame([("a",), ("b",), ("b",)], "x string")
    le = LabelEncoder().fit(df, "x")
    coded = le.transform(df)
    back = le.inverse_transform(coded.select("code"))
    assert sorted(r["x"] for r in back.collect()) == ["a", "b", "b"]


def test_standard_scaler(lineitem):
    sc = StandardScaler().fit(lineitem, ["l_quantity", "l_tax"])
    out = sc.transform(lineitem)
    stats = out.selectExpr(
        "avg(l_quantity) m", "stddev_pop(l_quantity) s"
    ).first()
    assert stats["m"] == pytest.approx(0.0, abs=1e-9)
    assert stats["s"] == pytest.approx(1.0, rel=1e-9)


def test_minmax_scaler(lineitem):
    sc = MinMaxScaler(feature_range=(0.0, 1.0)).fit(lineitem, ["l_quantity"])
    out = sc.transform(lineitem)
    stats = out.selectExpr("min(l_quantity) lo", "max(l_quantity) hi").first()
    assert stats["lo"] == pytest.approx(0.0, abs=1e-12)
    assert stats["hi"] == pytest.approx(1.0, rel=1e-12)


def test_top_level_api_surface():
    """Reference-parity imports: every name exposed at the package root of
    python/cuml/__init__.py:17-68 resolves at cuml_spark's root too."""
    import cuml_spark

    for name in (
        "Base", "DBSCAN", "KMeans", "make_blobs", "make_regression", "PCA",
        "TruncatedSVD", "KalmanFilter", "ElasticNet", "Lasso",
        "LinearRegression", "LogisticRegression", "MBSGDClassifier",
        "MBSGDRegressor", "Ridge", "r2_score", "accuracy_score",
        "adjusted_rand_score", "NearestNeighbors", "CD", "SGD", "QN",
        "ExponentialSmoothing", "UMAP", "TSNE", "GaussianRandomProjection",
        "SparseRandomProjection", "johnson_lindenstrauss_min_dim",
        "train_test_split", "LabelEncoder", "ForestInference",
        "RandomForestClassifier", "RandomForestRegressor",
    ):
        assert getattr(cuml_spark, name) is not None


def test_group_aware_split_atomic_groups(spark):
    """No group ever straddles the split; rows absent from the membership
    frame are singletons; assignment is deterministic."""
    from pyspark.sql import functions as F

    from cuml_spark.preprocessing import group_aware_split

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # groups: pairs (2i, 2i+1) share a group for i < 50; ids >= 100 absent
    members = [(2 * i, 2 * i) for i in range(50)] + [
        (2 * i + 1, 2 * i) for i in range(50)
    ]
    groups = spark.createDataFrame(members, "vid long, group_id long")
    out = group_aware_split(
        df, "doc_id", groups, test_frac=0.3, seed=4
    ).cache()
    # every group is atomic: exactly one distinct split value per group
    straddling = (
        out.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter("n_sides > 1")
        .count()
    )
    assert straddling == 0
    # paired rows landed together
    pair_sides = {
        r["doc_id"]: r["split"] for r in out.filter("doc_id < 100").collect()
    }
    for i in range(50):
        assert pair_sides[2 * i] == pair_sides[2 * i + 1]
    # singletons got their own id as group and both sides are populated
    single = out.filter("doc_id >= 100")
    assert single.filter("group_id != doc_id").count() == 0
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "test"}
    # deterministic re-run
    again = group_aware_split(df, "doc_id", groups, test_frac=0.3, seed=4)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    out.unpersist()


# --------------------------------------------------------------------------
# Exact-count stratified sampling (ops/sampling.py)
# --------------------------------------------------------------------------


def test_stratified_sample_exact_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from cuml_spark.ops.sampling import stratified_sample_exact

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("g"))
    out = stratified_sample_exact(df, "g", 37, key_cols="doc_id", seed=3)
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 37, "1": 37, "2": 37, "3": 37}
    # groups smaller than the quota are kept whole
    small = df.where(F.col("doc_id") < 10)
    assert stratified_sample_exact(small, "g", 37).count() == 10
    # deterministic on any partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_sample_exact(
        df.repartition(17), "g", 37, key_cols="doc_id", seed=3).collect()}
    assert a == b


def test_stratified_sample_dict_caps_and_validation(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from cuml_spark.ops.sampling import stratified_sample_exact

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("g"))
    out = stratified_sample_exact(df, "g", {"0": 5, "1": 20}, key_cols="doc_id")
    counts = {r["g"]: r["n"] for r in
              out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 5, "1": 20, "2": 100}  # unlisted kept whole
    with _pt.raises(ValueError, match="n_per_group"):
        stratified_sample_exact(df, "g", 0)
    with _pt.raises(ValueError, match="must not be empty"):
        stratified_sample_exact(df, "g", {})
    with _pt.raises(ValueError, match=">= 1"):
        stratified_sample_exact(df, "g", {"0": 0})
