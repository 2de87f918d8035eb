"""Benchmark subsystem smoke tests — parity with the reference's
benchmark-as-test tier (python/cuml/benchmark/runners.py:46,158;
test_benchmark.py in the reference's suite)."""

from __future__ import annotations

import pytest

from cuml_spark.benchmark import (AccuracyComparisonRunner, BenchmarkTimer,
                                  SpeedupComparisonRunner, algorithm_by_name,
                                  all_algorithms, run_variations)


def test_timer_collects_reps():
    t = BenchmarkTimer(reps=3)
    for _ in t.benchmark_runs():
        pass
    assert len(t.timings) == 3 and all(x >= 0 for x in t.timings)


def test_registry_has_core_algorithms():
    names = {a.name for a in all_algorithms()}
    assert {
        "KMeans", "PCA", "tSVD", "NearestNeighbors", "DBSCAN",
        "LinearRegression", "Ridge", "LogisticRegression",
        "RandomForestClassifier", "RandomForestRegressor", "TSNE",
    } <= names
    assert algorithm_by_name("kmeans").name == "KMeans"
    with pytest.raises(ValueError):
        algorithm_by_name("nope")


def test_second_wave_pairs_run(spark):
    r = AccuracyComparisonRunner(bench_rows=[250], bench_dims=[4],
                                 dataset_name="blobs")
    (tsvd,) = r.run(spark, algorithm_by_name("tSVD"), raise_on_error=True)
    assert tsvd["metric"] > 0.95  # singular values match numpy SVD
    (dbs,) = r.run(spark, algorithm_by_name("DBSCAN"), raise_on_error=True)
    assert dbs["metric"] > 0.9  # core/noise agreement vs numpy BFS
    (rfc,) = r.run(spark, algorithm_by_name("RandomForestClassifier"),
                   raise_on_error=True)
    assert rfc["baseline_time"] == 0.0  # cpu_class=None contract
    assert rfc["metric"] > 0.8


def test_third_wave_pairs_run(spark):
    names = {a.name for a in all_algorithms()}
    assert {"GaussianRandomProjection", "Lasso", "ElasticNet",
            "MBSGDClassifier", "FIL"} <= names

    r = AccuracyComparisonRunner(bench_rows=[300], bench_dims=[6],
                                 dataset_name="regression")
    (lasso,) = r.run(spark, algorithm_by_name("Lasso"), raise_on_error=True)
    assert lasso["metric"] > 0.8  # R² of the distributed CD fit
    assert lasso["baseline_time"] > 0  # numpy CD baseline actually ran
    (enet,) = r.run(spark, algorithm_by_name("ElasticNet"), raise_on_error=True)
    assert enet["metric"] > 0.8

    rb = AccuracyComparisonRunner(bench_rows=[300], bench_dims=[6],
                                  dataset_name="blobs")
    (grp,) = rb.run(spark, algorithm_by_name("GaussianRandomProjection"),
                    raise_on_error=True)
    assert grp["metric"] > 0.4  # median pairwise distortion near 1 at k=d/2
    (fil,) = rb.run(spark, algorithm_by_name("FIL"), raise_on_error=True)
    assert fil["metric"] > 0.999  # tree traversal matches numpy replay
    (mb,) = rb.run(spark, algorithm_by_name("MBSGDClassifier"),
                   raise_on_error=True)
    assert mb["metric"] > 0.5  # separable-ish blobs: better than chance


def test_speedup_runner_times_both_sides(spark):
    r = SpeedupComparisonRunner(bench_rows=[400], bench_dims=[4],
                                dataset_name="blobs")
    out = r.run(spark, algorithm_by_name("KMeans"), raise_on_error=True)
    (row,) = out
    assert row["spark_time"] > 0 and row["baseline_time"] > 0
    assert row["n_samples"] == 400 and row["n_features"] == 4


def test_accuracy_runner_gates_quality(spark):
    r = AccuracyComparisonRunner(bench_rows=[400], bench_dims=[4],
                                 dataset_name="regression")
    (row,) = r.run(spark, algorithm_by_name("LinearRegression"),
                   raise_on_error=True)
    assert row["metric"] > 0.9  # distributed OLS recovers the linear target

    r2 = AccuracyComparisonRunner(bench_rows=[300], bench_dims=[8],
                                  dataset_name="blobs")
    (knn_row,) = r2.run(spark, algorithm_by_name("NearestNeighbors"),
                        raise_on_error=True)
    assert knn_row["metric"] == pytest.approx(1.0)  # exact KNN == numpy brute


def test_run_variations_grid(spark):
    rows = run_variations(
        spark, [algorithm_by_name("PCA")], dataset_name="blobs",
        bench_rows=[200, 400], bench_dims=[4],
    )
    assert len(rows) == 2
    assert all(r["metric"] > 0.95 for r in rows)
