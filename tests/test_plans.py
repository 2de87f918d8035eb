"""Physical-plan shape gates: the scale contract, asserted.

Each core operator's executed plan must have the shuffle (Exchange) count
its 100 TB design claims — one hash shuffle for a keyed aggregate, one for
a window merge, zero for a streamed map — and parquet scans must prune to
the referenced columns (``ReadSchema``).  These are regression guards: a
future edit that silently adds a shuffle or widens a scan fails here, not
in a cluster."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(df) -> int:
    # count shuffle exchanges only (broadcast exchanges are the cheap,
    # intended pattern for small sides)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", _plan(df)))


def _read_schemas(df) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", _plan(df))


def test_exact_dedup_single_shuffle_pruned_scan(spark):
    from cuml_spark.text import exact_dedup_groups

    documents = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = exact_dedup_groups(documents)
    assert _n_shuffles(out) == 1  # one hash shuffle on the 16-byte key
    schemas = _read_schemas(out)
    assert schemas and all("meta" not in s for s in schemas)  # untouched cols pruned


def test_minhash_single_shuffle(documents):
    from cuml_spark.text import minhash_signatures

    out = minhash_signatures(documents)
    assert _n_shuffles(out) == 1  # one groupBy(doc_id) over exploded shingles


def test_group_topk_single_shuffle(lineitem):
    from cuml_spark.ops.topk import group_topk

    out = group_topk(lineitem, ["l_returnflag"], "l_extendedprice", k=3)
    assert _n_shuffles(out) == 1  # the rank window's hash partitioning


def test_stats_describe_no_extra_shuffle(spark):
    from cuml_spark.ops.stats import col_means

    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    out = col_means(lineitem, ["l_quantity", "l_extendedprice"])
    # global aggregate: partial map-side combine + single-partition merge
    assert _n_shuffles(out) <= 1
    schemas = _read_schemas(out)
    assert schemas
    for s in schemas:
        assert "l_comment" not in s and "l_shipdate" not in s  # pruned


def test_knn_gemm_single_merge_shuffle(spark):
    from cuml_spark.neighbors import knn_join

    rng = np.random.RandomState(0)
    df = spark.createDataFrame(
        [(i, [float(v) for v in rng.standard_normal(4)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    out = knn_join(df, df.where(F.col("vec_id") < 5), k=3)
    # per-shard top-k rows meet in exactly one merge window shuffle
    assert _n_shuffles(out) == 1


def test_row_normalize_single_shuffle(lineitem):
    from cuml_spark.ops.sparse import row_normalize_l1

    edges = lineitem.groupBy(
        F.col("l_orderkey").alias("row"), F.col("l_suppkey").alias("col")
    ).agg(F.sum("l_quantity").alias("value"))
    out = row_normalize_l1(edges, row="row", value="value")
    # groupBy shuffle + the row-sum window reusing the same partitioning
    assert _n_shuffles(out) <= 2


def test_filter_pushdown_reaches_scan(spark):
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    out = lineitem.where(F.col("l_quantity") > 30).select("l_orderkey")
    plan = _plan(out)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan
    schemas = _read_schemas(out)
    assert all(len(s.split(",")) <= 2 for s in schemas)  # 2 cols read, not 16
