"""KNN / similarity search vs numpy brute force (reference: FAISS-backed
brute_force_knn, knn.cu:57 — exact, ties by index)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.neighbors import NearestNeighbors, cosine_topk, knn_join
from cuml_spark.neighbors.nearest_neighbors import self_knn_graph


@pytest.fixture(scope="module")
def emb_np(embeddings):
    pdf = embeddings.orderBy("vec_id").toPandas()
    return pdf["vec_id"].to_numpy(), np.array(pdf["embedding"].tolist(), dtype=np.float64)


def _np_knn(ids, X, query_ids, k):
    out = {}
    for qi in query_ids:
        q = X[ids == qi][0]
        d = ((X - q) ** 2).sum(axis=1)
        order = sorted((float(d[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != qi)
        out[qi] = [nid for _, nid in order[:k]]
    return out


def test_knn_exact_matches_numpy(embeddings, emb_np):
    ids, X = emb_np
    queries = embeddings.where(F.col("vec_id") < 5)
    got = knn_join(embeddings, queries, k=4).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    expected = _np_knn(ids, X, range(5), 4)
    assert by_q == expected


def test_knn_distances_correct(embeddings, emb_np):
    ids, X = emb_np
    queries = embeddings.where(F.col("vec_id") == 0)
    got = knn_join(embeddings, queries, k=3).collect()
    q = X[ids == 0][0]
    for r in got:
        nb = X[ids == r["neighbor_id"]][0]
        assert r["distance"] == pytest.approx(((q - nb) ** 2).sum(), rel=1e-9)


def test_cosine_topk_matches_numpy(embeddings, emb_np):
    ids, X = emb_np
    queries = embeddings.where(F.col("vec_id") == 1)
    got = cosine_topk(embeddings, queries, k=3).orderBy("rank").collect()
    q = X[ids == 1][0]
    sims = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = sorted(
        ((-float(sims[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != 1)
    )[:3]
    assert [r["neighbor_id"] for r in got] == [nid for _, nid in order]
    assert got[0]["cos_sim"] == pytest.approx(-order[0][0], rel=1e-9)


def test_lsh_ann_recall(embeddings, emb_np):
    """ANN mode: recall@10 vs exact must clear a floor (approximate by design)."""
    ids, X = emb_np
    nn = NearestNeighbors(n_neighbors=10, algorithm="lsh", n_planes=6, n_tables=6)
    nn.fit(embeddings)
    queries = embeddings.where(F.col("vec_id") < 20)
    got = nn.kneighbors(queries).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact = _np_knn(ids, X, range(20), 10)
    recalls = [len(by_q.get(q, set()) & set(exact[q])) / 10 for q in range(20)]
    assert float(np.mean(recalls)) > 0.25


def test_self_knn_graph_exact_path(embeddings, emb_np):
    """Below the cap the graph is the exact GEMM top-k — spot-check vs numpy."""
    ids, X = emb_np
    got = self_knn_graph(embeddings, k=4).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    expected = _np_knn(ids, X, range(5), 4)
    for q in range(5):
        assert by_q[q] == expected[q]


@pytest.mark.parametrize(
    "n_pts",
    [
        pytest.param(2_000, id="unit-2000"),
        pytest.param(20_000, marks=pytest.mark.quality, id="quality-20000"),
    ],
)
def test_self_knn_graph_lsh_path_recall(spark, n_pts):
    """Above the exact cap the graph routes through LSH candidates + exact
    re-rank — no full-table broadcast.  Recall vs brute on sampled queries
    must clear a floor, and every point must still get k ranked neighbors."""
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((8, 16)) * 4.0
    lab = rng.randint(8, size=n_pts)
    X = centers[lab] + rng.standard_normal((n_pts, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n_pts)],
        "vec_id long, embedding array<double>",
    ).repartition(8).cache()
    k = 5
    ann = self_knn_graph(df, k=k, exact_max_rows=500, n_tables=8, seed=3,
                         n_rows=n_pts)
    pdf = ann.toPandas()
    # every point got neighbors, ranks within 1..k, no self-pairs
    assert pdf["rank"].between(1, k).all()
    assert (pdf["query_id"] != pdf["neighbor_id"]).all()
    assert pdf.groupby("query_id").size().max() <= k
    assert pdf["query_id"].nunique() >= n_pts * 0.95  # LSH may orphan a few
    # recall vs exact brute on a query sample
    sample_q = list(range(0, n_pts, max(1, n_pts // 50)))[:50]
    exact = knn_join(df, df.where(F.col("vec_id").isin(sample_q)), k=k).toPandas()
    got = pdf[pdf["query_id"].isin(sample_q)]
    by_q = got.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    ex_q = exact.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    recalls = [
        len(by_q.get(q, set()) & ex_q[q]) / k for q in ex_q
    ]
    assert float(np.mean(recalls)) > 0.5


def test_brute_class_api(embeddings):
    nn = NearestNeighbors(n_neighbors=2).fit(embeddings)
    out = nn.kneighbors(embeddings.where(F.col("vec_id") == 3))
    rows = out.collect()
    assert len(rows) == 2
    assert {r["rank"] for r in rows} == {1, 2}


def test_knn_streamed_query_side_matches_gemm(spark):
    """When the query side exceeds the ship cap but the index fits, the roles
    flip: the index rides in the scorer closure and queries stream with NO
    shuffle (the inference shape — e.g. UMAP.transform over the full table).
    Results must equal the query-shipped GEMM path exactly."""
    from cuml_spark.neighbors.nearest_neighbors import (_GEMM_QUERY_CAP,
                                                       _knn_stream_queries)

    rng = np.random.RandomState(2)
    Xi = rng.standard_normal((40, 6))
    Xq = rng.standard_normal((300, 6))
    idx = spark.createDataFrame(
        [(i, [float(v) for v in Xi[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    qdf_raw = spark.createDataFrame(
        [(1000 + i, [float(v) for v in Xq[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    qdf = qdf_raw.repartition(7)

    ref = knn_join(idx, qdf, k=3).select(
        "query_id", "neighbor_id", "distance", "rank"
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    q_src = qdf.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    i_rows = [(r["vec_id"], r["embedding"]) for r in idx.collect()]
    streamed_df = _knn_stream_queries(i_rows, q_src, k=3, metric="sqeuclidean")
    got = streamed_df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    assert (got["query_id"] == ref["query_id"]).all()
    assert (got["neighbor_id"] == ref["neighbor_id"]).all()
    assert np.allclose(got["distance"], ref["distance"])
    # shuffle-free plan: a pure map over the query scan (the only Exchange
    # allowed is the explicit .repartition on the test input — use a clean
    # input to assert the scorer itself adds none)
    clean = _knn_stream_queries(
        i_rows,
        qdf_raw.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>").alias("q_vec")),
        k=3, metric="sqeuclidean",
    )
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # and knn_join itself picks this path when queries overflow the cap:
    # shrink the cap via monkeypatching is invasive — instead assert the
    # dispatch predicate directly
    assert len(i_rows) <= _GEMM_QUERY_CAP
