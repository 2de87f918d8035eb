"""UMAP / TSNE — quality gates via trustworthiness + cluster preservation
(S-class; mirrors the reference's own embedding quality tests)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuml_spark.datasets import make_blobs
from cuml_spark.manifold import TSNE, UMAP
from cuml_spark.metrics import trustworthiness


@pytest.fixture(scope="module")
def blob_vecs(spark):
    centers = np.array([
        [10, 0, 0, 0, 0], [0, 10, 0, 0, 0], [0, 0, 10, 0, 0],
    ])
    df = make_blobs(spark, n_samples=240, n_features=5, centers=centers,
                    cluster_std=1.0, random_state=7)
    return df.select(
        F.col("id").alias("pid"),
        F.array("f0", "f1", "f2", "f3", "f4").alias("x"),
        "label",
    ).cache()


def _cluster_separation(emb_pdf, labels):
    """mean inter-centroid distance / mean intra-cluster spread."""
    Y = np.vstack(emb_pdf["embedding"].to_numpy())
    cents, spreads = [], []
    for l in set(labels):
        pts = Y[labels == l]
        cents.append(pts.mean(0))
        spreads.append(np.linalg.norm(pts - pts.mean(0), axis=1).mean())
    cents = np.array(cents)
    inter = np.mean([
        np.linalg.norm(cents[i] - cents[j])
        for i in range(len(cents)) for j in range(i + 1, len(cents))
    ])
    return inter / np.mean(spreads)


def test_umap_preserves_blob_structure(blob_vecs):
    um = UMAP(n_neighbors=10, n_epochs=150, init="spectral", random_state=3)
    out = um.fit_transform(blob_vecs, vec_col="x", id_col="pid").toPandas()
    pdf = blob_vecs.select("pid", "label").toPandas()
    merged = out.merge(pdf, on="pid").sort_values("pid")
    sep = _cluster_separation(merged, merged["label"].to_numpy())
    assert sep > 2.0  # clusters stay far apart relative to their spread

    emb = blob_vecs.sparkSession.createDataFrame(
        [(int(r["pid"]), [float(v) for v in r["embedding"]]) for _, r in out.iterrows()],
        "pid long, x array<double>",
    )
    t = trustworthiness(blob_vecs, emb, n_neighbors=10, id_col="pid")
    assert t > 0.8


def test_umap_transform_places_near_train(blob_vecs):
    um = UMAP(n_neighbors=10, n_epochs=100, random_state=3)
    um.fit(blob_vecs, vec_col="x", id_col="pid")
    # transform the training points themselves: should land near their own cluster
    out = um.transform(blob_vecs, vec_col="x", id_col="pid").toPandas()
    pdf = blob_vecs.select("pid", "label").toPandas()
    merged = out.merge(pdf, on="pid")
    sep = _cluster_separation(merged, merged["label"].to_numpy())
    assert sep > 1.5


def test_umap_supervised_tightens_classes(blob_vecs):
    """Supervised fit (categorical intersection, runner.h:139 semantics):
    labels attenuate inter-class edges, so class separation in the layout
    must not degrade vs the unsupervised fit on the same data."""
    um_u = UMAP(n_neighbors=10, n_epochs=100, init="spectral", random_state=3)
    out_u = um_u.fit_transform(blob_vecs, vec_col="x", id_col="pid").toPandas()
    um_s = UMAP(n_neighbors=10, n_epochs=100, init="spectral", random_state=3)
    out_s = um_s.fit_transform(
        blob_vecs, vec_col="x", id_col="pid", y_col="label"
    ).toPandas()
    pdf = blob_vecs.select("pid", "label").toPandas()
    sep_u = _cluster_separation(out_u.merge(pdf, on="pid"),
                                out_u.merge(pdf, on="pid")["label"].to_numpy())
    sep_s = _cluster_separation(out_s.merge(pdf, on="pid"),
                                out_s.merge(pdf, on="pid")["label"].to_numpy())
    assert sep_s >= sep_u * 0.95  # supervision must not hurt separation
    assert sep_s > 2.0


def test_tsne_barnes_hut_raises():
    with pytest.raises(NotImplementedError, match="exact"):
        TSNE(method="barnes_hut")


def test_tsne_preserves_blob_structure(blob_vecs):
    ts = TSNE(perplexity=15.0, n_iter=300, random_state=5)
    out = ts.fit_transform(blob_vecs, vec_col="x", id_col="pid").toPandas()
    pdf = blob_vecs.select("pid", "label").toPandas()
    merged = out.merge(pdf, on="pid").sort_values("pid")
    sep = _cluster_separation(merged, merged["label"].to_numpy())
    assert sep > 2.0
    assert np.isfinite(ts.kl_divergence_)
