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


def test_tsne_unknown_method_raises():
    with pytest.raises(ValueError, match="barnes_hut"):
        TSNE(method="fft")


def test_bh_repulsion_matches_exact():
    """The quadtree treecode at angle=0.5 must track the exact O(n²)
    repulsive force: small relative error in Z and per-point forces aligned
    with their exact counterparts (bh_kernels.h accuracy contract)."""
    from cuml_spark.manifold.tsne import _bh_repulsion

    rng = np.random.RandomState(11)
    # clustered layout — the regime BH sees mid-optimization
    Y = np.concatenate([
        rng.standard_normal((300, 2)) * 0.5 + c
        for c in ([0, 0], [6, 1], [-4, 5])
    ])
    n = len(Y)
    diff = Y[:, None, :] - Y[None, :, :]
    q = 1.0 / (1.0 + (diff ** 2).sum(-1))
    np.fill_diagonal(q, 0.0)
    z_exact = q.sum()
    f_exact = (q[:, :, None] ** 2 * diff).sum(1) / z_exact

    f_bh, z_bh = _bh_repulsion(Y, angle=0.5)
    assert abs(z_bh - z_exact) / z_exact < 0.05
    # force field agreement: small residual relative to the field's scale
    denom = np.linalg.norm(f_exact, axis=1).mean()
    rel = np.linalg.norm(f_bh - f_exact, axis=1).mean() / denom
    assert rel < 0.1
    # tighter angle → tighter agreement
    f_bh2, z_bh2 = _bh_repulsion(Y, angle=0.2)
    rel2 = np.linalg.norm(f_bh2 - f_exact, axis=1).mean() / denom
    assert rel2 <= rel + 1e-12
    assert abs(z_bh2 - z_exact) / z_exact < 0.02


@pytest.mark.quality
def test_tsne_bh_capacity_15k(spark):
    """The BH path must embed sample sizes the dense exact path cannot hold
    (15k points → a 1.8 GB dense Q alone): k-sparse P + treecode repulsion,
    cluster structure preserved."""
    n, d, n_cl = 15_000, 8, 6
    rng = np.random.RandomState(4)
    centers = rng.standard_normal((n_cl, d)) * 8.0
    lab = rng.randint(n_cl, size=n)
    X = centers[lab] + rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "pid long, x array<double>",
    ).repartition(16).cache()
    ts = TSNE(perplexity=15.0, n_iter=150, method="barnes_hut", random_state=5)
    out = ts.fit_transform(df, vec_col="x", id_col="pid").toPandas()
    assert len(out) == n
    merged = out.sort_values("pid").reset_index(drop=True)
    sep = _cluster_separation(merged, lab[merged["pid"].to_numpy()])
    assert sep > 1.5
    assert np.isfinite(ts.kl_divergence_)


@pytest.mark.parametrize("method", ["barnes_hut", "exact"])
def test_tsne_preserves_blob_structure(blob_vecs, method):
    ts = TSNE(perplexity=15.0, n_iter=300, method=method, random_state=5)
    out = ts.fit_transform(blob_vecs, vec_col="x", id_col="pid").toPandas()
    pdf = blob_vecs.select("pid", "label").toPandas()
    merged = out.merge(pdf, on="pid").sort_values("pid")
    sep = _cluster_separation(merged, merged["label"].to_numpy())
    assert sep > 2.0
    assert np.isfinite(ts.kl_divergence_)


def test_umap_fuzzy_knobs_semantics():
    """set_op_mix_ratio / local_connectivity act on the fuzzy graph the way
    the reference defines them (umap.pyx:240 vocabulary): mix=0 is the fuzzy
    intersection (≤ union weights, zero for one-sided edges), and larger
    local_connectivity raises rho (pure numpy — no Spark)."""
    from cuml_spark.manifold.umap import (_fuzzy_simplicial_set,
                                          _smooth_knn_dist_all)

    rng = np.random.RandomState(3)
    n, k = 40, 5
    qi = np.repeat(np.arange(n), k)
    ni = np.concatenate([rng.choice([j for j in range(n) if j != i], k, replace=False)
                         for i in range(n)])
    dist = rng.uniform(0.1, 2.0, size=n * k)

    hu, tu, wu = _fuzzy_simplicial_set(qi, ni, dist, n, k, set_op_mix_ratio=1.0)
    hi, ti, wi = _fuzzy_simplicial_set(qi, ni, dist, n, k, set_op_mix_ratio=0.0)
    assert (hu == hi).all() and (tu == ti).all()
    assert (wi <= wu + 1e-12).all()      # intersection never exceeds union
    assert wi.sum() < wu.sum()           # and is strictly smaller somewhere
    # one-sided edges (reverse absent) have zero intersection weight
    keyset = set(zip(qi.tolist(), ni.tolist()))
    one_sided = np.array([(int(t), int(h)) not in keyset for h, t in zip(hu, tu)])
    assert (wi[one_sided] < 1e-9).all()

    # local_connectivity: rho_2 >= rho_1 pointwise (2nd neighbor is farther)
    order = np.argsort(qi, kind="stable")
    D = np.full((n, k), np.inf)
    slot = np.tile(np.arange(k), n)
    D[qi[order], slot] = dist[order]
    rho1, _ = _smooth_knn_dist_all(D, k, local_connectivity=1.0)
    rho2, _ = _smooth_knn_dist_all(D, k, local_connectivity=2.0)
    assert (rho2 >= rho1 - 1e-12).all()
    assert rho2.sum() > rho1.sum()


def test_umap_repulsion_strength_spreads_layout(blob_vecs):
    """gamma scales the negative-sample push: a stronger repulsion must not
    collapse the layout — its spread should be at least that of gamma=1."""
    um1 = UMAP(n_neighbors=10, n_epochs=60, init="random", random_state=3,
               repulsion_strength=1.0)
    um2 = UMAP(n_neighbors=10, n_epochs=60, init="random", random_state=3,
               repulsion_strength=4.0)
    y1 = np.vstack(um1.fit_transform(blob_vecs, vec_col="x", id_col="pid")
                   .toPandas()["embedding"].to_numpy())
    y2 = np.vstack(um2.fit_transform(blob_vecs, vec_col="x", id_col="pid")
                   .toPandas()["embedding"].to_numpy())
    assert y2.std() > y1.std() * 0.9


def test_umap_driver_cap_enforced(blob_vecs):
    # Sample-then-embed contract (SCALE.md): past the cap, fit must raise
    # instead of silently collecting an unbounded edge list to the driver.
    um = UMAP(n_neighbors=5, n_epochs=5, max_driver_rows=100)
    with pytest.raises(ValueError, match="max_driver_rows"):
        um.fit(blob_vecs, vec_col="x", id_col="pid")
    # seeded-sample path under the cap keeps working
    sample = blob_vecs.sample(fraction=0.35, seed=1)
    um2 = UMAP(n_neighbors=5, n_epochs=20, max_driver_rows=100,
               init="random", random_state=0)
    out = um2.fit_transform(sample, vec_col="x", id_col="pid")
    assert out.count() == sample.count()


def test_tsne_driver_cap_enforced(blob_vecs):
    ts = TSNE(n_iter=5, max_driver_rows=100)
    with pytest.raises(ValueError, match="max_driver_rows"):
        ts.fit_transform(blob_vecs, vec_col="x", id_col="pid")
    # exact method hard-caps to 100k regardless of a looser request
    assert TSNE(method="exact", max_driver_rows=10**9).max_driver_rows == 100_000


def test_umap_epoch_callback(blob_vecs):
    # reference umap.pyx:202-208 GraphBasedDimRedCallback surface
    class Rec:
        def __init__(self):
            self.pre = 0
            self.epochs = 0
            self.end = 0

        def on_preprocess_end(self, emb):
            self.pre += 1

        def on_epoch_end(self, emb):
            self.epochs += 1
            assert emb.shape[1] == 2

        def on_train_end(self, emb):
            self.end += 1

    rec = Rec()
    sample = blob_vecs.sample(fraction=0.3, seed=2)
    UMAP(n_neighbors=5, n_epochs=12, init="random", callback=rec,
         random_state=0).fit(sample, vec_col="x", id_col="pid")
    assert rec.pre == 1 and rec.end == 1 and rec.epochs == 12

    # bare-callable form gets (epoch, embedding)
    seen = []
    UMAP(n_neighbors=5, n_epochs=7, init="random",
         callback=lambda e, Y: seen.append(e),
         random_state=0).fit(sample, vec_col="x", id_col="pid")
    assert seen == list(range(7))
