"""Metrics vs sklearn oracles (reference tier-1 pattern)."""

from __future__ import annotations

import math

import pytest

from cuml_spark.metrics import (
    accuracy_score,
    adjusted_rand_score,
    entropy,
    homogeneity_completeness_v_measure,
    kl_divergence,
    mean_absolute_error,
    mean_squared_error,
    mutual_info_score,
    r2_score,
    rand_score,
)


@pytest.fixture(scope="module")
def labeled(lineitem):
    return lineitem.select("l_returnflag", "l_linestatus").cache()


def test_r2_mse_mae(spark):
    import numpy as np

    rows = [(float(i), float(i) + (i % 3 - 1) * 0.5) for i in range(100)]
    df = spark.createDataFrame(rows, "y double, p double")
    y = np.array([r[0] for r in rows])
    p = np.array([r[1] for r in rows])
    exp_r2 = 1 - ((y - p) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert r2_score(df, "y", "p") == pytest.approx(exp_r2, rel=1e-9)
    assert mean_squared_error(df, "y", "p") == pytest.approx(((y - p) ** 2).mean(), rel=1e-9)
    assert mean_absolute_error(df, "y", "p") == pytest.approx(abs(y - p).mean(), rel=1e-9)


def test_accuracy(labeled):
    acc = accuracy_score(labeled, "l_returnflag", "l_linestatus")
    assert 0.0 <= acc <= 1.0


def _np_cluster_oracles(y, yp):
    """ARI / RI / MI from the contingency table, straight from the formulas
    (Hubert & Arabie 1985; cover both implementations independently)."""
    import numpy as np
    import pandas as pd

    cont = pd.crosstab(y, yp).to_numpy().astype(float)
    n = cont.sum()
    a = cont.sum(axis=1)
    b = cont.sum(axis=0)
    comb2 = lambda x: x * (x - 1) / 2.0
    sum_ij = comb2(cont).sum()
    sum_a, sum_b = comb2(a).sum(), comb2(b).sum()
    total = comb2(n)
    exp = sum_a * sum_b / total
    ari = (sum_ij - exp) / ((sum_a + sum_b) / 2 - exp)
    ri = (total + 2 * sum_ij - sum_a - sum_b) / total
    nz = cont > 0
    mi = (cont[nz] / n * np.log(n * cont[nz] / np.outer(a, b)[nz])).sum()
    h = lambda c: -(c[c > 0] / n * np.log(c[c > 0] / n)).sum()
    hom = mi / h(a) if h(a) > 0 else 1.0
    comp = mi / h(b) if h(b) > 0 else 1.0
    v = 2 * hom * comp / (hom + comp) if hom + comp > 0 else 0.0
    return ari, ri, mi, hom, comp, v


def test_cluster_metrics_vs_numpy(labeled):
    pdf = labeled.toPandas()
    y, yp = pdf["l_returnflag"], pdf["l_linestatus"]
    e_ari, e_ri, e_mi, e_hom, e_comp, e_v = _np_cluster_oracles(y, yp)
    assert adjusted_rand_score(labeled, "l_returnflag", "l_linestatus") == pytest.approx(e_ari, rel=1e-9)
    assert rand_score(labeled, "l_returnflag", "l_linestatus") == pytest.approx(e_ri, rel=1e-9)
    assert mutual_info_score(labeled, "l_returnflag", "l_linestatus") == pytest.approx(e_mi, rel=1e-9)
    hom, comp, v = homogeneity_completeness_v_measure(labeled, "l_returnflag", "l_linestatus")
    assert hom == pytest.approx(e_hom, rel=1e-9)
    assert comp == pytest.approx(e_comp, rel=1e-9)
    assert v == pytest.approx(e_v, rel=1e-9)


def test_entropy(labeled):
    import numpy as np

    pdf = labeled.toPandas()
    p = pdf["l_returnflag"].value_counts(normalize=True).to_numpy()
    expected = -(p * np.log(p)).sum()
    assert entropy(labeled, "l_returnflag") == pytest.approx(expected, rel=1e-9)


def test_kl_divergence(spark):
    rows = [(0.2, 0.25), (0.3, 0.25), (0.4, 0.25), (0.1, 0.25)]
    df = spark.createDataFrame(rows, "p double, q double")
    expected = sum(p * math.log(p / q) for p, q in rows)
    assert kl_divergence(df, "p", "q") == pytest.approx(expected, rel=1e-9)


def test_silhouette_sample_size_guard(spark):
    import numpy as np

    from cuml_spark.metrics import silhouette_score

    rng = np.random.RandomState(0)
    rows = [(i, float(rng.normal() + 8 * (i % 2)), float(rng.normal()), i % 2)
            for i in range(400)]
    df = spark.createDataFrame(rows, "pid long, x1 double, x2 double, lbl int")
    full = silhouette_score(df, ["x1", "x2"], "lbl", "pid")
    sampled = silhouette_score(df, ["x1", "x2"], "lbl", "pid", sample_size=150)
    # sampled estimate must track the full score on well-separated clusters
    assert abs(full - sampled) < 0.1
    assert full > 0.7


def test_trustworthiness_sample_size_and_k_guard(spark):
    import numpy as np
    import pytest as _pt

    from cuml_spark.metrics import trustworthiness

    rng = np.random.RandomState(1)
    pts = [(i, [float(v) for v in rng.normal(size=4)]) for i in range(200)]
    df = spark.createDataFrame(pts, "pid long, x array<double>")
    # identity embedding → perfect trustworthiness, sampled or not
    t = trustworthiness(df, df, n_neighbors=5, sample_size=80)
    assert t == _pt.approx(1.0)
    with _pt.raises(ValueError, match="n_neighbors"):
        trustworthiness(df, df, n_neighbors=120)


def test_cluster_agreement_metrics_matches_individuals(lineitem):
    from cuml_spark.metrics import (adjusted_rand_score,
                                    cluster_agreement_metrics,
                                    homogeneity_completeness_v_measure,
                                    mutual_info_score, rand_score)

    m = cluster_agreement_metrics(lineitem, "l_returnflag", "l_linestatus")
    assert m["ari"] == pytest.approx(
        adjusted_rand_score(lineitem, "l_returnflag", "l_linestatus"))
    assert m["rand"] == pytest.approx(
        rand_score(lineitem, "l_returnflag", "l_linestatus"))
    assert m["mi"] == pytest.approx(
        mutual_info_score(lineitem, "l_returnflag", "l_linestatus"))
    hom, comp, v = homogeneity_completeness_v_measure(
        lineitem, "l_returnflag", "l_linestatus")
    assert (m["homogeneity"], m["completeness"], m["v_measure"]) == (
        pytest.approx(hom), pytest.approx(comp), pytest.approx(v))
