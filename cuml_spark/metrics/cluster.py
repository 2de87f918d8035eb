"""Clustering / information-theoretic metrics.

Reference mapping (SURVEY.md §2.3):
- contingency matrix  src_prims/metrics/contingencyMatrix.h → groupBy(y, ŷ).count()
- adjusted Rand       src_prims/metrics/adjustedRandIndex.h:161 (+ pyx :42)
- entropy             src_prims/metrics/entropy.h
- mutual info         src_prims/metrics/mutualInfoScore.h
- homogeneity/completeness/V  src_prims/metrics/{homogeneityScore,...}.h
- KL divergence       src_prims/metrics/klDivergence.h

Design: the contingency table is k×k' rows (tiny — label cardinality squared),
so every metric = one distributed groupBy over the data followed by closed-form
arithmetic on the collected table.  That is exactly the reference's shape
(device contingency build + final reduce), with the shuffle playing the role of
the atomics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contingency_matrix(df: DataFrame, y: str, y_pred: str) -> DataFrame:
    """(y, ŷ, n) counts — the join+pivot analog of contingencyMatrix.h."""
    return (
        df.groupBy(F.col(y).alias("y"), F.col(y_pred).alias("y_pred"))
        .agg(F.count("*").alias("n"))
    )


def _comb2(n: float) -> float:
    return n * (n - 1) / 2.0


def adjusted_rand_score(df: DataFrame, y: str, y_pred: str) -> float:
    """ARI from the collected contingency table (adjustedRandIndex.h:161)."""
    cont = contingency_matrix(df, y, y_pred).collect()
    n = sum(r["n"] for r in cont)
    a: dict = {}
    b: dict = {}
    sum_comb_ij = 0.0
    for r in cont:
        a[r["y"]] = a.get(r["y"], 0) + r["n"]
        b[r["y_pred"]] = b.get(r["y_pred"], 0) + r["n"]
        sum_comb_ij += _comb2(r["n"])
    sum_comb_a = sum(_comb2(v) for v in a.values())
    sum_comb_b = sum(_comb2(v) for v in b.values())
    total = _comb2(n)
    expected = sum_comb_a * sum_comb_b / total
    max_index = (sum_comb_a + sum_comb_b) / 2.0
    if max_index == expected:  # degenerate: single cluster or all-singleton
        return 1.0
    return (sum_comb_ij - expected) / (max_index - expected)


def rand_score(df: DataFrame, y: str, y_pred: str) -> float:
    """Unadjusted Rand index (metrics.hpp:73)."""
    cont = contingency_matrix(df, y, y_pred).collect()
    n = sum(r["n"] for r in cont)
    a: dict = {}
    b: dict = {}
    sum_comb_ij = 0.0
    for r in cont:
        a[r["y"]] = a.get(r["y"], 0) + r["n"]
        b[r["y_pred"]] = b.get(r["y_pred"], 0) + r["n"]
        sum_comb_ij += _comb2(r["n"])
    total = _comb2(n)
    sum_comb_a = sum(_comb2(v) for v in a.values())
    sum_comb_b = sum(_comb2(v) for v in b.values())
    return (total + 2 * sum_comb_ij - sum_comb_a - sum_comb_b) / total


def entropy_df(df: DataFrame, col: str, out_col: str = "entropy") -> DataFrame:
    """Lazy 1-row DataFrame variant of :func:`entropy` (natural log)."""
    counts = df.groupBy(col).agg(F.count("*").alias("n"))
    return (
        counts.select((F.col("n") / F.sum("n").over(Window.partitionBy())).alias("p"))
        .agg((-F.sum(F.col("p") * F.log("p"))).alias(out_col))
    )


def entropy(df: DataFrame, col: str, base: float | None = None) -> float:
    """Shannon entropy of a label column, natural log by default (entropy.h).

    Distributed: groupBy(label).count() then −Σ p ln p over the tiny table —
    expressed as a second aggregate so nothing but k rows ever leaves the
    executors.
    """
    counts = df.groupBy(col).agg(F.count("*").alias("n"))
    row = (
        counts.select((F.col("n") / F.sum("n").over(Window.partitionBy())).alias("p"))
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("h"))
        .first()
    )
    h = row["h"] or 0.0
    if base is not None:
        h /= math.log(base)
    return h


def mutual_info_score(df: DataFrame, y: str, y_pred: str) -> float:
    """MI(y, ŷ) = Σ_ij p_ij ln(p_ij/(p_i q_j)) from the contingency table."""
    cont = contingency_matrix(df, y, y_pred).collect()
    n = sum(r["n"] for r in cont)
    a: dict = {}
    b: dict = {}
    for r in cont:
        a[r["y"]] = a.get(r["y"], 0) + r["n"]
        b[r["y_pred"]] = b.get(r["y_pred"], 0) + r["n"]
    mi = 0.0
    for r in cont:
        p_ij = r["n"] / n
        mi += p_ij * math.log(n * r["n"] / (a[r["y"]] * b[r["y_pred"]]))
    return mi


def homogeneity_completeness_v_measure(
    df: DataFrame, y: str, y_pred: str
) -> tuple[float, float, float]:
    """(homogeneity, completeness, V) — metrics.hpp:198-236 semantics."""
    mi = mutual_info_score(df, y, y_pred)
    h_y = entropy(df, y)
    h_pred = entropy(df, y_pred)
    hom = 1.0 if h_y == 0 else mi / h_y
    comp = 1.0 if h_pred == 0 else mi / h_pred
    v = 0.0 if hom + comp == 0 else 2 * hom * comp / (hom + comp)
    return hom, comp, v


def cluster_agreement_metrics(df: DataFrame, y: str, y_pred: str) -> dict:
    """All six partition-agreement metrics from ONE collected contingency
    table (ari, rand, mi, homogeneity, completeness, v_measure) — the
    marginals and marginal entropies derive from the same k×k counts, so a
    single groupBy job feeds everything (the individual functions above stay
    for cuML API parity; this is the shared fast path)."""
    cont = contingency_matrix(df, y, y_pred).collect()
    n = sum(r["n"] for r in cont)
    a: dict = {}
    b: dict = {}
    sum_comb_ij = 0.0
    for r in cont:
        a[r["y"]] = a.get(r["y"], 0) + r["n"]
        b[r["y_pred"]] = b.get(r["y_pred"], 0) + r["n"]
        sum_comb_ij += _comb2(r["n"])
    sum_comb_a = sum(_comb2(v) for v in a.values())
    sum_comb_b = sum(_comb2(v) for v in b.values())
    total = _comb2(n)
    expected = sum_comb_a * sum_comb_b / total
    max_index = (sum_comb_a + sum_comb_b) / 2.0
    ari = 1.0 if max_index == expected else (
        (sum_comb_ij - expected) / (max_index - expected)
    )
    rand = (total + 2 * sum_comb_ij - sum_comb_a - sum_comb_b) / total
    mi = 0.0
    for r in cont:
        p_ij = r["n"] / n
        mi += p_ij * math.log(n * r["n"] / (a[r["y"]] * b[r["y_pred"]]))
    h_y = -sum(v / n * math.log(v / n) for v in a.values())
    h_p = -sum(v / n * math.log(v / n) for v in b.values())
    hom = 1.0 if h_y == 0 else mi / h_y
    comp = 1.0 if h_p == 0 else mi / h_p
    v = 0.0 if hom + comp == 0 else 2 * hom * comp / (hom + comp)
    return {
        "ari": ari, "rand": rand, "mi": mi,
        "homogeneity": hom, "completeness": comp, "v_measure": v,
    }


def kl_divergence(df: DataFrame, p: str, q: str) -> float:
    """Σ p·ln(p/q) over paired probability columns (klDivergence.h)."""
    return df.agg(
        F.sum(F.col(p) * F.log(F.col(p) / F.col(q)))
    ).first()[0]
