"""k-center greedy coreset selection (farthest-point sampling; Gonzalez
1985, the 2-approximation; Sener & Savarese 2018 "Active Learning for
CNNs: A Core-Set Approach" for the training-data-selection use): pick
``k`` embeddings such that every point is close to some pick —
the DIVERSITY selection that complements SemDeDup's redundancy pruning
(similarity/semdedup.py prunes near-duplicates; this keeps a maximally
spread skeleton).  The reference ships the estimator this composes
around (NearestNeighbors python/cuml/neighbors/nearest_neighbors.pyx)
but no coreset selector; like text/dsir.py this is curation-side
composition.

Spark shape (100 TB): the selected set lives on the DRIVER (k rows — a
coreset is small by definition) and each greedy round is ONE distributed
scan: every point computes its cosine distance to the newest center
IN-ROW against a literal center vector (whole-stage codegen `zip_with`
dot product — no UDF, no join, no shuffle of the embedding column), the
running minimum folds via ``least(...)`` over the ≤k literal-center
distances, and the argmax is ``TakeOrderedAndProject`` (top-1, never a
sort).  Total cost: k scans, O(n·k²·d) codegen flops (round i
recomputes all i center distances — the lazy-expression trade for zero
materialization), zero shuffles.  Distances ROUND to 6 before the
min/argmax (the bm25
determinism rule), ties break on the smaller id, and already-selected
ids are excluded — so the selection is deterministic on any
partitioning, and a DuckDB chain of k CTEs replays it value-for-value.

For large k (thousands), the O(k) literal distances per scan get
expensive — chunk the corpus or switch to the IVF index for candidate
pruning; the coreset use-case (seed sets, eval panels, prototype
libraries) is small-k by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kcenter_select"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)


def _lit_vec(vals: list[float]) -> Column:
    # one parsed literal, not F.array(*[F.lit(x)]): the greedy loop embeds
    # O(k²) center vectors across its rounds, and per-element py4j
    # conversion made the DRIVER the bottleneck between rounds (~1.3 s of
    # a 1.9 s query; core/exprs.py, r12).  Fail-fast note (ADVICE r12):
    # double_array_lit REJECTS NaN/Inf where F.lit would embed them — a
    # degenerate center (e.g. from all-zero embeddings) now raises at
    # query construction instead of silently propagating NaN distances.
    from cuml_spark.core.exprs import double_array_lit

    return double_array_lit(vals)


def kcenter_select(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_id: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """→ (id_col, sel_order 1..k, dist): the greedy k-center picks in
    selection order; ``dist`` is the (rounded) covering distance the
    point had when picked — a non-increasing sequence whose last value
    is the coreset's covering radius — and NULL for the seed.

    The seed is the smallest id (or ``seed_id``); cosine distance with
    zero-norm vectors defined as distance 1.0 (never NaN/ANSI 0-div).
    Selects ``min(k, n)`` points on corpora smaller than ``k``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__n", F.sqrt(_dot(F.col("__v"), F.col("__v"))))

    if seed_id is None:
        seed_row = pts.orderBy("__id").limit(1).collect()
    else:
        seed_row = pts.filter(F.col("__id") == int(seed_id)).limit(1).collect()
    if not seed_row:
        raise ValueError("kcenter_select: empty input (or seed_id missing)")
    centers = [(int(seed_row[0]["__id"]), list(seed_row[0]["__v"]),
                float(seed_row[0]["__n"]), None)]

    for _ in range(1, k):
        dists = []
        for cid, cvec, cnorm, _d in centers:
            den = F.col("__n") * F.lit(cnorm)
            d = F.when(
                den > 0,
                F.lit(1.0) - _dot(F.col("__v"), _lit_vec(cvec)) / den,
            ).otherwise(F.lit(1.0))
            dists.append(F.round(d, round_to))
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        chosen = (
            pts.filter(~F.col("__id").isin([c[0] for c in centers]))
            .select("__id", "__v", "__n", mind.alias("__mind"))
            .orderBy(F.col("__mind").desc(), F.col("__id"))
            .limit(1)
            .collect()
        )
        if not chosen:
            break  # k > n: every point already selected
        r = chosen[0]
        centers.append((int(r["__id"]), list(r["__v"]), float(r["__n"]),
                        float(r["__mind"])))

    rows = [(cid, i + 1, d) for i, (cid, _v, _n, d) in enumerate(centers)]
    return spark.createDataFrame(
        rows, f"{id_col} long, sel_order long, dist double")
