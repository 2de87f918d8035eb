"""SemDeDup-style semantic pruning (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication").

The scale trick that makes embedding dedup tractable at 100 TB: never
compare across the whole corpus — cluster first (k-means over
embeddings), then search for semantic duplicates ONLY within each
cluster, shrinking the pair space from O(n²) to O(Σ|c|²).  The pruning
policy is the paper's deterministic keep-lowest-id rule: a row is pruned
iff some SAME-CLUSTER row with a smaller id has cosine similarity ≥
``threshold`` (each row is judged against all earlier rows, not only
kept ones — duplicates of a pruned row are pruned too, matching the
reference implementation's max-sim-to-earlier test).

Spark shape: norms are precomputed map-only; the self-join shuffles both
sides once on the CLUSTER key (co-partitioned equi-join), the in-row
``zip_with``/``aggregate`` dot product stays in whole-stage codegen (no
UDF), and the witness aggregation reuses the same key space.  Nothing
driver-side, nothing quadratic beyond the per-cluster blocks the caller
sized via k.

Cluster assignments come from the caller (``cuml_spark.cluster.KMeans``
``.transform`` at scale, or any partition column) — keeping the operator
composable and its oracle exact.  Not in the cuML reference (its
neighbors tier stops at KNN); first-class here like the dedup tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """In-row dot product — sequential left fold, the same association
    DuckDB's list_dot_product uses, so oracle comparisons are bit-exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def semantic_prune(
    df: DataFrame,
    threshold: float,
    *,
    cluster_col: str = "cluster",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_rows: int | None = 100_000,
) -> DataFrame:
    """→ (id_col, cluster_col, kept, pruned_by): ``kept`` is false iff an
    earlier (smaller-id) same-cluster row is cosine-similar ≥
    ``threshold``; ``pruned_by`` is the smallest such witness id (null
    when kept).

    ``max_cluster_rows`` refuses degenerate clusterings before paying the
    within-cluster O(|c|²) join — at 100 TB the caller controls the block
    size through k, and a cluster bigger than the cap means the
    clustering, not this operator, needs fixing.  ``None`` skips the
    check (and its one cheap counting job).

    Zero-norm embeddings have no defined cosine: they are treated as
    never-similar (always kept, never a pruning witness) rather than
    failing the job under ANSI division.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"cosine threshold in [-1, 1], got {threshold}")
    if max_cluster_rows is not None:
        biggest = (
            df.groupBy(cluster_col).agg(F.count("*").alias("__n"))
            .agg(F.max("__n")).collect()[0][0]
        )
        if biggest is not None and biggest > max_cluster_rows:
            raise ValueError(
                f"largest cluster has {biggest} rows > max_cluster_rows="
                f"{max_cluster_rows}; the within-cluster pair space is "
                "quadratic — refit the clustering with a larger k (or "
                "raise the cap deliberately)")
    pts = df.select(
        F.col(cluster_col),
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    pts = pts.withColumn("__nrm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))
    a = pts.select(
        F.col(cluster_col),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    b = pts.select(
        F.col(cluster_col),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("__vb"),
        F.col("__nrm").alias("__nb"),
    )
    # zero-norm guard: under Spark 4's default ANSI mode a 0/0 double
    # division throws DIVIDE_BY_ZERO, so one zero embedding would fail
    # the whole job; gate the division so zero-norm rows score NULL =
    # never-similar (kept, never a witness) — the same semantics the
    # DuckDB oracle's NULL comparison and the PQ/IVF-PQ numpy guards have
    den = F.col("__na") * F.col("__nb")
    sim = F.when(den > 0, _dot(F.col("__va"), F.col("__vb")) / den)
    pruned = (
        a.join(b, [cluster_col]).where(F.col("__idb") < F.col("__ida"))
        .where(sim >= float(threshold))
        .groupBy(F.col("__ida").alias(id_col))
        .agg(F.min("__idb").alias("pruned_by"))
    )
    return (
        df.select(id_col, cluster_col)
        .join(pruned, [id_col], "left")
        .select(
            id_col, cluster_col,
            F.col("pruned_by").isNull().alias("kept"),
            "pruned_by",
        )
    )
