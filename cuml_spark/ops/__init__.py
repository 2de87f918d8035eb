from cuml_spark.ops.stats import (
    col_means,
    col_stddev,
    col_sum,
    col_minmax,
    covariance_matrix,
    correlation_matrix,
    histogram,
    weighted_mean,
    mean_center,
    describe_matrix,
)
from cuml_spark.ops.topk import group_topk, global_topk
from cuml_spark.ops.labels import unique_labels, make_monotonic, one_vs_rest_labels
from cuml_spark.ops.distance import (
    with_sq_norm,
    pairwise_sq_euclidean,
    pairwise_cosine_sim,
)
from cuml_spark.ops.linalg import (
    gram_matrix,
    gram_vector,
    row_norms,
    col_norms,
    tall_skinny_qr,
    svd_tall,
    randomized_svd,
)
from cuml_spark.ops.sparse import (
    coo_sort,
    coo_remove_zeros,
    coo_symmetrize,
    csr_add,
    row_normalize_l1,
    row_normalize_max,
    connected_components,
)

from cuml_spark.ops.matrix import sort_cols_per_row, gather, matrix_math
from cuml_spark.ops.rng import (
    rng_uniform,
    rng_normal,
    permute,
    reduce_cols_by_key,
)
from cuml_spark.ops.sampling import hash_sample

__all__ = [
    "gram_matrix", "gram_vector", "row_norms", "col_norms",
    "tall_skinny_qr", "svd_tall", "randomized_svd",
    "coo_sort", "coo_remove_zeros", "coo_symmetrize",
    "csr_add", "row_normalize_l1", "row_normalize_max", "connected_components",
    "col_means", "col_stddev", "col_sum", "col_minmax",
    "covariance_matrix", "correlation_matrix", "histogram",
    "weighted_mean", "mean_center", "describe_matrix",
    "group_topk", "global_topk",
    "unique_labels", "make_monotonic", "one_vs_rest_labels",
    "with_sq_norm", "pairwise_sq_euclidean", "pairwise_cosine_sim",
    "sort_cols_per_row", "gather", "matrix_math",
    "rng_uniform", "rng_normal", "permute", "reduce_cols_by_key",
    "hash_sample",
]
