from cuml_spark.decomposition.pca import PCA
from cuml_spark.decomposition.random_projection import (
    GaussianRandomProjection,
    SparseRandomProjection,
    johnson_lindenstrauss_min_dim,
)
from cuml_spark.decomposition.tsvd import TruncatedSVD

__all__ = [
    "PCA",
    "GaussianRandomProjection",
    "SparseRandomProjection",
    "TruncatedSVD",
    "johnson_lindenstrauss_min_dim",
]
