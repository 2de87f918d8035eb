from cuml_spark.decomposition.pca import PCA
from cuml_spark.decomposition.tsvd import TruncatedSVD

__all__ = ["PCA", "TruncatedSVD"]
