from cuml_spark.cluster.dbscan import DBSCAN
from cuml_spark.cluster.kmeans import KMeans
from cuml_spark.cluster.spectral import SpectralClustering, spectral_embedding

__all__ = ["DBSCAN", "KMeans", "SpectralClustering", "spectral_embedding"]
