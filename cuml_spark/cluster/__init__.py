from cuml_spark.cluster.dbscan import DBSCAN
from cuml_spark.cluster.kmeans import KMeans

__all__ = ["DBSCAN", "KMeans"]
