from cuml_spark.cluster.kmeans import KMeans

__all__ = ["KMeans"]
