from cuml_spark.neighbors.nearest_neighbors import NearestNeighbors, knn_join, cosine_topk

__all__ = ["NearestNeighbors", "knn_join", "cosine_topk"]
