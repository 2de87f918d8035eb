"""MNMG KNN parity (dask/neighbors/nearest_neighbors.py — the reference
chunks the index across workers and merges per-shard top-k; knn_join's
shard-and-merge GEMM is the same pattern natively)."""
from cuml_spark.neighbors.nearest_neighbors import NearestNeighbors  # noqa: F401
