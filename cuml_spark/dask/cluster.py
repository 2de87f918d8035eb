"""MNMG cluster parity (dask/cluster/kmeans.py → same class here)."""
from cuml_spark.cluster.kmeans import KMeans  # noqa: F401
from cuml_spark.cluster.dbscan import DBSCAN  # noqa: F401
