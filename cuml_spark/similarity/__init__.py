from cuml_spark.similarity.ivf import IVFIndex
from cuml_spark.similarity.neardup import embedding_near_duplicates
from cuml_spark.similarity.pq import PQIndex

__all__ = ["IVFIndex", "PQIndex", "embedding_near_duplicates"]
