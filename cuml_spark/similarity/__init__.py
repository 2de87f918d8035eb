from cuml_spark.similarity.ivf import IVFIndex
from cuml_spark.similarity.neardup import embedding_near_duplicates

__all__ = ["IVFIndex", "embedding_near_duplicates"]
