from cuml_spark.manifold.tsne import TSNE
from cuml_spark.manifold.umap import UMAP

__all__ = ["TSNE", "UMAP"]
