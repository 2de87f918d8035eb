"""MNMG decomposition parity (dask/decomposition/pca.py → same class)."""
from cuml_spark.decomposition.pca import PCA  # noqa: F401
from cuml_spark.decomposition.tsvd import TruncatedSVD  # noqa: F401
