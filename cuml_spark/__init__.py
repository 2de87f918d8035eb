"""cuml_spark — a PySpark-native rebuild of the cuML 0.11 estimator surface.

The reference (`/root/reference`, RAPIDS cuML v0.11) is a GPU ML library with a
scikit-learn-style API: fit / predict / transform / fit_predict / fit_transform,
plus metrics, preprocessing and dataset generators (see SURVEY.md).  This package
re-expresses that surface Spark-first:

- declarative DataFrame/SQL aggregations for the statistical primitives
  (``cuml_spark.ops``), so Catalyst gets pushdown/pruning/codegen for free;
- ``pyspark.ml`` wrappers where MLlib has the same algorithm family
  (KMeans, linear models, RF, PCA);
- Arrow-batched ``applyInPandas`` kernels for per-group algorithms MLlib lacks
  (time series, DBSCAN local step);
- driver-side linalg only on provably-small matrices (d×d gramians, k×d centers).

Everything here is built from public knowledge only: the PySpark API plus the
reference repo's observable behavior.
"""

__version__ = "0.1.0"

from cuml_spark.core.session import get_spark  # noqa: F401
