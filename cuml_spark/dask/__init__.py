"""``cuml_spark.dask`` — import-path parity with the reference's MNMG tier.

Reference: python/cuml/dask/ is cuML's multi-node-multi-GPU layer (Dask
futures + NCCL comms, SURVEY.md §2.5): each submodule wraps the single-GPU
estimator with partition extraction and a comms handshake
(dask/ensemble/randomforestclassifier.py, dask/cluster/kmeans.py, …).

Under Spark, distribution is not a separate tier — every estimator in this
package already plans over partitioned DataFrames and scales by adding
executors, which is precisely the role Dask+NCCL plays for the reference.
So ``cuml_spark.dask.<sub>.<Estimator>`` simply re-exports the one
implementation: reference-style MNMG imports

    from cuml.dask.cluster import KMeans            # reference
    from cuml_spark.dask.cluster import KMeans      # here — same class as
    from cuml_spark.cluster import KMeans           #   the "single-node" path

port by renaming the package only, and there is no behavioral fork to keep
in sync (the reference's MNMG RF, for instance, trains disjoint sub-forests
per worker — Spark's shared-shuffle training strictly generalizes that).
"""

from cuml_spark.dask import (cluster, datasets, decomposition, ensemble,  # noqa: F401
                             linear_model, neighbors)
