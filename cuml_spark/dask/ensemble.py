"""MNMG forest parity (dask/ensemble/randomforest{classifier,regressor}.py).

The reference's MNMG forest trains an independent sub-forest per worker on
that worker's partitions and concatenates; Spark's binned level-wise
training over the full shuffle-partitioned table strictly generalizes it."""
from cuml_spark.ensemble.random_forest import (RandomForestClassifier,  # noqa: F401
                                               RandomForestRegressor)
