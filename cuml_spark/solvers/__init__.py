from cuml_spark.solvers.cd import CD
from cuml_spark.solvers.qn import QN
from cuml_spark.solvers.sgd import SGD

__all__ = ["CD", "QN", "SGD"]
