from cuml_spark.linear_model.elastic_net import ElasticNet
from cuml_spark.linear_model.lasso import Lasso
from cuml_spark.linear_model.linear_regression import LinearRegression
from cuml_spark.linear_model.logistic_regression import LogisticRegression
from cuml_spark.linear_model.mbsgd import MBSGDClassifier, MBSGDRegressor
from cuml_spark.linear_model.ridge import Ridge

__all__ = [
    "ElasticNet",
    "Lasso",
    "LinearRegression",
    "LogisticRegression",
    "MBSGDClassifier",
    "MBSGDRegressor",
    "Ridge",
]
