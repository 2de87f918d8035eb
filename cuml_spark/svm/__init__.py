from cuml_spark.svm.svc import SVC

__all__ = ["SVC"]
