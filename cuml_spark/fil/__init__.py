from cuml_spark.fil.fil import ForestInference

__all__ = ["ForestInference"]
