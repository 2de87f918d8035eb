from cuml_spark.datasets.generators import make_blobs, make_mvg, make_regression

__all__ = ["make_blobs", "make_mvg", "make_regression"]
