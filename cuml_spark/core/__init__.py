from cuml_spark.core.base import Base
from cuml_spark.core.session import get_spark
from cuml_spark.core.validation import check_features, to_double_cols

__all__ = ["Base", "get_spark", "check_features", "to_double_cols"]
