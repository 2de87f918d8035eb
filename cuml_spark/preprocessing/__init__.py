from cuml_spark.preprocessing.model_selection import (
    group_aware_split,
    train_test_split,
)
from cuml_spark.preprocessing.label_encoder import LabelEncoder
from cuml_spark.preprocessing.scalers import StandardScaler, MinMaxScaler

__all__ = ["train_test_split", "group_aware_split", "LabelEncoder",
           "StandardScaler", "MinMaxScaler"]
