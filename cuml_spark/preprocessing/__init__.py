from cuml_spark.preprocessing.model_selection import train_test_split
from cuml_spark.preprocessing.label_encoder import LabelEncoder
from cuml_spark.preprocessing.scalers import StandardScaler, MinMaxScaler

__all__ = ["train_test_split", "LabelEncoder", "StandardScaler", "MinMaxScaler"]
