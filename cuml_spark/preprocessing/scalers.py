"""Column scalers built on the stats prims (meanCenter/stddev/minmax —
src_prims/stats/{mean_center,stddev,minmax}.h).  Fit = one aggregate scan;
transform = pure expressions over the broadcast 1-row stats."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.core.base import Base
from cuml_spark.core.validation import check_features


class StandardScaler(Base):
    def __init__(self, with_mean: bool = True, with_std: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.with_mean = with_mean
        self.with_std = with_std
        self.mean_: dict | None = None
        self.scale_: dict | None = None
        self._cols: list[str] | None = None

    def fit(self, df: DataFrame, cols: list[str]) -> "StandardScaler":
        check_features(df, cols)
        row = df.agg(
            *[F.avg(c).alias(f"m_{c}") for c in cols],
            *[F.stddev_pop(c).alias(f"s_{c}") for c in cols],
        ).first()
        self.mean_ = {c: row[f"m_{c}"] for c in cols}
        self.scale_ = {c: (row[f"s_{c}"] or 1.0) or 1.0 for c in cols}
        self._cols = list(cols)
        return self

    def transform(self, df: DataFrame, cols: list[str] | None = None) -> DataFrame:
        cols = cols or self._cols
        if self.mean_ is None:
            raise RuntimeError("not fitted")
        out = []
        for c in cols:
            e = F.col(c).cast("double")
            if self.with_mean:
                e = e - float(self.mean_[c])
            if self.with_std:
                e = e / float(self.scale_[c] if self.scale_[c] != 0 else 1.0)
            out.append(e.alias(c))
        keep = [c for c in df.columns if c not in cols]
        return df.select(*keep, *out)

    def fit_transform(self, df: DataFrame, cols: list[str]) -> DataFrame:
        return self.fit(df, cols).transform(df, cols)


class MinMaxScaler(Base):
    def __init__(self, feature_range: tuple[float, float] = (0.0, 1.0), **kwargs):
        super().__init__(**kwargs)
        self.feature_range = feature_range
        self.data_min_: dict | None = None
        self.data_max_: dict | None = None
        self._cols: list[str] | None = None

    def fit(self, df: DataFrame, cols: list[str]) -> "MinMaxScaler":
        check_features(df, cols)
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).first()
        self.data_min_ = {c: row[f"lo_{c}"] for c in cols}
        self.data_max_ = {c: row[f"hi_{c}"] for c in cols}
        self._cols = list(cols)
        return self

    def transform(self, df: DataFrame, cols: list[str] | None = None) -> DataFrame:
        cols = cols or self._cols
        if self.data_min_ is None:
            raise RuntimeError("not fitted")
        a, b = self.feature_range
        out = []
        for c in cols:
            lo, hi = float(self.data_min_[c]), float(self.data_max_[c])
            span = (hi - lo) or 1.0
            e = (F.col(c).cast("double") - lo) / span * (b - a) + a
            out.append(e.alias(c))
        keep = [c for c in df.columns if c not in cols]
        return df.select(*keep, *out)

    def fit_transform(self, df: DataFrame, cols: list[str]) -> DataFrame:
        return self.fit(df, cols).transform(df, cols)
