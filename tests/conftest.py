from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_UNIT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from cuml_spark.core.session import get_spark

    s = get_spark("cuml_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
