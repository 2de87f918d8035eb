from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_UNIT = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# size-tiered parametrization, mirroring the reference's
# unit_param/quality_param/stress_param selected by pytest flags
# (python/cuml/test/conftest.py:19-76, test/utils.py:156-166).  Default runs
# the unit tier only; --run-quality / --run-stress enable the bigger rows.
# ---------------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--run-quality", action="store_true", default=False,
                     help="also run quality-tier (larger) parametrizations")
    parser.addoption("--run-stress", action="store_true", default=False,
                     help="also run stress-tier parametrizations")


def pytest_collection_modifyitems(config, items):
    skip_q = pytest.mark.skip(reason="needs --run-quality")
    skip_s = pytest.mark.skip(reason="needs --run-stress")
    for item in items:
        if "quality" in item.keywords and not config.getoption("--run-quality"):
            item.add_marker(skip_q)
        if "stress" in item.keywords and not config.getoption("--run-stress"):
            item.add_marker(skip_s)


def unit_param(*args):
    return pytest.param(*args, id=f"unit-{args[0]}")


def quality_param(*args):
    return pytest.param(*args, marks=pytest.mark.quality, id=f"quality-{args[0]}")


def stress_param(*args):
    return pytest.param(*args, marks=pytest.mark.stress, id=f"stress-{args[0]}")


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
