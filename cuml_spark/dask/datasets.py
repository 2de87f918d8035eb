"""MNMG dataset generation parity (dask/datasets/blobs.py make_blobs —
already distributed blockwise here, datasets/generators.py)."""
from cuml_spark.datasets.generators import make_blobs, make_regression  # noqa: F401
