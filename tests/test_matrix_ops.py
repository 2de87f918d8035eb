"""sort_cols_per_row / gather / matrix_math (columnWiseSort.h, gather.h:142,
matrix/math.h) — closed-form checks."""

import pytest
from pyspark.sql import functions as F

from cuml_spark.ops import gather, matrix_math, sort_cols_per_row


@pytest.fixture(scope="module")
def mat(spark):
    return spark.createDataFrame(
        [(0, 3.0, 1.0, 2.0), (1, -1.0, 5.0, 0.0), (2, 4.0, 4.0, -2.0)],
        "rid long, a double, b double, c double",
    )


def test_sort_cols_per_row(mat):
    out = {r["rid"]: r["sorted"] for r in
           sort_cols_per_row(mat, ["a", "b", "c"]).collect()}
    assert out[0] == [1.0, 2.0, 3.0]
    assert out[1] == [-1.0, 0.0, 5.0]
    desc = {r["rid"]: r["sorted"] for r in
            sort_cols_per_row(mat, ["a", "b", "c"], ascending=False).collect()}
    assert desc[2] == [4.0, 4.0, -2.0]


def test_gather(spark, mat):
    idx = spark.createDataFrame([(2,), (0,)], "idx long")
    got = sorted(r["rid"] for r in gather(mat, idx, "rid").collect())
    assert got == [0, 2]


def test_matrix_math(mat):
    sq = {r["rid"]: r["a"] for r in matrix_math(mat, ["a"], "sq").collect()}
    assert sq[0] == 9.0 and sq[1] == 1.0
    halved = {r["rid"]: r["b"] for r in
              matrix_math(mat, ["b"], "div", 2.0).collect()}
    assert halved[1] == 2.5
    with pytest.raises(ValueError):
        matrix_math(mat, ["a"], "nope")
    with pytest.raises(ValueError):
        matrix_math(mat, ["a"], "pow")
