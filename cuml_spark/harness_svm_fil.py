"""Harness queries: ForestInference (D-class) + kernel SVC (A-class).

A fixed imported forest is a pure decision function — the DuckDB oracle
replays the trees as CASE expressions, checking the scoring path
end-to-end (since r12 these small forests compile to native CASE WHEN
expressions; forests past the codegen cap keep the broadcast +
pandas-UDF traversal, and the two are pinned result-identical in
tests/test_fil.py).  SVC's SMO is iterative → rows-only; its quality gates
live in tests/test_svm.py (KKT conditions, XOR separation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuml_spark.fil import ForestInference
from cuml_spark.svm import SVC
from cuml_spark.core.session import read_table

# tree0: f0 < 2.5 ? (f1 < 0.5 ? +0.4 : -0.2) : -0.3 ; tree1: f1 < 2.0 ? +0.1 : -0.5
_TREES = [
    {
        "nodeid": 0, "split": "f0", "split_condition": 2.5, "yes": 1, "no": 2,
        "children": [
            {"nodeid": 1, "split": "f1", "split_condition": 0.5, "yes": 3, "no": 4,
             "children": [{"nodeid": 3, "leaf": 0.4}, {"nodeid": 4, "leaf": -0.2}]},
            {"nodeid": 2, "leaf": -0.3},
        ],
    },
    {
        "nodeid": 0, "split": "f1", "split_condition": 2.0, "yes": 1, "no": 2,
        "children": [{"nodeid": 1, "leaf": 0.1}, {"nodeid": 2, "leaf": -0.5}],
    },
]


def q_fil_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no ensure_parallelism: FIL scoring compiles to a map-only CASE WHEN
    # projection (zero Python boundary), so injecting a round-robin
    # repartition only adds a full-frame Exchange before a projection the
    # scan can feed directly (guide §2.4; interleaved ×4 at sf0.1:
    # 3.85 s with the shuffle vs 3.43 s without, B faster in all pairs)
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    feats = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_quantity") / 10.0).alias("f0"),
        (F.col("l_discount") * 10.0).alias("f1"),
    )
    fil = ForestInference.load_from_xgboost_json(_TREES, output="sigmoid")
    out = fil.predict(feats, ["f0", "f1"], out_col="score")
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.round("score", 6).alias("score"),
    )


_SQL_FIL_SCORE = """
WITH f AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity/10.0 AS f0, l_discount*10.0 AS f1
  FROM lineitem
), raw AS (
  SELECT l_orderkey, l_linenumber,
         (CASE WHEN f0 < 2.5 THEN (CASE WHEN f1 < 0.5 THEN 0.4 ELSE -0.2 END)
               ELSE -0.3 END)
         + (CASE WHEN f1 < 2.0 THEN 0.1 ELSE -0.5 END) AS s
  FROM f
)
SELECT l_orderkey, l_linenumber, round(1.0/(1.0 + exp(-s)), 6) AS score
FROM raw
"""


# LightGBM text model (the public Booster.save_model format, parsed
# dependency-free — fil.py load_from_lightgbm_text, reference surface
# fil.pyx:445-459):
# tree0: f0 <= 2.5 ? (f1 <= 0.5 ? +0.4 : -0.2) : -0.3
# tree1: f1 <= 0.45 ? +0.1 : -0.5
# LightGBM routes <= LEFT where xgboost routes < — and both thresholds
# land EXACTLY on attainable feature values (l_quantity=25 -> f0=2.5,
# l_discount=0.05 -> f1=0.5), so mis-imported routing flips real rows.
_LGB_MODEL_TEXT = """tree
version=v3
num_class=1
num_tree_per_iteration=1
label_index=0
max_feature_idx=1
objective=binary sigmoid:1
feature_names=f0 f1
feature_infos=none none

Tree=0
num_leaves=3
num_cat=0
split_feature=0 1
threshold=2.5 0.5
decision_type=2 2
left_child=1 -1
right_child=-3 -2
leaf_value=0.4 -0.2 -0.3
shrinkage=1

Tree=1
num_leaves=2
num_cat=0
split_feature=1
threshold=0.45
decision_type=2
left_child=-1
right_child=-2
leaf_value=0.1 -0.5
shrinkage=1

end of trees
"""


def q_fil_lightgbm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ForestInference over an imported LightGBM TEXT model (r12 —
    closes the last closable reference-surface refusal, VERDICT r11
    #4): same scoring path as fil_score, but the
    trees come from the LightGBM save_model format with its <=-left
    routing and the binary objective's sigmoid, both of which the
    oracle replays as CASE expressions on rows that sit exactly ON the
    thresholds."""
    # map-only scoring — same no-repartition rationale as q_fil_score
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    feats = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_quantity") / 10.0).alias("f0"),
        (F.col("l_discount") * 10.0).alias("f1"),
    )
    fil = ForestInference.load_from_lightgbm_text(_LGB_MODEL_TEXT)
    out = fil.predict(feats, ["f0", "f1"], out_col="score")
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.round("score", 6).alias("score"),
    )


_SQL_FIL_LIGHTGBM_SCORE = """
WITH f AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity/10.0 AS f0, l_discount*10.0 AS f1
  FROM lineitem
), raw AS (
  SELECT l_orderkey, l_linenumber,
         (CASE WHEN f0 <= 2.5 THEN (CASE WHEN f1 <= 0.5 THEN 0.4 ELSE -0.2 END)
               ELSE -0.3 END)
         + (CASE WHEN f1 <= 0.45 THEN 0.1 ELSE -0.5 END) AS s
  FROM f
)
SELECT l_orderkey, l_linenumber, round(1.0/(1.0 + exp(-s)), 6) AS score
FROM raw
"""


def q_svc_rule_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SVC (exact SMO on a bounded sample, distributed scoring) learning a
    linear rule on customer features.  A-class fit; D-class projection:
    exact scored-row count + fixed accuracy floor (0.98 observed; a broken
    SMO or kernel regresses toward the 0.5 base rate)."""
    cust = read_table(spark, f"{sf_dir}/customer.parquet")
    pts = cust.select(
        "c_custkey",
        (F.col("c_acctbal") / 1000.0).alias("x1"),
        ((F.col("c_custkey") % 89) / 8.9).alias("x2"),
    ).withColumn("y", ((F.col("x1") + F.col("x2")) > 9.0).cast("double"))
    train = pts.filter(F.col("c_custkey") % 5 == 0)  # bounded deterministic sample
    # the (fit → score) chain and the row count are independent — overlap
    # them (guide §2.6; results identical, r12)
    from cuml_spark.core.session import run_overlapped

    acc, n = run_overlapped(
        lambda: SVC(kernel="linear", C=1.0, max_iter=60)
        .fit(train, ["x1", "x2"], "y").score(pts, ["x1", "x2"], "y"),
        pts.count,
    )
    return spark.createDataFrame(
        [(int(n), bool(acc >= 0.9))], "n_scored long, acc_ge_090 boolean"
    )


_SQL_SVC_RULE_ACCURACY = "SELECT count(*) AS n_scored, true AS acc_ge_090 FROM customer"


QUERIES_SVM_FIL = {
    "fil_score": q_fil_score,
    "fil_lightgbm_score": q_fil_lightgbm_score,
    "svc_rule_accuracy": q_svc_rule_accuracy,
}

ORACLES_SVM_FIL = {
    "fil_score": _SQL_FIL_SCORE,
    "fil_lightgbm_score": _SQL_FIL_LIGHTGBM_SCORE,
    "svc_rule_accuracy": _SQL_SVC_RULE_ACCURACY,
}
