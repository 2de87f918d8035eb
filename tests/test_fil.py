"""ForestInference vs hand-computed traversals (D-class given a fixed model)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from cuml_spark.fil import ForestInference

# two hand-built xgboost-dump trees:
# tree0: f0 < 1.0 ? (f1 < 0.5 ? +0.4 : -0.2) : -0.3
# tree1: f1 < 2.0 ? +0.1 : -0.5
_TREE0 = {
    "nodeid": 0, "split": "f0", "split_condition": 1.0, "yes": 1, "no": 2,
    "children": [
        {"nodeid": 1, "split": "f1", "split_condition": 0.5, "yes": 3, "no": 4,
         "children": [{"nodeid": 3, "leaf": 0.4}, {"nodeid": 4, "leaf": -0.2}]},
        {"nodeid": 2, "leaf": -0.3},
    ],
}
_TREE1 = {
    "nodeid": 0, "split": "f1", "split_condition": 2.0, "yes": 1, "no": 2,
    "children": [{"nodeid": 1, "leaf": 0.1}, {"nodeid": 2, "leaf": -0.5}],
}


def _manual_score(x0: float, x1: float) -> float:
    t0 = (0.4 if x1 < 0.5 else -0.2) if x0 < 1.0 else -0.3
    t1 = 0.1 if x1 < 2.0 else -0.5
    return t0 + t1


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.RandomState(2)
    rows = [(i, float(rng.uniform(-1, 3)), float(rng.uniform(-1, 3)))
            for i in range(200)]
    return spark.createDataFrame(rows, "id int, f0 double, f1 double").cache()


def test_fil_raw_matches_manual(points_df):
    fil = ForestInference.load_from_xgboost_json(
        json.dumps([_TREE0, _TREE1]), output="raw"
    )
    out = fil.predict(points_df, ["f0", "f1"]).toPandas().sort_values("id")
    expect = [_manual_score(r.f0, r.f1) for r in out.itertuples()]
    np.testing.assert_allclose(out["prediction"].to_numpy(), expect, rtol=1e-12)


def test_fil_sigmoid_and_class(points_df):
    fil = ForestInference.load_from_xgboost_json([_TREE0, _TREE1], output="sigmoid")
    out = fil.predict(points_df, ["f0", "f1"]).toPandas().sort_values("id")
    raw = np.array([_manual_score(r.f0, r.f1) for r in out.itertuples()])
    np.testing.assert_allclose(
        out["prediction"].to_numpy(), 1 / (1 + np.exp(-raw)), rtol=1e-12
    )
    cls = ForestInference.load_from_xgboost_json([_TREE0, _TREE1], output="class")
    got = cls.predict(points_df, ["f0", "f1"]).toPandas().sort_values("id")
    np.testing.assert_array_equal(
        got["prediction"].to_numpy(), (1 / (1 + np.exp(-raw)) > 0.5).astype(float)
    )


def test_fil_from_arrays_average(points_df):
    # stumps in array form: f0 < 0 ? 1 : 3  and  constant 2
    trees = [
        {"feature": [0, -1, -1], "threshold": [0.0, 0, 0],
         "left": [1, -1, -1], "right": [2, -1, -1], "value": [0.0, 1.0, 3.0]},
        {"feature": [-1], "threshold": [0.0], "left": [-1], "right": [-1],
         "value": [2.0]},
    ]
    fil = ForestInference.load_from_arrays(trees, output="raw", average=True)
    out = fil.predict(points_df, ["f0", "f1"]).toPandas()
    expect = ((out["f0"] < 0).astype(float) * 1.0 + (out["f0"] >= 0) * 3.0 + 2.0) / 2
    np.testing.assert_allclose(out["prediction"].to_numpy(), expect.to_numpy(), rtol=1e-12)


def test_fil_load_from_file(tmp_path, points_df):
    """File entry point (fil.pyx:459 ``load``): JSON dumps parse natively;
    raw prediction equals the manual traversal; binary/treelite formats
    raise naming the missing dependency."""
    p = tmp_path / "model.json"
    p.write_text(json.dumps([_TREE0, _TREE1]))
    fil = ForestInference.load(str(p))
    got = {
        r["id"]: r["score"]
        for r in fil.predict(points_df, ["f0", "f1"], out_col="score").collect()
    }
    pdf = points_df.toPandas()
    for _, row in pdf.iterrows():
        assert abs(got[row["id"]] - _manual_score(row["f0"], row["f1"])) < 1e-9

    clf = ForestInference.load(str(p), output_class=True, threshold=0.1)
    vals = {r["score"] for r in clf.predict(points_df, ["f0", "f1"], out_col="score").collect()}
    assert vals <= {0.0, 1.0}

    with pytest.raises(NotImplementedError, match="treelite"):
        ForestInference.load(str(p), model_type="lightgbm")
    binp = tmp_path / "model.bin"
    binp.write_bytes(b"\x00\x01binary-not-json")
    with pytest.raises(NotImplementedError, match="treelite"):
        ForestInference.load(str(binp))


# ---- load_from_sklearn (reference fil.pyx:445) -----------------------------
# sklearn is not installed in this environment, so the import surface is
# exercised with structural stand-ins exposing the exact public attributes
# the converter duck-types over (estimators_, tree_.children_left/right/
# feature/threshold/value, learning_rate, init_.constant_).


class _SkTree:
    def __init__(self, cl, cr, feat, thr, value):
        self.children_left = np.asarray(cl)
        self.children_right = np.asarray(cr)
        self.feature = np.asarray(feat)
        self.threshold = np.asarray(thr)
        self.value = np.asarray(value, dtype=np.float64)


class _SkEst:
    def __init__(self, tree):
        self.tree_ = tree


def _reg_tree(leaf_lo, leaf_hi, thr=0.5):
    # node0: f0 <= thr ? node1(leaf_lo) : node2(leaf_hi)
    return _SkTree([1, -1, -1], [2, -1, -1], [0, -2, -2], [thr, -2.0, -2.0],
                   [[[0.0]], [[leaf_lo]], [[leaf_hi]]])


class RandomForestRegressor:  # structural stand-in, name drives detection
    def __init__(self, trees):
        self.estimators_ = [_SkEst(t) for t in trees]


class RandomForestClassifier:
    def __init__(self, trees):
        self.estimators_ = [_SkEst(t) for t in trees]


class GradientBoostingRegressor:
    def __init__(self, trees, lr, const):
        self.estimators_ = np.empty((len(trees), 1), dtype=object)
        for i, t in enumerate(trees):
            self.estimators_[i, 0] = _SkEst(t)
        self.learning_rate = lr

        class _Init:
            constant_ = np.array([[const]])

        self.init_ = _Init()


def test_fil_sklearn_rf_regressor(spark):
    rf = RandomForestRegressor([_reg_tree(1.0, 3.0), _reg_tree(2.0, 6.0)])
    fi = ForestInference.load_from_sklearn(rf)
    df = spark.createDataFrame(
        [(0, 0.2), (1, 0.5), (2, 0.9)], "pid long, f0 double")
    got = {r["pid"]: r["prediction"]
           for r in fi.predict(df, ["f0"]).collect()}
    # sklearn routes f0 <= 0.5 LEFT: pid 1 sits exactly on the threshold
    assert got[0] == pytest.approx((1.0 + 2.0) / 2)
    assert got[1] == pytest.approx((1.0 + 2.0) / 2)
    assert got[2] == pytest.approx((3.0 + 6.0) / 2)


def test_fil_sklearn_rf_classifier_proba_and_class(spark):
    def clf_tree(counts_lo, counts_hi):
        return _SkTree([1, -1, -1], [2, -1, -1], [0, -2, -2], [0.5, -2, -2],
                       [[[0.0, 0.0]], counts_lo, counts_hi])

    rf = RandomForestClassifier([
        clf_tree([[8.0, 2.0]], [[1.0, 9.0]]),   # p1: 0.2 / 0.9
        clf_tree([[6.0, 4.0]], [[5.0, 5.0]]),   # p1: 0.4 / 0.5
    ])
    df = spark.createDataFrame([(0, 0.1), (1, 0.8)], "pid long, f0 double")
    proba = {r["pid"]: r["prediction"] for r in
             ForestInference.load_from_sklearn(rf).predict(df, ["f0"]).collect()}
    assert proba[0] == pytest.approx((0.2 + 0.4) / 2)  # predict_proba[:, 1]
    assert proba[1] == pytest.approx((0.9 + 0.5) / 2)
    cls = {r["pid"]: r["prediction"] for r in
           ForestInference.load_from_sklearn(rf, output_class=True)
           .predict(df, ["f0"]).collect()}
    # thresholded on the averaged probability directly — no sigmoid
    assert (cls[0], cls[1]) == (0.0, 1.0)


def test_fil_sklearn_gradient_boosting(spark):
    gb = GradientBoostingRegressor(
        [_reg_tree(-1.0, 2.0), _reg_tree(0.5, -0.5)], lr=0.1, const=3.0)
    fi = ForestInference.load_from_sklearn(gb)
    df = spark.createDataFrame([(0, 0.0), (1, 1.0)], "pid long, f0 double")
    got = {r["pid"]: r["prediction"] for r in fi.predict(df, ["f0"]).collect()}
    assert got[0] == pytest.approx(3.0 + 0.1 * (-1.0 + 0.5))
    assert got[1] == pytest.approx(3.0 + 0.1 * (2.0 - 0.5))


def test_fil_sklearn_rejects_unfitted():
    class RandomForestRegressorUnfit:
        pass

    with pytest.raises(ValueError, match="estimators_"):
        ForestInference.load_from_sklearn(RandomForestRegressorUnfit())


class GradientBoostingClassifier:
    """Stand-in matching REAL sklearn: default init_ is a DummyClassifier
    exposing class_prior_ (it has NO constant_ attribute), so the raw-score
    constant is the prior log-odds."""

    def __init__(self, trees, lr, prior1):
        self.estimators_ = np.empty((len(trees), 1), dtype=object)
        for i, t in enumerate(trees):
            self.estimators_[i, 0] = _SkEst(t)
        self.learning_rate = lr

        class _DummyInit:
            class_prior_ = np.array([1.0 - prior1, prior1])

        self.init_ = _DummyInit()


def test_fil_sklearn_gb_classifier_prior_logodds(spark):
    prior1 = 0.9  # imbalanced — the dropped-base-score failure mode
    gb = GradientBoostingClassifier(
        [_reg_tree(-1.0, 2.0), _reg_tree(0.5, -0.5)], lr=0.1, prior1=prior1)
    fi = ForestInference.load_from_sklearn(gb)
    df = spark.createDataFrame([(0, 0.0), (1, 1.0)], "pid long, f0 double")
    got = {r["pid"]: r["prediction"] for r in fi.predict(df, ["f0"]).collect()}
    base = np.log(prior1 / (1.0 - prior1))
    exp0 = 1.0 / (1.0 + np.exp(-(base + 0.1 * (-1.0 + 0.5))))
    exp1 = 1.0 / (1.0 + np.exp(-(base + 0.1 * (2.0 - 0.5))))
    assert got[0] == pytest.approx(exp0)
    assert got[1] == pytest.approx(exp1)


def test_fil_sklearn_gb_unrecognized_init_raises(spark):
    gb = GradientBoostingRegressor([_reg_tree(-1.0, 2.0)], lr=0.1, const=3.0)

    class _Opaque:
        pass

    gb.init_ = _Opaque()  # neither class_prior_ nor constant_
    with pytest.raises(ValueError, match="init_"):
        ForestInference.load_from_sklearn(gb)


def test_fil_sklearn_gb_init_zero(spark):
    gb = GradientBoostingRegressor([_reg_tree(-1.0, 2.0)], lr=0.1, const=3.0)
    gb.init_ = "zero"  # sklearn keeps the literal string for init='zero'
    fi = ForestInference.load_from_sklearn(gb)
    df = spark.createDataFrame([(0, 0.0), (1, 1.0)], "pid long, f0 double")
    got = {r["pid"]: r["prediction"] for r in fi.predict(df, ["f0"]).collect()}
    assert got[0] == pytest.approx(0.1 * -1.0)
    assert got[1] == pytest.approx(0.1 * 2.0)


# -- LightGBM text-format import (VERDICT r11 #4) ---------------------------

# hand-built LightGBM text model (the public Booster.save_model format):
# tree0: f0 <= 1.0 ? (f1 <= 0.5 ? +0.4 : -0.2) : -0.3
# tree1: f1 <= 2.0 ? +0.1 : -0.5
# (same shape as the xgboost fixtures but with LightGBM's <= routing —
# a value exactly ON a threshold distinguishes the two libraries)
_LGB_MODEL = """tree
version=v3
num_class=1
num_tree_per_iteration=1
label_index=0
max_feature_idx=1
objective=regression
feature_names=f0 f1
feature_infos=none none
tree_sizes=100 60

Tree=0
num_leaves=3
num_cat=0
split_feature=0 1
split_gain=1 1
threshold=1.0 0.5
decision_type=2 2
left_child=1 -1
right_child=-3 -2
leaf_value=0.4 -0.2 -0.3
leaf_weight=1 1 1
leaf_count=1 1 1
internal_value=0 0
internal_weight=0 0
internal_count=3 2
is_linear=0
shrinkage=1

Tree=1
num_leaves=2
num_cat=0
split_feature=1
split_gain=1
threshold=2.0
decision_type=2
left_child=-1
right_child=-2
leaf_value=0.1 -0.5
leaf_weight=1 1
leaf_count=1 1
internal_value=0
internal_weight=0
internal_count=2
is_linear=0
shrinkage=1

end of trees

feature_importances:
f0=1
f1=2

parameters:
[boosting: gbdt]
[objective: regression]

end of parameters
"""


def _manual_lgb_score(x0: float, x1: float) -> float:
    t0 = (0.4 if x1 <= 0.5 else -0.2) if x0 <= 1.0 else -0.3
    t1 = 0.1 if x1 <= 2.0 else -0.5
    return t0 + t1


def test_fil_lightgbm_text_matches_manual(points_df):
    fil = ForestInference.load_from_lightgbm_text(_LGB_MODEL)
    assert fil.output == "raw"  # regression objective
    out = fil.predict(points_df, ["f0", "f1"]).toPandas().sort_values("id")
    expect = [_manual_lgb_score(r.f0, r.f1) for r in out.itertuples()]
    np.testing.assert_allclose(out["prediction"].to_numpy(), expect, rtol=1e-12)


def test_fil_lightgbm_le_routing_on_boundary(spark):
    """A value exactly ON the threshold goes LEFT (<=) — the rule that
    separates LightGBM from xgboost (<); misrouting flips the leaf."""
    fil = ForestInference.load_from_lightgbm_text(_LGB_MODEL)
    df = spark.createDataFrame(
        [(0, 1.0, 0.5), (1, 1.0, 2.0)], "id int, f0 double, f1 double")
    got = {r["id"]: r["prediction"]
           for r in fil.predict(df, ["f0", "f1"]).collect()}
    assert got[0] == pytest.approx(0.4 + 0.1)    # both on-threshold -> left
    assert got[1] == pytest.approx(-0.2 + 0.1)   # f1=2.0 on tree1 edge


def test_fil_lightgbm_binary_sigmoid_and_file_load(tmp_path, spark):
    """objective=binary scores through sigmoid with the model's own
    sigmoid slope folded in at load; the load() file entry point routes
    model_type='lightgbm' text models to the same parser."""
    binary = _LGB_MODEL.replace(
        "objective=regression", "objective=binary sigmoid:2")
    fil = ForestInference.load_from_lightgbm_text(binary)
    assert fil.output == "sigmoid"
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id int, f0 double, f1 double")
    got = fil.predict(df, ["f0", "f1"]).collect()[0]["prediction"]
    raw = 2.0 * _manual_lgb_score(0.0, 0.0)  # slope folded into leaves
    assert got == pytest.approx(1.0 / (1.0 + np.exp(-raw)))

    p = tmp_path / "model.txt"
    p.write_text(binary)
    via_file = ForestInference.load(
        str(p), model_type="lightgbm", output_class=True, threshold=0.5)
    assert via_file.output == "class"
    cls_val = via_file.predict(df, ["f0", "f1"]).collect()[0]["prediction"]
    assert cls_val == (1.0 if 1.0 / (1.0 + np.exp(-raw)) > 0.5 else 0.0)


def test_fil_lightgbm_nan_default_direction(spark):
    """decision_type bit 1 sets the NaN default branch when missing
    type is NaN (bits 2-3 = 2); with missing type none LightGBM scores
    NaN as 0.0 — both pinned here."""
    # missing=NaN, default RIGHT on tree0's root (bit1 clear): 10 = cat0
    # | default0 | missing NaN(2<<2=8) -> decision_type=8; tree1 default
    # LEFT with NaN missing: 8|2=10
    m = _LGB_MODEL.replace(
        "decision_type=2 2", "decision_type=8 2").replace(
        "decision_type=2\nleft_child=-1", "decision_type=10\nleft_child=-1")
    fil = ForestInference.load_from_lightgbm_text(m)
    df = spark.createDataFrame(
        [(0, float("nan"), 0.0), (1, 0.0, float("nan"))],
        "id int, f0 double, f1 double")
    got = {r["id"]: r["prediction"]
           for r in fil.predict(df, ["f0", "f1"]).collect()}
    # id0: f0 NaN -> RIGHT at root -> -0.3; tree1 f1=0.0<=2.0 -> 0.1
    assert got[0] == pytest.approx(-0.3 + 0.1)
    # id1: f0=0.0<=1.0 -> internal1, f1 NaN + missing none -> scored as
    # 0.0<=0.5 -> left 0.4; tree1 f1 NaN missing NaN default LEFT -> 0.1
    assert got[1] == pytest.approx(0.4 + 0.1)


def test_fil_lightgbm_refusals():
    with pytest.raises(NotImplementedError, match="multiclass"):
        ForestInference.load_from_lightgbm_text(
            _LGB_MODEL.replace("num_class=1", "num_class=3").replace(
                "num_tree_per_iteration=1", "num_tree_per_iteration=3"))
    with pytest.raises(NotImplementedError, match="categorical"):
        ForestInference.load_from_lightgbm_text(
            _LGB_MODEL.replace("decision_type=2 2", "decision_type=3 2"))
    with pytest.raises(NotImplementedError, match="zero_as_missing"):
        ForestInference.load_from_lightgbm_text(
            _LGB_MODEL.replace("decision_type=2 2", "decision_type=6 2"))
    with pytest.raises(ValueError, match="no Tree"):
        ForestInference.load_from_lightgbm_text("tree\nversion=v3\n")


def test_fil_lightgbm_single_leaf_tree(spark):
    """num_leaves=1 trees (a boosting round that learned a constant)
    contribute their single leaf unconditionally."""
    stump = """tree
version=v3
num_class=1
num_tree_per_iteration=1
max_feature_idx=1
objective=regression

Tree=0
num_leaves=1
num_cat=0
leaf_value=0.25
shrinkage=1

end of trees
"""
    fil = ForestInference.load_from_lightgbm_text(stump)
    df = spark.createDataFrame([(0, 9.0, 9.0)], "id int, f0 double, f1 double")
    assert fil.predict(df, ["f0", "f1"]).collect()[0]["prediction"] == \
        pytest.approx(0.25)


def test_fil_codegen_and_arrow_paths_identical(spark):
    """The native-expression compile and the Arrow traversal are
    result-identical — every output mode, on a frame that exercises
    threshold-exact values, nulls and NaN (both default directions)."""
    import math

    trees = [
        {"feature": [0, 1, -1, -1, -1], "threshold": [2.5, 0.5, 0, 0, 0],
         "left": [1, 3, -1, -1, -1], "right": [2, 4, -1, -1, -1],
         "value": [0.0, 0.0, -0.3, 0.4, -0.2]},
        {"feature": [1, -1, -1], "threshold": [0.45, 0, 0],
         "left": [1, -1, -1], "right": [2, -1, -1],
         "value": [0.0, 0.1, -0.5]},
    ]
    rows = [(i, float(x0), float(x1)) for i, (x0, x1) in enumerate(
        [(2.5, 0.45), (2.5, 0.5), (0.0, 1.0), (9.0, -1.0), (2.4999, 0.451)])]
    rows += [(100, None, 0.2), (101, 1.0, None),
             (102, float("nan"), float("nan"))]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double")
    for output in ("raw", "sigmoid", "class", "threshold"):
        for avg in (False, True):
            fil = ForestInference.load_from_arrays(
                trees, output=output, average=avg)
            # flip default_left on one node so null/NaN routing is
            # exercised in BOTH directions
            fil._trees[0].default_left[0] = True
            a = {r["id"]: r["p"] for r in fil.predict(
                df, ["f0", "f1"], "p", codegen="always").collect()}
            b = {r["id"]: r["p"] for r in fil.predict(
                df, ["f0", "f1"], "p", codegen="never").collect()}
            assert set(a) == set(b)
            for k in a:
                if output == "sigmoid":
                    # JVM Math.exp and numpy exp may differ by 1 ulp
                    # (IEEE 754 does not mandate correctly-rounded exp);
                    # raw arithmetic and the class/threshold cuts away
                    # from the boundary stay bit-exact below
                    assert abs(a[k] - b[k]) <= 4 * math.ulp(b[k]), (
                        avg, k, a[k], b[k])
                else:
                    assert (a[k] == b[k]
                            or (math.isnan(a[k]) and math.isnan(b[k]))), (
                        output, avg, k, a[k], b[k])


def test_fil_codegen_threshold_routes_paths(spark):
    """auto mode: small forests take the expression path (no Python
    workers in the plan), forests past CODEGEN_MAX_NODES keep Arrow."""
    df = spark.createDataFrame([(1.0,)], "f0 double")
    small = ForestInference.load_from_arrays(
        [{"feature": [-1], "threshold": [0], "left": [-1], "right": [-1],
          "value": [1.0]}])
    plan = small.predict(df, ["f0"], "p")._jdf.queryExecution(
        ).executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    big_tree = {"feature": [-1] * 600, "threshold": [0] * 600,
                "left": [-1] * 600, "right": [-1] * 600,
                "value": [0.5] * 600}
    big = ForestInference.load_from_arrays([big_tree])
    plan = big.predict(df, ["f0"], "p")._jdf.queryExecution(
        ).executedPlan().toString()
    assert "ArrowEvalPython" in plan
    with pytest.raises(ValueError, match="codegen"):
        small.predict(df, ["f0"], "p", codegen="sometimes")


def _native_model(objective="binary:logistic", base_score="0.5",
                  num_class="0", booster="gbtree", categories=None):
    """Hand-built native save_model JSON equivalent to _TREE0/_TREE1:
    the flat-array layout xgboost's Booster.save_model('model.json')
    writes (split_conditions carry leaf values at leaves)."""
    trees = [
        {  # tree0: nodes 0,1,2(leaf -0.3),3(leaf .4),4(leaf -.2)
            "left_children": [1, 3, -1, -1, -1],
            "right_children": [2, 4, -1, -1, -1],
            "split_indices": [0, 1, 0, 0, 0],
            "split_conditions": [1.0, 0.5, -0.3, 0.4, -0.2],
            "default_left": [1, 1, 0, 0, 0],
            "categories": categories or [],
        },
        {
            "left_children": [1, -1, -1],
            "right_children": [2, -1, -1],
            "split_indices": [1, 0, 0],
            "split_conditions": [2.0, 0.1, -0.5],
            "default_left": [1, 0, 0],
            "categories": [],
        },
    ]
    return {
        "learner": {
            "gradient_booster": {"name": booster, "model": {"trees": trees}},
            "learner_model_param": {"base_score": base_score,
                                    "num_class": num_class},
            "objective": {"name": objective},
        },
        "version": [2, 0, 0],
    }


def test_fil_xgboost_native_model_matches_dump(tmp_path, points_df):
    """The native save_model JSON scores identically to the equivalent
    get_dump trees — same < routing, leaf values from split_conditions —
    and load() auto-detects the layout by the 'learner' key."""
    import math

    dump = ForestInference.load_from_xgboost_json(
        json.dumps([_TREE0, _TREE1]), output="sigmoid")
    native = ForestInference.load_from_xgboost_model(_native_model())
    a = {r["id"]: r["p"] for r in dump.predict(
        points_df, ["f0", "f1"], "p").collect()}
    b = {r["id"]: r["p"] for r in native.predict(
        points_df, ["f0", "f1"], "p").collect()}
    assert a == b  # base_score 0.5 → logit 0 → identical margins
    path = tmp_path / "model.json"
    path.write_text(json.dumps(_native_model()))
    from_file = ForestInference.load(str(path))
    c = {r["id"]: r["p"] for r in from_file.predict(
        points_df, ["f0", "f1"], "p").collect()}
    assert c == b
    # non-default base_score enters through the logit link (xgboost's
    # ProbToMargin), NOT as a raw addend
    shifted = ForestInference.load_from_xgboost_model(
        _native_model(base_score="0.25"))
    assert shifted.base_score == pytest.approx(math.log(0.25 / 0.75))
    d = {r["id"]: r["p"] for r in shifted.predict(
        points_df, ["f0", "f1"], "p").collect()}
    for k in b:
        raw_b = math.log(b[k] / (1 - b[k]))
        assert d[k] == pytest.approx(
            1 / (1 + math.exp(-(raw_b + shifted.base_score))), rel=1e-9)
    # regression objective: identity link, raw output
    reg = ForestInference.load_from_xgboost_model(
        _native_model(objective="reg:squarederror", base_score="1.5"))
    r = {row["id"]: row["p"] for row in reg.predict(
        points_df, ["f0", "f1"], "p").collect()}
    pts = {row["id"]: (row["f0"], row["f1"]) for row in points_df.collect()}
    for k, (x0, x1) in pts.items():
        assert r[k] == pytest.approx(_manual_score(x0, x1) + 1.5, rel=1e-12)


def test_fil_xgboost_native_model_refusals():
    with pytest.raises(NotImplementedError, match="gblinear"):
        ForestInference.load_from_xgboost_model(
            _native_model(booster="gblinear"))
    with pytest.raises(NotImplementedError, match="multiclass"):
        ForestInference.load_from_xgboost_model(_native_model(num_class="3"))
    with pytest.raises(NotImplementedError, match="objective"):
        ForestInference.load_from_xgboost_model(
            _native_model(objective="rank:pairwise"))
    with pytest.raises(NotImplementedError, match="categorical"):
        ForestInference.load_from_xgboost_model(
            _native_model(categories=[1]))
    with pytest.raises(ValueError, match="save_model"):
        ForestInference.load_from_xgboost_model({"not": "a model"})
