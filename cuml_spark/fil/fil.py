"""ForestInference (FIL) — batch scoring of imported tree ensembles.

Reference: python/cuml/fil/fil.pyx:315 (``load:459`` via treelite,
``load_from_sklearn:445``, ``predict:375``) → cpp/src/fil/fil.cu:474-536
(init_dense / from_treelite / predict) with output transforms
(output_t in cpp/include/cuml/fil/fil.h: RAW / SIGMOID / threshold / AVG).

Spark-native, two scoring tiers: forests at or under
``CODEGEN_MAX_NODES`` total nodes compile to native nested CASE WHEN
expressions (whole-stage codegen, no Python workers, no Arrow transfer
of the feature columns); bigger forests flatten every tree into numpy
arrays (feature idx, threshold, children, leaf value), BROADCAST them, and
score with an Arrow-batched pandas UDF that walks all trees vectorized over
the batch (the executor-side analog of FIL's per-block tree walk).  treelite
isn't a dependency here; the import surface is the XGBoost dump-model JSON
(``[{split,split_condition,yes,no,children,leaf}, ...]``), the same format
treelite itself consumes from XGBoost.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from cuml_spark.core.base import Base


class _FlatTree:
    """Arrays: children_left/right = node index or -1 at leaves.

    ``le_split`` encodes the library's split rule: xgboost sends x < thr
    left, sklearn sends x <= thr left — mixing them up flips every row that
    lands exactly on a threshold (common with integer-ish features)."""

    __slots__ = ("feature", "threshold", "left", "right", "value",
                 "default_left", "le_split")

    def __init__(self, n: int):
        self.feature = np.full(n, -1, dtype=np.int64)
        self.threshold = np.zeros(n)
        self.left = np.full(n, -1, dtype=np.int64)
        self.right = np.full(n, -1, dtype=np.int64)
        self.value = np.zeros(n)
        self.default_left = np.zeros(n, dtype=bool)
        self.le_split = False


def _flatten_xgb_tree(root: dict) -> _FlatTree:
    """XGBoost dump JSON node → flat arrays (nodeid-indexed)."""
    nodes: dict[int, dict] = {}

    def walk(nd: dict):
        nodes[nd["nodeid"]] = nd
        for ch in nd.get("children", []):
            walk(ch)

    walk(root)
    n = max(nodes) + 1
    t = _FlatTree(n)
    for nid, nd in nodes.items():
        if "leaf" in nd:
            t.value[nid] = float(nd["leaf"])
        else:
            f = nd["split"]
            t.feature[nid] = int(f[1:]) if isinstance(f, str) and f.startswith("f") else int(f)
            t.threshold[nid] = float(nd["split_condition"])
            t.left[nid] = int(nd["yes"])
            t.right[nid] = int(nd["no"])
            t.default_left[nid] = nd.get("missing", nd["yes"]) == nd["yes"]
    return t


def _flatten_sklearn_tree(tree, classifier: bool) -> _FlatTree:
    """sklearn ``DecisionTree*.tree_`` arrays → _FlatTree.  Duck-typed over
    the public tree_ attributes (children_left/right, feature, threshold,
    value of shape (n_nodes, n_outputs, n_classes)) so no sklearn import is
    needed to convert a pickled model.  Classifier leaves become the class-1
    probability (count / total) — averaging them across trees reproduces
    sklearn's ``predict_proba`` exactly."""
    cl = np.asarray(tree.children_left, dtype=np.int64)
    cr = np.asarray(tree.children_right, dtype=np.int64)
    n = len(cl)
    t = _FlatTree(n)
    leaf = cl < 0
    t.left, t.right = cl, cr
    t.feature = np.where(leaf, -1, np.asarray(tree.feature, dtype=np.int64))
    t.threshold = np.where(leaf, 0.0, np.asarray(tree.threshold, dtype=np.float64))
    val = np.asarray(tree.value, dtype=np.float64)
    if classifier:
        if val.shape[2] != 2:
            raise ValueError(
                f"only binary classifiers are supported (got {val.shape[2]} "
                "classes) — the reference FIL surface is binary too (fil.pyx:375)"
            )
        counts = val[:, 0, :]
        tot = counts.sum(axis=1)
        p1 = np.divide(counts[:, 1], tot, out=np.zeros(n), where=tot > 0)
        t.value = np.where(leaf, p1, 0.0)
    else:
        t.value = np.where(leaf, val[:, 0, 0], 0.0)
    t.le_split = True  # sklearn routes x <= threshold LEFT
    return t


def _flatten_lightgbm_tree(kv: dict[str, str]) -> _FlatTree:
    """One ``Tree=N`` block of a LightGBM text model → _FlatTree.

    LightGBM stores L-1 internal nodes and L leaves in separate arrays;
    a child value c >= 0 is an internal-node index, c < 0 is leaf ~c.
    Numerical splits route x <= threshold LEFT (le_split).
    decision_type bit 0 = categorical, bit 1 = default-left, bits 2-3 =
    missing type (0 none, 1 zero, 2 nan) — categorical and
    zero-as-missing models are refused rather than mis-scored; with
    missing type 'none' LightGBM scores NaN as 0.0, which maps to a
    per-node default direction of (0.0 <= threshold)."""
    n_leaves = int(kv["num_leaves"])
    if int((kv.get("num_cat", "").split() or ["0"])[0]) > 0:
        raise NotImplementedError(
            "categorical splits in LightGBM models are not supported — "
            "re-train with categoricals one-hot/target encoded"
        )
    leaf_value = [float(x) for x in kv["leaf_value"].split()]
    if n_leaves == 1:
        t = _FlatTree(1)
        t.value[0] = leaf_value[0]
        t.le_split = True
        return t
    n_int = n_leaves - 1
    feats = [int(x) for x in kv["split_feature"].split()]
    thr = [float(x) for x in kv["threshold"].split()]
    dec = [int(float(x)) for x in kv["decision_type"].split()]
    lc = [int(x) for x in kv["left_child"].split()]
    rc = [int(x) for x in kv["right_child"].split()]
    t = _FlatTree(n_int + n_leaves)

    def node(c: int) -> int:
        return c if c >= 0 else n_int + ~c

    for i in range(n_int):
        if dec[i] & 1:
            raise NotImplementedError(
                "categorical splits in LightGBM models are not supported"
            )
        missing_type = (dec[i] >> 2) & 3
        if missing_type == 1:
            raise NotImplementedError(
                "zero_as_missing LightGBM models are not supported — "
                "zero routes by a default direction the dense traversal "
                "here cannot express; re-train with zero_as_missing=false"
            )
        t.feature[i] = feats[i]
        t.threshold[i] = thr[i]
        t.left[i] = node(lc[i])
        t.right[i] = node(rc[i])
        t.default_left[i] = (
            bool(dec[i] & 2) if missing_type == 2 else 0.0 <= thr[i]
        )
    for j in range(n_leaves):
        t.value[n_int + j] = leaf_value[j]
    t.le_split = True
    return t


def _predict_trees(trees: list[_FlatTree], X: np.ndarray) -> np.ndarray:
    """Vectorized traversal: every tree walked for the whole batch at once."""
    n = X.shape[0]
    out = np.zeros(n)
    for t in trees:
        node = np.zeros(n, dtype=np.int64)
        active = t.feature[0] >= 0
        if not active:
            out += t.value[0]
            continue
        done = np.zeros(n, dtype=bool)
        while not done.all():
            feat = t.feature[node]
            leaf = feat < 0
            newly = leaf & ~done
            out[newly] += t.value[node[newly]]
            done |= leaf
            live = ~done
            if not live.any():
                break
            xv = X[np.arange(n)[live], feat[live]]
            thr = t.threshold[node[live]]
            nan = np.isnan(xv)
            cmp = (xv <= thr) if t.le_split else (xv < thr)
            go_left = cmp | (nan & t.default_left[node[live]])
            nxt = np.where(go_left, t.left[node[live]], t.right[node[live]])
            node[live] = nxt
    return out


class ForestInference(Base):
    """Score imported forests distributedly; model state broadcast once."""

    def __init__(self, output: str = "raw", threshold: float = 0.5,
                 average: bool = False, base_score: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        if output not in ("raw", "sigmoid", "class", "threshold"):
            # 'class' = sigmoid then threshold (boosted raw scores);
            # 'threshold' = threshold directly (forest-averaged probabilities)
            raise ValueError(
                "output must be raw | sigmoid | class | threshold (fil.h output_t)")
        self.output = output
        self.threshold = threshold
        self.average = average
        self.base_score = base_score
        self._trees: list[_FlatTree] | None = None

    # -- loaders ------------------------------------------------------------
    @classmethod
    def load(cls, filename: str, output_class: bool = False,
             threshold: float = 0.5, algo: str = "TREE_REORG",
             storage_type: str = "DENSE", model_type: str = "xgboost",
             handle=None) -> "ForestInference":
        """File loader matching the reference's primary entry point
        (fil.pyx:459 ``ForestInference.load``): xgboost JSON in BOTH
        public layouts — native ``save_model('model.json')`` files
        (auto-detected by the ``learner`` key) and ``get_dump`` tree
        dumps — and LightGBM TEXT models (``Booster.save_model``
        output, ``model_type='lightgbm'``) parse natively; the
        remaining binary treelite formats ('protobuf', xgboost binary)
        need the treelite package, which is not bundled — those raise
        naming the missing dependency rather than mis-parsing.

        ``algo`` / ``storage_type`` are accepted for signature parity: they
        select GPU kernel layouts in the reference (fil.h storage_type_t) and
        have no Spark analog — scoring here is an Arrow-batched broadcast UDF
        whatever their value.
        """
        if model_type == "lightgbm":
            with open(filename, errors="replace") as f:
                text = f.read()
            if not text.lstrip().startswith("tree"):
                raise NotImplementedError(
                    f"{filename} is not a LightGBM TEXT model (the format "
                    "Booster.save_model writes); other serializations need "
                    "the treelite runtime, which is not bundled"
                )
            out = cls.load_from_lightgbm_text(
                text, output_class=output_class, threshold=threshold)
            if handle is not None:
                out.handle = handle
            return out
        if model_type != "xgboost":
            raise NotImplementedError(
                f"model_type={model_type!r} needs the treelite runtime, which "
                "is not bundled; export the model as an xgboost JSON dump "
                "(Booster.get_dump(dump_format='json')) or a LightGBM text "
                "model (Booster.save_model) and use load() on that."
            )
        with open(filename) as f:
            text = f.read()
        try:
            payload = json.loads(text)
        except json.JSONDecodeError as e:
            raise NotImplementedError(
                f"{filename} is not xgboost JSON (binary xgboost/treelite "
                "models need the treelite runtime, not bundled; export "
                f"with save_model('model.json') or get_dump): {e}"
            ) from None
        if isinstance(payload, dict) and "learner" in payload:
            # native save_model('model.json') layout
            out = cls.load_from_xgboost_model(
                payload, output_class=output_class, threshold=threshold)
        else:
            out = cls.load_from_xgboost_json(
                payload, output="class" if output_class else "raw",
                threshold=threshold,
            )
        if handle is not None:
            out.handle = handle
        return out

    @classmethod
    def load_from_xgboost_json(cls, dump: str | list, output: str = "sigmoid",
                               threshold: float = 0.5,
                               base_score: float = 0.0) -> "ForestInference":
        """``dump``: json string or parsed list of tree dicts
        (xgboost ``Booster.get_dump(dump_format='json')`` contents)."""
        model = cls(output=output, threshold=threshold, base_score=base_score)
        payload = json.loads(dump) if isinstance(dump, str) else dump
        trees = [json.loads(t) if isinstance(t, str) else t for t in payload]
        model._trees = [_flatten_xgb_tree(t) for t in trees]
        return model

    @classmethod
    def load_from_xgboost_model(cls, model: str | dict,
                                output_class: bool = False,
                                threshold: float = 0.5) -> "ForestInference":
        """Import a native xgboost ``save_model`` JSON (``model.json`` —
        the format users actually have on disk, vs ``get_dump``'s
        per-tree dump this class also accepts; reference surface
        fil.pyx:445-459 via treelite).  Trees come as the public flat
        arrays under ``learner.gradient_booster.model.trees[]``
        (left/right_children, split_indices, split_conditions — which
        hold the LEAF VALUE at leaf nodes — and default_left);
        routing is xgboost's ``x < threshold`` left.

        ``base_score`` is stored in OUTPUT space (probability for
        ``binary:logistic``) and enters the margin through the
        objective's prob-to-margin link, exactly as xgboost's own
        predictor applies it: logit for binary:logistic, identity for
        regression.  Multiclass, ranking and non-gbtree boosters
        (gblinear/dart) are refused by name rather than mis-scored."""
        payload = json.loads(model) if isinstance(model, str) else model
        try:
            learner = payload["learner"]
            booster = learner["gradient_booster"]
            booster_name = booster.get("name", "gbtree")
            trees_json = booster["model"]["trees"]
            mparam = learner["learner_model_param"]
        except (KeyError, TypeError) as e:
            raise ValueError(
                f"not an xgboost save_model JSON (missing {e}); for "
                "get_dump(dump_format='json') output use "
                "load_from_xgboost_json"
            ) from None
        if booster_name != "gbtree":
            raise NotImplementedError(
                f"booster {booster_name!r} is not supported — only gbtree "
                "forests score here (gblinear has no trees; dart needs "
                "per-tree weights)"
            )
        if int(mparam.get("num_class", "0") or 0) > 1:
            raise NotImplementedError(
                "multiclass xgboost models are not supported — the FIL "
                "surface here (like the reference's, fil.pyx:375) is "
                "binary/regression"
            )
        objective = learner.get("objective", {}).get("name", "reg:squarederror")
        base_prob = float(mparam.get("base_score", "0.5"))
        if objective == "binary:logistic":
            # ProbToMargin: the stored base_score is a probability
            eps = np.finfo(np.float64).eps
            p = float(np.clip(base_prob, eps, 1 - eps))
            base = float(np.log(p / (1.0 - p)))
            out_mode = "class" if output_class else "sigmoid"
        elif objective.startswith(("reg:squarederror", "reg:absoluteerror",
                                   "reg:pseudohubererror", "reg:linear")):
            base = base_prob  # identity link
            out_mode = "raw"
        else:
            raise NotImplementedError(
                f"objective {objective!r} is not supported — supported: "
                "binary:logistic and identity-link regression objectives"
            )
        flat = []
        for tj in trees_json:
            if tj.get("categories"):
                raise NotImplementedError(
                    "categorical splits in xgboost models are not "
                    "supported — re-train with one-hot/target encoding"
                )
            lc = np.asarray(tj["left_children"], dtype=np.int64)
            rc = np.asarray(tj["right_children"], dtype=np.int64)
            n = len(lc)
            t = _FlatTree(n)
            leaf = lc < 0
            t.left, t.right = lc, rc
            t.feature = np.where(
                leaf, -1, np.asarray(tj["split_indices"], dtype=np.int64))
            cond = np.asarray(tj["split_conditions"], dtype=np.float64)
            t.threshold = np.where(leaf, 0.0, cond)
            t.value = np.where(leaf, cond, 0.0)  # leaves carry the value
            t.default_left = np.asarray(
                tj["default_left"], dtype=np.int64).astype(bool)
            t.le_split = False  # xgboost routes x < threshold LEFT
            flat.append(t)
        model_out = cls(output=out_mode, threshold=threshold,
                        base_score=base)
        model_out._trees = flat
        return model_out

    @classmethod
    def load_from_lightgbm_text(cls, model_str: str,
                                output_class: bool = False,
                                threshold: float = 0.5) -> "ForestInference":
        """Import a LightGBM TEXT model (``Booster.save_model`` /
        ``model_to_string`` output — the public, dependency-free format;
        reference surface fil.pyx:445-459 via treelite).  Header
        key=values up to the first ``Tree=`` block, then one block per
        tree; parsing stops at ``end of trees`` (feature importances /
        parameters sections follow it).  Boosted leaf values are saved
        post-shrinkage, so the raw score is the plain leaf SUM (plus
        boost_from_average's init folded into tree 0 by LightGBM
        itself).  ``objective=binary`` scores through sigmoid (the
        model's own sigmoid:k slope is applied); regression objectives
        score raw.  Multiclass (num_tree_per_iteration > 1) is refused
        — the reference FIL surface is binary/regression too."""
        header: dict[str, str] = {}
        tree_blocks: list[dict[str, str]] = []
        cur: dict[str, str] | None = None
        for ln in model_str.splitlines():
            s = ln.strip()
            if s == "end of trees":
                break
            if s.startswith("Tree="):
                cur = {}
                tree_blocks.append(cur)
                continue
            if "=" in s:
                k, v = s.split("=", 1)
                (header if cur is None else cur)[k.strip()] = v.strip()
        if not tree_blocks:
            raise ValueError(
                "no Tree= blocks found — not a LightGBM text model")
        if int(header.get("num_tree_per_iteration", "1")) > 1 or \
                int(header.get("num_class", "1")) > 1:
            raise NotImplementedError(
                "multiclass LightGBM models are not supported — the FIL "
                "surface here (like the reference's, fil.pyx:375) is "
                "binary/regression"
            )
        objective = header.get("objective", "regression")
        binary = objective.split()[0] == "binary"
        # binary objective may carry its sigmoid slope: 'binary sigmoid:1'
        slope = 1.0
        for part in objective.split()[1:]:
            if part.startswith("sigmoid:"):
                slope = float(part.split(":", 1)[1])
        model = cls(
            output=("class" if output_class and binary
                    else "sigmoid" if binary else "raw"),
            threshold=threshold,
        )
        model._trees = [_flatten_lightgbm_tree(kv) for kv in tree_blocks]
        if binary and slope != 1.0:
            # fold the slope into the leaf values once at load: sigmoid
            # applies to slope·Σleaves and the scorer's sigmoid is unit-slope
            for t in model._trees:
                t.value = t.value * slope
        return model

    @classmethod
    def load_from_sklearn(cls, skl_model, output_class: bool = False,
                          threshold: float = 0.5, algo: str = "TREE_REORG",
                          storage_type: str = "DENSE",
                          handle=None) -> "ForestInference":
        """Import a FITTED sklearn ensemble (reference surface fil.pyx:445).

        Supported (duck-typed, no sklearn import required):

        * ``RandomForestRegressor`` / ``ExtraTreesRegressor`` — mean of tree
          leaf values (matches ``predict``);
        * ``RandomForestClassifier`` (binary) — mean of per-tree class-1
          leaf probabilities (matches ``predict_proba[:, 1]``), thresholded
          when ``output_class``;
        * ``GradientBoosting{Regressor,Classifier}`` — init constant +
          learning_rate-scaled leaf sums (classifier raw scores pass through
          sigmoid, matching ``predict_proba``).
        """
        if not hasattr(skl_model, "estimators_"):
            raise ValueError(
                "load_from_sklearn needs a FITTED sklearn tree ensemble "
                "(no estimators_ attribute found — call fit() first)"
            )
        name = type(skl_model).__name__
        boosted = "Boosting" in name
        classifier = "Classifier" in name
        ests = np.asarray(skl_model.estimators_, dtype=object).ravel()
        if boosted:
            # GB trees are regression trees on the loss gradient whatever the
            # task; raw score = init constant + lr · Σ leaf values
            lr = float(getattr(skl_model, "learning_rate", 1.0))
            trees = [_flatten_sklearn_tree(e.tree_, classifier=False) for e in ests]
            for t in trees:
                t.value = t.value * lr
            # sklearn's default init_ is a Dummy{Classifier,Regressor}:
            # regressors expose constant_ (the target mean); classifiers
            # expose class_prior_ — the raw-score constant is the prior
            # log-odds log(p1/p0). Silently defaulting to 0.0 would drop
            # that term and break predict_proba parity on imbalanced data.
            init = getattr(skl_model, "init_", None)
            if init is None or init == "zero":
                base = 0.0
            elif classifier and hasattr(init, "class_prior_"):
                prior = np.ravel(init.class_prior_)
                if len(prior) != 2:
                    raise ValueError(
                        "load_from_sklearn supports binary GB classifiers "
                        f"only (got {len(prior)} class priors)"
                    )
                eps = np.finfo(np.float64).eps
                p1 = float(np.clip(prior[1], eps, 1 - eps))
                base = float(np.log(p1 / (1.0 - p1)))
            elif hasattr(init, "constant_"):
                base = float(np.ravel(init.constant_)[0])
            else:
                raise ValueError(
                    "unrecognized GradientBoosting init_ estimator "
                    f"({type(init).__name__}: no class_prior_/constant_); "
                    "refusing to silently drop the base score"
                )
            output = ("class" if output_class and classifier
                      else "sigmoid" if classifier else "raw")
            model = cls(output=output, threshold=threshold, base_score=base)
            model._trees = trees
        else:
            trees = [_flatten_sklearn_tree(e.tree_, classifier=classifier)
                     for e in ests]
            # forest probabilities are already in [0,1] — threshold them
            # directly (no sigmoid), exactly sklearn's predict
            output = "threshold" if output_class and classifier else "raw"
            model = cls(output=output, threshold=threshold, average=True)
            model._trees = trees
        if handle is not None:
            model.handle = handle
        return model

    @classmethod
    def load_from_arrays(cls, trees: list[dict], output: str = "raw",
                         average: bool = False) -> "ForestInference":
        """Each dict: feature/threshold/left/right/value arrays (sklearn-style
        export — the ``load_from_sklearn`` analog, fil.pyx:445)."""
        model = cls(output=output, average=average)
        flat = []
        for td in trees:
            n = len(td["feature"])
            t = _FlatTree(n)
            t.feature = np.asarray(td["feature"], dtype=np.int64)
            t.threshold = np.asarray(td["threshold"], dtype=np.float64)
            t.left = np.asarray(td["left"], dtype=np.int64)
            t.right = np.asarray(td["right"], dtype=np.int64)
            t.value = np.asarray(td["value"], dtype=np.float64)
            flat.append(t)
        model._trees = flat
        return model

    # -- scoring ------------------------------------------------------------

    # Forests at or under this many TOTAL nodes score as native nested
    # CASE WHEN expressions (whole-stage codegen, no Python workers) —
    # at 100 TB that removes the Arrow transfer of every feature column
    # for the common small-imported-model case.  Above it, deeply nested
    # expressions risk the JVM's 64 KB generated-method limit (Catalyst
    # then falls back to interpreted eval), and the vectorized Arrow
    # traversal wins — so big forests keep the broadcast pandas-UDF path.
    CODEGEN_MAX_NODES = 512

    def _tree_expr(self, t: _FlatTree, feature_cols: list[str]):
        """One tree as a nested CASE WHEN column, replicating the pandas
        path's missing-value semantics exactly: null and NaN both take
        the node's default direction (the Arrow path casts null → NaN and
        routes NaN by ``default_left``).  The default branch folds into
        the comparison — ``default_left`` nodes test
        ``isnull | isnan | cmp`` — so no subtree is ever duplicated."""
        cols = [F.col(c).cast("double") for c in feature_cols]

        def node(nid: int):
            if t.feature[nid] < 0:
                return F.lit(float(t.value[nid]))
            c = cols[int(t.feature[nid])]
            thr = F.lit(float(t.threshold[nid]))
            cmp = (c <= thr) if t.le_split else (c < thr)
            if t.default_left[nid]:
                cmp = c.isNull() | F.isnan(c) | cmp
            # default-right needs nothing: null/NaN comparisons are
            # null/false in Spark SQL, so the otherwise() branch fires
            return F.when(cmp, node(int(t.left[nid]))).otherwise(
                node(int(t.right[nid])))

        return node(0)

    def _predict_expr(self, df: DataFrame, feature_cols: list[str],
                      out_col: str) -> DataFrame:
        total = self._tree_expr(self._trees[0], feature_cols)
        for t in self._trees[1:]:
            total = total + self._tree_expr(t, feature_cols)
        # identical arithmetic order to the Arrow path: Σ / navg + base
        navg = float(len(self._trees)) if self.average else 1.0
        raw = total / F.lit(navg) + F.lit(float(self.base_score))
        if self.output == "sigmoid":
            out = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
        elif self.output == "class":
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
            out = (p > F.lit(self.threshold)).cast("double")
        elif self.output == "threshold":
            out = (raw > F.lit(self.threshold)).cast("double")
        else:
            out = raw
        return df.withColumn(out_col, out)

    def predict(self, df: DataFrame, feature_cols: list[str],
                out_col: str = "prediction",
                codegen: str = "auto") -> DataFrame:
        """``codegen``: 'auto' compiles forests ≤ CODEGEN_MAX_NODES total
        nodes to native expressions and keeps the Arrow path above;
        'always'/'never' force one path (the two are result-identical —
        pinned by tests that score both on the same frame)."""
        if self._trees is None:
            raise RuntimeError("load a model first")
        if codegen not in ("auto", "always", "never"):
            raise ValueError("codegen must be auto | always | never")
        n_nodes = sum(len(t.feature) for t in self._trees)
        if codegen == "always" or (
                codegen == "auto" and n_nodes <= self.CODEGEN_MAX_NODES):
            return self._predict_expr(df, feature_cols, out_col)
        # broadcast the flattened arrays ONCE per predict instead of pickling
        # them into every task's UDF closure — at 100 TB a scoring stage runs
        # ~1e5 tasks and a deep forest is tens of MB
        bc_trees = df.sparkSession.sparkContext.broadcast(self._trees)
        navg = float(len(self._trees)) if self.average else 1.0
        base = self.base_score
        output, thr = self.output, self.threshold

        @F.pandas_udf(DoubleType())
        def score(*batch: pd.Series) -> pd.Series:
            X = np.column_stack(
                [s.to_numpy(dtype=np.float64) for s in batch]
            )
            raw = _predict_trees(bc_trees.value, X) / navg + base
            if output == "sigmoid":
                return pd.Series(1.0 / (1.0 + np.exp(-raw)))
            if output == "class":
                p = 1.0 / (1.0 + np.exp(-raw))
                return pd.Series((p > thr).astype(np.float64))
            if output == "threshold":
                return pd.Series((raw > thr).astype(np.float64))
            return pd.Series(raw)

        return df.withColumn(out_col, score(*[F.col(c).cast("double") for c in feature_cols]))
