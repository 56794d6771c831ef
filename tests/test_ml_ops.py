"""ai.onnx.ml domain: classical-ML ops (ops/ml.py + host.py epilog).

Device ops are verified against pure-python oracles (tree walkers, libsvm
kernel math); string label/table paths exercise the host prolog
(string→numeric encoders) and the NEW host epilog (ZipMap sequence-of-maps,
numeric→string mapping, string-labelled classifier index mapping). The
reference engine has no ml-domain support at all
(src/inference_engine/model_inference.rs:138-161)."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model

from util import make_model, node, run_op

ML = "ai.onnx.ml"
rng = np.random.default_rng(77)


# --------------------------------------------------------------------------
# feature preprocessing
# --------------------------------------------------------------------------
def test_scaler():
    x = rng.normal(size=(3, 4)).astype(np.float32)
    off = [0.5, -1.0, 0.0, 2.0]
    sc = [2.0, 1.0, 0.5, -1.0]
    y, = run_op("Scaler", {"x": x}, domain=ML, offset=off, scale=sc)
    np.testing.assert_allclose(y, (x - off) * sc, rtol=1e-6)


@pytest.mark.parametrize("norm,ref", [
    ("MAX", lambda x: x / np.max(np.abs(x), -1, keepdims=True)),
    ("L1", lambda x: x / np.sum(np.abs(x), -1, keepdims=True)),
    ("L2", lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)),
])
def test_normalizer(norm, ref):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    y, = run_op("Normalizer", {"x": x}, domain=ML, norm=norm)
    np.testing.assert_allclose(y, ref(x), rtol=1e-5)


def test_binarizer_and_imputer():
    x = np.array([[0.1, 0.9], [0.5, -0.2]], np.float32)
    y, = run_op("Binarizer", {"x": x}, domain=ML, threshold=0.5)
    np.testing.assert_array_equal(y, (x > 0.5).astype(np.float32))

    xn = np.array([[np.nan, 2.0], [1.0, np.nan]], np.float32)
    y, = run_op("Imputer", {"x": xn}, domain=ML,
                imputed_value_floats=[5.0, 6.0])
    np.testing.assert_array_equal(y, [[5.0, 2.0], [1.0, 6.0]])

    xi = np.array([[-1, 3]], np.int64)
    y, = run_op("Imputer", {"x": xi}, domain=ML,
                imputed_value_int64s=[9], replaced_value_int64=-1)
    np.testing.assert_array_equal(y, [[9, 3]])


def test_array_feature_extractor_and_vectorizer():
    x = rng.normal(size=(3, 6)).astype(np.float32)
    y, = run_op("ArrayFeatureExtractor",
                {"x": x, "idx": np.array([5, 0, 2], np.int64)}, domain=ML)
    np.testing.assert_allclose(y, x[:, [5, 0, 2]], rtol=1e-6)

    a = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=(2, 1)).astype(np.float32)
    y, = run_op("FeatureVectorizer", {"a": a, "b": b}, domain=ML,
                inputdimensions=[2, 2])
    np.testing.assert_allclose(
        y, np.concatenate([a[:, :2], b, np.zeros((2, 1), np.float32)], 1))


def test_one_hot_encoder_int_device():
    y, = run_op("OneHotEncoder", {"x": np.array([[1, 3], [2, 7]], np.int64)},
                domain=ML, cats_int64s=[1, 2, 3], zeros=1)
    np.testing.assert_array_equal(
        y, [[[1, 0, 0], [0, 0, 1]], [[0, 1, 0], [0, 0, 0]]])


def test_one_hot_encoder_string_host_prolog():
    x = np.array(["b", "a", "zz"], dtype=object)
    y, = run_op("OneHotEncoder", {"x": x}, domain=ML,
                cats_strings=["a", "b"], zeros=1)
    np.testing.assert_array_equal(y, [[0, 1], [1, 0], [0, 0]])


def test_label_encoder_numeric_device():
    y, = run_op("LabelEncoder", {"x": np.array([1, 5, 9], np.int64)},
                domain=ML, keys_int64s=[1, 5], values_int64s=[10, 50],
                default_int64=-1)
    np.testing.assert_array_equal(y, [10, 50, -1])
    y, = run_op("LabelEncoder", {"x": np.array([2.0, 7.0], np.float32)},
                domain=ML, keys_floats=[2.0], values_floats=[0.25],
                default_float=-9.0)
    np.testing.assert_allclose(y, [0.25, -9.0])


def test_label_encoder_string_to_int_host_prolog():
    x = np.array(["cat", "dog", "??"], dtype=object)
    y, = run_op("LabelEncoder", {"x": x}, domain=ML,
                keys_strings=["cat", "dog"], values_int64s=[0, 1],
                default_int64=-1)
    np.testing.assert_array_equal(y.astype(np.int64), [0, 1, -1])


def test_label_encoder_int_to_string_host_epilog():
    y, = run_op("LabelEncoder", {"x": np.array([0, 1, 7], np.int64)},
                domain=ML, keys_int64s=[0, 1], values_strings=["lo", "hi"],
                default_string="?")
    assert [str(v) for v in y.ravel()] == ["lo", "hi", "?"]


def test_category_mapper_both_directions():
    y, = run_op("CategoryMapper", {"x": np.array([[7, 8, 9]], np.int64)},
                domain=ML, cats_int64s=[7, 8], cats_strings=["a", "b"],
                default_string="?")
    assert [str(v) for v in y.ravel()] == ["a", "b", "?"]
    x = np.array(["b", "q"], dtype=object)
    y, = run_op("CategoryMapper", {"x": x}, domain=ML,
                cats_int64s=[7, 8], cats_strings=["a", "b"],
                default_int64=-5)
    np.testing.assert_array_equal(y.astype(np.int64), [8, -5])


# --------------------------------------------------------------------------
# linear / SVM models
# --------------------------------------------------------------------------
def test_linear_regressor_multi_target():
    x = rng.normal(size=(4, 3)).astype(np.float32)
    w = rng.normal(size=(2, 3)).astype(np.float32)
    b = np.array([0.5, -0.5], np.float32)
    y, = run_op("LinearRegressor", {"x": x}, domain=ML,
                coefficients=[float(v) for v in w.ravel()],
                intercepts=[float(v) for v in b], targets=2)
    np.testing.assert_allclose(y, x @ w.T + b, rtol=1e-5)


def test_linear_classifier_binary_logistic():
    x = np.array([[1.0, 2.0], [-1.0, -2.0]], np.float32)
    lab, sc = run_op("LinearClassifier", {"x": x}, domain=ML,
                     coefficients=[1.0, 1.0], intercepts=[0.0],
                     classlabels_int64s=[0, 1],
                     post_transform="LOGISTIC", n_outputs=2)
    z = x.sum(-1)
    np.testing.assert_allclose(
        sc, np.stack([1 / (1 + np.exp(z)), 1 / (1 + np.exp(-z))], -1),
        rtol=1e-5)
    np.testing.assert_array_equal(lab, [1, 0])


def test_linear_classifier_multiclass_softmax_string_labels():
    x = rng.normal(size=(5, 4)).astype(np.float32)
    w = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    lab, sc = run_op("LinearClassifier", {"x": x}, domain=ML,
                     coefficients=[float(v) for v in w.ravel()],
                     intercepts=[float(v) for v in b],
                     classlabels_strings=["a", "b", "c"],
                     post_transform="SOFTMAX", n_outputs=2)
    z = x @ w.T + b
    e = np.exp(z - z.max(-1, keepdims=True))
    np.testing.assert_allclose(sc, e / e.sum(-1, keepdims=True), rtol=1e-5)
    assert [str(v) for v in lab] == [
        "abc"[i] for i in z.argmax(-1)]


def _rbf(a, b, gamma):
    return np.exp(-gamma * np.sum((a - b) ** 2))


def test_svm_regressor_kernels():
    sv = rng.normal(size=(3, 2)).astype(np.float32)
    coef = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(4, 2)).astype(np.float32)
    gamma, coef0, rho = 0.6, 0.3, 0.05
    for kind, kfn in [
        ("RBF", lambda a, b: _rbf(a, b, gamma)),
        ("LINEAR", lambda a, b: a @ b),
        ("POLY", lambda a, b: (gamma * (a @ b) + coef0) ** 2),
        ("SIGMOID", lambda a, b: np.tanh(gamma * (a @ b) + coef0)),
    ]:
        y, = run_op("SVMRegressor", {"x": x}, domain=ML,
                    coefficients=[float(v) for v in coef],
                    support_vectors=[float(v) for v in sv.ravel()],
                    n_supports=3, rho=[rho], kernel_type=kind,
                    kernel_params=[gamma, coef0, 2.0])
        exp = [sum(c * kfn(r, s) for c, s in zip(coef, sv)) + rho
               for r in x]
        np.testing.assert_allclose(y.ravel(), exp, rtol=2e-4), kind


def test_svm_classifier_binary_votes_first_class_on_positive():
    sv = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)
    x = np.array([[0.1, 0.0], [2.0, 1.5]], np.float32)
    gamma = 0.7
    lab, sc = run_op("SVMClassifier", {"x": x}, domain=ML,
                     coefficients=[0.6, -0.4],
                     support_vectors=[0.0, 0.0, 1.0, 1.0],
                     vectors_per_class=[1, 1], rho=[0.05],
                     kernel_type="RBF", kernel_params=[gamma, 0.0, 3.0],
                     classlabels_int64s=[3, 8], n_outputs=2)
    dec = np.array([0.6 * _rbf(r, sv[0], gamma)
                    - 0.4 * _rbf(r, sv[1], gamma) + 0.05 for r in x])
    np.testing.assert_allclose(sc, np.stack([dec, -dec], -1), rtol=1e-4)
    np.testing.assert_array_equal(lab, np.where(dec > 0, 3, 8))
    assert (sc.argmax(-1) == (lab == 8)).all()  # scores agree with votes


def test_svm_classifier_multiclass_voting_tiebreak():
    # 3 classes, 1 sv each, linear kernel — hand-checkable votes
    lab, sc = run_op(
        "SVMClassifier",
        {"x": np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]], np.float32)},
        domain=ML,
        coefficients=[1.0, 1.0, 1.0, -1.0, -1.0, -1.0],
        support_vectors=[1.0, 0.0, 0.0, 1.0, -1.0, -1.0],
        vectors_per_class=[1, 1, 1], rho=[0.0, 0.0, 0.0],
        kernel_type="LINEAR", classlabels_int64s=[10, 20, 30], n_outputs=2)
    # row 2 votes tie 1-1-1 → libsvm tie-break: lowest class index
    np.testing.assert_array_equal(lab, [10, 30, 10])
    assert sc.shape == (3, 3)  # pair decision values (0,1),(0,2),(1,2)


def test_svm_classifier_binary_platt_probabilities():
    x = np.array([[0.3, 0.3], [1.2, 0.9]], np.float32)
    gamma, pa, pb = 0.7, -1.3, 0.2
    lab, sc = run_op("SVMClassifier", {"x": x}, domain=ML,
                     coefficients=[0.6, -0.4],
                     support_vectors=[0.0, 0.0, 1.0, 1.0],
                     vectors_per_class=[1, 1], rho=[0.05],
                     kernel_type="RBF", kernel_params=[gamma, 0.0, 3.0],
                     prob_a=[pa], prob_b=[pb],
                     classlabels_int64s=[0, 1], n_outputs=2)
    sv = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)
    dec = np.array([0.6 * _rbf(r, sv[0], gamma)
                    - 0.4 * _rbf(r, sv[1], gamma) + 0.05 for r in x])
    p0 = 1 / (1 + np.exp(pa * dec + pb))
    np.testing.assert_allclose(sc, np.stack([p0, 1 - p0], -1), rtol=1e-4)
    np.testing.assert_allclose(sc.sum(-1), 1.0, rtol=1e-5)


def test_svm_classifier_3class_pairwise_coupling_sums_to_one():
    # random-ish but fixed 3-class SVC with Platt tables: posteriors from
    # Wu-Lin coupling must be a distribution and argmax-consistent
    sv = rng.normal(size=(6, 2)).astype(np.float32)
    lab, sc = run_op(
        "SVMClassifier", {"x": rng.normal(size=(4, 2)).astype(np.float32)},
        domain=ML,
        coefficients=[float(v) for v in rng.normal(size=(12,))],
        support_vectors=[float(v) for v in sv.ravel()],
        vectors_per_class=[2, 2, 2], rho=[0.1, -0.2, 0.05],
        kernel_type="RBF", kernel_params=[0.5, 0.0, 3.0],
        prob_a=[-1.0, -1.5, -0.8], prob_b=[0.1, -0.1, 0.0],
        classlabels_int64s=[0, 1, 2], n_outputs=2)
    np.testing.assert_allclose(np.asarray(sc).sum(-1), 1.0, atol=1e-4)
    assert (np.asarray(sc) >= 0).all()
    np.testing.assert_array_equal(lab, np.asarray(sc).argmax(-1))


def test_svm_classifier_linear_mode_no_support_vectors():
    x = rng.normal(size=(3, 4)).astype(np.float32)
    w = rng.normal(size=(3, 4)).astype(np.float32)
    rho = np.array([0.1, 0.2, -0.3], np.float32)
    lab, sc = run_op("SVMClassifier", {"x": x}, domain=ML,
                     coefficients=[float(v) for v in w.ravel()],
                     rho=[float(v) for v in rho],
                     kernel_type="LINEAR",
                     classlabels_int64s=[0, 1, 2], n_outputs=2)
    np.testing.assert_allclose(sc, x @ w.T + rho, rtol=1e-5)
    np.testing.assert_array_equal(lab, (x @ w.T + rho).argmax(-1))


# --------------------------------------------------------------------------
# tree ensembles (oracle: pure-python walker over random trees)
# --------------------------------------------------------------------------
def _random_forest(n_trees, depth, n_feat, n_out, seed, classifier):
    """Random full binary trees in ONNX v3 attribute form + a walker."""
    r = np.random.default_rng(seed)
    rows = []  # (treeid, nodeid, featureid, mode, value, true, false, mt)
    lk = "class" if classifier else "target"
    leaf = {f"{lk}_treeids": [], f"{lk}_nodeids": [], f"{lk}_ids": [],
            f"{lk}_weights": []}
    trees = []

    def build(t, nid, d, spec):
        my = nid[0]
        nid[0] += 1
        if d == 0:
            rows.append([t, my, 0, "LEAF", 0.0, 0, 0, 0])
            w = {}
            for o in range(n_out):
                wv = float(r.normal())
                leaf[f"{lk}_treeids"].append(t)
                leaf[f"{lk}_nodeids"].append(my)
                leaf[f"{lk}_ids"].append(o)
                leaf[f"{lk}_weights"].append(wv)
                w[o] = wv
            spec[my] = ("LEAF", w)
            return my
        f = int(r.integers(0, n_feat))
        v = float(r.normal())
        mt = int(r.integers(0, 2))
        row = [t, my, f, "BRANCH_LEQ", v, 0, 0, mt]
        rows.append(row)
        row[5] = build(t, nid, d - 1, spec)
        row[6] = build(t, nid, d - 1, spec)
        spec[my] = ("BRANCH", f, v, mt, row[5], row[6])
        return my

    for t in range(n_trees):
        spec = {}
        build(t, [0], depth, spec)
        trees.append(spec)

    keys = ("nodes_treeids", "nodes_nodeids", "nodes_featureids",
            "nodes_modes", "nodes_values", "nodes_truenodeids",
            "nodes_falsenodeids", "nodes_missing_value_tracks_true")
    attrs = {k: [row[i] for row in rows] for i, k in enumerate(keys)}

    def walk(x):
        out = np.zeros(n_out)
        for spec in trees:
            i = 0
            while spec[i][0] == "BRANCH":
                _, f, v, mt, ti, fi = spec[i]
                go_true = bool(mt) if np.isnan(x[f]) else (x[f] <= v)
                i = ti if go_true else fi
            for o, w in spec[i][1].items():
                out[o] += w
        return out

    return {**attrs, **leaf}, walk


def test_tree_ensemble_regressor_random_forest_oracle():
    attrs, walk = _random_forest(4, 3, 5, 2, seed=3, classifier=False)
    x = rng.normal(size=(16, 5)).astype(np.float32)
    x[3, 2] = np.nan  # exercise missing_value_tracks_true
    y, = run_op("TreeEnsembleRegressor", {"x": x}, domain=ML,
                n_targets=2, base_values=[0.25, -0.5], **attrs)
    exp = np.stack([walk(r) for r in x]) + [0.25, -0.5]
    np.testing.assert_allclose(y, exp, rtol=1e-4, atol=1e-5)


def test_tree_ensemble_regressor_average_min_max():
    attrs, walk = _random_forest(3, 2, 4, 1, seed=9, classifier=False)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    for agg in ("AVERAGE", "MIN", "MAX"):
        y, = run_op("TreeEnsembleRegressor", {"x": x}, domain=ML,
                    n_targets=1, aggregate_function=agg, **attrs)
        red = {"AVERAGE": np.mean, "MIN": min, "MAX": max}[agg]
        exp = [red(_per_tree_values(attrs, r)) for r in x]
        np.testing.assert_allclose(y.ravel(), exp, rtol=1e-4, atol=1e-5)


def _per_tree_values(attrs, x):
    """Walk each tree of a v3 attribute bundle separately (target id 0)."""
    rows = {}
    for j in range(len(attrs["nodes_treeids"])):
        rows[(attrs["nodes_treeids"][j], attrs["nodes_nodeids"][j])] = j
    weights = {}
    for t, n, w in zip(attrs["target_treeids"], attrs["target_nodeids"],
                       attrs["target_weights"]):
        weights[(t, n)] = weights.get((t, n), 0.0) + w
    out = []
    for t in sorted(set(attrs["nodes_treeids"])):
        i = rows[(t, 0)]
        while attrs["nodes_modes"][i] != "LEAF":
            f = attrs["nodes_featureids"][i]
            v = attrs["nodes_values"][i]
            mt = attrs["nodes_missing_value_tracks_true"][i]
            go = bool(mt) if np.isnan(x[f]) else (x[f] <= v)
            n = attrs["nodes_truenodeids"][i] if go \
                else attrs["nodes_falsenodeids"][i]
            i = rows[(t, n)]
        out.append(weights[(t, attrs["nodes_nodeids"][i])])
    return out


def test_tree_ensemble_classifier_multiclass_softmax():
    attrs, walk = _random_forest(3, 3, 4, 3, seed=5, classifier=True)
    x = rng.normal(size=(12, 4)).astype(np.float32)
    lab, sc = run_op("TreeEnsembleClassifier", {"x": x}, domain=ML,
                     classlabels_int64s=[7, 8, 9],
                     post_transform="SOFTMAX", n_outputs=2, **attrs)
    z = np.stack([walk(r) for r in x])
    e = np.exp(z - z.max(-1, keepdims=True))
    np.testing.assert_allclose(sc, e / e.sum(-1, keepdims=True),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(lab, np.array([7, 8, 9])[z.argmax(-1)])


def test_tree_ensemble_classifier_binary_single_sided_logistic():
    # GBM-style: weights only for class 1, LOGISTIC post-transform
    attrs, walk = _random_forest(2, 2, 3, 1, seed=11, classifier=True)
    attrs["class_ids"] = [1] * len(attrs["class_ids"])
    x = rng.normal(size=(6, 3)).astype(np.float32)
    lab, sc = run_op("TreeEnsembleClassifier", {"x": x}, domain=ML,
                     classlabels_int64s=[0, 1],
                     post_transform="LOGISTIC", n_outputs=2, **attrs)
    s = np.stack([walk(r) for r in x]).ravel()
    p1 = 1 / (1 + np.exp(-s))
    np.testing.assert_allclose(sc, np.stack([1 - p1, p1], -1), rtol=1e-4)
    np.testing.assert_array_equal(lab, (p1 > 0.5).astype(np.int64))


def test_tree_ensemble_v5_tensor_format():
    y, = run_op("TreeEnsemble",
                {"x": np.array([[0.3], [0.7], [2.0]], np.float32)},
                domain=ML,
                nodes_featureids=[0, 0], nodes_splits=[0.5, 1.0],
                nodes_modes=[0, 0],
                nodes_truenodeids=[0, 1], nodes_falsenodeids=[1, 2],
                nodes_trueleafs=[1, 1], nodes_falseleafs=[0, 1],
                tree_roots=[0],
                leaf_targetids=[0, 0, 0], leaf_weights=[1.5, 2.5, 4.0],
                n_targets=1, aggregate_function=1)
    # x<=0.5 → leaf0; else node1: x<=1.0 → leaf1 else leaf2
    np.testing.assert_allclose(y.ravel(), [1.5, 2.5, 4.0])


# --------------------------------------------------------------------------
# end-to-end sklearn-style pipeline with string labels + ZipMap epilog
# --------------------------------------------------------------------------
def test_sklearn_pipeline_imputer_scaler_forest_zipmap():
    attrs, walk = _random_forest(3, 2, 3, 2, seed=21, classifier=True)
    nodes = [
        node("Imputer", ["x"], ["x1"], domain=ML,
             imputed_value_floats=[0.0, 0.0, 0.0]),
        node("Scaler", ["x1"], ["x2"], domain=ML,
             offset=[0.1, 0.2, 0.3], scale=[1.0, 2.0, 0.5]),
        node("TreeEnsembleClassifier", ["x2"], ["label", "scores"],
             domain=ML, classlabels_strings=["no", "yes"],
             post_transform="SOFTMAX", **attrs),
        node("ZipMap", ["scores"], ["probs"], domain=ML,
             classlabels_strings=["no", "yes"]),
    ]
    x = rng.normal(size=(5, 3)).astype(np.float32)
    x[0, 1] = np.nan
    m = make_model(nodes, {"x": x}, ["label", "probs"])
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    eng = Engine(import_model(m2))
    res = eng.run({"x": x})

    xs = (np.nan_to_num(x) - [0.1, 0.2, 0.3]) * [1.0, 2.0, 0.5]
    z = np.stack([walk(r) for r in xs])
    e = np.exp(z - z.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    assert [str(v) for v in res["label"]] == [
        ["no", "yes"][i] for i in z.argmax(-1)]
    maps = res["probs"]
    assert isinstance(maps, list) and isinstance(maps[0], dict)
    np.testing.assert_allclose(
        [[mp["no"], mp["yes"]] for mp in maps], p, rtol=1e-4, atol=1e-5)
    # scores tensor itself is NOT a graph output here — only the maps


def test_post_transform_probit_and_softmax_zero():
    # PROBIT(0.5) = 0; PROBIT(~0.8413) ≈ 1 (Φ(1) inverse)
    y, = run_op("LinearRegressor",
                {"x": np.array([[1.0], [1.6827]], np.float32)},
                domain=ML, coefficients=[0.5], intercepts=[0.0],
                post_transform="PROBIT")
    np.testing.assert_allclose(y.ravel(), [0.0, 1.0], atol=2e-3)

    # SOFTMAX_ZERO: zeros stay zero, nonzeros renormalize among themselves
    from onnx_rusty_inference_engine_tpu.ops.ml import post_transform
    import jax

    jax.config.update("jax_platforms", "cpu")
    z = np.array([[1.0, 0.0, 2.0]], np.float32)
    out = np.asarray(post_transform(z, "SOFTMAX_ZERO"))
    assert out[0, 1] == 0.0
    e = np.exp(np.array([1.0, 2.0]) - 2.0)
    np.testing.assert_allclose(out[0, [0, 2]], e / e.sum(), rtol=1e-5)


def test_tree_ensemble_blocked_layout_matches_dense():
    """Large forests switch C to the block-diagonal-by-tree layout
    (ops/ml.py _BLOCKED_THRESHOLD); results must be bit-identical to the
    dense path on the same model."""
    import onnx_rusty_inference_engine_tpu.ops.ml as ml

    attrs, walk = _random_forest(5, 4, 6, 2, seed=31, classifier=False)
    x = rng.normal(size=(9, 6)).astype(np.float32)
    x[2, 4] = np.nan
    dense, = run_op("TreeEnsembleRegressor", {"x": x}, domain=ML,
                    n_targets=2, **attrs)
    old = ml._BLOCKED_THRESHOLD
    ml._BLOCKED_THRESHOLD = 1  # force blocked
    try:
        blocked, = run_op("TreeEnsembleRegressor", {"x": x}, domain=ML,
                          n_targets=2, **attrs)
    finally:
        ml._BLOCKED_THRESHOLD = old
    np.testing.assert_array_equal(dense, blocked)
    exp = np.stack([walk(r) for r in x])
    np.testing.assert_allclose(blocked, exp, rtol=1e-4, atol=1e-5)


def test_tree_ensemble_blocked_large_forest():
    """A forest big enough to trip the blocked threshold for real
    (120 trees x depth 6 -> dense C would be ~7.6k x 7.7k) runs and
    agrees with the python walker."""
    attrs, walk = _random_forest(120, 6, 8, 1, seed=41, classifier=False)
    import onnx_rusty_inference_engine_tpu.ops.ml as ml
    ni = sum(m != "LEAF" for m in attrs["nodes_modes"])
    nl = sum(m == "LEAF" for m in attrs["nodes_modes"])
    assert ni * nl > ml._BLOCKED_THRESHOLD  # really exercises the path
    x = rng.normal(size=(4, 8)).astype(np.float32)
    y, = run_op("TreeEnsembleRegressor", {"x": x}, domain=ML,
                n_targets=1, **attrs)
    exp = np.stack([walk(r) for r in x])
    np.testing.assert_allclose(y, exp, rtol=1e-3, atol=1e-4)
