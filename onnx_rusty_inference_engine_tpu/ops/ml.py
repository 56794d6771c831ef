"""ai.onnx.ml domain: classical-ML ops (sklearn/LightGBM/XGBoost exports).

The reference engine supports none of this domain (its dispatcher covers 10
CNN ops, src/inference_engine/model_inference.rs:138-161); it is included
because "a user of the reference switching here" in practice carries
sklearn-exported pipelines too, and the ONNX backend-test corpus treats
ai.onnx.ml as core.

TPU-native design notes
-----------------------
* TreeEnsemble{Classifier,Regressor} lower to THREE matmuls (the GEMM tree
  strategy): node-feature pick ``[B,F]@[F,NI]``, path resolution
  ``[B,NI]@[NI,NL]``, leaf→output ``[B,NL]@[NL,T]``. Every FLOP lands on
  the MXU; there are no gathers (CLAUDE.md: an index-gather this chip
  executes catastrophically slower than the equivalent one-hot matmul) and
  no data-dependent control flow, so XLA fuses the comparison/select
  epilogue into the surrounding graph. Tables are built once at trace time
  in numpy from the node attributes.
* SVMClassifier/SVMRegressor evaluate the kernel matrix as one
  ``[B,F]@[F,NSV]`` matmul; one-vs-one voting and Platt/pairwise-coupling
  probabilities are small dense follow-ups on device.
* String-labelled classifiers emit the class INDEX on device; the engine's
  host epilog (host.py) maps indices to label strings after the jitted
  call — strings never enter the XLA program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register

ML = "ai.onnx.ml"

_BIG = np.float32(3.4e38)  # sentinel for masked min/max (finite: NaN-safe)


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------
def _as_2d(x):
    """ai.onnx.ml feature ops accept [N,C] or [C]; lift to 2-D."""
    return (x.reshape(1, -1), True) if x.ndim == 1 else (x, False)


def post_transform(scores, kind: str):
    """ONNX ml post_transform attribute → jnp (scores: [..., C])."""
    if kind in (None, "NONE"):
        return scores
    if kind == "SOFTMAX":
        return jax.nn.softmax(scores, axis=-1)
    if kind == "LOGISTIC":
        return jax.nn.sigmoid(scores)
    if kind == "SOFTMAX_ZERO":
        # softmax over the nonzero entries only; zero entries stay zero
        nz = scores != 0
        m = jnp.max(jnp.where(nz, scores, -_BIG), axis=-1, keepdims=True)
        e = jnp.where(nz, jnp.exp(scores - m), 0.0)
        return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)
    if kind == "PROBIT":
        from jax.scipy.special import ndtri

        return ndtri(scores)
    raise UnsupportedOpError(f"post_transform {kind!r} not in the ml spec")


def _pick_const_by_index(idx, table: np.ndarray):
    """table[idx] for a tiny trace-time table, as a one-hot multiply-sum
    (no gather: CLAUDE.md rule). idx int [...], table [K] → [...]."""
    k = table.shape[0]
    oh = idx[..., None] == jnp.arange(k, dtype=idx.dtype)
    return jnp.sum(jnp.where(oh, jnp.asarray(table), 0), axis=-1)


def _labels_attr(node: Node, prefix: str) -> Tuple[np.ndarray, bool]:
    """(labels, is_string) from {prefix}_int64s / {prefix}_strings."""
    s = node.attr(f"{prefix}_strings")
    if s is not None:
        return np.asarray(s, dtype=object), True
    i = node.attr(f"{prefix}_int64s")
    if i is None:
        raise UnsupportedOpError(
            f"{node.op_type}: {prefix}_int64s or {prefix}_strings required")
    return np.asarray(i, dtype=np.int64), False


def classifier_string_labels(node: Node) -> Optional[np.ndarray]:
    """Label table when this classifier's Y output is a string index the
    host epilog must map; None for int-labelled classifiers."""
    if node.op_type in ("TreeEnsembleClassifier", "LinearClassifier",
                        "SVMClassifier"):
        s = node.attr("classlabels_strings")
        if s is not None:
            return np.asarray(s, dtype=object)
    return None


def _emit_labels(scores_t, labels: np.ndarray, is_string: bool):
    """argmax over transformed scores → label value (or index if string)."""
    from .registry import index_dtype

    idx = jnp.argmax(scores_t, axis=-1).astype(index_dtype())
    if is_string:
        return idx  # host epilog maps index → string
    return _pick_const_by_index(idx, labels.astype(np.int64)).astype(
        index_dtype())


# --------------------------------------------------------------------------
# feature preprocessing ops
# --------------------------------------------------------------------------
@register("Scaler", domain=ML)
def scaler(ctx, node, ins):
    x = ins[0].astype(jnp.float32)
    offset = np.asarray(node.attr("offset", [0.0]), np.float32)
    scale = np.asarray(node.attr("scale", [1.0]), np.float32)
    return [(x - offset) * scale]


@register("Normalizer", domain=ML)
def normalizer(ctx, node, ins):
    x = ins[0].astype(jnp.float32)
    norm = node.attr("norm", "MAX")
    x2, squeeze = _as_2d(x)
    if norm == "MAX":
        d = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    elif norm == "L1":
        d = jnp.sum(jnp.abs(x2), axis=-1, keepdims=True)
    elif norm == "L2":
        d = jnp.sqrt(jnp.sum(x2 * x2, axis=-1, keepdims=True))
    else:
        raise UnsupportedOpError(f"Normalizer: norm {norm!r}")
    y = x2 / jnp.where(d == 0, 1.0, d)
    return [y.reshape(x.shape) if squeeze else y]


@register("Binarizer", domain=ML)
def binarizer(ctx, node, ins):
    t = float(node.attr("threshold", 0.0))
    return [(ins[0] > t).astype(ins[0].dtype)]


@register("Imputer", domain=ML)
def imputer(ctx, node, ins):
    x = ins[0]
    if jnp.issubdtype(x.dtype, jnp.floating):
        imputed = np.asarray(node.attr("imputed_value_floats"), np.float32)
        replaced = float(node.attr("replaced_value_float", np.nan))
        hit = jnp.isnan(x) if np.isnan(replaced) else (x == replaced)
    else:
        imputed = np.asarray(node.attr("imputed_value_int64s"), np.int64)
        replaced = int(node.attr("replaced_value_int64", 0))
        hit = x == replaced
    x2, squeeze = _as_2d(x)
    hit2 = hit.reshape(x2.shape)
    if imputed.size not in (1, x2.shape[-1]):
        raise UnsupportedOpError(
            f"Imputer: {imputed.size} imputed values for {x2.shape[-1]} "
            f"features")
    fill = jnp.asarray(imputed).astype(x.dtype)
    y = jnp.where(hit2, fill, x2)
    return [y.reshape(x.shape) if squeeze else y]


@register("ArrayFeatureExtractor", domain=ML)
def array_feature_extractor(ctx, node, ins):
    """Column pick along the last axis. Lowered as a one-hot matmul (the
    select matrix is [K, D]) — never an index gather (CLAUDE.md rule)."""
    x = ins[0]
    idx_c = ctx.constant(node.inputs[1])
    d = x.shape[-1]
    if idx_c is not None:
        idx = jnp.asarray(np.asarray(idx_c, np.int64).reshape(-1))
    else:
        idx = ins[1].astype(jnp.int32).reshape(-1)
    oh = (idx[:, None] == jnp.arange(d, dtype=idx.dtype))  # [K, D]
    if jnp.issubdtype(x.dtype, jnp.floating):
        y = jnp.einsum("...d,kd->...k", x, oh.astype(x.dtype))
    else:
        y = jnp.sum(jnp.where(oh, x[..., None, :], 0), axis=-1)
    if x.ndim == 1:
        y = y.reshape(-1)
    return [y]


@register("FeatureVectorizer", domain=ML)
def feature_vectorizer(ctx, node, ins):
    """Concat per-input leading columns into one [N, sum(dims)] tensor;
    each input is truncated/zero-padded to its declared inputdimensions."""
    dims = node.attr("inputdimensions")
    if dims is None:
        dims = [int(np.prod(v.shape[1:])) if v.ndim > 1 else 1 for v in ins]
    cols = []
    for v, d in zip(ins, dims):
        v2 = v.reshape(v.shape[0], -1) if v.ndim > 1 else v.reshape(-1, 1)
        v2 = v2.astype(jnp.float32)
        d = int(d)
        if v2.shape[1] >= d:
            v2 = v2[:, :d]
        else:
            v2 = jnp.pad(v2, ((0, 0), (0, d - v2.shape[1])))
        cols.append(v2)
    return [jnp.concatenate(cols, axis=1)]


@register("OneHotEncoder", domain=ML)
def one_hot_encoder(ctx, node, ins):
    """Numeric categories on device; string categories run in the host
    prolog (host.py registers the numpy twin)."""
    cats = node.attr("cats_int64s")
    if cats is None:
        raise UnsupportedOpError(
            "OneHotEncoder with cats_strings needs a string input (hosted); "
            "numeric inputs require cats_int64s")
    cats = jnp.asarray(np.asarray(cats, np.int64).astype(np.int32))
    x = ins[0].astype(jnp.int32)
    # zeros=0 means unmatched categories are a model error; XLA cannot
    # raise data-dependently, so unmatched rows stay all-zero either way
    return [(x[..., None] == cats).astype(jnp.float32)]


@register("LabelEncoder", domain=ML)
def label_encoder(ctx, node, ins):
    """Numeric→numeric mapping on device via one-hot multiply-sum; any
    string-keyed or string-valued variant is hosted (host.py)."""
    keys, kstr = _label_encoder_table(node, "keys")
    vals, vstr = _label_encoder_table(node, "values")
    if kstr or vstr:
        raise UnsupportedOpError(
            "LabelEncoder over strings runs on host; it reached the device "
            "graph, which means its input is numeric but its table is not")
    default = node.attr("default_float")
    if default is None:
        default = node.attr("default_int64", -1)
    x = ins[0]
    eq = x[..., None] == jnp.asarray(keys.astype(x.dtype))  # [..., K]
    hit = jnp.any(eq, axis=-1)
    picked = jnp.sum(jnp.where(eq, jnp.asarray(vals), 0), axis=-1)
    y = jnp.where(hit, picked, jnp.asarray(vals.dtype.type(default)))
    return [y]


def _label_encoder_table(node: Node, which: str) -> Tuple[np.ndarray, bool]:
    """LabelEncoder v2 ({which}_int64s/_floats/_strings) or v4
    ({which}_tensor) table; returns (array, is_string)."""
    t = node.attr(f"{which}_tensor")
    if t is not None:
        arr = np.asarray(t)
        return arr, arr.dtype.kind in ("U", "S", "O")
    s = node.attr(f"{which}_strings")
    if s is not None:
        return np.asarray(s, dtype=object), True
    f = node.attr(f"{which}_floats")
    if f is not None:
        return np.asarray(f, np.float32), False
    i = node.attr(f"{which}_int64s")
    if i is not None:
        return np.asarray(i, np.int64), False
    raise UnsupportedOpError(f"LabelEncoder: no {which}_* attribute")


# --------------------------------------------------------------------------
# linear models
# --------------------------------------------------------------------------
@register("LinearRegressor", domain=ML)
def linear_regressor(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    targets = int(node.attr("targets", 1))
    coeff = np.asarray(node.attr("coefficients"), np.float32)
    w = coeff.reshape(targets, -1)  # [T, F]
    b = np.asarray(node.attr("intercepts", [0.0] * targets), np.float32)
    y = x @ jnp.asarray(w.T) + jnp.asarray(b)
    return [post_transform(y, node.attr("post_transform", "NONE"))]


def _expand_binary(scores):
    """One decision value for a 2-class model → [-s, s] so that a
    subsequent LOGISTIC/SOFTMAX yields complementary class scores."""
    return jnp.concatenate([-scores, scores], axis=-1)


@register("LinearClassifier", domain=ML)
def linear_classifier(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    labels, is_str = _labels_attr(node, "classlabels")
    n_classes = len(labels)
    coeff = np.asarray(node.attr("coefficients"), np.float32)
    n_sets = coeff.size // x.shape[-1] if x.shape[-1] else 1
    w = coeff.reshape(n_sets, -1)  # [S, F]
    b = np.asarray(node.attr("intercepts", [0.0] * n_sets), np.float32)
    z = x @ jnp.asarray(w.T) + jnp.asarray(b)  # [B, S]
    if n_sets == 1 and n_classes == 2:
        z = _expand_binary(z)
    scores = post_transform(z, node.attr("post_transform", "NONE"))
    return [_emit_labels(scores, labels, is_str), scores]


# --------------------------------------------------------------------------
# SVMs (libsvm layout; reference for semantics: the ai.onnx.ml spec)
# --------------------------------------------------------------------------
def _svm_kernel(node: Node, x, sv):
    """k(x, sv): x [B,F], sv [NSV,F] → [B,NSV]; one matmul + elementwise."""
    kind = node.attr("kernel_type", "LINEAR")
    gamma, coef0, degree = 0.0, 0.0, 3.0
    kp = node.attr("kernel_params")
    if kp:
        kp = list(kp) + [0.0] * (3 - len(kp))
        gamma, coef0, degree = float(kp[0]), float(kp[1]), float(kp[2])
    dot = x @ sv.T  # [B, NSV] — the MXU does all the work
    if kind == "LINEAR":
        return dot
    if kind == "POLY":
        return (gamma * dot + coef0) ** degree
    if kind == "SIGMOID":
        return jnp.tanh(gamma * dot + coef0)
    if kind == "RBF":
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        s2 = jnp.sum(sv * sv, axis=-1)
        return jnp.exp(-gamma * (x2 - 2 * dot + s2))
    raise UnsupportedOpError(f"SVM kernel_type {kind!r}")


@register("SVMRegressor", domain=ML)
def svm_regressor(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    coeff = np.asarray(node.attr("coefficients"), np.float32)
    rho = np.asarray(node.attr("rho", [0.0]), np.float32)
    nsv = int(node.attr("n_supports", 0))
    if nsv:
        sv = jnp.asarray(
            np.asarray(node.attr("support_vectors"), np.float32)
            .reshape(nsv, -1))
        k = _svm_kernel(node, x, sv)  # [B, NSV]
        y = k @ jnp.asarray(coeff.reshape(nsv, 1)) + rho[0]
    else:  # linear mode: coefficients are feature weights
        y = x @ jnp.asarray(coeff.reshape(-1, 1)) + rho[0]
    one_class = int(node.attr("one_class", 0))
    if one_class:
        y = jnp.sign(y)
    return [post_transform(y, node.attr("post_transform", "NONE"))]


def _pairwise_coupling(pair_probs, n_classes: int, pairs):
    """Wu–Lin (2004) second method: pairwise class probabilities → class
    posteriors, the same algorithm libsvm/ORT use. Fixed-iteration jax
    loop (data-dependent convergence is not jittable); 100 rounds is far
    past libsvm's stopping point for C ≤ ~50."""
    b = pair_probs.shape[0]
    r = jnp.full((b, n_classes, n_classes), 0.5, jnp.float32)
    for k, (i, j) in enumerate(pairs):
        r = r.at[:, i, j].set(pair_probs[:, k])
        r = r.at[:, j, i].set(1.0 - pair_probs[:, k])
    q = jnp.zeros((b, n_classes, n_classes), jnp.float32)
    for i in range(n_classes):
        for j in range(n_classes):
            if i == j:
                q = q.at[:, i, i].set(jnp.sum(r[:, :, i] ** 2, axis=-1)
                                      - r[:, i, i] ** 2)
            else:
                q = q.at[:, i, j].set(-r[:, j, i] * r[:, i, j])

    p0 = jnp.full((b, n_classes), 1.0 / n_classes, jnp.float32)

    def step(_, p):
        qp = jnp.einsum("bij,bj->bi", q, p)
        pqp = jnp.sum(p * qp, axis=-1, keepdims=True)
        for i in range(n_classes):
            diff = (-qp[:, i] + pqp[:, 0]) / jnp.maximum(q[:, i, i], 1e-12)
            p = p.at[:, i].add(diff)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            qp = jnp.einsum("bij,bj->bi", q, p)
            pqp = jnp.sum(p * qp, axis=-1, keepdims=True)
        return p

    return jax.lax.fori_loop(0, 100, step, p0)


@register("SVMClassifier", domain=ML)
def svm_classifier(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    labels, is_str = _labels_attr(node, "classlabels")
    n_classes = len(labels)
    rho = np.asarray(node.attr("rho"), np.float32)
    coeff = np.asarray(node.attr("coefficients"), np.float32)
    prob_a = node.attr("prob_a")
    prob_b = node.attr("prob_b")
    vpc = node.attr("vectors_per_class")
    pt = node.attr("post_transform", "NONE")

    if not vpc or sum(vpc) == 0:  # linear mode (e.g. LinearSVC)
        w = coeff.reshape(n_classes if n_classes > 2 else 1, -1)
        z = x @ jnp.asarray(w.T) + jnp.asarray(rho)
        if w.shape[0] == 1 and n_classes == 2:
            z = _expand_binary(z)
        scores = post_transform(z, pt)
        return [_emit_labels(scores, labels, is_str), scores]

    vpc = [int(v) for v in vpc]
    nsv = sum(vpc)
    sv = jnp.asarray(
        np.asarray(node.attr("support_vectors"), np.float32).reshape(nsv, -1))
    dual = coeff.reshape(n_classes - 1, nsv)  # libsvm dual-coef layout
    k = _svm_kernel(node, x, sv)  # [B, NSV]

    starts = np.concatenate([[0], np.cumsum(vpc)])
    pairs = [(i, j) for i in range(n_classes)
             for j in range(i + 1, n_classes)]
    # decision value per (i,j) pair is a dot of K with a fixed dual-coef
    # pattern → stack all pairs into ONE [NSV, P] matrix, single matmul
    pat = np.zeros((nsv, len(pairs)), np.float32)
    for p, (i, j) in enumerate(pairs):
        si, ei = starts[i], starts[i + 1]
        sj, ej = starts[j], starts[j + 1]
        pat[si:ei, p] = dual[j - 1, si:ei]
        pat[sj:ej, p] = dual[i, sj:ej]
    dec = k @ jnp.asarray(pat) + jnp.asarray(rho)  # [B, P]

    if prob_a is not None and prob_b is not None and len(prob_a):
        pa = np.asarray(prob_a, np.float32)
        pb = np.asarray(prob_b, np.float32)
        pij = jax.nn.sigmoid(-(pa * dec + pb))  # libsvm: P(first class)
        pij = jnp.clip(pij, 1e-7, 1 - 1e-7)
        if n_classes == 2:
            scores = jnp.concatenate([pij, 1 - pij], axis=-1)
            scores = post_transform(scores, pt)
            return [_emit_labels(scores, labels, is_str), scores]
        probs = _pairwise_coupling(pij, n_classes, pairs)
        scores = post_transform(probs, pt)
        return [_emit_labels(scores, labels, is_str), scores]

    # no probability tables: scores are the raw pair decision values and
    # the label comes from one-vs-one VOTING (ties → lowest class index)
    votes = jnp.zeros((x.shape[0], n_classes), jnp.float32)
    for p, (i, j) in enumerate(pairs):
        win_i = dec[:, p] > 0
        votes = votes.at[:, i].add(jnp.where(win_i, 1.0, 0.0))
        votes = votes.at[:, j].add(jnp.where(win_i, 0.0, 1.0))
    from .registry import index_dtype

    idx = jnp.argmax(votes, axis=-1).astype(index_dtype())
    if n_classes == 2:
        # libsvm binary: one pair; POSITIVE decision votes the FIRST
        # class (unlike LinearClassifier's sklearn convention), so the
        # score pair is [d, -d] — argmax(scores) == the voted label
        scores = post_transform(jnp.concatenate([dec, -dec], axis=-1), pt)
    else:
        scores = post_transform(dec, pt)
    if is_str:
        return [idx, scores]
    lab = _pick_const_by_index(idx, labels.astype(np.int64))
    return [lab.astype(index_dtype()), scores]


# --------------------------------------------------------------------------
# tree ensembles — the GEMM strategy (see module docstring)
# --------------------------------------------------------------------------
_CMP = {
    "BRANCH_LEQ": lambda a, b: a <= b,
    "BRANCH_LT": lambda a, b: a < b,
    "BRANCH_GTE": lambda a, b: a >= b,
    "BRANCH_GT": lambda a, b: a > b,
    "BRANCH_EQ": lambda a, b: a == b,
    "BRANCH_NEQ": lambda a, b: a != b,
}


# above this many cells the dense path matrix C [NI, NL] switches to the
# block-diagonal form (C only couples nodes and leaves of the SAME tree):
# per-tree blocks padded to the max tree size and contracted with one
# batched einsum — a 500-tree depth-8 forest needs ~130 MB blocked vs
# ~65 GB dense, and the batched matmul is exactly what the MXU wants
_BLOCKED_THRESHOLD = 1 << 22


class _TreeTables:
    """Trace-time numpy compilation of an ONNX tree ensemble into the GEMM
    matrices: feats/thresh per internal node, path matrix C [NI, NL], true-
    ancestor counts D [NL], leaf keys for the output matrix. Large forests
    use the block-diagonal-by-tree layout (see _BLOCKED_THRESHOLD)."""

    def __init__(self, tree_ids, node_ids, feats, modes, values,
                 true_ids, false_ids, miss_true):
        n = len(tree_ids)
        row = {(int(tree_ids[i]), int(node_ids[i])): i for i in range(n)}
        if len(row) != n:
            raise UnsupportedOpError("tree ensemble: duplicate (tree, node)")
        is_leaf = [m == "LEAF" for m in modes]
        self.internal = [i for i in range(n) if not is_leaf[i]]
        self.leaves: List[int] = []
        icol = {r: c for c, r in enumerate(self.internal)}

        # roots: first row of each tree id (spec: nodes are listed per tree;
        # robust fallback = the node of a tree never referenced as a child)
        children = set()
        for i in range(n):
            if not is_leaf[i]:
                children.add(row[(int(tree_ids[i]), int(true_ids[i]))])
                children.add(row[(int(tree_ids[i]), int(false_ids[i]))])
        roots = [i for i in range(n) if i not in children]

        paths: Dict[int, List[Tuple[int, int]]] = {}
        for r in roots:
            stack = [(r, [])]
            while stack:
                i, path = stack.pop()
                if is_leaf[i]:
                    paths[i] = path
                    self.leaves.append(i)
                    continue
                t = row[(int(tree_ids[i]), int(true_ids[i]))]
                f = row[(int(tree_ids[i]), int(false_ids[i]))]
                stack.append((t, path + [(icol[i], +1)]))
                stack.append((f, path + [(icol[i], -1)]))
        if len(paths) + len(self.internal) != n:
            raise UnsupportedOpError(
                "tree ensemble: disconnected nodes (bad child ids)")

        self.n_trees = len(roots)
        by_tree: Dict[int, Tuple[List[int], List[int]]] = {}
        for i in self.internal:
            by_tree.setdefault(int(tree_ids[i]), ([], []))[0].append(i)
        for i in self.leaves:
            by_tree.setdefault(int(tree_ids[i]), ([], []))[1].append(i)
        tree_order = sorted(by_tree)
        ni_m = max((len(v[0]) for v in by_tree.values()), default=1) or 1
        nl_m = max(len(v[1]) for v in by_tree.values())
        t = len(tree_order)
        self.blocked = len(self.internal) * len(self.leaves) \
            > _BLOCKED_THRESHOLD
        if self.blocked:
            # per-tree padded layout: row t*NI_m + j / leaf t*NL_m + j
            self.block_shape = (t, ni_m, nl_m)
            order_i = {}
            order_l = {}
            feat = np.zeros(t * ni_m, np.int64)
            thresh = np.zeros(t * ni_m, np.float32)
            miss = np.zeros(t * ni_m, np.float32)
            mode_l = ["BRANCH_LEQ"] * (t * ni_m)
            self.C = np.zeros((t, ni_m, nl_m), np.float32)
            self.D = np.full((t, nl_m), -1.0, np.float32)  # pads: never hit
            self.leaf_key = [("__pad__", ti, j) for ti in range(t)
                             for j in range(nl_m)]
            for ti, tid in enumerate(tree_order):
                ints, lvs = by_tree[tid]
                for j, i in enumerate(ints):
                    r = ti * ni_m + j
                    order_i[i] = r
                    feat[r] = feats[i]
                    thresh[r] = values[i]
                    mode_l[r] = modes[i]
                    miss[r] = (miss_true[i]
                               if miss_true is not None else 0)
                for j, i in enumerate(lvs):
                    order_l[i] = (ti, j)
                    self.D[ti, j] = 0.0
                    self.leaf_key[ti * nl_m + j] = (
                        int(tree_ids[i]), int(node_ids[i]))
            for leaf, path in paths.items():
                ti, j = order_l[leaf]
                for (col, sign) in path:
                    # `col` indexes self.internal order; map to padded row
                    r = order_i[self.internal[col]]
                    self.C[ti, r - ti * ni_m, j] = sign
                    if sign > 0:
                        self.D[ti, j] += 1.0
            self.feat, self.thresh, self.miss = feat, thresh, miss
            self.modes = mode_l
        else:
            ni, nl = len(self.internal), len(self.leaves)
            self.feat = np.asarray([feats[i] for i in self.internal],
                                   np.int64)
            self.thresh = np.asarray([values[i] for i in self.internal],
                                     np.float32)
            self.modes = [modes[i] for i in self.internal]
            self.miss = np.asarray(
                [(miss_true[i] if miss_true is not None else 0)
                 for i in self.internal], np.float32)
            self.C = np.zeros((ni, nl), np.float32)
            self.D = np.zeros((nl,), np.float32)
            for c, leaf in enumerate(self.leaves):
                for (i, sign) in paths[leaf]:
                    self.C[i, c] = sign
                    if sign > 0:
                        self.D[c] += 1.0
            self.leaf_key = [(int(tree_ids[i]), int(node_ids[i]))
                             for i in self.leaves]

    def leaf_onehot(self, x):
        """x [B,F] float32 → leaf selector [B,NL] float32 (exactly one 1
        per live tree slot; padded slots in the blocked layout are never
        selected — their required count D is -1). Three fused device
        steps: pick, compare, path-matmul (batched over trees when
        blocked)."""
        f = x.shape[-1]
        ni = self.feat.shape[0]
        ok = self.feat < f
        if not ok.all():
            raise UnsupportedOpError(
                f"tree ensemble reads feature {int(self.feat.max())} but "
                f"input has {f} columns")
        a = np.zeros((f, ni), np.float32)
        a[self.feat, np.arange(ni)] = 1.0
        a_j = jnp.asarray(a)
        xc = jnp.nan_to_num(x, nan=0.0)
        xn = xc @ a_j  # [B, NI] node-feature pick
        nanm = jnp.isnan(x).astype(jnp.float32) @ a_j  # [B, NI] ∈ {0,1}

        thr = jnp.asarray(self.thresh)
        pred = jnp.zeros(xn.shape, jnp.float32)
        for mode in sorted(set(self.modes)):
            mask = np.asarray([m == mode for m in self.modes], np.bool_)
            if mode not in _CMP:
                raise UnsupportedOpError(f"tree ensemble node mode {mode!r}")
            p = _CMP[mode](xn, thr).astype(jnp.float32)
            pred = jnp.where(jnp.asarray(mask), p, pred)
        pred = jnp.where(nanm > 0, jnp.asarray(self.miss), pred)

        if self.blocked:
            t, ni_m, nl_m = self.block_shape
            s = jnp.einsum("bti,tij->btj",
                           pred.reshape(-1, t, ni_m), jnp.asarray(self.C))
            eq = s == jnp.asarray(self.D)
            return eq.reshape(-1, t * nl_m).astype(jnp.float32)
        s = pred @ jnp.asarray(self.C)  # [B, NL]
        return (s == jnp.asarray(self.D)).astype(jnp.float32)


def _tables_from_attrs(node: Node) -> _TreeTables:
    get = node.attr
    required = ("nodes_treeids", "nodes_nodeids", "nodes_featureids",
                "nodes_modes", "nodes_values", "nodes_truenodeids",
                "nodes_falsenodeids")
    vals = [get(k) for k in required]
    if any(v is None for v in vals):
        missing = [k for k, v in zip(required, vals) if v is None]
        raise UnsupportedOpError(f"{node.op_type}: missing {missing}")
    return _TreeTables(*vals, get("nodes_missing_value_tracks_true"))


def _leaf_matrix(tables: _TreeTables, treeids, nodeids, outids, weights,
                 n_out: int) -> np.ndarray:
    """E [NL, n_out]: summed weights of each leaf's (class|target) entries.
    The spec allows several entries per leaf (multi-output trees)."""
    pos = {k: i for i, k in enumerate(tables.leaf_key)}
    e = np.zeros((len(tables.leaf_key), n_out), np.float32)
    for t, nd, o, w in zip(treeids, nodeids, outids, weights):
        i = pos.get((int(t), int(nd)))
        if i is None:
            raise UnsupportedOpError(
                f"tree ensemble: weight on unknown leaf ({t},{nd})")
        e[i, int(o)] += float(w)
    return e


@register("TreeEnsembleRegressor", domain=ML)
def tree_ensemble_regressor(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    tables = _tables_from_attrs(node)
    n_targets = int(node.attr("n_targets", 1))
    e = _leaf_matrix(tables, node.attr("target_treeids"),
                     node.attr("target_nodeids"), node.attr("target_ids"),
                     node.attr("target_weights"), n_targets)
    onehot = tables.leaf_onehot(x)  # [B, NL]
    agg = node.attr("aggregate_function", "SUM")
    if agg in ("SUM", "AVERAGE"):
        y = onehot @ jnp.asarray(e)
        if agg == "AVERAGE":
            y = y / max(tables.n_trees, 1)
    elif agg in ("MIN", "MAX"):
        # each tree selects exactly one leaf → min/max over trees equals
        # min/max over *selected* leaves; mask unselected with ±BIG
        v = onehot[..., None] * jnp.asarray(e)  # [B, NL, T]
        sel = onehot[..., None] > 0
        if agg == "MIN":
            y = jnp.min(jnp.where(sel, v, _BIG), axis=1)
        else:
            y = jnp.max(jnp.where(sel, v, -_BIG), axis=1)
    else:
        raise UnsupportedOpError(f"aggregate_function {agg!r}")
    base = node.attr("base_values")
    if base is not None:
        y = y + jnp.asarray(np.asarray(base, np.float32))
    return [post_transform(y, node.attr("post_transform", "NONE"))]


@register("TreeEnsembleClassifier", domain=ML)
def tree_ensemble_classifier(ctx, node, ins):
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    labels, is_str = _labels_attr(node, "classlabels")
    n_classes = len(labels)
    tables = _tables_from_attrs(node)
    class_ids = [int(c) for c in node.attr("class_ids")]
    one_sided = n_classes == 2 and len(set(class_ids)) == 1
    e = _leaf_matrix(tables, node.attr("class_treeids"),
                     node.attr("class_nodeids"),
                     [0] * len(class_ids) if one_sided else class_ids,
                     node.attr("class_weights"),
                     1 if one_sided else n_classes)
    onehot = tables.leaf_onehot(x)
    z = onehot @ jnp.asarray(e)  # [B, 1 | C]
    base = node.attr("base_values")
    if base is not None and not one_sided:
        z = z + jnp.asarray(np.asarray(base, np.float32))
    if one_sided:
        if base is not None:
            z = z + float(np.asarray(base, np.float32).reshape(-1)[-1])
        # single-score binary ensemble (GBM style): expand to [-s, s] so
        # LOGISTIC/SOFTMAX produce complementary class scores; flip when
        # the weights were written for class 0
        z = _expand_binary(z) if class_ids[0] == 1 \
            else _expand_binary(z)[..., ::-1]
    scores = post_transform(z, node.attr("post_transform", "NONE"))
    return [_emit_labels(scores, labels, is_str), scores]


# --------------------------------------------------------------------------
# TreeEnsemble (ai.onnx.ml opset 5): tensor-attribute format
# --------------------------------------------------------------------------
_V5_MODES = {0: "BRANCH_LEQ", 1: "BRANCH_LT", 2: "BRANCH_GTE",
             3: "BRANCH_GT", 4: "BRANCH_EQ", 5: "BRANCH_NEQ"}


@register("TreeEnsemble", domain=ML)
def tree_ensemble_v5(ctx, node, ins):
    """Opset-5 unified tree op. Internal nodes/leaves live in separate
    arrays with leaf-flag indirection; converted here to the same GEMM
    tables as the v3 ops. BRANCH_MEMBER (set membership) is not lowered."""
    x, _ = _as_2d(ins[0].astype(jnp.float32))
    get = node.attr

    feats = np.asarray(get("nodes_featureids"), np.int64)
    splits = np.asarray(get("nodes_splits"), np.float32)
    modes_i = np.asarray(get("nodes_modes"), np.int64)
    true_ids = np.asarray(get("nodes_truenodeids"), np.int64)
    false_ids = np.asarray(get("nodes_falsenodeids"), np.int64)
    true_leaf = np.asarray(get("nodes_trueleafs"), np.int64)
    false_leaf = np.asarray(get("nodes_falseleafs"), np.int64)
    roots = np.asarray(get("tree_roots"), np.int64)
    leaf_tid = np.asarray(get("leaf_targetids"), np.int64)
    leaf_w = np.asarray(get("leaf_weights"), np.float32)
    miss = get("nodes_missing_value_tracks_true")
    n_targets = int(get("n_targets", int(leaf_tid.max()) + 1
                        if leaf_tid.size else 1))
    if any(int(m) not in _V5_MODES for m in modes_i):
        raise UnsupportedOpError(
            "TreeEnsemble: BRANCH_MEMBER (set membership) has no dense "
            "lowering here yet")

    ni, nl = len(feats), len(leaf_w)
    # flatten to the v3 row format: internals first, then leaves
    tree_ids = np.zeros(ni + nl, np.int64)
    node_ids = np.arange(ni + nl, dtype=np.int64)  # unique per row
    modes = ["LEAF"] * (ni + nl)
    values = np.zeros(ni + nl, np.float32)
    t_ids = np.zeros(ni + nl, np.int64)
    f_ids = np.zeros(ni + nl, np.int64)
    feats_full = np.zeros(ni + nl, np.int64)
    miss_full = np.zeros(ni + nl, np.float32)

    def child_row(idx, leaf_flag):
        return ni + int(idx) if leaf_flag else int(idx)

    for t, r in enumerate(roots):
        # mark the whole subtree with tree id t (iterative walk)
        stack = [int(r)]
        while stack:
            i = stack.pop()
            tree_ids[i] = t
            modes[i] = _V5_MODES[int(modes_i[i])]
            values[i] = splits[i]
            feats_full[i] = feats[i]
            if miss is not None:
                miss_full[i] = float(miss[i])
            tc = child_row(true_ids[i], true_leaf[i])
            fc = child_row(false_ids[i], false_leaf[i])
            t_ids[i] = node_ids[tc]
            f_ids[i] = node_ids[fc]
            tree_ids[tc] = t
            tree_ids[fc] = t
            if not true_leaf[i]:
                stack.append(int(true_ids[i]))
            if not false_leaf[i]:
                stack.append(int(false_ids[i]))

    tables = _TreeTables(tree_ids, node_ids, feats_full, modes, values,
                         t_ids, f_ids, miss_full)
    # leaf rows appear in `tables.leaf_key` as (tree, ni+leaf_index)
    e = np.zeros((len(tables.leaf_key), n_targets), np.float32)
    pos = {k: i for i, k in enumerate(tables.leaf_key)}
    for li in range(nl):
        row = pos.get((int(tree_ids[ni + li]), ni + li))
        if row is None:
            continue  # unreachable leaf (never referenced)
        e[row, int(leaf_tid[li])] += float(leaf_w[li])

    onehot = tables.leaf_onehot(x)
    agg = int(get("aggregate_function", 1))  # 0=AVG,1=SUM,2=MIN,3=MAX
    v3_agg = {0: "AVERAGE", 1: "SUM", 2: "MIN", 3: "MAX"}.get(agg, "SUM")
    if v3_agg in ("SUM", "AVERAGE"):
        y = onehot @ jnp.asarray(e)
        if v3_agg == "AVERAGE":
            y = y / max(tables.n_trees, 1)
    elif v3_agg == "MIN":
        y = jnp.min(jnp.where(onehot[..., None] > 0,
                              onehot[..., None] * jnp.asarray(e), _BIG),
                    axis=1)
    else:
        y = jnp.max(jnp.where(onehot[..., None] > 0,
                              onehot[..., None] * jnp.asarray(e), -_BIG),
                    axis=1)
    pt = int(get("post_transform", 0))
    kinds = {0: "NONE", 1: "SOFTMAX", 2: "LOGISTIC", 3: "SOFTMAX_ZERO",
             4: "PROBIT"}
    return [post_transform(y, kinds.get(pt, "NONE"))]
