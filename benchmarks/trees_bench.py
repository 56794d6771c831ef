"""Classical-ML throughput: a GEMM-lowered tree ensemble on the chip.

The ai.onnx.ml TreeEnsembleRegressor lowers to three (batched) matmuls
(ops/ml.py); this measures rows/s for an XGBoost-scale forest, chained
on-device (utils/timing.py — the only honest measurement through the
tunnel). The reference engine has no ml-domain support; the comparison
point is simply that a sklearn/XGBoost user gets MXU-rate inference.

Usage (real chip): python benchmarks/trees_bench.py [--trees 200 --depth 6]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

import jax.numpy as jnp

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.utils.timing import device_loop_timer


def _forest_attrs(n_trees, depth, n_feat, seed):
    """Random full binary forest in ONNX v3 attribute form (numpy-built)."""
    r = np.random.default_rng(seed)
    rows, leaf = [], {"target_treeids": [], "target_nodeids": [],
                      "target_ids": [], "target_weights": []}

    def build(t, nid, d):
        my = nid[0]
        nid[0] += 1
        if d == 0:
            rows.append([t, my, 0, "LEAF", 0.0, 0, 0, 0])
            leaf["target_treeids"].append(t)
            leaf["target_nodeids"].append(my)
            leaf["target_ids"].append(0)
            leaf["target_weights"].append(float(r.normal()))
            return my
        row = [t, my, int(r.integers(0, n_feat)), "BRANCH_LEQ",
               float(r.normal()), 0, 0, 0]
        rows.append(row)
        row[5] = build(t, nid, d - 1)
        row[6] = build(t, nid, d - 1)
        return my

    for t in range(n_trees):
        build(t, [0], depth)
    keys = ("nodes_treeids", "nodes_nodeids", "nodes_featureids",
            "nodes_modes", "nodes_values", "nodes_truenodeids",
            "nodes_falsenodeids", "nodes_missing_value_tracks_true")
    return {**{k: [row[i] for row in rows] for i, k in enumerate(keys)},
            **leaf}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", type=int, default=200)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from tests.util import attr  # reuse the attribute builder

    attrs = _forest_attrs(args.trees, args.depth, args.features, seed=7)
    n = onnx_io.NodeProto(
        op_type="TreeEnsembleRegressor", input=["x"], output=["y"],
        domain="ai.onnx.ml",
        attributes={k: attr(k, v) for k, v in
                    {**attrs, "n_targets": 1}.items()})
    g = onnx_io.GraphProto(name="forest")
    g.nodes = [n]
    g.inputs = [onnx_io.ValueInfo(name="x", elem_type=1,
                                  shape=[args.batch, args.features])]
    g.outputs = [onnx_io.ValueInfo(name="y")]
    eng = Engine(import_model(onnx_io.ModelProto(graph=g, opset_version=13)))

    from onnx_rusty_inference_engine_tpu.ops import ml as _ml
    ni = sum(m != "LEAF" for m in attrs["nodes_modes"])
    nl = sum(m == "LEAF" for m in attrs["nodes_modes"])
    layout = "blocked" if ni * nl > _ml._BLOCKED_THRESHOLD else "dense"

    rng = np.random.default_rng(0)
    feed = {"x": jnp.asarray(rng.normal(size=(args.batch, args.features)),
                             jnp.float32)}
    fn = eng.jitted

    def step(params, carry):
        out = fn(params, carry)
        dep = jnp.sum(out["y"].ravel()[:1]) * 0
        return {"x": carry["x"] + dep}

    sec = device_loop_timer(step, feed, args.iters, params=eng.params)
    print(json.dumps({
        "bench": "tree_ensemble", "trees": args.trees, "depth": args.depth,
        "features": args.features, "batch": args.batch, "layout": layout,
        "internal_nodes": ni, "leaves": nl,
        "step_ms": round(sec * 1e3, 4),
        "rows_per_sec": round(args.batch / sec, 1),
        "tree_evals_per_sec": round(args.batch * args.trees / sec, 1),
    }))


if __name__ == "__main__":
    main()
