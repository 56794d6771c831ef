"""Optimization pass tests: BN folding + conv-bias fusion numerics."""

import numpy as np

import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import Graph, Node, import_model
from onnx_rusty_inference_engine_tpu.passes import (
    fold_batchnorm,
    fuse_conv_bias_add,
)

from util import make_model, node

rng = np.random.default_rng(17)


def _raw_import(m):
    """Import without the optimize() pass (build Graph manually)."""
    g = import_model(m)  # optimize already ran; fine for reference output
    return g


def test_conv_bias_add_fused_on_mnist():
    g = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    ops = [n.op_type for n in g.nodes]
    # CNTK export: Conv -> Add(bias [C,1,1]); both Adds fold into the convs
    assert ops.count("Conv") == 2
    assert ops.count("Add") == 1  # only the final FC bias add remains
    for n in g.nodes:
        if n.op_type == "Conv":
            assert len(n.inputs) == 3  # bias attached


def test_mnist_still_matches_golden_after_fusion(mnist_golden):
    x, y = mnist_golden
    g = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    out = Engine(g).run({x.name: x.array}).outputs["Plus214_Output_0"]
    np.testing.assert_allclose(out, y.array, rtol=1e-4, atol=1e-3)


def test_bn_fold_numerics():
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)
    gamma = (1 + 0.3 * rng.standard_normal(6)).astype(np.float32)
    beta = rng.standard_normal(6).astype(np.float32)
    mean = rng.standard_normal(6).astype(np.float32)
    var = (0.5 + np.abs(rng.standard_normal(6))).astype(np.float32)

    nodes = [
        node("Conv", ["x", "w"], ["c"], pads=[1, 1, 1, 1]),
        node("BatchNormalization", ["c", "g", "b", "m", "v"], ["out0"],
             epsilon=1e-5),
    ]
    m = make_model(nodes, {"x": x}, ["out0"],
                   {"w": w, "g": gamma, "b": beta, "m": mean, "v": var})
    g = import_model(m)  # optimize() folds BN
    assert all(n.op_type != "BatchNormalization" for n in g.nodes)

    got = Engine(g).run({"x": x}).outputs["out0"]
    # manual reference
    import jax
    from onnx_rusty_inference_engine_tpu.engine import lower
    ref_nodes = [n for n in g.nodes]  # folded already; compute unfused ref:
    pad = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    conv = np.zeros((2, 6, 8, 8), np.float32)
    for b_ in range(2):
        for o in range(6):
            for i in range(3):
                for hh in range(8):
                    for ww in range(8):
                        conv[b_, o, hh, ww] += np.sum(
                            pad[b_, i, hh:hh + 3, ww:ww + 3] * w[o, i])
    want = ((conv - mean.reshape(1, -1, 1, 1))
            / np.sqrt(var.reshape(1, -1, 1, 1) + 1e-5)
            * gamma.reshape(1, -1, 1, 1) + beta.reshape(1, -1, 1, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_bn_not_folded_when_conv_output_shared():
    """If the conv output feeds both BN and something else, don't fold."""
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((2, 2, 1, 1)).astype(np.float32)
    p = np.ones(2, np.float32)
    z = np.zeros(2, np.float32)
    nodes = [
        node("Conv", ["x", "w"], ["c"]),
        node("BatchNormalization", ["c", "g", "b", "m", "v"], ["bn"]),
        node("Relu", ["c"], ["r"]),
        node("Add", ["bn", "r"], ["out0"]),
    ]
    m = make_model(nodes, {"x": x}, ["out0"],
                   {"w": w, "g": p, "b": z, "m": z, "v": p})
    g = import_model(m)
    assert any(n.op_type == "BatchNormalization" for n in g.nodes)
    out = Engine(g).run({"x": x}).outputs["out0"]
    assert np.all(np.isfinite(out))


def test_resnet_int8_fully_quantized_spine():
    """After BN fold, ResNet's conv spine quantizes without fp32 islands."""
    from onnx_rusty_inference_engine_tpu.models import build_resnet50
    from onnx_rusty_inference_engine_tpu.quant import quantize_graph

    g = import_model(build_resnet50())
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    q = quantize_graph(g, calibration_inputs=[{"data": x}])
    ops = {}
    for n in q.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops.get("QLinearConv", 0) == 53
    # residual Adds happen in fp32 (dequant islands) but there must be no
    # plain fp32 Convs left
    assert "Conv" not in ops
