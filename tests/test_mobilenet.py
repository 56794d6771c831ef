"""MobileNetV2 family tests: depthwise QLinearConv, int8-domain ReLU6
(Clip), residual Adds between quantized tensors."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.mobilenet import build_mobilenetv2
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(37)


@pytest.fixture(scope="module")
def mnv2_graph():
    return import_model(build_mobilenetv2())


def test_mobilenetv2_topology(mnv2_graph):
    ops = {}
    for n in mnv2_graph.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    # 1 stem + 17 blocks x (expand? + dw + project) + 1 head
    # block0 has t=1 (no expand) -> 16*3 + 2 + 2 + 1 = 52 convs
    assert ops["Conv"] == 52
    dw = [n for n in mnv2_graph.nodes
          if n.op_type == "Conv" and int(n.attr("group", 1)) > 1]
    assert len(dw) == 17  # one depthwise conv per inverted residual
    assert ops["Clip"] == 35  # stem + head + per-block (1 or 2)
    assert ops["Add"] == 10  # residual connections


def test_mobilenetv2_forward(mnv2_graph):
    eng = Engine(mnv2_graph)
    x = rng.standard_normal((2, 3, 96, 96)).astype(np.float32)
    out = eng.run({"input": x})["output"]
    assert out.shape == (2, 1000)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=1e-4)


def test_depthwise_conv_matches_torch():
    """Grouped/depthwise conv conformance vs torch (cross-framework)."""
    import torch

    C, k = 24, 3
    x = rng.standard_normal((2, C, 17, 19)).astype(np.float32)
    w = rng.standard_normal((C, 1, k, k)).astype(np.float32)

    from onnx_rusty_inference_engine_tpu.models._builder import GraphBuilder

    b = GraphBuilder("dw", opset=13)
    xi = b.input("x", list(x.shape))
    wn = b.init("w", w)
    (y,) = b.node("Conv", [xi, wn], ["y"], kernel_shape=[k, k],
                  strides=[2, 2], pads=[1, 1, 1, 1], group=C)
    b.output(y)
    g = import_model(b.model())
    got = Engine(g).run({"x": x})["y"]
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1,
        groups=C).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mobilenetv2_int8(mnv2_graph):
    x = rng.standard_normal((2, 3, 96, 96)).astype(np.float32)
    q = quantize_graph(mnv2_graph, calibration_inputs=[{"input": x}])
    ops = {}
    for n in q.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops["QLinearConv"] == 52
    assert ops["QLinearMatMul"] == 1  # the Gemm classifier
    # every ReLU6 stays in the int8 domain (no dequant/requant island):
    # Clip nodes in the q-graph must consume int8 bound constants
    clips = [n for n in q.nodes if n.op_type == "Clip"]
    assert len(clips) == 35
    for n in clips:
        assert q.constants[n.inputs[1]].dtype == np.int8
        assert q.constants[n.inputs[2]].dtype == np.int8
    ref = Engine(mnv2_graph).run({"input": x})["output"]
    got = Engine(q).run({"input": x})["output"]
    # the residual stream is quantized per block (QLinearAdd, the standard
    # ORT/TFLite scheme); on random weights with near-uniform logits (see
    # PERF.md conditioning analysis) allow the correspondingly looser bound
    assert (ref.argmax(1) == got.argmax(1)).all() or \
        np.abs(got - ref).max() < 0.15
