"""ResNet-50 family tests (north-star config #4)."""

import numpy as np
import pytest

import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models import build_resnet50
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(21)


@pytest.fixture(scope="module")
def resnet_graph():
    return import_model(build_resnet50())


def test_resnet50_topology(resnet_graph):
    ops = {}
    for n in resnet_graph.nodes:
        ops[n.op_type] = ops.get(n.op_type, 0) + 1
    assert ops["Conv"] == 53  # 1 stem + 16 blocks x 3 + 4 downsamples
    # all 53 BNs fold into their convs at import (passes.fold_batchnorm)
    assert "BatchNormalization" not in ops
    assert ops["Gemm"] == 1
    assert resnet_graph.outputs == ["logits"]


def test_resnet50_forward(resnet_graph):
    eng = Engine(resnet_graph)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    out = eng.run({"data": x})
    assert out["logits"].shape == (2, 1000)
    assert np.all(np.isfinite(out["logits"]))


def test_resnet50_int8_quantizes_and_agrees(resnet_graph):
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    q = quantize_graph(resnet_graph, calibration_inputs=[{"data": x}])
    n_q = sum(1 for n in q.nodes if n.op_type == "QLinearConv")
    assert n_q == 53
    ref = Engine(resnet_graph).run({"data": x})["logits"]
    got = Engine(q).run({"data": x})["logits"]
    # top-1 agreement per image
    assert (ref.argmax(1) == got.argmax(1)).all() or \
        np.abs(got - ref).max() / np.abs(ref).max() < 0.1


def test_resnet50_int8_served_with_continuous_batching(resnet_graph):
    """North-star config #4: ResNet-50 INT8 + continuous batching + sharded
    weights (virtual mesh stands in for the 4-chip host)."""
    from onnx_rusty_inference_engine_tpu.parallel import (
        cnn_param_sharding, data_input_sharding, make_mesh)
    from onnx_rusty_inference_engine_tpu.serve import InferenceServer

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    q = quantize_graph(resnet_graph, calibration_inputs=[{"data": x}])
    mesh = make_mesh({"data": 1, "model": 4})
    eng = Engine(q, mesh=mesh,
                 param_sharding_fn=cnn_param_sharding(mesh),
                 input_sharding_fn=data_input_sharding(mesh))
    single = Engine(q)
    with mesh:
        srv = InferenceServer(eng, batch_buckets=(1, 2, 4), max_delay_s=0.02)
        try:
            futs = [srv.submit(x[i % 2][None]) for i in range(5)]
            outs = [f.result(timeout=300) for f in futs]
        finally:
            srv.stop()
    want = single({"data": x[:1]})["logits"]
    np.testing.assert_allclose(outs[0]["logits"], np.asarray(want),
                               rtol=1e-3, atol=1e-3)
    assert srv.stats.summary()["requests"] == 5
