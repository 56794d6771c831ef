"""End-to-end golden-file tests (SURVEY.md §4 plan (b)).

fp32 outputs must be bit-for-bit-close to the bundled reference pairs
(BASELINE.md). SqueezeNet's .onnx blob is missing from the reference
checkout (.MISSING_LARGE_BLOBS) — that test gates on file presence.
"""

import os

import numpy as np
import pytest

import onnx_rusty_inference_engine_tpu as oriet

REFERENCE = "/root/reference"


def test_mnist_fp32_golden(mnist_model_path, mnist_golden):
    x, y = mnist_golden
    graph = oriet.import_onnx(mnist_model_path)
    assert [n.op_type for n in graph.nodes] != []
    eng = oriet.Engine(graph)
    res = eng.run({x.name: x.array})
    got = res.outputs["Plus214_Output_0"]
    np.testing.assert_allclose(got, y.array, rtol=1e-4, atol=1e-3)
    assert res.top1()[0] == int(np.argmax(y.array))


def test_mnist_api_surface(mnist_model_path):
    rep = oriet.onnx_make_inference(
        mnist_model_path,
        f"{REFERENCE}/mnist_data_0.pb",
        f"{REFERENCE}/mnist_output_0.pb",
    )
    assert rep["golden_match"] is True
    assert rep["max_abs_err"] < 1e-3
    assert rep["top1"][0] == 2  # class for the bundled sample


def test_mnist_batched():
    """Batch-general execution (the reference hardcodes batch index 0)."""
    graph = oriet.import_onnx(f"{REFERENCE}/models/mnist-8.onnx")
    eng = oriet.Engine(graph)
    from onnx_rusty_inference_engine_tpu import onnx_io
    x = onnx_io.read_tensor_file(f"{REFERENCE}/mnist_data_0.pb").array
    xb = np.concatenate([x, x * 0.5, np.zeros_like(x)], axis=0)
    res = eng.run({"Input3": xb})
    out = res.outputs["Plus214_Output_0"]
    assert out.shape == (3, 10)
    single = eng.run({"Input3": x}).outputs["Plus214_Output_0"]
    np.testing.assert_allclose(out[0], single[0], rtol=1e-4, atol=1e-4)


def test_matmul_backend_model():
    graph = oriet.import_onnx(f"{REFERENCE}/models/model.onnx")
    eng = oriet.Engine(graph)
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.arange(12, dtype=np.float32).reshape(4, 3)
    res = eng.run({"a": a, "b": b})
    np.testing.assert_allclose(res.outputs["c"], a @ b, rtol=1e-5)


SQUEEZENET = f"{REFERENCE}/models/squeezenet1.0-8.onnx"


@pytest.mark.skipif(not os.path.exists(SQUEEZENET),
                    reason="squeezenet blob missing from reference checkout")
def test_squeezenet_fp32_golden(squeezenet_golden):
    x, y = squeezenet_golden
    graph = oriet.import_onnx(SQUEEZENET)
    eng = oriet.Engine(graph)
    res = eng.run({x.name: x.array})
    got = res.outputs[y.name].reshape(y.array.shape)
    np.testing.assert_allclose(got, y.array, rtol=1e-3, atol=1e-4)


def test_bfloat16_engine_mode():
    """dtype policy: bf16 compute, fp32 I/O; logits stay close enough for
    identical top-1 on the golden digit."""
    from onnx_rusty_inference_engine_tpu import onnx_io

    graph = oriet.import_onnx(f"{REFERENCE}/models/mnist-8.onnx")
    eng = oriet.Engine(graph, dtype="bfloat16")
    x = onnx_io.read_tensor_file(f"{REFERENCE}/mnist_data_0.pb")
    y = onnx_io.read_tensor_file(f"{REFERENCE}/mnist_output_0.pb")
    res = eng.run({x.name: x.array})
    out = res.outputs["Plus214_Output_0"]
    assert out.dtype == np.float32  # cast back at the boundary
    assert res.top1()[0] == int(np.argmax(y.array))
    assert np.abs(out - y.array).max() < 1.0  # bf16 drift, same ranking


def test_export_style_dynamic_reshape():
    """HF-export idiom: Shape -> Gather -> Unsqueeze -> Concat -> Reshape
    must lower statically for any actual batch size."""
    from util import make_model, node
    from onnx_rusty_inference_engine_tpu.graph import import_model

    nodes = [
        node("Shape", ["x"], ["shp"]),
        node("Gather", ["shp", "zero"], ["b"], axis=0),
        node("Unsqueeze", ["b"], ["b1"], axes=[0]),
        node("Concat", ["b1", "minus1"], ["tgt"], axis=0),
        node("Reshape", ["x", "tgt"], ["out0"]),
    ]
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    m = make_model(nodes, {"x": x}, ["out0"],
                   {"zero": np.array(0, np.int64),
                    "minus1": np.array([-1], np.int64)})
    g = import_model(m)
    eng = oriet.Engine(g)
    out = eng.run({"x": x}).outputs["out0"]
    np.testing.assert_array_equal(out, x.reshape(2, 12))
    # different batch, same compiled engine class (new trace)
    x2 = np.arange(48, dtype=np.float32).reshape(4, 3, 4)
    out2 = eng.run({"x": x2}).outputs["out0"]
    np.testing.assert_array_equal(out2, x2.reshape(4, 12))
