"""Native C++ ONNX parser: parity with the pure-Python wire codec."""

import os
import subprocess

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu import native_loader

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(native_loader.__file__)), "native")


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_native_matches_python_mnist(lib):
    path = "/root/reference/models/mnist-8.onnx"
    m_py = onnx_io.load_model(path)
    m_c = native_loader.load_model_native(path)
    assert m_c is not None
    assert (m_c.ir_version, m_c.opset_version, m_c.producer_name) == (
        m_py.ir_version, m_py.opset_version, m_py.producer_name)
    assert [n.op_type for n in m_c.graph.nodes] == \
        [n.op_type for n in m_py.graph.nodes]
    for k, v in m_py.graph.initializers.items():
        assert np.array_equal(m_c.graph.initializers[k], v)
    for a, b in zip(m_py.graph.inputs, m_c.graph.inputs):
        assert (a.name, a.elem_type, a.shape) == (b.name, b.elem_type, b.shape)
    for na, nb in zip(m_py.graph.nodes, m_c.graph.nodes):
        assert set(na.attributes) == set(nb.attributes)
        for k in na.attributes:
            va, vb = na.attributes[k].value, nb.attributes[k].value
            assert va == vb or np.array_equal(va, vb)


def test_native_roundtrip_synthetic(lib, tmp_path):
    """Writer -> native reader roundtrip on a model with every attr kind."""
    from onnx_rusty_inference_engine_tpu.models.gpt2 import TINY, build_gpt2

    m = build_gpt2(TINY, batch=1, seq_len=4, with_presents=False)
    p = str(tmp_path / "t.onnx")
    onnx_io.save_model(p, m)
    m_c = native_loader.load_model_native(p)
    assert m_c is not None
    assert [n.op_type for n in m_c.graph.nodes] == \
        [n.op_type for n in m.graph.nodes]
    for k, v in m.graph.initializers.items():
        got = m_c.graph.initializers[k]
        assert got.dtype == v.dtype and np.array_equal(got, v), k


def test_engine_runs_natively_loaded_model(lib):
    import onnx_rusty_inference_engine_tpu as oriet

    graph = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    eng = oriet.Engine(graph)
    x = onnx_io.read_tensor_file("/root/reference/mnist_data_0.pb")
    y = onnx_io.read_tensor_file("/root/reference/mnist_output_0.pb")
    out = eng.run({x.name: x.array})
    np.testing.assert_allclose(out.outputs["Plus214_Output_0"], y.array,
                               rtol=1e-4, atol=1e-3)


def test_native_tensor_loader(lib):
    from onnx_rusty_inference_engine_tpu.native_loader import read_tensor_native

    for p in ["/root/reference/mnist_data_0.pb",
              "/root/reference/squeezenet_output_0.pb"]:
        t_c = read_tensor_native(p)
        t_py = onnx_io.read_tensor_file(p)
        assert t_c is not None
        assert t_c.name == t_py.name
        assert t_c.array.dtype == t_py.array.dtype
        assert np.array_equal(t_c.array, t_py.array)


def test_native_parser_control_flow_subgraphs(tmp_path):
    """GRAPH-typed attributes survive the C++ fast path (raw attr bytes are
    decoded by the shared Python decoder, subgraphs included)."""
    import numpy as np

    from onnx_rusty_inference_engine_tpu import onnx_io
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.native_loader import (
        load_model_native)
    from util import make_model, node

    then_g = onnx_io.GraphProto(name="t")
    then_g.nodes = [node("Add", ["x", "x"], ["o"])]
    then_g.outputs.append(onnx_io.ValueInfo(name="o"))
    else_g = onnx_io.GraphProto(name="e")
    else_g.nodes = [node("Neg", ["x"], ["o"])]
    else_g.outputs.append(onnx_io.ValueInfo(name="o"))
    x = np.ones((2, 2), np.float32)
    m = make_model(
        [node("If", ["p"], ["out0"], then_branch=then_g, else_branch=else_g)],
        {"x": x}, ["out0"], {"p": np.array(True)})
    path = str(tmp_path / "cf.onnx")
    onnx_io.save_model(path, m)
    native = load_model_native(path)
    if native is None:
        import pytest

        pytest.skip("native parser unavailable in this environment")
    out = Engine(import_model(native)).run({"x": x})["out0"]
    np.testing.assert_array_equal(out, x + x)
