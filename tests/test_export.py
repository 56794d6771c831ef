"""Graph export (save/reload) tests — incl. quantized-model persistence."""

import numpy as np

import onnx_rusty_inference_engine_tpu as oriet
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import export_model, import_model, save_graph
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(9)


def test_export_reimport_mnist(tmp_path):
    g = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    p = str(tmp_path / "m.onnx")
    save_graph(p, g)
    g2 = oriet.import_onnx(p)
    x = (rng.standard_normal((2, 1, 28, 28)) * 10).astype(np.float32)
    a = Engine(g).run({"Input3": x}).outputs["Plus214_Output_0"]
    b = Engine(g2).run({"Input3": x}).outputs["Plus214_Output_0"]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_quantize_save_reload(tmp_path):
    """Offline quantization persists: quantize once, reload, same outputs."""
    g = oriet.import_onnx("/root/reference/models/mnist-8.onnx")
    x = (rng.standard_normal((4, 1, 28, 28)) * 10).astype(np.float32)
    qg = quantize_graph(g, calibration_inputs=[{"Input3": x}])
    p = str(tmp_path / "m_int8.onnx")
    save_graph(p, qg)
    qg2 = oriet.import_onnx(p)
    assert any(n.op_type == "QLinearConv" for n in qg2.nodes)
    a = Engine(qg).run({"Input3": x}).outputs["Plus214_Output_0"]
    b = Engine(qg2).run({"Input3": x}).outputs["Plus214_Output_0"]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_cli_quantize_roundtrip(tmp_path):
    from onnx_rusty_inference_engine_tpu.cli import main

    out = str(tmp_path / "q.onnx")
    rc = main(["quantize", "--model", "/root/reference/models/mnist-8.onnx",
               "--out", out,
               "--calib-input", "/root/reference/mnist_data_0.pb"])
    assert rc == 0
    qg = oriet.import_onnx(out)
    eng = Engine(qg)
    from onnx_rusty_inference_engine_tpu import onnx_io
    x = onnx_io.read_tensor_file("/root/reference/mnist_data_0.pb")
    res = eng.run({"Input3": x.array})
    y = onnx_io.read_tensor_file("/root/reference/mnist_output_0.pb")
    assert res.top1()[0] == int(np.argmax(y.array))
