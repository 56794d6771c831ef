"""Intermediate-tensor debug mode (debug.py + `oriet run --dump-stats`).

Parity with the reference's `debug_prints` feature
(reference: src/inference_fp32_ops/convolution_op.rs:165-168), rebuilt as a
single probe-graph run instead of per-op prints.
"""

import json
import os

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.debug import (
    dump_intermediates, probe_graph, tensor_stats)
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_onnx, import_model
from onnx_rusty_inference_engine_tpu.models._builder import GraphBuilder

REF = "/root/reference"
MNIST = os.path.join(REF, "models", "mnist-8.onnx")
MNIST_IN = os.path.join(REF, "mnist_data_0.pb")

needs_mnist = pytest.mark.skipif(not os.path.exists(MNIST),
                                 reason="reference mnist assets missing")


def _small_graph():
    b = GraphBuilder("dbg", opset=17, seed=0)
    x = b.input("x", [1, 4])
    w = b.init("w", np.arange(16, dtype=np.float32).reshape(4, 4))
    (h,) = b.node("MatMul", [x, w], ["hidden"])
    (r,) = b.node("Relu", [h], ["relu_out"])
    b.output(r, [1, 4])
    return import_model(b.model())


def test_dump_intermediates_known_values():
    g = _small_graph()
    x = np.array([[1.0, -2.0, 3.0, -4.0]], np.float32)
    vals = dump_intermediates(g, {"x": x})
    w = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.testing.assert_allclose(vals["hidden"], x @ w, rtol=1e-6)
    np.testing.assert_allclose(vals["relu_out"], np.maximum(x @ w, 0),
                               rtol=1e-6)
    assert np.array_equal(vals["x"], x)  # inputs surfaced too


def test_dump_selected_names_only():
    g = _small_graph()
    x = np.ones((1, 4), np.float32)
    vals = dump_intermediates(g, {"x": x}, names=["hidden"])
    assert set(vals) == {"hidden"}


def test_tensor_stats_rows():
    vals = {"t": np.array([[1.0, -3.0], [5.0, np.inf]], np.float32)}
    (row,) = tensor_stats(vals)
    assert row["shape"] == [2, 2] and row["min"] == -3.0
    assert row["nonfinite"] == 1


def test_probe_graph_truncation_warns(caplog):
    import logging
    g = _small_graph()
    with caplog.at_level(logging.WARNING,
                         logger="onnx_rusty_inference_engine_tpu.debug"):
        p = probe_graph(g, max_tensors=1)
    assert len(p.outputs) == 1
    assert any("truncated" in r.message for r in caplog.records)


@needs_mnist
def test_mnist_dump_matches_engine_output():
    g = import_onnx(MNIST)
    t = onnx_io.read_tensor_file(MNIST_IN)
    feed = {g.input_names[0]: t.array}
    vals = dump_intermediates(g, feed)
    out = Engine(g).run(feed)
    final = g.outputs[0]
    np.testing.assert_allclose(vals[final], out.outputs[final],
                               rtol=1e-5, atol=1e-5)
    # every ReLU output is nonnegative — the kind of invariant --dump-stats
    # exists to surface when hunting a wrong output
    relu_outs = [n.outputs[0] for n in g.nodes if n.op_type == "Relu"]
    assert relu_outs
    for name in relu_outs:
        assert vals[name].min() >= 0.0


@needs_mnist
def test_cli_dump_stats_flag(capsys, tmp_path):
    from onnx_rusty_inference_engine_tpu.cli import main
    npz = tmp_path / "t.npz"
    rc = main(["run", "--model", MNIST, "--input", MNIST_IN,
               "--dump-stats", "--dump-tensors", str(npz)])
    assert rc == 0
    err = capsys.readouterr().err
    rows = [json.loads(line) for line in err.splitlines()
            if line.startswith("{")]
    assert any("min" in r for r in rows)
    with np.load(npz) as z:
        assert len(z.files) >= 10
