"""Control-flow ops: If / Scan / Loop lowered onto lax.cond / lax.scan,
including subgraph closure captures and the wire-codec roundtrip of
GRAPH-typed attributes."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.ops.registry import UnsupportedOpError
from util import make_model, node

rng = np.random.default_rng(97)


def _subgraph(name, nodes, inputs=(), outputs=(), initializers=None):
    g = onnx_io.GraphProto(name=name)
    g.nodes = list(nodes)
    g.initializers = dict(initializers or {})
    for n_ in inputs:
        g.inputs.append(onnx_io.ValueInfo(name=n_))
    for n_ in outputs:
        g.outputs.append(onnx_io.ValueInfo(name=n_))
    return g


def _run(model, feeds):
    m2 = onnx_io.parse_model(onnx_io.serialize_model(model))  # codec roundtrip
    return Engine(import_model(m2)).run(feeds)


def test_if_with_captures():
    """Both branches close over an outer tensor (y); dynamic predicate."""
    x = rng.standard_normal((3, 4)).astype(np.float32)
    then_g = _subgraph("then", [node("Add", ["y", "y"], ["t_out"])],
                       outputs=["t_out"])
    else_g = _subgraph("else", [node("Neg", ["y"], ["e_out"])],
                       outputs=["e_out"])
    nodes = [
        node("Relu", ["x"], ["y"]),
        node("ReduceSum", ["y"], ["s"], keepdims=0),
        node("Greater", ["s", "zero"], ["pred"]),
        node("If", ["pred"], ["out0"], then_branch=then_g, else_branch=else_g),
    ]
    m = make_model(nodes, {"x": x}, ["out0"],
                   {"zero": np.float32(0.0)})
    got = _run(m, {"x": x})["out0"]
    y = np.maximum(x, 0)
    want = y + y if y.sum() > 0 else -y
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # flip the predicate by negating the input
    got2 = _run(m, {"x": -np.abs(x) - 1})["out0"]
    np.testing.assert_allclose(got2, -np.maximum(-np.abs(x) - 1, 0),
                               rtol=1e-6)


def test_if_constant_predicate_prunes():
    then_g = _subgraph("then", [node("Add", ["x", "x"], ["o"])], outputs=["o"])
    else_g = _subgraph("else", [node("Neg", ["x"], ["o"])], outputs=["o"])
    x = rng.standard_normal((2, 2)).astype(np.float32)
    m = make_model(
        [node("If", ["p"], ["out0"], then_branch=then_g, else_branch=else_g)],
        {"x": x}, ["out0"], {"p": np.array(True)})
    np.testing.assert_allclose(_run(m, {"x": x})["out0"], x + x)


def test_scan_running_sum():
    """Scan = cumulative state over the leading axis, plus per-step output."""
    body = _subgraph(
        "body",
        [node("Add", ["acc_in", "x_t"], ["acc_out"]),
         node("Mul", ["acc_out", "two"], ["y_t"])],
        inputs=["acc_in", "x_t"], outputs=["acc_out", "y_t"],
        initializers={"two": np.float32(2.0)})
    T, D = 5, 3
    xs = rng.standard_normal((T, D)).astype(np.float32)
    init = np.zeros((D,), np.float32)
    m = make_model(
        [node("Scan", ["init", "xs"], ["final", "ys"], body=body,
              num_scan_inputs=1)],
        {"init": init, "xs": xs}, ["final", "ys"])
    out = _run(m, {"init": init, "xs": xs})
    np.testing.assert_allclose(out["final"], xs.sum(0), rtol=1e-5)
    np.testing.assert_allclose(out["ys"], 2 * np.cumsum(xs, 0), rtol=1e-5)


def test_scan_reverse_direction():
    body = _subgraph(
        "body", [node("Add", ["a", "x_t"], ["a2"])],
        inputs=["a", "x_t"], outputs=["a2"])
    xs = rng.standard_normal((4, 2)).astype(np.float32)
    init = np.zeros((2,), np.float32)
    m = make_model(
        [node("Scan", ["init", "xs"], ["final"], body=body,
              num_scan_inputs=1, scan_input_directions=[1])],
        {"init": init, "xs": xs}, ["final"])
    np.testing.assert_allclose(_run(m, {"init": init, "xs": xs})["final"],
                               xs.sum(0), rtol=1e-5)


def test_loop_fixed_trip_count():
    """for i in range(M): s = s + x — with a per-trip scan output."""
    body = _subgraph(
        "body",
        [node("Identity", ["cond_in"], ["cond_out"]),
         node("Add", ["s_in", "x"], ["s_out"]),
         node("Identity", ["s_out"], ["y_t"])],
        inputs=["iter", "cond_in", "s_in"],
        outputs=["cond_out", "s_out", "y_t"])
    x = rng.standard_normal((3,)).astype(np.float32)
    s0 = np.zeros((3,), np.float32)
    m = make_model(
        [node("Loop", ["M", "cond", "s0"], ["s_final", "ys"], body=body)],
        {"s0": s0, "x": x}, ["s_final", "ys"],
        {"M": np.array(4, np.int64), "cond": np.array(True)})
    out = _run(m, {"s0": s0, "x": x})
    np.testing.assert_allclose(out["s_final"], 4 * x, rtol=1e-5)
    np.testing.assert_allclose(out["ys"],
                               np.stack([x, 2 * x, 3 * x, 4 * x]), rtol=1e-5)


def test_loop_early_exit_state_freezes():
    """while cond: dynamic exit via the body condition (no scan outputs):
    state must freeze once the condition goes false."""
    # body: s += 1; cond_out = (s < 3)
    body = _subgraph(
        "body",
        [node("Add", ["s_in", "one"], ["s_out"]),
         node("Less", ["s_out", "three"], ["cond_out"])],
        inputs=["iter", "cond_in", "s_in"],
        outputs=["cond_out", "s_out"],
        initializers={"one": np.float32(1.0), "three": np.float32(3.0)})
    s0 = np.zeros((), np.float32)
    m = make_model(
        [node("Loop", ["M", "cond", "s0"], ["s_final"], body=body)],
        {"s0": s0}, ["s_final"],
        {"M": np.array(10, np.int64), "cond": np.array(True)})
    out = _run(m, {"s0": s0})
    np.testing.assert_allclose(out["s_final"], 3.0)


def test_loop_dynamic_trip_count_rejected():
    body = _subgraph(
        "body",
        [node("Identity", ["cond_in"], ["cond_out"]),
         node("Identity", ["s_in"], ["s_out"])],
        inputs=["iter", "cond_in", "s_in"],
        outputs=["cond_out", "s_out"])
    s0 = np.zeros((2,), np.float32)
    m = make_model(
        [node("Loop", ["M", "cond", "s0"], ["s_final"], body=body)],
        {"s0": s0, "M": np.array(4, np.int64)}, ["s_final"],
        {"cond": np.array(True)})
    with pytest.raises((UnsupportedOpError, Exception)):
        _run(m, {"s0": s0, "M": np.array(4, np.int64)})


def test_loop_body_dynamic_cond_with_scan_outputs_rejected():
    """A body-computed exit condition + per-trip scan outputs implies a
    data-dependent output length — must raise, not silently emit M rows."""
    body = _subgraph(
        "body",
        [node("Add", ["s_in", "one"], ["s_out"]),
         node("Less", ["s_out", "three"], ["cond_out"]),
         node("Identity", ["s_out"], ["y_t"])],
        inputs=["iter", "cond_in", "s_in"],
        outputs=["cond_out", "s_out", "y_t"],
        initializers={"one": np.float32(1.0), "three": np.float32(3.0)})
    s0 = np.zeros((), np.float32)
    m = make_model(
        [node("Loop", ["M", "cond", "s0"], ["s_final", "ys"], body=body)],
        {"s0": s0}, ["s_final", "ys"],
        {"M": np.array(10, np.int64), "cond": np.array(True)})
    with pytest.raises(Exception):
        _run(m, {"s0": s0})
