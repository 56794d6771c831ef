"""Sequence / Optional ops: trace-time list structure, dynamic elements.

Covers construction, indexing (static and lax.switch-dynamic), insert/erase,
tensor<->sequence conversion, SequenceMap, the Loop-append export pattern
(unrolled at trace time), and statically-resolved optionals."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.ops.registry import UnsupportedOpError
from util import make_model, node

rng = np.random.default_rng(41)


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


def test_construct_at_length():
    a = rng.standard_normal((2, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)  # heterogeneous shapes
    m = make_model(
        [node("SequenceConstruct", ["a", "b"], ["seq"]),
         node("SequenceAt", ["seq", "neg1"], ["last"]),
         node("SequenceLength", ["seq"], ["n"])],
        {"a": a, "b": b}, ["last", "n"],
        {"neg1": np.array(-1, np.int64)})
    out = _run(m, {"a": a, "b": b})
    np.testing.assert_allclose(out["last"], b)
    assert int(out["n"]) == 2


def test_sequence_at_dynamic_position():
    """Runtime position over a homogeneous sequence → lax.switch."""
    a = rng.standard_normal((3,)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    c = rng.standard_normal((3,)).astype(np.float32)
    m = make_model(
        [node("SequenceConstruct", ["a", "b", "c"], ["seq"]),
         node("SequenceAt", ["seq", "pos"], ["out"])],
        {"a": a, "b": b, "c": c, "pos": np.array(0, np.int64)}, ["out"])
    for p, want in [(0, a), (1, b), (2, c), (-1, c)]:
        got = _run(m, {"a": a, "b": b, "c": c,
                       "pos": np.array(p, np.int64)})["out"]
        np.testing.assert_allclose(got, want)


def test_sequence_at_dynamic_heterogeneous_rejected():
    a = rng.standard_normal((3,)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    m = make_model(
        [node("SequenceConstruct", ["a", "b"], ["seq"]),
         node("SequenceAt", ["seq", "pos"], ["out"])],
        {"a": a, "b": b, "pos": np.array(0, np.int64)}, ["out"])
    with pytest.raises(UnsupportedOpError, match="heterogeneous"):
        _run(m, {"a": a, "b": b, "pos": np.array(0, np.int64)})


def test_insert_erase():
    a = np.float32([1.0])
    b = np.float32([2.0])
    c = np.float32([3.0])
    # [a] -> insert b at end -> insert c at 0 -> erase middle (=a) -> concat
    m = make_model(
        [node("SequenceConstruct", ["a"], ["s0"]),
         node("SequenceInsert", ["s0", "b"], ["s1"]),
         node("SequenceInsert", ["s1", "c", "zero"], ["s2"]),
         node("SequenceErase", ["s2", "one"], ["s3"]),
         node("ConcatFromSequence", ["s3"], ["out"], axis=0)],
        {"a": a, "b": b, "c": c}, ["out"],
        {"zero": np.array(0, np.int64), "one": np.array(1, np.int64)})
    got = _run(m, {"a": a, "b": b, "c": c})["out"]
    np.testing.assert_allclose(got, [3.0, 2.0])


def test_erase_default_is_last():
    a = np.float32([1.0, 2.0])
    b = np.float32([3.0, 4.0])
    m = make_model(
        [node("SequenceConstruct", ["a", "b"], ["s"]),
         node("SequenceErase", ["s"], ["s2"]),
         node("ConcatFromSequence", ["s2"], ["out"], axis=0)],
        {"a": a, "b": b}, ["out"])
    np.testing.assert_allclose(_run(m, {"a": a, "b": b})["out"], a)


def test_split_to_sequence_scalar_with_remainder():
    x = np.arange(14, dtype=np.float32).reshape(7, 2)
    m = make_model(
        [node("SplitToSequence", ["x", "k"], ["seq"], axis=0),
         node("SequenceAt", ["seq", "neg1"], ["tail"]),
         node("SequenceLength", ["seq"], ["n"])],
        {"x": x}, ["tail", "n"],
        {"k": np.array(3, np.int64), "neg1": np.array(-1, np.int64)})
    out = _run(m, {"x": x})
    assert int(out["n"]) == 3  # 3 + 3 + 1
    np.testing.assert_allclose(out["tail"], x[6:7])


def test_split_to_sequence_sizes_and_keepdims():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    m = make_model(
        [node("SplitToSequence", ["x", "sizes"], ["seq"], axis=1),
         node("SequenceAt", ["seq", "one"], ["p1"])],
        {"x": x}, ["p1"],
        {"sizes": np.array([1, 3], np.int64), "one": np.array(1, np.int64)})
    np.testing.assert_allclose(_run(m, {"x": x})["p1"], x[:, 1:])
    # no split input, keepdims=0: per-slice squeeze
    m2 = make_model(
        [node("SplitToSequence", ["x"], ["seq"], axis=0, keepdims=0),
         node("SequenceAt", ["seq", "one"], ["row"])],
        {"x": x}, ["row"], {"one": np.array(1, np.int64)})
    got = _run(m2, {"x": x})["row"]
    assert got.shape == (4,)
    np.testing.assert_allclose(got, x[1])


def test_concat_from_sequence_new_axis():
    a = rng.standard_normal((2, 3)).astype(np.float32)
    b = rng.standard_normal((2, 3)).astype(np.float32)
    m = make_model(
        [node("SequenceConstruct", ["a", "b"], ["s"]),
         node("ConcatFromSequence", ["s"], ["out"], axis=1, new_axis=1)],
        {"a": a, "b": b}, ["out"])
    got = _run(m, {"a": a, "b": b})["out"]
    np.testing.assert_allclose(got, np.stack([a, b], axis=1))


def test_sequence_map_with_broadcast_and_zipped_inputs():
    body = _subgraph(
        "body",
        [node("Mul", ["e", "scale"], ["m0"]),
         node("Add", ["m0", "z"], ["o"])],
        inputs=["e", "z"], outputs=["o"],
        initializers={"scale": np.float32(2.0)})
    a = rng.standard_normal((3,)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    za = rng.standard_normal((3,)).astype(np.float32)
    zb = rng.standard_normal((3,)).astype(np.float32)
    m = make_model(
        [node("SequenceConstruct", ["a", "b"], ["xs"]),
         node("SequenceConstruct", ["za", "zb"], ["zs"]),
         node("SequenceMap", ["xs", "zs"], ["ys"], body=body),
         node("ConcatFromSequence", ["ys"], ["out"], axis=0, new_axis=1)],
        {"a": a, "b": b, "za": za, "zb": zb}, ["out"])
    got = _run(m, {"a": a, "b": b, "za": za, "zb": zb})["out"]
    np.testing.assert_allclose(got, np.stack([2 * a + za, 2 * b + zb]),
                               rtol=1e-6)


def test_loop_appends_to_sequence():
    """The classic export pattern: SequenceEmpty + SequenceInsert in a Loop
    body, ConcatFromSequence after — requires the trace-time unrolled Loop."""
    body = _subgraph(
        "body",
        [node("Identity", ["cond_in"], ["cond_out"]),
         node("Cast", ["iter"], ["fi"], to=onnx_io.FLOAT),
         node("Mul", ["x", "fi"], ["xi"]),
         node("SequenceInsert", ["seq_in", "xi"], ["seq_out"])],
        inputs=["iter", "cond_in", "seq_in"],
        outputs=["cond_out", "seq_out"])
    x = rng.standard_normal((2,)).astype(np.float32)
    m = make_model(
        [node("SequenceEmpty", [], ["s0"]),
         node("Loop", ["M", "cond", "s0"], ["s_final"], body=body),
         node("ConcatFromSequence", ["s_final"], ["out"], axis=0, new_axis=1)],
        {"x": x}, ["out"],
        {"M": np.array(3, np.int64), "cond": np.array(True)})
    got = _run(m, {"x": x})["out"]
    np.testing.assert_allclose(got, np.stack([0 * x, 1 * x, 2 * x]),
                               rtol=1e-6)


def test_sequence_graph_output():
    """A sequence can be a graph output: run() returns a list of arrays."""
    a = rng.standard_normal((2,)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    m = make_model([node("SequenceConstruct", ["a", "b"], ["seq"])],
                   {"a": a, "b": b}, ["seq"])
    out = _run(m, {"a": a, "b": b})["seq"]
    assert isinstance(out, list) and len(out) == 2
    np.testing.assert_allclose(out[0], a)
    np.testing.assert_allclose(out[1], b)


def test_optional_roundtrip_and_empty():
    x = rng.standard_normal((2, 2)).astype(np.float32)
    m = make_model(
        [node("Optional", ["x"], ["opt"]),
         node("OptionalHasElement", ["opt"], ["has"]),
         node("OptionalGetElement", ["opt"], ["got"])],
        {"x": x}, ["has", "got"])
    out = _run(m, {"x": x})
    assert bool(out["has"])
    np.testing.assert_allclose(out["got"], x)

    m2 = make_model(
        [node("Optional", [], ["opt"]),
         node("OptionalHasElement", ["opt"], ["has"])],
        {"x": x}, ["has"])
    assert not bool(_run(m2, {"x": x})["has"])

    m3 = make_model(
        [node("Optional", [], ["opt"]),
         node("OptionalGetElement", ["opt"], ["y"])],
        {"x": x}, ["y"])
    with pytest.raises(UnsupportedOpError, match="empty optional"):
        _run(m3, {"x": x})
