"""Common-subexpression elimination (passes.eliminate_common_subexpressions):
exporter-duplicated chains collapse to one node; control flow, graph
outputs, captured tensors, and nondeterministic ops are left alone.

Reference parity note: the reference has no graph optimizer
(/root/reference/src/model_inference.rs:29-120 executes nodes as parsed)."""

import numpy as np

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import (
    Graph,
    InputSpec,
    Node,
)
from onnx_rusty_inference_engine_tpu.passes import (
    eliminate_common_subexpressions,
)

rng = np.random.default_rng(3)


def _graph(nodes, outputs, consts=None, in_shape=(2, 4)):
    g = Graph(name="t", nodes=nodes, constants=dict(consts or {}),
              inputs=[InputSpec("x", in_shape, np.dtype(np.float32))],
              outputs=list(outputs), opset=17,
              weight_names=list(consts or {}))
    return g


def test_duplicate_chain_collapses():
    c = {"k": np.float32(2.0)}
    nodes = [
        Node("Mul", ["x", "k"], ["a1"]),
        Node("Relu", ["a1"], ["b1"]),
        Node("Mul", ["x", "k"], ["a2"]),      # same as a1
        Node("Relu", ["a2"], ["b2"]),          # same as b1 after rename
        Node("Add", ["b1", "b2"], ["y"]),
    ]
    g = _graph(nodes, ["y"], c)
    n = eliminate_common_subexpressions(g)
    assert n == 2
    assert [nd.op_type for nd in g.nodes] == ["Mul", "Relu", "Add"]
    x = rng.standard_normal((2, 4)).astype(np.float32)
    y = np.asarray(Engine(g).run({"x": x})["y"])
    np.testing.assert_allclose(y, 2 * np.maximum(2 * x, 0), rtol=1e-6)


def test_attr_mismatch_not_merged():
    nodes = [
        Node("ReduceMax", ["x"], ["a"], attrs={"axes": [0], "keepdims": 1}),
        Node("ReduceMax", ["x"], ["b"], attrs={"axes": [1], "keepdims": 1}),
        Node("Add", ["a", "b"], ["y"]),
    ]
    g = _graph(nodes, ["y"])
    assert eliminate_common_subexpressions(g) == 0


def test_graph_outputs_never_renamed():
    nodes = [
        Node("Relu", ["x"], ["y1"]),
        Node("Relu", ["x"], ["y2"]),
    ]
    g = _graph(nodes, ["y1", "y2"])
    assert eliminate_common_subexpressions(g) == 0
    assert set(g.outputs) == {"y1", "y2"}


def test_nondeterministic_not_merged():
    nodes = [
        Node("RandomNormal", [], ["r1"], attrs={"shape": [2, 4]}),
        Node("RandomNormal", [], ["r2"], attrs={"shape": [2, 4]}),
        Node("Add", ["r1", "r2"], ["y"]),
    ]
    g = _graph(nodes, ["y"])
    assert eliminate_common_subexpressions(g) == 0


def test_captured_tensor_producer_kept():
    """A tensor a Loop body closes over must keep its name even when a
    twin node computes the same value."""
    body = object()  # never inspected: the Loop node is skipped wholesale
    nodes = [
        Node("Relu", ["x"], ["cap"]),
        Node("Relu", ["x"], ["cap2"]),
        Node("Loop", ["m", "cond"], ["y"],
             attrs={"body": body, "__captures__": ["cap2"]}),
        Node("Add", ["cap", "cap2"], ["z"]),
    ]
    g = _graph(nodes, ["y", "z"])
    g.constants["m"] = np.int64(1)
    g.constants["cond"] = np.bool_(True)
    assert eliminate_common_subexpressions(g) == 0  # cap2 is captured


def test_tensor_attr_content_hash():
    w = rng.standard_normal((4, 4)).astype(np.float32)
    nodes = [
        Node("Constant", [], ["c1"], attrs={"value": w}),
        Node("Constant", [], ["c2"], attrs={"value": w.copy()}),
        Node("MatMul", ["x", "c1"], ["m1"]),
        Node("MatMul", ["x", "c2"], ["m2"]),
        Node("Add", ["m1", "m2"], ["y"]),
    ]
    g = _graph(nodes, ["y"])
    # c2 merges into c1 (content hash), then m2 into m1; the Add's operands
    # both rename to m1 but the Add itself is unique
    assert eliminate_common_subexpressions(g) == 2
    x = rng.standard_normal((2, 4)).astype(np.float32)
    y = np.asarray(Engine(g).run({"x": x})["y"])
    np.testing.assert_allclose(y, 2 * (x @ w), rtol=1e-5)


def test_optional_output_mask_blocks_bad_merge():
    """Two otherwise-identical MaxPools that use DIFFERENT optional-output
    slots must not merge: renaming the duplicate's live Indices output to
    the representative's empty slot would rewire its consumer to an
    omitted input (round-4 advisor finding)."""
    nodes = [
        Node("MaxPool", ["x"], ["p1", ""],
             attrs={"kernel_shape": [2, 2], "strides": [2, 2]}),
        Node("MaxPool", ["x"], ["p2", "idx"],
             attrs={"kernel_shape": [2, 2], "strides": [2, 2]}),
        Node("Relu", ["p1"], ["r"]),
        Node("Cast", ["idx"], ["idxf"], attrs={"to": 1}),
        Node("Add", ["r", "idxf"], ["y"]),
    ]
    g = _graph(nodes, ["y"], in_shape=(1, 1, 4, 4))
    assert eliminate_common_subexpressions(g) == 0
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)
    Engine(g).run({"x": x})  # executes without a dangling-input failure


def test_same_output_mask_still_merges():
    nodes = [
        Node("MaxPool", ["x"], ["p1", "i1"],
             attrs={"kernel_shape": [2, 2], "strides": [2, 2]}),
        Node("MaxPool", ["x"], ["p2", "i2"],
             attrs={"kernel_shape": [2, 2], "strides": [2, 2]}),
        Node("Cast", ["i1"], ["c1"], attrs={"to": 1}),
        Node("Cast", ["i2"], ["c2"], attrs={"to": 1}),
        Node("Add", ["p1", "p2"], ["s"]),
        Node("Add", ["c1", "c2"], ["t"]),
        Node("Add", ["s", "t"], ["y"]),
    ]
    g = _graph(nodes, ["y"], in_shape=(1, 1, 4, 4))
    assert eliminate_common_subexpressions(g) >= 1
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)
    Engine(g).run({"x": x})
