"""Helpers for building single-op ONNX models in memory (backend-test style,
like the reference's bundled models/model.onnx = ONNX test_matmul_2d)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model


def attr(name: str, value) -> onnx_io.Attribute:
    a = onnx_io.Attribute(name=name)
    if isinstance(value, float):
        a.f = value
    elif isinstance(value, bool):
        a.i = int(value)
    elif isinstance(value, int):
        a.i = value
    elif isinstance(value, str):
        a.s = value.encode()
    elif isinstance(value, np.ndarray):
        a.t = onnx_io.TensorData(name="", array=value)
    elif isinstance(value, onnx_io.GraphProto):
        a.g = value
    elif isinstance(value, (list, tuple)) and value and \
            isinstance(value[0], onnx_io.GraphProto):
        a.graphs = list(value)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            a.ints = list(value)
        elif all(isinstance(v, float) for v in value):
            a.floats = list(value)
        else:
            a.strings = [v.encode() for v in value]
    else:
        raise TypeError(f"attr {name}: {type(value)}")
    return a


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         domain: str = "", **attrs) -> onnx_io.NodeProto:
    return onnx_io.NodeProto(
        op_type=op_type,
        input=list(inputs),
        output=list(outputs),
        domain=domain,
        attributes={k: attr(k, v) for k, v in attrs.items()},
    )


def make_model(
    nodes: List[onnx_io.NodeProto],
    inputs: Dict[str, np.ndarray],
    output_names: Sequence[str],
    initializers: Optional[Dict[str, np.ndarray]] = None,
    opset: int = 13,
) -> onnx_io.ModelProto:
    g = onnx_io.GraphProto(name="t")
    g.nodes = nodes
    g.initializers = dict(initializers or {})
    for name, arr in inputs.items():
        g.inputs.append(
            onnx_io.ValueInfo(
                name=name,
                elem_type=onnx_io.NUMPY_TO_DTYPE[arr.dtype],
                shape=list(arr.shape),
            )
        )
    for name in output_names:
        g.outputs.append(onnx_io.ValueInfo(name=name))
    return onnx_io.ModelProto(graph=g, opset_version=opset)


def run_op(
    op_type: str,
    inputs: Dict[str, np.ndarray],
    initializers: Optional[Dict[str, np.ndarray]] = None,
    opset: int = 13,
    n_outputs: int = 1,
    domain: str = "",
    **attrs,
) -> List[np.ndarray]:
    """Build a single-op model, serialize→reparse (exercising the wire codec),
    import, lower, jit, run."""
    out_names = [f"out{i}" for i in range(n_outputs)]
    n = node(op_type, list(inputs) + list(initializers or {}), out_names,
             domain=domain, **attrs)
    m = make_model([n], inputs, out_names, initializers, opset)
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))  # roundtrip on purpose
    eng = Engine(import_model(m2))
    res = eng.run(inputs)
    return [res.outputs[o] for o in out_names]
