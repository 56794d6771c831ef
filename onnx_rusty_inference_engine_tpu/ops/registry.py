"""Lowering-rule registry: ONNX op_type → JAX emitter.

The TPU-native replacement for the reference's `node_inference` match-dispatch
(reference: src/inference_engine/model_inference.rs:138-161). Instead of
executing eagerly against a mutex-guarded value store, each emitter *builds*
part of a single pure JAX computation; XLA compiles and schedules the whole
graph at once.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ..graph import Graph, Node

# keyed by (domain, op_type); domain "" is ai.onnx (the spec treats
# "ai.onnx" as an alias for the default domain)
_REGISTRY: Dict[tuple, Callable] = {}

# op names whose emitter was actually dispatched this process — the test
# suite's coverage meta-test asserts every registered op appears here after
# the run (a quoted string in a test file no longer counts as coverage)
_HITS: set = set()


def executed_ops() -> set:
    return set(_HITS)


class UnsupportedOpError(NotImplementedError):
    """Clean error for unknown ops (the reference panics: model_inference.rs:158-160)."""


def _norm_domain(domain: str) -> str:
    return "" if domain in ("", "ai.onnx") else domain


def register(*op_types: str, domain: str = ""):
    def deco(fn):
        for op in op_types:
            _REGISTRY[(_norm_domain(domain), op)] = fn
        return fn
    return deco


def get_emitter(op_type: str, domain: str = "") -> Callable:
    """Dispatch by (domain, op_type).

    Lookup order: the node's own domain first, then the default domain
    (many exporters leave node.domain empty even for contrib ops, and some
    stamp com.microsoft on nodes we lower with default-domain semantics)."""
    dom = _norm_domain(domain)
    fn = _REGISTRY.get((dom, op_type))
    if fn is None and dom:
        fn = _REGISTRY.get(("", op_type))
    if fn is None and not dom:
        # bare contrib node (exporters frequently omit the domain)
        fn = _REGISTRY.get(("com.microsoft", op_type))
    if fn is None:
        raise UnsupportedOpError(
            f"op '{op_type}' (domain {domain!r}) has no lowering rule; "
            f"supported: {supported_ops()}"
        )
    _HITS.add(op_type)
    return fn


def supported_ops():
    return sorted({op for _, op in _REGISTRY})


class LoweringContext:
    """Static context handed to emitters: constants + opset + value env.

    `static_env` holds values that are known at trace time even though they
    flow through graph nodes — e.g. Shape of a traced tensor, and any
    foldable arithmetic on such values. This is what makes the ONNX-export
    idiom  Shape -> Gather -> Unsqueeze -> Concat -> Reshape  lower to a
    static XLA reshape."""

    def __init__(self, graph: Graph, env: dict):
        self.graph = graph
        self.env = env  # tensor name -> traced jax value
        self.static_env: Dict[str, np.ndarray] = {}
        self.opset = graph.opset
        # True when this trace runs at a batch other than the graph's
        # declared input batch (engine.lower sets it per trace): shape
        # ops may then substitute the runtime batch for baked leading
        # dims. When False, baked shapes are authoritative — a mismatch
        # is an invalid model, not polymorphism (ADVICE r3: Expand).
        self.batch_polymorphic = True

    def constant(self, name: str) -> Optional[np.ndarray]:
        """Static (trace-time) value of a tensor if known, else None."""
        v = self.graph.constants.get(name)
        if v is None:
            v = self.static_env.get(name)
        return v

    def require_constant(self, name: str, what: str) -> np.ndarray:
        v = self.constant(name)
        if v is None:
            raise UnsupportedOpError(
                f"{what} must be statically known (tensor {name!r}) for XLA lowering"
            )
        return v

    def eval_subgraph(self, gproto, inputs: list) -> list:
        """Lower an attribute subgraph (If/Loop/Scan body) inline.

        ONNX subgraphs close over the outer scope, so lowering starts from a
        copy of the outer env; `inputs` bind positionally to the subgraph's
        declared inputs. Returns the subgraph's output values in order.
        ONNX requires subgraph nodes to be topologically sorted already."""
        import jax.numpy as jnp

        from ..graph import _node_from_proto

        env = dict(self.env)
        env.update({k: jnp.asarray(v)
                    for k, v in gproto.initializers.items()})
        for vi, val in zip(gproto.inputs, inputs):
            env[vi.name] = val
        sub = LoweringContext(self.graph, env)
        sub.batch_polymorphic = self.batch_polymorphic
        sub.static_env = dict(self.static_env)
        sub.static_env.update(
            {k: np.asarray(v) for k, v in gproto.initializers.items()})
        for nproto in gproto.nodes:
            node = _node_from_proto(nproto)
            emitter = get_emitter(node.op_type, node.domain)
            ins = [env[i] if i else None for i in node.inputs]
            outs = emitter(sub, node, ins)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[vi.name] for vi in gproto.outputs]


def index_dtype():
    """Dtype for ONNX int64 index OUTPUTS (ArgMax, Shape, NonZero, ...).

    Spec says int64; under JAX's default x64-off mode the engine-wide
    convention is int32 (declared-int64 graph inputs already flow as
    int32), and asking for int64 there only triggers a truncation warning
    per op. Honors int64 when jax_enable_x64 is on."""
    import jax
    import jax.numpy as jnp

    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
