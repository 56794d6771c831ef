"""Inference engine: lower a Graph to one pure JAX function and jit it.

The TPU-native replacement for the reference's `inference()` orchestration
loop + thread scheduler (reference: src/inference_engine/
model_inference.rs:29-120 and multithreading/*): instead of walking nodes at
runtime and synchronizing threads through a mutex-guarded HashMap, the whole
graph is lowered once into a single pure function `f(params, *inputs)` and
compiled by XLA, which owns scheduling, fusion, and (via shardings)
multi-chip parallelism. Branch parallelism — the reference's headline
feature — falls out for free: independent branches are independent HLO ops.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compiled-executable cache (the framework's compile-checkpoint
# story; the reference persists nothing, SURVEY.md §5). Opt in with
# ORIET_COMPILE_CACHE=/path — subsequent runs of the same model skip XLA
# compilation entirely.
_cache_dir = os.environ.get("ORIET_COMPILE_CACHE")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from .graph import Graph
from .ops import registry as _registry
from .ops.registry import LoweringContext, get_emitter

__all__ = ["lower", "Engine", "InferenceResult"]


def lower(graph: Graph):
    """Build `f(params: dict[str, Array], inputs: dict[str, Array]) -> dict`.

    `params` carries the graph's weights (so they can be device_put with
    shardings and donated); non-weight folded constants are closed over as
    literals.
    """

    def fn(params: Dict[str, jax.Array], inputs: Dict[str, jax.Array]):
        env: Dict[str, jax.Array] = {}
        env.update({k: jnp.asarray(v) for k, v in graph.constants.items()
                    if k not in params})
        env.update(params)
        env.update(inputs)
        from .graph import _fold_one
        from .ops.registry import UnsupportedOpError  # noqa: F401

        ctx = LoweringContext(graph, env)
        # batch polymorphism is live for THIS trace only when some input
        # actually arrives at a different leading dim than declared (or
        # the spec is symbolic); at the declared batch, baked shapes are
        # authoritative and invalid Expands must error, not be rewritten
        ctx.batch_polymorphic = False
        for s in graph.inputs:
            v = inputs.get(s.name)
            if v is None or not s.shape:
                continue
            d0 = s.shape[0]
            if isinstance(d0, str) or (
                    getattr(v, "ndim", 0) >= 1 and v.shape[0] != d0):
                ctx.batch_polymorphic = True
                break

        def static_value(name):
            if name in graph.constants:
                return graph.constants[name]
            return ctx.static_env.get(name)

        for node in graph.nodes:
            # trace-time static propagation: Shape/Size of traced tensors are
            # known statically; foldable ops over static values stay static
            if node.op_type in ("Shape", "Size") and node.inputs[0] in env:
                shp = env[node.inputs[0]].shape
                if node.op_type == "Shape":
                    from .ops.standard import _shape_slice

                    val = np.asarray(shp[_shape_slice(node, len(shp))],
                                     dtype=np.int64)
                else:
                    val = np.asarray(int(np.prod(shp)), dtype=np.int64)
                ctx.static_env[node.outputs[0]] = val
                env[node.outputs[0]] = jnp.asarray(val)
                continue
            from .graph import _FOLDABLE

            if node.op_type in _FOLDABLE and len(node.outputs) == 1 and all(
                    (not i) or static_value(i) is not None for i in node.inputs):
                try:
                    folded = _fold_one(
                        node, {i: static_value(i) for i in node.inputs if i})
                except Exception:
                    folded = None
                if folded is not None:
                    folded = np.asarray(folded)
                    ctx.static_env[node.outputs[0]] = folded
                    env[node.outputs[0]] = jnp.asarray(folded)
                    continue

            emitter = get_emitter(node.op_type, node.domain)
            ins = [env[i] if i else None for i in node.inputs]
            # named_scope threads the ONNX node identity into XLA/HLO
            # metadata, so profiler traces map back to graph nodes (the
            # structured analog of the reference's per-node execution log,
            # model_inference.rs:132-135).
            with jax.named_scope(f"{node.op_type}.{node.name or node.outputs[0]}"):
                outs = emitter(ctx, node, ins)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return {o: env[o] for o in graph.outputs}

    return fn


class InferenceResult:
    """Structured results (replaces the reference's print-from-inside-ops:
    add_op.rs:104-105, softmax_op.rs:41)."""

    def __init__(self, outputs: Dict[str, np.ndarray], latency_s: float):
        self.outputs = outputs
        self.latency_s = latency_s

    def __getitem__(self, name: str) -> np.ndarray:
        return self.outputs[name]

    def top_k(self, k: int = 1, output: Optional[str] = None) -> np.ndarray:
        name = output or next(iter(self.outputs))
        arr = self.outputs[name]
        flat = arr.reshape(arr.shape[0], -1)
        return np.argsort(flat, axis=-1)[:, ::-1][:, :k]

    def top1(self, output: Optional[str] = None) -> np.ndarray:
        return self.top_k(1, output)[:, 0]


class Engine:
    """Compiled executor for one ONNX graph.

    Parameters
    ----------
    graph: imported Graph.
    dtype: compute dtype policy for float tensors ("float32" or "bfloat16").
    mesh / param_sharding / input_sharding: optional jax.sharding placement
        (see parallel/), applied to weights at load and inputs per call.
    """

    def __init__(
        self,
        graph: Graph,
        *,
        dtype: str = "float32",
        mesh=None,
        param_sharding_fn=None,
        input_sharding_fn=None,
        donate_inputs: bool = False,
        share_params_with: "Optional[Engine]" = None,
    ):
        # string/image front-end ops run on host before the jitted graph,
        # map/string tails (ZipMap, string-labelled classifiers) after it
        # (host.py); graphs without such ops pass through untouched
        from .host import split_host_epilog, split_host_prolog

        self._host, graph = split_host_prolog(graph)
        graph, self._epilog = split_host_epilog(graph)
        self.graph = graph
        self.dtype = np.dtype(dtype)
        self.mesh = mesh
        self._input_sharding_fn = input_sharding_fn

        if share_params_with is not None:
            # same weights, different static shapes elsewhere (e.g. the
            # per-cache-length decode programs of a length-bucketed
            # server): reuse the donor's device arrays instead of
            # re-uploading a full parameter set per program. Shape- or
            # dtype-mismatched entries (length-dependent tables such as
            # position aranges/masks) are NOT shared — they upload fresh.
            if set(share_params_with.params) != set(graph.weight_names):
                raise ValueError("share_params_with: weight sets differ")
            donor = share_params_with.params
            self.params = {}
            for name in graph.weight_names:
                arr = graph.constants[name]
                if arr.dtype == np.float32 and self.dtype != np.float32:
                    arr = arr.astype(self.dtype)
                d = donor[name]
                if tuple(d.shape) == tuple(np.shape(arr)) \
                        and d.dtype == arr.dtype:
                    self.params[name] = d
                elif mesh is not None and param_sharding_fn is not None:
                    self.params[name] = jax.device_put(
                        jnp.asarray(arr), param_sharding_fn(name, arr))
                else:
                    self.params[name] = jnp.asarray(arr)
        else:
            params: Dict[str, jax.Array] = {}
            for name in graph.weight_names:
                arr = graph.constants[name]
                if arr.dtype == np.float32 and self.dtype != np.float32:
                    arr = arr.astype(self.dtype)
                if mesh is not None and param_sharding_fn is not None:
                    sharding = param_sharding_fn(name, arr)
                    params[name] = jax.device_put(jnp.asarray(arr), sharding)
                else:
                    params[name] = jnp.asarray(arr)
            self.params = params

        raw = lower(graph)
        if self.dtype != np.float32:
            cast_dtype = self.dtype

            def fn(params, inputs):
                inputs = {
                    k: (v.astype(cast_dtype) if v.dtype == jnp.float32 else v)
                    for k, v in inputs.items()
                }
                out = raw(params, inputs)

                def uncast(v):
                    if isinstance(v, (list, tuple)):  # sequence output
                        return [uncast(e) for e in v]
                    return (v.astype(jnp.float32)
                            if v.dtype == jnp.dtype(cast_dtype) else v)

                return {k: uncast(v) for k, v in out.items()}
        else:
            fn = raw
        self._fn = jax.jit(fn, donate_argnums=(1,) if donate_inputs else ())

    # -- input handling ------------------------------------------------
    def _canon_inputs(self, inputs) -> Dict[str, jax.Array]:
        names = self.graph.input_names
        if isinstance(inputs, (list, tuple)):
            inputs = dict(zip(names, inputs))
        elif isinstance(inputs, np.ndarray) or hasattr(inputs, "shape"):
            inputs = {names[0]: inputs}
        out = {}
        for k, v in inputs.items():
            v = jnp.asarray(v)
            if self._input_sharding_fn is not None and self.mesh is not None:
                v = jax.device_put(v, self._input_sharding_fn(k, v))
            out[k] = v
        return out

    def _apply_host(self, inputs):
        """Run the host prolog (string/image front-end): returns the device
        feed dict and the host-produced graph outputs."""
        h = self._host
        if isinstance(inputs, (list, tuple)):
            inputs = dict(zip(h.orig_input_names, inputs))
        elif isinstance(inputs, np.ndarray) or hasattr(inputs, "shape"):
            inputs = {h.orig_input_names[0]: inputs}
        need = set(h.consumed_inputs)  # don't pull device-only feeds to host
        host_out = h.run({k: np.asarray(v) for k, v in inputs.items()
                          if k in need})
        dev_feed = {k: v for k, v in inputs.items()
                    if k in self.graph.input_names}
        dev_feed.update({b: host_out[b] for b in h.boundary})
        return dev_feed, {o: host_out[o] for o in h.host_outputs}

    # -- API -----------------------------------------------------------
    def __call__(self, inputs) -> Dict[str, jax.Array]:
        host_outputs: Dict[str, np.ndarray] = {}
        if self._host is not None:
            inputs, host_outputs = self._apply_host(inputs)
        feed = self._canon_inputs(inputs)
        out = (dict(self._fn(self.params, feed))
               if self.graph.outputs else {})
        out.update(host_outputs)
        if self._epilog is not None:
            ep = self._epilog.run(out, feed)
            for b in self._epilog.extra_boundary:  # helper-only tensors
                out.pop(b, None)
            out.update(ep)
        return out

    @staticmethod
    def _to_host(v):
        if isinstance(v, (list, tuple)):  # sequence output
            return [e if isinstance(e, dict) else np.asarray(e)
                    for e in v]           # ZipMap: sequence of maps
        return np.asarray(v)

    def run(self, inputs) -> InferenceResult:
        t0 = time.perf_counter()
        out = self(inputs)
        out = {k: self._to_host(v) for k, v in out.items()}  # blocks
        return InferenceResult(out, time.perf_counter() - t0)

    def compile(self, inputs):
        """Ahead-of-time compile for the given example inputs; returns self."""
        if self._host is not None:
            self(inputs)  # host prolog shapes gate the device signature
            return self
        self._fn(self.params, self._canon_inputs(inputs))
        return self

    def output_shapes(self, inputs) -> Dict[str, Tuple[int, ...]]:
        if self._host is not None or self._epilog is not None:
            return {k: tuple(np.shape(v)) for k, v in self(inputs).items()}
        shapes = jax.eval_shape(self._fn, self.params, self._canon_inputs(inputs))
        return {k: tuple(v.shape) for k, v in shapes.items()}

    @property
    def jitted(self):
        return self._fn
