"""Sharding rules: how weights and activations map onto the mesh.

The engine is sharding-agnostic — it takes `param_sharding_fn(name, array)`
and `input_sharding_fn(name, array)` callables (engine.py). This module
provides the standard policies:

- activations: batch dim sharded over "data" (data parallelism; the
  reference hardcodes batch==1, convolution_op.rs:480).
- CNN weights: output-channel dim sharded over "model" when divisible
  (tensor parallelism; XLA inserts the all-gathers/reduce-scatters).
- small tensors (biases, scales): replicated.

With these in place, `jax.jit` of the lowered graph under a Mesh runs the
same program single-chip, multi-chip, and multi-host.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_input_sharding(mesh: Mesh, axis: str = "data") -> Callable:
    """Shard the leading (batch) dim of every input over the data axis."""

    def fn(name: str, arr) -> NamedSharding:
        if arr.ndim >= 1 and axis in mesh.axis_names:
            n = mesh.shape[axis]
            if arr.shape[0] % n == 0 and arr.shape[0] >= n:
                return NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
        return replicated(mesh)

    return fn


def seq_input_sharding(mesh: Mesh, axis: str = "seq",
                       data_axis: str = "data") -> Callable:
    """Sequence parallelism for prefill: shard dim 1 (the L axis of
    [B, L] token inputs / [B, L, D] activations) over `axis`, composable
    with batch sharding over `data_axis` on dim 0.

    Jit propagates the L-sharding through embeddings, layernorms and MLPs
    (which stay fully sequence-parallel) and inserts the all-gathers that
    attention genuinely needs (K/V over the full sequence) — the XLA-native
    form of sequence parallelism: annotate, don't hand-schedule."""

    def fn(name: str, arr) -> NamedSharding:
        spec = [None] * max(arr.ndim, 0)
        if arr.ndim >= 1 and data_axis in mesh.axis_names:
            n = mesh.shape[data_axis]
            if n > 1 and arr.shape[0] % n == 0:
                spec[0] = data_axis
        if arr.ndim >= 2 and axis in mesh.axis_names:
            n = mesh.shape[axis]
            if n > 1 and arr.shape[1] % n == 0:
                spec[1] = axis
        return NamedSharding(mesh, P(*spec))

    return fn


def cnn_param_sharding(mesh: Mesh, axis: str = "model") -> Callable:
    """Tensor-shard conv kernels (O I kh kw) and matmul weights on the
    output-feature dim when it divides the model axis; replicate the rest."""

    def fn(name: str, arr: np.ndarray) -> NamedSharding:
        if axis not in mesh.axis_names:
            return replicated(mesh)
        n = mesh.shape[axis]
        if n == 1 or arr.ndim < 2:
            return replicated(mesh)
        if arr.ndim == 4 and arr.shape[0] % n == 0:  # conv OIHW → shard O
            return NamedSharding(mesh, P(axis, None, None, None))
        if arr.ndim == 2 and arr.shape[-1] % n == 0:  # matmul (in,out) → shard out
            return NamedSharding(mesh, P(None, axis))
        return replicated(mesh)

    return fn


def shard_params(params: Dict[str, jax.Array], mesh: Mesh,
                 rule: Callable) -> Dict[str, jax.Array]:
    return {k: jax.device_put(v, rule(k, v)) for k, v in params.items()}
