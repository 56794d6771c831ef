"""Sequence and Optional ops (ONNX sequence<tensor> / optional<T> types).

The reference engine has no notion of non-tensor values at all (its value
store is a flat name → tensor map, src/inference_engine/model_inference.rs).
TPU-native realization: a sequence is a TRACE-TIME structure — a Python
list of traced arrays — because XLA programs have static shapes, so the
*length* of a sequence (like every shape) must be known when the graph is
lowered. Element values stay fully dynamic; only the list structure is
static. This is exactly the jit pytree model: a list of arrays is a valid
jit input/output, so sequences flow through `Engine`'s single jitted
function with zero special-casing in the executor.

Consequences, stated per op below:
  * positions (SequenceAt / Insert / Erase) prefer trace-time constants;
    SequenceAt additionally supports a *dynamic* position over a
    homogeneous sequence via `lax.switch` (static structure, dynamic
    choice — the XLA-legal form of dynamic indexing).
  * a Loop whose state carries a sequence is unrolled at trace time
    (ONNX Loop here already requires a static trip count — see
    control_flow.py — so unrolling is always possible); the classic
    "append to a sequence in a Loop" export pattern therefore works.

Optionals are the same idea one level up: presence is static, the payload
is dynamic. `OptionalValue(None)` is the empty optional.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph import Node
from .registry import (LoweringContext, UnsupportedOpError, index_dtype,
                       register)

__all__ = ["OptionalValue", "is_sequence"]


class OptionalValue:
    """ONNX optional<tensor|sequence>: statically-known presence."""

    __slots__ = ("value",)

    def __init__(self, value=None):
        self.value = value

    @property
    def has(self) -> bool:
        return self.value is not None

    def __repr__(self):
        return f"OptionalValue({'empty' if self.value is None else 'set'})"


def is_sequence(v) -> bool:
    return isinstance(v, list)


def _require_sequence(v, op: str) -> List:
    if not is_sequence(v):
        raise UnsupportedOpError(
            f"{op}: expected a sequence value (trace-time list), got "
            f"{type(v).__name__} — sequence structure must be static under "
            f"XLA; a sequence produced by data-dependent control flow "
            f"cannot be lowered")
    return v


def _static_pos(ctx: LoweringContext, node: Node, idx: int,
                length: int, op: str, default: Optional[int] = None
                ) -> Optional[int]:
    """Trace-time position input, normalized to [0, length]; None when the
    input is present but dynamic (caller decides whether that's legal)."""
    if idx >= len(node.inputs) or not node.inputs[idx]:
        if default is None:
            raise UnsupportedOpError(f"{op}: position input required")
        return default
    c = ctx.constant(node.inputs[idx])
    if c is None:
        return None
    p = int(np.asarray(c).reshape(()))
    if p < 0:
        p += length
    return p


# --------------------------------------------------------------------------
# construction / destructuring
# --------------------------------------------------------------------------
@register("SequenceEmpty")
def sequence_empty(ctx: LoweringContext, node: Node, ins):
    return ([],)


@register("SequenceConstruct")
def sequence_construct(ctx: LoweringContext, node: Node, ins):
    return (list(ins),)


@register("SequenceLength")
def sequence_length(ctx: LoweringContext, node: Node, ins):
    seq = _require_sequence(ins[0], "SequenceLength")
    return (jnp.asarray(len(seq), dtype=index_dtype()),)


@register("SequenceAt")
def sequence_at(ctx: LoweringContext, node: Node, ins):
    seq = _require_sequence(ins[0], "SequenceAt")
    if not seq:
        raise UnsupportedOpError("SequenceAt on an empty sequence")
    p = _static_pos(ctx, node, 1, len(seq), "SequenceAt")
    if p is not None:
        if not 0 <= p < len(seq):
            raise UnsupportedOpError(
                f"SequenceAt: position {p} out of range for length {len(seq)}")
        return (seq[p],)
    # dynamic position: legal when every element agrees in shape+dtype —
    # lax.switch keeps the structure static while the choice is data-driven
    shapes = {(v.shape, str(v.dtype)) for v in seq}
    if len(shapes) != 1:
        raise UnsupportedOpError(
            "SequenceAt: dynamic position over a heterogeneous sequence "
            f"(element shapes/dtypes {sorted(map(str, shapes))}) has no "
            "static-shape lowering; make the position a constant")
    pos = ins[1].reshape(()).astype(jnp.int32)
    pos = jnp.where(pos < 0, pos + len(seq), pos)
    return (lax.switch(jnp.clip(pos, 0, len(seq) - 1),
                       [lambda v=v: v for v in seq]),)


@register("SequenceInsert")
def sequence_insert(ctx: LoweringContext, node: Node, ins):
    seq = _require_sequence(ins[0], "SequenceInsert")
    p = _static_pos(ctx, node, 2, len(seq), "SequenceInsert",
                    default=len(seq))
    if p is None:
        raise UnsupportedOpError(
            "SequenceInsert: position must be a trace-time constant — a "
            "dynamic insert position changes which static slot each element "
            "occupies")
    if not 0 <= p <= len(seq):
        raise UnsupportedOpError(
            f"SequenceInsert: position {p} out of range for length {len(seq)}")
    out = list(seq)
    out.insert(p, ins[1])
    return (out,)


@register("SequenceErase")
def sequence_erase(ctx: LoweringContext, node: Node, ins):
    seq = _require_sequence(ins[0], "SequenceErase")
    if not seq:
        raise UnsupportedOpError("SequenceErase on an empty sequence")
    p = _static_pos(ctx, node, 1, len(seq), "SequenceErase",
                    default=len(seq) - 1)
    if p is None:
        raise UnsupportedOpError(
            "SequenceErase: position must be a trace-time constant")
    if not 0 <= p < len(seq):
        raise UnsupportedOpError(
            f"SequenceErase: position {p} out of range for length {len(seq)}")
    out = list(seq)
    del out[p]
    return (out,)


# --------------------------------------------------------------------------
# tensor <-> sequence
# --------------------------------------------------------------------------
@register("SplitToSequence")
def split_to_sequence(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    axis = int(node.attrs.get("axis", 0)) % max(x.ndim, 1)
    n = x.shape[axis]
    if len(node.inputs) > 1 and node.inputs[1]:
        split = ctx.require_constant(node.inputs[1],
                                     "SplitToSequence split sizes")
        split = np.asarray(split)
        if split.ndim == 0:
            k = int(split)
            if k <= 0:
                raise UnsupportedOpError(
                    f"SplitToSequence: split size {k} must be positive")
            sizes = [k] * (n // k) + ([n % k] if n % k else [])
        else:
            sizes = [int(s) for s in split.tolist()]
            if sum(sizes) != n:
                raise UnsupportedOpError(
                    f"SplitToSequence: split sizes {sizes} do not sum to "
                    f"dim {n}")
        out, off = [], 0
        for s in sizes:
            out.append(lax.slice_in_dim(x, off, off + s, axis=axis))
            off += s
        return (out,)
    # no split input: one element per slice; keepdims controls the rank
    keepdims = int(node.attrs.get("keepdims", 1))
    parts = [lax.slice_in_dim(x, i, i + 1, axis=axis) for i in range(n)]
    if not keepdims:
        parts = [jnp.squeeze(p, axis=axis) for p in parts]
    return (parts,)


@register("ConcatFromSequence")
def concat_from_sequence(ctx: LoweringContext, node: Node, ins):
    seq = _require_sequence(ins[0], "ConcatFromSequence")
    if not seq:
        raise UnsupportedOpError("ConcatFromSequence on an empty sequence")
    axis = int(node.attrs["axis"])
    if int(node.attrs.get("new_axis", 0)):
        return (jnp.stack(seq, axis=axis % (seq[0].ndim + 1)),)
    return (jnp.concatenate(seq, axis=axis % seq[0].ndim),)


@register("SequenceMap")
def sequence_map(ctx: LoweringContext, node: Node, ins):
    """Apply the body subgraph to every element (trace-time unroll).

    Additional inputs that are themselves sequences zip per-element; plain
    tensors broadcast to every call, per the spec. XLA still sees one flat
    program — when the per-element computation is identical, its CSE/fusion
    handles the redundancy (a lax.scan would require homogeneous elements,
    which sequences do not guarantee)."""
    body = node.attrs.get("body")
    if body is None:
        raise UnsupportedOpError("SequenceMap: missing body subgraph")
    seq = _require_sequence(ins[0], "SequenceMap")
    extras = list(ins[1:])
    for e in extras:
        if is_sequence(e) and len(e) != len(seq):
            raise UnsupportedOpError(
                f"SequenceMap: additional sequence input of length {len(e)} "
                f"!= mapped length {len(seq)}")
    n_out = len(body.outputs)
    outs: List[List] = [[] for _ in range(n_out)]
    for i, elem in enumerate(seq):
        call = [elem] + [e[i] if is_sequence(e) else e for e in extras]
        res = ctx.eval_subgraph(body, call)
        for j in range(n_out):
            outs[j].append(res[j])
    return tuple(outs)


# --------------------------------------------------------------------------
# optionals
# --------------------------------------------------------------------------
@register("Optional")
def optional_construct(ctx: LoweringContext, node: Node, ins):
    if node.inputs and node.inputs[0]:
        return (OptionalValue(ins[0]),)
    return (OptionalValue(None),)


@register("OptionalHasElement")
def optional_has_element(ctx: LoweringContext, node: Node, ins):
    # opset 18: the input itself is optional; absent input → False. A
    # non-optional tensor/sequence input is trivially present.
    if not node.inputs or not node.inputs[0] or ins[0] is None:
        has = False
    elif isinstance(ins[0], OptionalValue):
        has = ins[0].has
    else:
        has = True
    return (jnp.asarray(has, dtype=jnp.bool_),)


@register("OptionalGetElement")
def optional_get_element(ctx: LoweringContext, node: Node, ins):
    v = ins[0]
    if isinstance(v, OptionalValue):
        if not v.has:
            raise UnsupportedOpError(
                "OptionalGetElement on a statically-empty optional")
        return (v.value,)
    if v is None:
        raise UnsupportedOpError("OptionalGetElement: input is absent")
    return (v,)  # opset 18 allows a plain tensor/sequence passthrough
