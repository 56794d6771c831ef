"""Control-flow emitters: If / Scan / Loop.

The reference has no control flow at all (its op set is a 10-entry match,
model_inference.rs:138-161). TPU-native realization under `jit`: XLA allows
no data-dependent Python control flow, so ONNX subgraphs lower onto
structured primitives — `lax.cond` (If), `lax.scan` (Scan, and Loop with a
static trip count). Subgraphs close over the outer scope via
LoweringContext.eval_subgraph (registry.py).

ONNX Loop's fully dynamic form (data-dependent trip count with per-trip
scan outputs) implies dynamic result shapes, which XLA cannot express; the
emitter supports the static-trip-count forms and raises a clean
UnsupportedOpError otherwise, stating exactly what was dynamic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register


@register("If")
def if_op(ctx: LoweringContext, node: Node, ins):
    pred = ins[0].reshape(()).astype(bool)
    then_g = node.attr("then_branch")
    else_g = node.attr("else_branch")
    if then_g is None or else_g is None:
        raise UnsupportedOpError("If: missing then/else branch subgraph")

    # constant predicate: lower only the taken branch (dead-branch pruning)
    p_static = ctx.constant(node.inputs[0])
    if p_static is not None:
        g = then_g if bool(np.asarray(p_static).reshape(())) else else_g
        return tuple(ctx.eval_subgraph(g, []))

    def then_fn(_):
        return tuple(ctx.eval_subgraph(then_g, []))

    def else_fn(_):
        return tuple(ctx.eval_subgraph(else_g, []))

    return lax.cond(pred, then_fn, else_fn, None)


@register("Scan")
def scan(ctx: LoweringContext, node: Node, ins):
    body = node.attr("body")
    n_scan = int(node.attr("num_scan_inputs"))
    n_state = len(ins) - n_scan
    states = list(ins[:n_state])
    xs = list(ins[n_state:])

    in_axes = [int(a) for a in node.attr("scan_input_axes", [0] * n_scan)]
    in_dirs = [int(d) for d in node.attr("scan_input_directions",
                                         [0] * n_scan)]
    body_outs = len(body.outputs)
    k_out = body_outs - n_state
    out_axes = [int(a) for a in node.attr("scan_output_axes", [0] * k_out)]
    out_dirs = [int(d) for d in node.attr("scan_output_directions",
                                          [0] * k_out)]

    # normalize every scan input to iterate over leading axis, forward
    norm = []
    for x, ax, d in zip(xs, in_axes, in_dirs):
        x = jnp.moveaxis(x, ax % x.ndim, 0)
        if d:
            x = jnp.flip(x, 0)
        norm.append(x)

    def step(carry, x_slices):
        outs = ctx.eval_subgraph(body, list(carry) + list(x_slices))
        return tuple(outs[:n_state]), tuple(outs[n_state:])

    carry, ys = lax.scan(step, tuple(states), tuple(norm))
    final = list(carry)
    for y, ax, d in zip(ys, out_axes, out_dirs):
        if d:
            y = jnp.flip(y, 0)
        final.append(jnp.moveaxis(y, 0, ax % y.ndim))
    return tuple(final)


def _body_cond_is_passthrough_or_true(body) -> bool:
    """True when the Loop body's first output (cond_out) is statically the
    incoming condition: an Identity chain from the body's cond input, or a
    constant-true initializer."""
    producers = {o: n for n in body.nodes for o in n.output if o}
    name = body.outputs[0].name
    while name in producers and producers[name].op_type == "Identity":
        name = producers[name].input[0]
    if len(body.inputs) > 1 and name == body.inputs[1].name:
        return True  # passthrough of the incoming cond
    const = body.initializers.get(name)
    return const is not None and bool(np.asarray(const).reshape(()))


@register("Loop")
def loop(ctx: LoweringContext, node: Node, ins):
    body = node.attr("body")
    m_name, cond_name = node.inputs[0], node.inputs[1]
    v_init = list(ins[2:])
    n_state = len(v_init)
    k_scan = len(body.outputs) - 1 - n_state

    trip = ctx.constant(m_name) if m_name else None
    if trip is None:
        raise UnsupportedOpError(
            "Loop: trip count must be statically known for XLA lowering "
            f"(tensor {m_name!r} is dynamic)")
    M = int(np.asarray(trip).reshape(()))

    # sequence/optional state (the "append to a sequence in a Loop" export
    # pattern): such state has trace-time STRUCTURE, so it cannot ride a
    # lax.scan carry — but the trip count is already static here, so the
    # loop unrolls at trace time instead. Dynamic early exit would make the
    # final structure data-dependent, hence the passthrough/true condition
    # requirement (same rule as scan outputs below).
    from .sequences import OptionalValue, is_sequence

    if any(is_sequence(v) or isinstance(v, OptionalValue) for v in v_init):
        cond0_static = ctx.constant(cond_name) if cond_name else True
        init_true = (not cond_name) or (
            cond0_static is not None
            and bool(np.asarray(cond0_static).reshape(())))
        if not (init_true and _body_cond_is_passthrough_or_true(body)):
            raise UnsupportedOpError(
                "Loop: sequence-valued state with a dynamic exit condition "
                "implies a data-dependent sequence length; make the trip "
                "count static and the body condition a passthrough/constant")
        states = list(v_init)
        ys_acc = [[] for _ in range(k_scan)]
        for i in range(M):
            outs = ctx.eval_subgraph(
                body, [jnp.asarray(i, dtype=ins[0].dtype
                                   if hasattr(ins[0], "dtype") else jnp.int32),
                       jnp.asarray(True)] + states)
            states = list(outs[1:1 + n_state])
            for j, y in enumerate(outs[1 + n_state:]):
                ys_acc[j].append(y)
        ys_out = tuple(jnp.stack(col) for col in ys_acc)
        return tuple(states) + ys_out

    if k_scan:
        # scan outputs under ANY dynamic early exit would have a
        # data-dependent length — not expressible in XLA. That includes a
        # body-computed condition, not just a dynamic initial one: allow
        # scan outputs only when the body's cond output provably stays at a
        # statically-true initial value (Identity passthrough of the cond
        # input, or a constant-true initializer).
        # the initial cond must be statically TRUE, not merely static: a
        # constant-false start means 0 iterations, so scan outputs must have
        # length 0 — which the fixed-M scan below cannot produce.
        cond0_static = ctx.constant(cond_name) if cond_name else True
        init_static_true = (not cond_name) or (
            cond0_static is not None
            and bool(np.asarray(cond0_static).reshape(())))
        if not (init_static_true and _body_cond_is_passthrough_or_true(body)):
            raise UnsupportedOpError(
                "Loop: per-iteration scan outputs with a dynamic exit "
                "condition imply dynamic shapes; make the trip count static "
                "and the body condition a passthrough/constant instead")

    cond0 = (ins[1].reshape(()).astype(bool) if cond_name
             else jnp.asarray(True))

    # run exactly M iterations; once the body's cond goes false the state
    # freezes (while-loop emulation with a fixed bound — the XLA-legal form)
    def step(carry, i):
        alive, states = carry
        outs = ctx.eval_subgraph(body, [i, alive] + list(states))
        new_cond = outs[0].reshape(()).astype(bool)
        new_states = tuple(
            jnp.where(alive, n, s) for n, s in zip(outs[1:1 + n_state],
                                                   states))
        ys = tuple(outs[1 + n_state:])
        return (jnp.logical_and(alive, new_cond), new_states), ys

    (alive_f, states_f), ys = lax.scan(
        step, (cond0, tuple(v_init)), jnp.arange(M))
    return tuple(states_f) + tuple(ys)
