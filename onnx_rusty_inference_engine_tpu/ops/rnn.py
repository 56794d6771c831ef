"""Recurrent op emitters: LSTM / GRU / RNN.

The reference's op set is pure CNN (model_inference.rs:138-161); these
complete coverage for the RNN-era ONNX zoo. TPU-native realization: the
time loop is a single `lax.scan` (one compiled region, no Python loop), the
per-step gate math is one [B, I+H] x [I+H, G·H] matmul on the MXU, and
bidirectional runs as two scans over the same weights pytree.

ONNX semantics implemented: gate orders iofc (LSTM) / zrh (GRU), layout 0
([T,B,...]) and 1 ([B,T,...]), forward/reverse/bidirectional,
optional bias / initial states / peepholes (LSTM) / sequence_lens
(per-batch masking: state freezes and Y zeroes past each length),
linear_before_reset (GRU), clip. Non-default activation lists raise
UnsupportedOpError (the defaults sigmoid/tanh are what real exports use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register

_DEFAULT_ACTS = {
    "LSTM": [b"Sigmoid", b"Tanh", b"Tanh"],
    "GRU": [b"Sigmoid", b"Tanh"],
    "RNN": [b"Tanh"],
}


def _check_activations(node: Node, op: str, n_dirs: int):
    acts = node.attr("activations")
    if acts is None:
        return
    acts = [a if isinstance(a, bytes) else str(a).encode() for a in acts]
    want = _DEFAULT_ACTS[op] * n_dirs
    if [a.lower() for a in acts] != [w.lower() for w in want]:
        raise UnsupportedOpError(
            f"{op}: only default activations supported, got {acts}")


def _clip_fn(node: Node):
    c = node.attr("clip")
    if c is None:
        return lambda x: x
    c = float(c)
    return lambda x: jnp.clip(x, -c, c)


def _prep(node: Node, ins, n_gates: int):
    """Common unpacking: returns (x [T,B,I], per-direction params, meta)."""
    x = ins[0]
    layout = int(node.attr("layout", 0))
    if layout == 1:
        x = jnp.transpose(x, (1, 0, 2))
    W, R = ins[1], ins[2]  # [D, G*H, I], [D, G*H, H]
    n_dirs = W.shape[0]
    H = W.shape[1] // n_gates
    B = ins[3] if len(ins) > 3 and ins[3] is not None else None  # [D, 2*G*H]
    seq_lens = ins[4] if len(ins) > 4 and ins[4] is not None else None
    init_h = ins[5] if len(ins) > 5 and ins[5] is not None else None
    direction = node.attr("direction", b"forward")
    direction = (direction.decode() if isinstance(direction, bytes)
                 else str(direction)).lower()
    return x, W, R, B, seq_lens, init_h, n_dirs, H, direction, layout


def _mask_scan(step, carry0, xs, seq_lens, T):
    """Scan `step` over time with optional per-batch length masking.

    step: (carry, x_t) -> (carry, y_t); carry is a tuple of [B, H] arrays.
    Past a sequence's length the carry freezes and y zeroes (ORT behavior).
    """
    ts = jnp.arange(T)

    def wrapped(carry, inp):
        t, x_t = inp
        new_carry, y = step(carry, x_t)
        if seq_lens is not None:
            alive = (t < seq_lens)[:, None]  # [B, 1]
            new_carry = tuple(jnp.where(alive, n, c)
                              for n, c in zip(new_carry, carry))
            y = jnp.where(alive, y, 0)
        return new_carry, y

    return lax.scan(wrapped, carry0, (ts, xs))


def _flip_valid(x, seq_lens):
    """Per-sequence time reversal of the VALID prefix: frame t of sequence b
    maps to len_b-1-t for t < len_b, and stays in place past the length
    (ONNX reverse semantics with sequence_lens; a whole-tensor flip would
    process padding frames and mask the real ones). Involution, so the same
    transform un-reverses the outputs. x: [T, B, ...]."""
    T = x.shape[0]
    t = jnp.arange(T)[:, None]                                # [T, 1]
    lens = seq_lens.astype(jnp.int32)[None, :]                # [1, B]
    idx = jnp.where(t < lens, lens - 1 - t, t)                # [T, B]
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=0)


def _run_directions(x, n_dirs, direction, run_one, seq_lens=None):
    """run_one(xs, d) -> (ys [T,B,H], finals tuple). Returns stacked
    [T, D, B, H] and per-state [D, B, H]."""
    outs, finals = [], []

    def flip(v):
        return (_flip_valid(v, seq_lens) if seq_lens is not None
                else jnp.flip(v, 0))

    for d in range(n_dirs):
        rev = (direction == "reverse") or (
            direction == "bidirectional" and d == 1)
        xs = flip(x) if rev else x
        ys, fin = run_one(xs, d)
        if rev:
            ys = flip(ys)
        outs.append(ys)
        finals.append(fin)
    y = jnp.stack(outs, axis=1)  # [T, D, B, H]
    states = [jnp.stack([f[i] for f in finals], axis=0)
              for i in range(len(finals[0]))]
    return y, states


def _finish(y, states, layout):
    if layout == 1:  # [T,D,B,H] -> [B,T,D,H]; states [D,B,H] -> [B,D,H]
        y = jnp.transpose(y, (2, 0, 1, 3))
        states = [jnp.transpose(s, (1, 0, 2)) for s in states]
    return (y, *states)


@register("LSTM")
def lstm(ctx: LoweringContext, node: Node, ins):
    x, W, R, Bb, seq_lens, init_h, n_dirs, H, direction, layout = _prep(
        node, ins, 4)
    _check_activations(node, "LSTM", n_dirs)
    clip = _clip_fn(node)
    init_c = ins[6] if len(ins) > 6 and ins[6] is not None else None
    P = ins[7] if len(ins) > 7 and ins[7] is not None else None  # [D, 3H]
    if layout == 1:
        if init_h is not None:
            init_h = jnp.transpose(init_h, (1, 0, 2))
        if init_c is not None:
            init_c = jnp.transpose(init_c, (1, 0, 2))
    T, Bt = x.shape[0], x.shape[1]

    def run_one(xs, d):
        Wd, Rd = W[d].T, R[d].T  # [I, 4H], [H, 4H]
        bias = (Bb[d, :4 * H] + Bb[d, 4 * H:]) if Bb is not None else 0.0
        h0 = init_h[d] if init_h is not None else jnp.zeros((Bt, H), x.dtype)
        c0 = init_c[d] if init_c is not None else jnp.zeros((Bt, H), x.dtype)
        pi, po, pf = ((P[d, :H], P[d, H:2 * H], P[d, 2 * H:])
                      if P is not None else (0.0, 0.0, 0.0))

        def step(carry, x_t):
            h, c = carry
            g = clip(x_t @ Wd + h @ Rd + bias)  # [B, 4H], gate order iofc
            i = jax.nn.sigmoid(g[:, :H] + pi * c)
            o_pre = g[:, H:2 * H]
            f = jax.nn.sigmoid(g[:, 2 * H:3 * H] + pf * c)
            c_new = f * c + i * jnp.tanh(g[:, 3 * H:])
            o = jax.nn.sigmoid(o_pre + po * c_new)
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_f, c_f), ys = _mask_scan(step, (h0, c0), xs, seq_lens, T)
        return ys, (h_f, c_f)

    y, states = _run_directions(x, n_dirs, direction, run_one, seq_lens)
    return _finish(y, states, layout)


@register("GRU")
def gru(ctx: LoweringContext, node: Node, ins):
    x, W, R, Bb, seq_lens, init_h, n_dirs, H, direction, layout = _prep(
        node, ins, 3)
    _check_activations(node, "GRU", n_dirs)
    clip = _clip_fn(node)
    lbr = int(node.attr("linear_before_reset", 0))
    if layout == 1 and init_h is not None:
        init_h = jnp.transpose(init_h, (1, 0, 2))
    T, Bt = x.shape[0], x.shape[1]

    def run_one(xs, d):
        Wd, Rd = W[d].T, R[d].T  # [I, 3H], [H, 3H]
        wb = Bb[d, :3 * H] if Bb is not None else jnp.zeros((3 * H,), x.dtype)
        rb = Bb[d, 3 * H:] if Bb is not None else jnp.zeros((3 * H,), x.dtype)
        h0 = init_h[d] if init_h is not None else jnp.zeros((Bt, H), x.dtype)

        def step(carry, x_t):
            (h,) = carry
            gx = x_t @ Wd + wb          # [B, 3H], gate order zrh
            gh = h @ Rd + rb            # [B, 3H]
            z = jax.nn.sigmoid(clip(gx[:, :H] + gh[:, :H]))
            r = jax.nn.sigmoid(clip(gx[:, H:2 * H] + gh[:, H:2 * H]))
            if lbr:
                hh = jnp.tanh(clip(gx[:, 2 * H:] + r * gh[:, 2 * H:]))
            else:
                hh = jnp.tanh(clip(gx[:, 2 * H:] + (r * h) @ Rd[:, 2 * H:]
                                   + rb[2 * H:]))
            h_new = (1 - z) * hh + z * h
            return (h_new,), h_new

        (h_f,), ys = _mask_scan(step, (h0,), xs, seq_lens, T)
        return ys, (h_f,)

    y, states = _run_directions(x, n_dirs, direction, run_one, seq_lens)
    return _finish(y, states, layout)


@register("RNN")
def rnn(ctx: LoweringContext, node: Node, ins):
    x, W, R, Bb, seq_lens, init_h, n_dirs, H, direction, layout = _prep(
        node, ins, 1)
    _check_activations(node, "RNN", n_dirs)
    clip = _clip_fn(node)
    if layout == 1 and init_h is not None:
        init_h = jnp.transpose(init_h, (1, 0, 2))
    T, Bt = x.shape[0], x.shape[1]

    def run_one(xs, d):
        Wd, Rd = W[d].T, R[d].T
        bias = (Bb[d, :H] + Bb[d, H:]) if Bb is not None else 0.0
        h0 = init_h[d] if init_h is not None else jnp.zeros((Bt, H), x.dtype)

        def step(carry, x_t):
            (h,) = carry
            h_new = jnp.tanh(clip(x_t @ Wd + h @ Rd + bias))
            return (h_new,), h_new

        (h_f,), ys = _mask_scan(step, (h0,), xs, seq_lens, T)
        return ys, (h_f,)

    y, states = _run_directions(x, n_dirs, direction, run_one, seq_lens)
    return _finish(y, states, layout)
