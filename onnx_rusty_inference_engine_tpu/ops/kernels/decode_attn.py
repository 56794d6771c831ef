"""Fused single-token decode attention over an INT8 KV cache.

One Pallas kernel computes, per (batch, head):

    scores = q . K^T        (K dequantized int8->bf16 in VMEM)
    scores += causal/validity bias
    p = softmax(scores)
    ctx = p . V             (V dequantized in VMEM)

replacing the XLA lowering's per-layer chain (K transpose, scores
dot_general, scale mul, bias add, 3-4 softmax kernels, ctx dot_general,
plus two materialized DequantizeLinear outputs) with ONE kernel launch.
On the time-shared chip each eliminated kernel also saves its
inter-kernel gap (~0.9 us, PERF.md), and the int8 cache is read at 1
byte/elem instead of round-tripping a dequantized fp32 copy through HBM.

Scale handling keeps the kernel scalar-free: the caller folds the
attention scale AND the per-head K scale into q (q' = q * sk[h] / sqrt(hd))
and applies the per-head V scale to the output (ctx * sv[h]) — both fuse
into the surrounding elementwise chains outside.

GQA comes free: the kv index map sends query head h to kv head
h // (H // Hkv), so grouped heads SHARE the cache block — no
Expand-materialized [B, H, L, hd] copy (the XLA path pays that in fp32).

Layout: hd must be a full lane tile (64/128 ok as the whole minor dim);
L (cache length) must be a sublane multiple (8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref,
                        *, n_kv: int, rep: int):
    bias = bias_ref[0]                               # [1, L]
    dn = (((1,), (1,)), ((), ()))                    # contract hd
    dn2 = (((1,), (0,)), ((), ()))                   # [rep,L] x [L,hd]
    for g in range(n_kv):
        qg = q_ref[0, g * rep:(g + 1) * rep].astype(jnp.bfloat16)  # [rep,hd]
        k = k_ref[0, g].astype(jnp.bfloat16)         # [L, hd]
        v = v_ref[0, g].astype(jnp.bfloat16)
        s = jax.lax.dot_general(qg, k, dn,
                                preferred_element_type=jnp.float32)
        s = s + bias                                 # [rep, L]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        out_ref[0, g * rep:(g + 1) * rep] = jax.lax.dot_general(
            p, v, dn2, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_q_heads", "interpret"))
def decode_attention_int8(
    q: jax.Array,      # f32/bf16 [B*H, 1, hd] — pre-scaled (see module doc)
    k8: jax.Array,     # int8 [B*Hkv, L, hd]
    v8: jax.Array,     # int8 [B*Hkv, L, hd]
    bias: jax.Array,   # f32 [B, 1, L] additive mask (0 / -inf style)
    *,
    n_q_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused decode attention -> f32 [B*H, 1, hd].

    Grid = batch only; the kv heads are a STATIC in-kernel loop (one
    kernel launch per layer, B grid steps) — a per-(b,h) grid paid ~1 us
    of step overhead per tiny [1,hd]x[hd,L] dot and measured SLOWER than
    the unfused XLA chain. Grouped query heads ride the same dot with
    M=rep rows."""
    BH, one, hd = q.shape
    assert one == 1
    H = n_q_heads
    B = BH // H
    BHkv, L, hd2 = k8.shape
    Hkv = BHkv // B
    assert hd2 == hd and BHkv * (H // Hkv) == BH * 1
    rep = H // Hkv

    q3 = q.reshape(B, H, hd)
    k4 = k8.reshape(B, Hkv, L, hd)
    v4 = v8.reshape(B, Hkv, L, hd)

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, n_kv=Hkv, rep=rep),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, L, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, L, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * L * hd,
            bytes_accessed=2 * BHkv * L * hd + BH * hd * 8 + B * L * 4,
            transcendentals=BH * L,
        ),
        interpret=interpret,
    )(q3, k4, v4, bias)
    return out.reshape(BH, 1, hd)


def _decode_attn_i8_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref,
                           *, n_kv: int, rep: int):
    """int8 x int8 MXU variant: q is dynamically quantized per row inside
    the kernel, scores accumulate in s32 on the MXU, probs are quantized
    to int8 for the p @ v contraction — the cache is NEVER widened on the
    VPU (the explicit int8->bf16 convert is what sank the bf16 variant,
    PERF.md "Fused decode attention")."""
    bias = bias_ref[0]                               # [1, L]
    dni = (((1,), (1,)), ((), ()))
    for g in range(n_kv):
        qf = q_ref[0, g * rep:(g + 1) * rep]         # [rep, hd] f32
        amax = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-9)
        sq = amax / 127.0
        q8 = jnp.round(qf / sq).astype(jnp.int8)
        s32 = jax.lax.dot_general(q8, k_ref[0, g], dni,
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * sq + bias      # [rep, L]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        # per-call dynamic prob scale: flat distributions (p ~ 1/L) would
        # vanish under a fixed 1/127 grid
        pmax = jnp.maximum(jnp.max(p), 1e-9)
        sp = pmax / 127.0
        p8 = jnp.round(p / sp).astype(jnp.int8)
        c32 = jax.lax.dot_general(p8, v_ref[0, g],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out_ref[0, g * rep:(g + 1) * rep] = c32.astype(jnp.float32) * sp


@functools.partial(jax.jit, static_argnames=("n_q_heads", "interpret"))
def decode_attention_int8_mxu(
    q: jax.Array,      # f32 [B*H, 1, hd] — pre-scaled (see module doc)
    k8: jax.Array,     # int8 [B*Hkv, L, hd]
    v8: jax.Array,     # int8 [B*Hkv, L, hd]
    bias: jax.Array,   # f32 [B, 1, L]
    *,
    n_q_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """int8xint8 fused decode attention -> f32 [B*H, 1, hd]."""
    BH, one, hd = q.shape
    H = n_q_heads
    B = BH // H
    BHkv, L, _ = k8.shape
    Hkv = BHkv // B
    rep = H // Hkv

    out = pl.pallas_call(
        functools.partial(_decode_attn_i8_kernel, n_kv=Hkv, rep=rep),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, L, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, L, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * L * hd,
            bytes_accessed=2 * BHkv * L * hd + BH * hd * 8 + B * L * 4,
            transcendentals=BH * L,
        ),
        interpret=interpret,
    )(q.reshape(B, H, hd), k8.reshape(B, Hkv, L, hd),
      v8.reshape(B, Hkv, L, hd), bias)
    return out.reshape(BH, 1, hd)
