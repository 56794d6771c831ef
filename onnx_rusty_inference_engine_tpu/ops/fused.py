"""Framework-native fused ops (domain com.oriet).

These are ops OUR builders emit when a whole subgraph has a dedicated
Pallas kernel — the TPU-native analog of ORT's com.microsoft fusions
(Attention, SkipLayerNorm...). The ONNX file stays self-describing: the
node carries a domain + documented signature, and a pure-JAX fallback
lowering keeps the graph runnable on any backend (CPU tests use it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .registry import LoweringContext, register
from ..graph import Node


@register("FusedDecodeAttention", domain="com.oriet")
def fused_decode_attention(ctx: LoweringContext, node: Node, ins):
    """Single-token attention over an INT8 KV cache, GQA-aware.

    Inputs: q [B,H,1,hd] float; k8, v8 [B,Hkv,L,hd] int8 (the updated
    cache); k_scale, v_scale [Hkv] per-head dequant scales; bias
    [B,1,1,L] additive mask. Attr: scale (default 1/sqrt(hd)).
    Output: ctx [B,H,1,hd] float — what MatMul(softmax(...), v) produces
    in the unfused graph (reference for the unfused chain:
    models/gpt2.py build_gpt2_decode per-layer attention).

    On TPU this lowers to ONE Pallas kernel (ops/kernels/decode_attn.py):
    the int8 cache is dequantized in VMEM (never materialized in fp32 HBM)
    and grouped query heads SHARE the kv block via the index map instead
    of an Expand copy. Elsewhere: a pure-JAX fp32 fallback.
    """
    q, k8, v8, sk, sv, bias = ins[:6]
    B, H, one, hd = q.shape
    _, Hkv, L, _ = k8.shape
    rep = H // Hkv
    scale = float(node.attr("scale", 1.0 / float(hd) ** 0.5))

    sk_h = jnp.repeat(sk, rep) if rep > 1 else sk      # [H]
    sv_h = jnp.repeat(sv, rep) if rep > 1 else sv

    if jax.default_backend() == "tpu":
        import os

        if os.environ.get("ORIET_ATTN_I8"):
            # experimental int8xint8 MXU formulation (s32 scores, dynamic
            # q/prob quantization in-kernel) — see PERF.md
            from .kernels.decode_attn import (
                decode_attention_int8_mxu as decode_attention_int8)
        else:
            from .kernels.decode_attn import decode_attention_int8

        q2 = q * (sk_h * scale)[None, :, None, None]
        out = decode_attention_int8(
            q2.reshape(B * H, one, hd),
            k8.reshape(B * Hkv, L, hd),
            v8.reshape(B * Hkv, L, hd),
            bias.reshape(B, 1, L),
            n_q_heads=H)
        ctx_out = out.reshape(B, H, one, hd) * sv_h[None, :, None, None]
        return (ctx_out.astype(q.dtype),)

    # fallback: same math in fp32 (matches the unfused QDQ chain closely)
    kf = k8.astype(jnp.float32) * sk[None, :, None, None]
    vf = v8.astype(jnp.float32) * sv[None, :, None, None]
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=1)
        vf = jnp.repeat(vf, rep, axis=1)
    s = jnp.einsum("bhqd,bhld->bhql", q.astype(jnp.float32), kf) * scale
    s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhql,bhld->bhqd", p, vf)
    return (out.astype(q.dtype),)
