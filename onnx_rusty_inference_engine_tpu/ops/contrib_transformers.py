"""ORT transformer contrib ops (com.microsoft domain).

onnxruntime's transformer optimizer rewrites exported BERT/GPT graphs into
fused contrib nodes; supporting them directly means those optimized ONNX
files ingest as-is. Lowering maps each back onto plain jnp/lax (XLA re-fuses
on TPU, so the "fused" contrib forms and the expanded forms compile to the
same machine code here — the ops exist for front-end compatibility).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register


@register("BiasGelu", domain="com.microsoft")
def bias_gelu(ctx, node, ins):
    x, b = ins
    return (jax.nn.gelu(x + b, approximate=False),)


@register("FastGelu", domain="com.microsoft")
def fast_gelu(ctx, node, ins):
    x = ins[0]
    if len(ins) > 1 and ins[1] is not None:
        x = x + ins[1]
    return (jax.nn.gelu(x, approximate=True),)


@register("SkipLayerNormalization", domain="com.microsoft")
def skip_layer_normalization(ctx, node, ins):
    x, skip, gamma = ins[0], ins[1], ins[2]
    beta = ins[3] if len(ins) > 3 and ins[3] is not None else None
    bias = ins[4] if len(ins) > 4 and ins[4] is not None else None
    eps = float(node.attr("epsilon", 1e-12))
    h = x + skip
    if bias is not None:
        h = h + bias
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    out = (h - mean) * jax.lax.rsqrt(var + eps) * gamma
    if beta is not None:
        out = out + beta
    # outputs: [ln, (mean), (inv_std), (input_skip_bias_sum)] — aligned by
    # SLOT, not by count of non-empty names: ORT's fused form commonly emits
    # ['ln', '', '', 'sum'] and the engine binds positionally (skipping
    # empty names), so every slot must carry its own value.
    extras = (mean.squeeze(-1), jax.lax.rsqrt(var + eps).squeeze(-1), h)
    return ((out,) + extras)[: len(node.outputs)]


@register("EmbedLayerNormalization", domain="com.microsoft")
def embed_layer_normalization(ctx, node, ins):
    (ids, seg_ids, word_emb, pos_emb) = ins[:4]
    seg_emb = ins[4] if len(ins) > 4 and ins[4] is not None else None
    gamma, beta = ins[5], ins[6]
    mask = ins[7] if len(ins) > 7 and ins[7] is not None else None
    pos_ids = ins[8] if len(ins) > 8 and ins[8] is not None else None
    eps = float(node.attr("epsilon", 1e-12))
    B, S = ids.shape
    e = word_emb[ids]
    if pos_ids is not None:
        # position_ids may be [B, S] or the broadcastable [1, S] / [S]
        pe = pos_emb[pos_ids.reshape(-1, pos_ids.shape[-1])
                     if pos_ids.ndim == 2 else pos_ids[None]]
        e = e + pe  # [B|1, S, D] broadcasts over the batch
    else:
        e = e + pos_emb[jnp.arange(S)][None]
    if seg_emb is not None and seg_ids is not None:
        e = e + seg_emb[seg_ids]
    mean = jnp.mean(e, axis=-1, keepdims=True)
    var = jnp.var(e, axis=-1, keepdims=True)
    out = (e - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    mask_index = (jnp.sum(mask.astype(jnp.int32), axis=1) if mask is not None
                  else jnp.full((B,), S, jnp.int32))
    # outputs: [ln, mask_index, (embedding_sum)] — slot-aligned (see
    # SkipLayerNormalization above for why).
    return (out, mask_index, e)[: max(len(node.outputs), 2)]


def _mask_bias(mask_index, B, S_q, S_kv):
    """ORT mask_index variants -> additive bias [B, 1, S_q, S_kv]."""
    if mask_index is None:
        return 0.0
    m = mask_index
    if m.ndim == 1 and m.shape[0] == B:  # right-padding lengths [B]
        valid = jnp.arange(S_kv)[None, :] < m[:, None]
    elif m.ndim == 2 and m.shape == (B, S_kv):  # 1/0 key mask
        valid = m.astype(bool)
    else:
        raise UnsupportedOpError(
            f"Attention: unsupported mask_index shape {m.shape}")
    return jnp.where(valid, 0.0, -1e9)[:, None, None, :]


def _sdpa(q, k, v, bias, unidirectional, scale=None):
    """q/k/v: [B, H, S, hd] -> [B, H, S_q, hd]."""
    hd = q.shape[-1]
    s = scale if scale is not None else 1.0 / np.sqrt(hd)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * s
    att = att + bias
    if unidirectional:
        S_q, S_kv = att.shape[-2], att.shape[-1]
        causal = jnp.tril(jnp.ones((S_q, S_kv), bool), S_kv - S_q)
        att = jnp.where(causal, att, -1e9)
    probs = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@register("Attention", domain="com.microsoft")
def attention(ctx: LoweringContext, node: Node, ins):
    """com.microsoft.Attention: fused packed-QKV self-attention."""
    x, w = ins[0], ins[1]
    bias = ins[2] if len(ins) > 2 and ins[2] is not None else None
    mask_index = ins[3] if len(ins) > 3 and ins[3] is not None else None
    if len(ins) > 4 and ins[4] is not None:
        raise UnsupportedOpError("Attention: past-state input not supported")
    attn_bias = ins[5] if len(ins) > 5 and ins[5] is not None else None
    if len(ins) > 6 and ins[6] is not None:
        raise UnsupportedOpError(
            "Attention: past_sequence_length input not supported")
    H = int(node.attr("num_heads"))
    uni = int(node.attr("unidirectional", 0))
    scale = node.attr("scale")
    B, S, D = x.shape
    qkv_sizes = node.attr("qkv_hidden_sizes")
    if qkv_sizes is not None:
        dq, dk, dv = [int(s_) for s_ in qkv_sizes]
    else:
        dq = dk = dv = w.shape[1] // 3
    qkv = x @ w
    if bias is not None:
        qkv = qkv + bias
    q, k, v = (qkv[..., :dq], qkv[..., dq:dq + dk], qkv[..., dq + dk:])

    def heads(t, d):
        return t.reshape(B, S, H, d // H).transpose(0, 2, 1, 3)

    mb = _mask_bias(mask_index, B, S, S)
    if attn_bias is not None:  # relative position bias, [B|1, H|1, S, S]
        mb = mb + attn_bias
    out = _sdpa(heads(q, dq), heads(k, dk), heads(v, dv), mb, uni,
                float(scale) if scale is not None else None)
    return (out.transpose(0, 2, 1, 3).reshape(B, S, dv),)


@register("MultiHeadAttention", domain="com.microsoft")
def multi_head_attention(ctx: LoweringContext, node: Node, ins):
    """com.microsoft.MultiHeadAttention: separate Q/K/V tensors."""
    q, k, v = ins[0], ins[1], ins[2]
    bias = ins[3] if len(ins) > 3 and ins[3] is not None else None
    key_padding_mask = ins[4] if len(ins) > 4 and ins[4] is not None else None
    attn_bias = ins[5] if len(ins) > 5 and ins[5] is not None else None
    if any(i is not None for i in ins[6:8]):
        raise UnsupportedOpError(
            "MultiHeadAttention: past-state inputs not supported")
    H = int(node.attr("num_heads"))
    scale = node.attr("scale")
    B, S_q, D = q.shape
    S_kv = k.shape[1]
    dv = v.shape[-1]
    if bias is not None:
        q = q + bias[:D]
        k = k + bias[D:D + k.shape[-1]]
        v = v + bias[D + k.shape[-1]:]

    def heads(t, d):
        return t.reshape(B, t.shape[1], H, d // H).transpose(0, 2, 1, 3)

    mb = _mask_bias(key_padding_mask, B, S_q, S_kv)
    if attn_bias is not None:
        mb = mb + attn_bias
    out = _sdpa(heads(q, D), heads(k, k.shape[-1]), heads(v, dv), mb,
                int(node.attr("unidirectional", 0)),
                float(scale) if scale is not None else None)
    return (out.transpose(0, 2, 1, 3).reshape(B, S_q, dv),)


@register("RotaryEmbedding", domain="com.microsoft")
def rotary_embedding(ctx: LoweringContext, node: Node, ins):
    """com.microsoft.RotaryEmbedding: apply RoPE with precomputed caches.

    input: [B, S, D] (or [B, H, S, hd] when input is 4-D), position_ids
    [B, S] or [1, S] (or scalar-per-batch [B, 1]), cos/sin caches
    [max_pos, rot_dim/2]. interleaved=0 (the llama half-rotation layout)
    and 1 (adjacent-pair rotation) both supported.
    """
    x, pos_ids, cos_cache, sin_cache = ins[:4]
    interleaved = int(node.attr("interleaved", 0))
    n_heads = int(node.attr("num_heads", 0))
    rot_half = cos_cache.shape[-1]
    rot = 2 * rot_half

    orig_ndim = x.ndim
    if x.ndim == 3:
        B, S, D = x.shape
        if n_heads:
            H = n_heads
        else:
            # ORT default: head_size inferred from the rotary cache
            if D % rot:
                raise UnsupportedOpError(
                    "RotaryEmbedding: num_heads required when hidden is not "
                    "a multiple of the rotary dim")
            H = D // rot
        xh = x.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)  # [B,H,S,hd]
    else:
        xh = x
        B, H, S, _ = xh.shape

    pid = pos_ids.reshape(pos_ids.shape[0], -1).astype(jnp.int32)
    if pid.shape[-1] == 1 and S > 1:
        # ORT shape-(B,1)/(1,) position_ids = per-sequence STARTING offset
        pid = pid + jnp.arange(S, dtype=jnp.int32)[None]
    cos = cos_cache[pid][:, None]  # [B|1, 1, S, rot/2]
    sin = sin_cache[pid][:, None]

    out = _rope_rotate(xh, cos, sin, rot, interleaved)
    if orig_ndim == 3:
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
    return (out,)


def _rope_rotate(xh, cos, sin, rot, interleaved):
    """Rotate the first `rot` head dims of xh [B,H,S,hd] by cos/sin
    [B|1, 1, S, rot/2]; dims past `rot` pass through. Shared by the
    com.microsoft and core-domain (opset 23) RotaryEmbedding lowerings."""
    rot_half = rot // 2
    xr, xp = xh[..., :rot], xh[..., rot:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rotated = jnp.stack([r1, r2], axis=-1).reshape(xr.shape)
    else:
        x1, x2 = xr[..., :rot_half], xr[..., rot_half:]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        rotated = jnp.concatenate([r1, r2], axis=-1)
    return jnp.concatenate([rotated, xp], axis=-1) if xp.shape[-1] \
        else rotated


@register("GroupQueryAttention", domain="com.microsoft")
def group_query_attention(ctx: LoweringContext, node: Node, ins):
    """com.microsoft.GroupQueryAttention (no-past form): GQA with optional
    fused rotary embedding — the attention node in ORT llama exports.

    Inputs: query [B,S,D], key/value [B,S,Hkv*hd], past_key/past_value
    (unsupported), seqlens_k [B] (per-batch valid KEY length - 1),
    total_sequence_length (scalar, ignored for the no-past static form),
    cos_cache/sin_cache (optional -> rotary applied to q/k). Causal by
    definition of the op.
    """
    q, k, v = ins[0], ins[1], ins[2]
    if any(i is not None for i in ins[3:5]):
        raise UnsupportedOpError(
            "GroupQueryAttention: past-state inputs not supported")
    seqlens_k = ins[5] if len(ins) > 5 and ins[5] is not None else None
    cos_cache = ins[7] if len(ins) > 7 and ins[7] is not None else None
    sin_cache = ins[8] if len(ins) > 8 and ins[8] is not None else None
    H = int(node.attr("num_heads"))
    Hkv = int(node.attr("kv_num_heads", H))
    # ORT: scale=0.0 (the serialized default) means 1/sqrt(head_size)
    scale = node.attr("scale")
    if scale is not None and float(scale) == 0.0:
        scale = None
    if float(node.attr("softcap", 0.0)) != 0.0:
        raise UnsupportedOpError("GroupQueryAttention: softcap not supported")
    if int(node.attr("local_window_size", -1)) not in (-1, 0):
        raise UnsupportedOpError(
            "GroupQueryAttention: local_window_size (sliding window) "
            "not supported")
    rot_interleaved = int(node.attr("rotary_interleaved", 0))
    B, S, D = q.shape
    hd = D // H

    qh = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)

    if cos_cache is not None:
        if 2 * cos_cache.shape[-1] != hd:
            raise UnsupportedOpError(
                "GroupQueryAttention: partial rotary dims not supported "
                f"(cache covers {2 * cos_cache.shape[-1]} of head_dim {hd})")
        pos = jnp.arange(S)
        if rot_interleaved:
            cos = jnp.repeat(cos_cache[pos], 2, -1)[None, None]
            sin = jnp.repeat(sin_cache[pos], 2, -1)[None, None]

            def rope(t):
                t1, t2 = t[..., 0::2], t[..., 1::2]
                r = jnp.stack([-t2, t1], axis=-1).reshape(t.shape)
                return t * cos + r * sin
        else:
            cos = jnp.concatenate([cos_cache[pos]] * 2, -1)[None, None]
            sin = jnp.concatenate([sin_cache[pos]] * 2, -1)[None, None]

            def rope(t):
                rot = jnp.concatenate(
                    [-t[..., hd // 2:], t[..., : hd // 2]], -1)
                return t * cos + rot * sin

        qh, kh = rope(qh), rope(kh)

    rep = H // Hkv
    if rep > 1:
        kh = jnp.repeat(kh, rep, axis=1)
        vh = jnp.repeat(vh, rep, axis=1)

    mb = 0.0
    if seqlens_k is not None:  # ORT convention: seqlens_k = valid len - 1
        valid = jnp.arange(S)[None, :] <= seqlens_k.reshape(B, 1)
        mb = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    out = _sdpa(qh, kh, vh, mb, unidirectional=1,
                scale=float(scale) if scale is not None else None)
    return (out.transpose(0, 2, 1, 3).reshape(B, S, D),)


@register("FusedMatMul", domain="com.microsoft")
def fused_matmul(ctx, node, ins):
    """com.microsoft.FusedMatMul: alpha * op(A) @ op(B) with trans/batch
    transpose flags (ORT's transformer optimizer emits these)."""
    a, b_ = ins
    if int(node.attr("transBatchA", 0)) or int(node.attr("transBatchB", 0)):
        raise UnsupportedOpError("FusedMatMul: transBatchA/B not supported")
    from .standard import _accum_dtype, _fp32_precision

    if int(node.attr("transA", 0)):
        a = jnp.swapaxes(a, -1, -2)
    if int(node.attr("transB", 0)):
        b_ = jnp.swapaxes(b_, -1, -2)
    out = jnp.matmul(a, b_, precision=_fp32_precision(a),
                     preferred_element_type=_accum_dtype(a))
    return ((float(node.attr("alpha", 1.0)) * out).astype(a.dtype),)
