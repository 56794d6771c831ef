"""Core-domain (ai.onnx) Attention and RotaryEmbedding — opset 23.

These are SPEC ops, distinct from the com.microsoft fused forms in
contrib_transformers.py: the core Attention takes separate Q/K/V (3-D or
pre-split 4-D), supports grouped-query head counts (q_num_heads a multiple
of kv_num_heads), optional past_key/past_value KV concatenation with
present_* outputs, boolean or additive float attn_mask, tanh softcap, and
the staged qk_matmul_output debug output. Core RotaryEmbedding puts the
caches at inputs 1/2 with position_ids OPTIONAL at input 3 (the contrib op
requires position_ids at input 1).

Bare nodes (exporters often omit the domain) are disambiguated
structurally: contrib Attention requires the `num_heads` attribute and
packs QKV into one weight; contrib RotaryEmbedding has integer
position_ids at input 1 where the core op has a float cos cache.

Reference parity note: the reference supports neither domain's form — it
panics on all but 10 ops (/root/reference/src/inference_engine/
model_inference.rs:158-160). Semantics follow the ONNX opset-23 spec and
its reference pseudocode (torch SDPA-style masking, upper-left-aligned
causal tril).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register
from .contrib_transformers import _rope_rotate

# large-negative instead of -inf: keeps softmax NaN-free for rows that are
# fully masked (the spec's reference produces NaN there; every partially
# masked row agrees to float tolerance)
_NEG = -1e9


@register("Attention")
def attention_core(ctx: LoweringContext, node: Node, ins):
    """ai.onnx Attention (opset 23): scaled dot-product attention over
    separate Q/K/V with GQA, past/present KV, mask, softcap."""
    if node.attr("num_heads") is not None:
        # bare ORT contrib node (packed x/weights form, num_heads attr is
        # required there and absent from the core spec)
        from .contrib_transformers import attention as ms_attention

        return ms_attention(ctx, node, ins)

    q, k, v = ins[0], ins[1], ins[2]
    attn_mask = ins[3] if len(ins) > 3 else None
    past_k = ins[4] if len(ins) > 4 else None
    past_v = ins[5] if len(ins) > 5 else None
    is_causal = int(node.attr("is_causal", 0))
    mode = int(node.attr("qk_matmul_output_mode", 0))
    softcap = float(node.attr("softcap", 0.0))
    scale = node.attr("scale")

    three_d = q.ndim == 3
    if three_d:
        Hq = int(node.attr("q_num_heads", 0))
        Hkv = int(node.attr("kv_num_heads", 0))
        if not Hq or not Hkv:
            raise UnsupportedOpError(
                "Attention: q_num_heads/kv_num_heads attributes are "
                "required for 3-D inputs")
        B = q.shape[0]

        def heads(t, H):
            return t.reshape(t.shape[0], t.shape[1], H,
                             t.shape[2] // H).transpose(0, 2, 1, 3)

        q, k, v = heads(q, Hq), heads(k, Hkv), heads(v, Hkv)
    else:
        B, Hq = q.shape[0], q.shape[1]
        Hkv = k.shape[1]

    if past_k is not None:
        k = jnp.concatenate([past_k, k], axis=2)
    if past_v is not None:
        v = jnp.concatenate([past_v, v], axis=2)
    present_k, present_v = k, v

    if Hq % Hkv:
        raise UnsupportedOpError(
            f"Attention: q_num_heads {Hq} not a multiple of kv_num_heads "
            f"{Hkv}")
    rep = Hq // Hkv
    if rep > 1:  # GQA: each kv head serves a contiguous group of q heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    L, S, hd = q.shape[2], k.shape[2], q.shape[-1]
    s = float(scale) if scale is not None else 1.0 / float(np.sqrt(hd))
    qk = jnp.einsum("bhld,bhsd->bhls", q, k) * jnp.asarray(s, q.dtype)
    staged = {0: qk}

    bias = jnp.zeros((L, S), qk.dtype)
    if is_causal:
        # upper-left-aligned tril (diagonal 0), per the spec pseudocode
        bias = jnp.where(jnp.tril(jnp.ones((L, S), bool)), bias, _NEG)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            bias = bias + jnp.where(attn_mask, 0.0, _NEG).astype(qk.dtype)
        else:
            bias = bias + attn_mask
    qk = qk + bias
    staged[1] = qk
    if softcap > 0.0:
        qk = softcap * jnp.tanh(qk / softcap)
    staged[2] = qk
    probs = jax.nn.softmax(qk, axis=-1)
    staged[3] = probs

    y = jnp.einsum("bhls,bhsd->bhld", probs, v)
    if three_d:
        y = y.transpose(0, 2, 1, 3).reshape(B, L, -1)
    # outputs are slot-aligned: [Y, present_key, present_value, qk_output]
    return (y, present_k, present_v, staged[mode])[: len(node.outputs)]


@register("RotaryEmbedding")
def rotary_embedding_core(ctx: LoweringContext, node: Node, ins):
    """ai.onnx RotaryEmbedding (opset 23): X [B,S,hidden] or [B,H,S,hd],
    cos/sin caches at inputs 1/2 ([max_pos, r/2] with position_ids at
    input 3, else per-position [B, S, r/2])."""
    if len(ins) > 1 and ins[1] is not None \
            and jnp.issubdtype(ins[1].dtype, jnp.integer):
        # bare ORT contrib node: position_ids (integer) sits at input 1
        from .contrib_transformers import rotary_embedding as ms_rope

        return ms_rope(ctx, node, ins)

    x, cos_cache, sin_cache = ins[0], ins[1], ins[2]
    pos_ids = ins[3] if len(ins) > 3 else None
    interleaved = int(node.attr("interleaved", 0))
    rot_dim = int(node.attr("rotary_embedding_dim", 0))

    orig3d = x.ndim == 3
    if orig3d:
        H = int(node.attr("num_heads", 0))
        if not H:
            raise UnsupportedOpError(
                "RotaryEmbedding: num_heads attribute is required for 3-D "
                "input")
        B, S, D = x.shape
        xh = x.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)
    else:
        xh = x
        B, _, S, _ = x.shape
    hd = xh.shape[-1]
    rot = rot_dim or hd
    half = rot // 2

    if pos_ids is not None:
        pid = pos_ids.astype(jnp.int32)
        if pid.ndim == 1:  # [S] broadcast over the batch
            pid = pid[None]
        cos = cos_cache[pid]  # [B|1, S, half]
        sin = sin_cache[pid]
    else:
        cos, sin = cos_cache, sin_cache  # [B, S, half] per spec
    cos = cos[..., :half][:, None]  # [B|1, 1, S, half]
    sin = sin[..., :half][:, None]

    out = _rope_rotate(xh, cos, sin, rot, interleaved)
    if orig3d:
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
    return (out,)
