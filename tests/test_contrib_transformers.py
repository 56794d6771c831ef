"""ORT transformer contrib ops vs torch references."""

import numpy as np
import pytest

from util import run_op

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

rng = np.random.default_rng(103)


def f32(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_bias_gelu_fast_gelu():
    x, b = f32(3, 8), f32(8)
    (got,) = run_op("BiasGelu", {"x": x}, {"b": b})
    want = F.gelu(torch.from_numpy(x + b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    (got,) = run_op("FastGelu", {"x": x}, {"b": b})
    want = F.gelu(torch.from_numpy(x + b), approximate="tanh").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_skip_layer_normalization():
    x, skip, g, be, bias = f32(2, 5, 16), f32(2, 5, 16), f32(16), f32(16), \
        f32(16)
    (got,) = run_op("SkipLayerNormalization", {"x": x, "skip": skip},
                    {"g": g, "be": be, "bias": bias}, epsilon=1e-12)
    h = torch.from_numpy(x + skip + bias)
    want = F.layer_norm(h, (16,), torch.from_numpy(g),
                        torch.from_numpy(be), 1e-12).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_embed_layer_normalization():
    V, P, D, B, S = 50, 20, 12, 2, 7
    ids = rng.integers(0, V, (B, S)).astype(np.int32)
    seg = rng.integers(0, 2, (B, S)).astype(np.int32)
    we, pe, se = f32(V, D), f32(P, D), f32(2, D)
    g, be = f32(D), f32(D)
    mask = np.concatenate([np.ones((B, S - 2)), np.zeros((B, 2))],
                          axis=1).astype(np.int32)
    got, mask_idx = run_op(
        "EmbedLayerNormalization", {"ids": ids, "seg": seg},
        {"we": we, "pe": pe, "se": se, "g": g, "be": be, "mask": mask},
        epsilon=1e-12, n_outputs=2)
    e = we[ids] + pe[np.arange(S)][None] + se[seg]
    want = F.layer_norm(torch.from_numpy(e), (D,), torch.from_numpy(g),
                        torch.from_numpy(be), 1e-12).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(mask_idx, np.full((B,), S - 2))


def _sdpa_torch(q, k, v, H, mask_bool=None, causal=False):
    B, S, D = q.shape
    hd = D // H
    qh = torch.from_numpy(q).view(B, S, H, hd).transpose(1, 2)
    kh = torch.from_numpy(k).view(B, k.shape[1], H, hd).transpose(1, 2)
    vh = torch.from_numpy(v).view(B, v.shape[1], H, hd).transpose(1, 2)
    attn_mask = None
    if mask_bool is not None:
        attn_mask = torch.from_numpy(mask_bool)[:, None, None, :]
    out = F.scaled_dot_product_attention(qh, kh, vh, attn_mask=attn_mask,
                                         is_causal=causal)
    return out.transpose(1, 2).reshape(B, S, D).numpy()


def test_attention_packed_qkv():
    B, S, D, H = 2, 6, 24, 4
    x = f32(B, S, D)
    w = f32(D, 3 * D) * 0.2
    b = f32(3 * D) * 0.1
    lens = np.array([6, 4], np.int32)
    (got,) = run_op("Attention", {"x": x}, {"w": w, "b": b, "m": lens},
                    num_heads=H)
    qkv = x @ w + b
    q, k, v = np.split(qkv, 3, axis=-1)
    mask = np.arange(S)[None, :] < lens[:, None]
    want = _sdpa_torch(q, k, v, H, mask_bool=mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_unidirectional():
    B, S, D, H = 1, 5, 16, 2
    x = f32(B, S, D)
    w = f32(D, 3 * D) * 0.2
    (got,) = run_op("Attention", {"x": x}, {"w": w}, num_heads=H,
                    unidirectional=1)
    qkv = x @ w
    q, k, v = np.split(qkv, 3, axis=-1)
    want = _sdpa_torch(q, k, v, H, causal=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multi_head_attention():
    B, Sq, Skv, D, H = 2, 4, 7, 24, 3
    q, k, v = f32(B, Sq, D), f32(B, Skv, D), f32(B, Skv, D)
    lens = np.array([7, 5], np.int32)
    (got,) = run_op("MultiHeadAttention", {"q": q, "k": k, "v": v},
                    {"bias": np.zeros(3 * D, np.float32), "kpm": lens},
                    num_heads=H)
    mask = np.arange(Skv)[None, :] < lens[:, None]
    hd = D // H
    qh = torch.from_numpy(q).view(B, Sq, H, hd).transpose(1, 2)
    kh = torch.from_numpy(k).view(B, Skv, H, hd).transpose(1, 2)
    vh = torch.from_numpy(v).view(B, Skv, H, hd).transpose(1, 2)
    am = torch.from_numpy(mask)[:, None, None, :]
    want = F.scaled_dot_product_attention(qh, kh, vh, attn_mask=am)
    want = want.transpose(1, 2).reshape(B, Sq, D).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rotary_embedding_matches_llama_convention():
    """RotaryEmbedding (non-interleaved) == the llama rotate-half formula."""
    B, H, S, hd = 2, 3, 5, 8
    x = f32(B, H, S, hd)
    max_pos = 16
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(max_pos)[:, None] * inv[None, :]
    cos_c = np.cos(t).astype(np.float32)  # [max_pos, hd/2]
    sin_c = np.sin(t).astype(np.float32)
    pos = np.tile(np.arange(S, dtype=np.int64)[None], (B, 1))

    (got,) = run_op("RotaryEmbedding", {"x": x},
                    {"pos": pos, "cos": cos_c, "sin": sin_c})
    # reference: rotate-half with duplicated-frequency tables
    emb = np.concatenate([t, t], -1)[:S]  # [S, hd]
    cs, sn = np.cos(emb), np.sin(emb)
    rot = np.concatenate([-x[..., hd // 2:], x[..., : hd // 2]], -1)
    want = x * cs + rot * sn
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rotary_embedding_3d_interleaved():
    B, S, D, H = 1, 4, 12, 2
    x = f32(B, S, D)
    hd = D // H
    max_pos = 8
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(max_pos)[:, None] * inv[None, :]
    cos_c = np.cos(t).astype(np.float32)
    sin_c = np.sin(t).astype(np.float32)
    pos = np.arange(S, dtype=np.int64)[None]

    (got,) = run_op("RotaryEmbedding", {"x": x},
                    {"pos": pos, "cos": cos_c, "sin": sin_c},
                    interleaved=1, num_heads=H)
    xh = x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    cs, sn = np.cos(t[:S]), np.sin(t[:S])
    x1, x2 = xh[..., 0::2], xh[..., 1::2]
    r1 = x1 * cs - x2 * sn
    r2 = x2 * cs + x1 * sn
    want = np.stack([r1, r2], -1).reshape(xh.shape)
    want = want.transpose(0, 2, 1, 3).reshape(B, S, D)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_group_query_attention():
    """GQA + fused rotary + causal + per-batch key lengths vs a torch
    reference built from repeat_interleave + sdpa."""
    B, S, D, H, Hkv = 2, 6, 24, 4, 2
    hd = D // H
    q, k, v = f32(B, S, D), f32(B, S, Hkv * hd), f32(B, S, Hkv * hd)
    max_pos = 16
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(max_pos)[:, None] * inv[None, :]
    cos_c = np.cos(t).astype(np.float32)
    sin_c = np.sin(t).astype(np.float32)
    seqlens_k = np.array([S - 1, 3], np.int32)  # valid len - 1

    from util import make_model, node as mknode
    from onnx_rusty_inference_engine_tpu import onnx_io
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model

    n = mknode("GroupQueryAttention",
               ["q", "k", "v", "", "", "sl", "", "cos", "sin"], ["out0"],
               num_heads=H, kv_num_heads=Hkv)
    m = make_model([n], {"q": q, "k": k, "v": v}, ["out0"],
                   {"sl": seqlens_k, "cos": cos_c, "sin": sin_c})
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    got = Engine(import_model(m2)).run({"q": q, "k": k, "v": v})["out0"]

    # torch reference
    emb = np.concatenate([t, t], -1)[:S]
    cs, sn = np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)

    def rope(x):  # [B, h, S, hd]
        rot = np.concatenate([-x[..., hd // 2:], x[..., : hd // 2]], -1)
        return x * cs + rot * sn

    qh = rope(q.reshape(B, S, H, hd).transpose(0, 2, 1, 3))
    kh = rope(k.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3))
    vh = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    kh = np.repeat(kh, H // Hkv, axis=1)
    vh = np.repeat(vh, H // Hkv, axis=1)
    causal = np.tril(np.ones((S, S), bool))
    key_ok = (np.arange(S)[None, :] <= seqlens_k[:, None])[:, None, None, :]
    att = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    att = np.where(causal[None, None] & key_ok, att, -1e9)
    probs = torch.softmax(torch.from_numpy(att), -1).numpy()
    want = (probs @ vh).transpose(0, 2, 1, 3).reshape(B, S, D)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rotary_embedding_scalar_position_offset():
    """ORT shape-(B,1) position_ids = per-sequence starting OFFSET: token s
    rotates at offset+s, not all tokens at the offset."""
    B, H, S, hd = 1, 2, 4, 8
    x = f32(B, H, S, hd)
    max_pos = 16
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd))
    t = np.arange(max_pos)[:, None] * inv[None, :]
    cos_c, sin_c = np.cos(t).astype(np.float32), np.sin(t).astype(np.float32)
    off = 3
    (got,) = run_op("RotaryEmbedding", {"x": x},
                    {"pos": np.array([[off]], np.int64),
                     "cos": cos_c, "sin": sin_c})
    (want,) = run_op("RotaryEmbedding", {"x": x},
                     {"pos": np.arange(off, off + S, dtype=np.int64)[None],
                      "cos": cos_c, "sin": sin_c})
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rotary_embedding_infers_num_heads():
    """3-D input without num_heads: heads derived from the rotary cache."""
    B, S, H, hd = 1, 3, 4, 8
    x = f32(B, S, H * hd)
    t = np.arange(8)[:, None] * (1.0 / (10000.0 ** (np.arange(0, hd, 2) / hd)))
    cos_c, sin_c = np.cos(t).astype(np.float32), np.sin(t).astype(np.float32)
    (got,) = run_op("RotaryEmbedding", {"x": x},
                    {"pos": np.arange(S, dtype=np.int64)[None],
                     "cos": cos_c, "sin": sin_c})
    (want,) = run_op("RotaryEmbedding", {"x": x},
                     {"pos": np.arange(S, dtype=np.int64)[None],
                      "cos": cos_c, "sin": sin_c}, num_heads=H)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # every head must actually be rotated (H=1 would leave channels 64+ alone)
    assert not np.allclose(got[..., hd:], x[..., hd:])


def test_gqa_scale_zero_means_default():
    B, S, D, H = 1, 4, 16, 2
    q, k, v = f32(B, S, D), f32(B, S, D), f32(B, S, D)
    from util import make_model, node as mknode
    from onnx_rusty_inference_engine_tpu import onnx_io
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model

    def run_gqa(**attrs):
        n = mknode("GroupQueryAttention",
                   ["q", "k", "v", "", "", "", "", "", ""], ["out0"],
                   num_heads=H, kv_num_heads=H, **attrs)
        m = make_model([n], {"q": q, "k": k, "v": v}, ["out0"])
        m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
        return Engine(import_model(m2)).run({"q": q, "k": k, "v": v})["out0"]

    np.testing.assert_allclose(run_gqa(scale=0.0), run_gqa(), rtol=1e-6)


def test_fused_matmul():
    a = f32(3, 4)
    bm = f32(5, 4)
    (got,) = run_op("FusedMatMul", {"a": a, "b": bm}, transB=1, alpha=0.5)
    np.testing.assert_allclose(got, 0.5 * (a @ bm.T), rtol=1e-5, atol=1e-6)
    a3 = f32(2, 4, 3)
    b3 = f32(2, 4, 5)
    (got,) = run_op("FusedMatMul", {"a": a3, "b": b3}, transA=1)
    np.testing.assert_allclose(got, np.swapaxes(a3, -1, -2) @ b3, rtol=1e-5,
                               atol=1e-6)
