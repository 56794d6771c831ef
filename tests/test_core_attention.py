"""Core-domain (ai.onnx, opset 23) Attention / RotaryEmbedding and
AffineGrid (opset 20) — the ops the round-4 verdict found missing from the
"complete core opset" claim. Semantics cross-checked against independent
numpy references and torch (SDPA / affine_grid), and the bare-node
disambiguation vs the com.microsoft contrib forms is pinned.

Reference parity note: the reference engine panics on all of these
(/root/reference/src/inference_engine/model_inference.rs:158-160)."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu import onnx_io
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model

from util import make_model, node

rng = np.random.default_rng(23)


def f32(*shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def run_node(op_type, named_inputs, n_outputs=1, opset=23, **attrs):
    """Single-op run allowing omitted optional inputs (None -> empty slot,
    trailing Nones trimmed)."""
    names, feeds = [], {}
    for k, v in named_inputs.items():
        if v is None:
            names.append("")
        else:
            names.append(k)
            feeds[k] = v
    while names and not names[-1]:
        names.pop()
    out_names = [f"out{i}" for i in range(n_outputs)]
    n = node(op_type, names, out_names, **attrs)
    m = make_model([n], feeds, out_names, opset=opset)
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    res = Engine(import_model(m2)).run(feeds)
    return [np.asarray(res.outputs[o]) for o in out_names]


# ---------------------------------------------------------------------------
# numpy reference for core Attention (independent re-derivation of the
# opset-23 spec pseudocode)
# ---------------------------------------------------------------------------
def ref_attention(q, k, v, attn_mask=None, past_k=None, past_v=None, *,
                  is_causal=0, scale=None, softcap=0.0, mode=0,
                  q_heads=None, kv_heads=None):
    three_d = q.ndim == 3
    if three_d:
        B, L, _ = q.shape

        def heads(t, H):
            return t.reshape(t.shape[0], t.shape[1], H, -1).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q, q_heads), heads(k, kv_heads), heads(v, kv_heads)
    if past_k is not None:
        k = np.concatenate([past_k, k], axis=2)
    if past_v is not None:
        v = np.concatenate([past_v, v], axis=2)
    pk, pv = k, v
    rep = q.shape[1] // k.shape[1]
    if rep > 1:
        k = np.repeat(k, rep, axis=1)
        v = np.repeat(v, rep, axis=1)
    L, S, hd = q.shape[2], k.shape[2], q.shape[-1]
    s = scale if scale is not None else 1.0 / np.sqrt(hd)
    qk = np.einsum("bhld,bhsd->bhls", q, k) * s
    staged = {0: qk}
    bias = np.zeros((L, S), np.float32)
    if is_causal:
        bias = np.where(np.tril(np.ones((L, S), bool)), bias, -1e9)
    if attn_mask is not None:
        if attn_mask.dtype == np.bool_:
            bias = bias + np.where(attn_mask, 0.0, -1e9).astype(np.float32)
        else:
            bias = bias + attn_mask
    qk = qk + bias
    staged[1] = qk
    if softcap > 0:
        qk = softcap * np.tanh(qk / softcap)
    staged[2] = qk
    e = np.exp(qk - qk.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    staged[3] = probs
    y = np.einsum("bhls,bhsd->bhld", probs, v)
    if three_d:
        y = y.transpose(0, 2, 1, 3).reshape(y.shape[0], L, -1)
    return y, pk, pv, staged[mode]


def test_attention_4d_matches_torch_sdpa():
    B, H, L, hd = 2, 4, 6, 8
    q, k, v = f32(B, H, L, hd), f32(B, H, L, hd), f32(B, H, L, hd)
    (got,) = run_node("Attention", {"q": q, "k": k, "v": v})
    import torch

    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5)


def test_attention_causal_upper_left_alignment():
    """is_causal with S > L (past KV present) must use the spec's
    upper-left tril (diagonal 0), not the bottom-right decode alignment."""
    B, H, L, hd, P = 1, 2, 3, 4, 5
    q = f32(B, H, L, hd)
    k, v = f32(B, H, L, hd), f32(B, H, L, hd)
    pk, pv = f32(B, H, P, hd), f32(B, H, P, hd)
    got = run_node("Attention",
                   {"q": q, "k": k, "v": v, "m": None, "pk": pk, "pv": pv},
                   n_outputs=3, is_causal=1)
    want = ref_attention(q, k, v, past_k=pk, past_v=pv, is_causal=1)
    for g, w in zip(got, want[:3]):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5)
    # upper-left alignment: q row 0 attends ONLY key 0, which is the first
    # PAST key => output row 0 == past_value[..., 0, :]
    np.testing.assert_allclose(got[0][:, :, 0], pv[:, :, 0],
                               rtol=2e-5, atol=2e-5)


def test_attention_gqa_3d_with_head_attrs():
    B, L, Hq, Hkv, hd = 2, 5, 8, 2, 4
    q = f32(B, L, Hq * hd)
    k, v = f32(B, L, Hkv * hd), f32(B, L, Hkv * hd)
    (got,) = run_node("Attention", {"q": q, "k": k, "v": v},
                      q_num_heads=Hq, kv_num_heads=Hkv)
    want, *_ = ref_attention(q, k, v, q_heads=Hq, kv_heads=Hkv)
    assert got.shape == (B, L, Hq * hd)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # torch cross-check via enable_gqa on the 4-D equivalent
    import torch

    tq = torch.from_numpy(q.reshape(B, L, Hq, hd).transpose(0, 2, 1, 3))
    tk = torch.from_numpy(k.reshape(B, L, Hkv, hd).transpose(0, 2, 1, 3))
    tv = torch.from_numpy(v.reshape(B, L, Hkv, hd).transpose(0, 2, 1, 3))
    tw = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, enable_gqa=True)
    np.testing.assert_allclose(
        got, tw.numpy().transpose(0, 2, 1, 3).reshape(B, L, -1),
        rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bool_mask", [True, False])
def test_attention_mask_variants(bool_mask):
    B, H, L, hd = 2, 3, 4, 8
    q, k, v = f32(B, H, L, hd), f32(B, H, L, hd), f32(B, H, L, hd)
    if bool_mask:
        mask = rng.random((B, 1, L, L)) > 0.3  # keep >=1 True per row below
        mask[..., 0] = True
    else:
        mask = (rng.standard_normal((L, L)) * 0.5).astype(np.float32)
    (got,) = run_node("Attention", {"q": q, "k": k, "v": v, "m": mask})
    want, *_ = ref_attention(q, k, v, attn_mask=mask)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_attention_softcap_and_scale():
    B, H, L, hd = 1, 2, 5, 4
    q, k, v = f32(B, H, L, hd, scale=3), f32(B, H, L, hd, scale=3), \
        f32(B, H, L, hd)
    (got,) = run_node("Attention", {"q": q, "k": k, "v": v},
                      softcap=5.0, scale=0.25)
    want, *_ = ref_attention(q, k, v, softcap=5.0, scale=0.25)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_attention_qk_matmul_output_modes(mode):
    B, H, L, hd = 1, 2, 4, 4
    q, k, v = f32(B, H, L, hd), f32(B, H, L, hd), f32(B, H, L, hd)
    mask = (rng.standard_normal((L, L)) * 0.5).astype(np.float32)
    got = run_node("Attention", {"q": q, "k": k, "v": v, "m": mask},
                   n_outputs=4, softcap=2.0, qk_matmul_output_mode=mode)
    want = ref_attention(q, k, v, attn_mask=mask, softcap=2.0, mode=mode)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[3], want[3], rtol=2e-5, atol=2e-5)


def test_attention_present_kv_roundtrip_decode():
    """Chained decode: step t's present_* feeds step t+1's past_* — the
    incremental path equals one full-sequence causal pass."""
    B, H, T, hd = 1, 2, 6, 4
    q_all = f32(B, H, T, hd)
    k_all, v_all = f32(B, H, T, hd), f32(B, H, T, hd)
    (full,) = run_node("Attention",
                       {"q": q_all, "k": k_all, "v": v_all}, is_causal=1)
    pk = pv = None
    outs = []
    for t in range(T):
        sl = slice(t, t + 1)
        res = run_node(
            "Attention",
            {"q": q_all[:, :, sl], "k": k_all[:, :, sl],
             "v": v_all[:, :, sl], "m": None, "pk": pk, "pv": pv},
            n_outputs=3)
        outs.append(res[0])
        pk, pv = res[1], res[2]
    np.testing.assert_allclose(np.concatenate(outs, axis=2), full,
                               rtol=2e-5, atol=2e-5)


def test_bare_contrib_attention_still_dispatches():
    """A bare (no-domain) node with the contrib signature (num_heads attr,
    packed QKV weight) must still route to the com.microsoft lowering."""
    B, S, D, H = 2, 4, 8, 2
    x, w = f32(B, S, D), f32(D, 3 * D, scale=0.3)
    (got,) = run_node("Attention", {"x": x, "w": w}, num_heads=H)
    q, k, v = np.split(x @ w, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)

    want, *_ = ref_attention(heads(q), heads(k), heads(v))
    want = want.transpose(0, 2, 1, 3).reshape(B, S, D)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# RotaryEmbedding (core layout: caches at inputs 1/2)
# ---------------------------------------------------------------------------
def _caches(max_pos, half, *, theta=10000.0):
    inv = 1.0 / theta ** (np.arange(half) / half)
    ang = np.arange(max_pos)[:, None] * inv[None]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def ref_rope(x, cos, sin, *, interleaved=0, rot=None, num_heads=None):
    """x [B,H,S,hd] or [B,S,D]; cos/sin [B|1,S,half] already gathered."""
    three_d = x.ndim == 3
    if three_d:
        B, S, D = x.shape
        xh = x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)
    else:
        xh = x
    hd = xh.shape[-1]
    r = rot or hd
    c = cos[..., : r // 2][:, None]
    s = sin[..., : r // 2][:, None]
    xr, xp = xh[..., :r], xh[..., r:]
    if interleaved:
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        rotated = np.stack([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).reshape(xr.shape)
    else:
        x1, x2 = xr[..., : r // 2], xr[..., r // 2:]
        rotated = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    out = np.concatenate([rotated, xp], axis=-1)
    if three_d:
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
    return out


@pytest.mark.parametrize("interleaved", [0, 1])
def test_rope_core_4d_with_position_ids(interleaved):
    B, H, S, hd = 2, 3, 5, 8
    x = f32(B, H, S, hd)
    cos_c, sin_c = _caches(16, hd // 2)
    pos = rng.integers(0, 16, (B, S)).astype(np.int64)
    (got,) = run_node("RotaryEmbedding",
                      {"x": x, "cos": cos_c, "sin": sin_c, "pos": pos},
                      interleaved=interleaved)
    want = ref_rope(x, cos_c[pos], sin_c[pos], interleaved=interleaved)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rope_core_3d_without_position_ids():
    B, S, H, hd = 2, 4, 2, 6
    x = f32(B, S, H * hd)
    cos_c, sin_c = _caches(S, hd // 2)
    cos_b = np.broadcast_to(cos_c, (B, S, hd // 2)).copy()
    sin_b = np.broadcast_to(sin_c, (B, S, hd // 2)).copy()
    (got,) = run_node("RotaryEmbedding",
                      {"x": x, "cos": cos_b, "sin": sin_b},
                      num_heads=H)
    want = ref_rope(x, cos_b, sin_b, num_heads=H)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_rope_core_partial_rotary_dim():
    B, H, S, hd, rot = 1, 2, 4, 8, 4
    x = f32(B, H, S, hd)
    cos_c, sin_c = _caches(8, rot // 2)
    pos = np.arange(S, dtype=np.int64)[None]
    (got,) = run_node("RotaryEmbedding",
                      {"x": x, "cos": cos_c, "sin": sin_c, "pos": pos},
                      rotary_embedding_dim=rot)
    want = ref_rope(x, cos_c[pos], sin_c[pos], rot=rot)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # pass-through dims untouched
    np.testing.assert_array_equal(got[..., rot:], x[..., rot:])


def test_bare_contrib_rope_still_dispatches():
    """Bare node with the contrib layout (integer position_ids at input 1)
    routes to the com.microsoft lowering and matches the core op's math."""
    B, S, H, hd = 1, 4, 2, 8
    x = f32(B, S, H * hd)
    cos_c, sin_c = _caches(8, hd // 2)
    pos = np.arange(S, dtype=np.int64)[None]
    (got,) = run_node("RotaryEmbedding",
                      {"x": x, "pos": pos, "cos": cos_c, "sin": sin_c})
    want = ref_rope(x, cos_c[pos], sin_c[pos], num_heads=H)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# AffineGrid (opset 20)
# ---------------------------------------------------------------------------
def _affine(theta, size, align):
    n = node("AffineGrid", ["theta", "size"], ["g"], align_corners=align)
    m = make_model([n], {"theta": theta}, ["g"],
                   initializers={"size": size}, opset=20)
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    return np.asarray(Engine(import_model(m2)).run({"theta": theta})
                      .outputs["g"])


@pytest.mark.parametrize("align", [0, 1])
def test_affine_grid_2d(align):
    import torch

    N, C, Hh, W = 2, 3, 5, 7
    theta = f32(N, 2, 3)
    size = np.array([N, C, Hh, W], np.int64)
    got = _affine(theta, size, align)
    want = torch.nn.functional.affine_grid(
        torch.from_numpy(theta), [N, C, Hh, W], align_corners=bool(align))
    assert got.shape == (N, Hh, W, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align", [0, 1])
def test_affine_grid_3d(align):
    import torch

    N, C, D, Hh, W = 1, 2, 3, 4, 5
    theta = f32(N, 3, 4)
    size = np.array([N, C, D, Hh, W], np.int64)
    got = _affine(theta, size, align)
    want = torch.nn.functional.affine_grid(
        torch.from_numpy(theta), [N, C, D, Hh, W], align_corners=bool(align))
    assert got.shape == (N, D, Hh, W, 3)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_affine_grid_feeds_grid_sample():
    """The natural pairing: AffineGrid -> GridSample (identity transform
    reproduces the input)."""
    N, C, Hh, W = 1, 2, 6, 6
    theta = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (N, 1, 1))
    size = np.array([N, C, Hh, W], np.int64)
    x = f32(N, C, Hh, W)
    nodes = [
        node("AffineGrid", ["theta", "size"], ["g"], align_corners=1),
        node("GridSample", ["x", "g"], ["y"], align_corners=1,
             mode="bilinear"),
    ]
    m = make_model(nodes, {"theta": theta, "x": x}, ["y"],
                   initializers={"size": size}, opset=20)
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    y = np.asarray(Engine(import_model(m2)).run(
        {"theta": theta, "x": x}).outputs["y"])
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-5)
