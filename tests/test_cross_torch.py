"""Cross-validation against torch (CPU): independent numerical reference for
the hot ops, beyond the inline-numpy checks in test_ops.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from util import run_op  # noqa: E402

rng = np.random.default_rng(29)


def f32(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_conv_vs_torch_stride_pad_dilation():
    x, w, b = f32(2, 5, 17, 19), f32(7, 5, 3, 3), f32(7)
    (got,) = run_op("Conv", {"x": x}, {"w": w, "b": b},
                    strides=[2, 3], pads=[1, 2, 1, 2], dilations=[2, 1])
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=(2, 3), padding=(1, 2),
                    dilation=(2, 1)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grouped_conv_vs_torch():
    x, w = f32(1, 8, 10, 10), f32(12, 2, 3, 3)
    (got,) = run_op("Conv", {"x": x}, {"w": w}, group=4, pads=[1, 1, 1, 1])
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    padding=1, groups=4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_vs_torch():
    x, w = f32(1, 4, 6, 6), f32(4, 6, 3, 3)
    (got,) = run_op("ConvTranspose", {"x": x}, {"w": w},
                    strides=[2, 2], pads=[1, 1, 1, 1], output_padding=[1, 1])
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=2, padding=1, output_padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_maxpool_ceil_vs_torch():
    x = f32(2, 3, 11, 11)
    (got,) = run_op("MaxPool", {"x": x}, kernel_shape=[3, 3], strides=[2, 2],
                    ceil_mode=1)
    want = F.max_pool2d(torch.from_numpy(x), 3, stride=2,
                        ceil_mode=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_avgpool_vs_torch():
    x = f32(1, 4, 9, 9)
    (got,) = run_op("AveragePool", {"x": x}, kernel_shape=[3, 3],
                    strides=[2, 2], pads=[1, 1, 1, 1], count_include_pad=0)
    want = F.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                        count_include_pad=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layernorm_vs_torch():
    x, g, b = f32(3, 7, 16), f32(16), f32(16)
    (got,) = run_op("LayerNormalization", {"x": x}, {"g": g, "b": b},
                    axis=-1, epsilon=1e-5)
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g),
                        torch.from_numpy(b), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gelu_softmax_vs_torch():
    x = f32(4, 33)
    (got,) = run_op("Gelu", {"x": x}, approximate="tanh")
    want = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    (got,) = run_op("Softmax", {"x": x}, axis=-1, opset=13)
    want = F.softmax(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lrn_vs_torch():
    x = f32(1, 8, 6, 6)
    (got,) = run_op("LRN", {"x": x}, size=5, alpha=1e-3, beta=0.75, bias=1.5)
    want = F.local_response_norm(torch.from_numpy(x), 5, alpha=1e-3,
                                 beta=0.75, k=1.5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gpt2_block_vs_torch():
    """One full transformer block (fused-QKV attention + causal mask + MLP)
    against a literal torch reimplementation with identical weights."""
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models.gpt2 import (
        GPT2Config, build_gpt2)

    cfg = GPT2Config(vocab_size=64, n_positions=16, n_embd=32, n_layer=1,
                     n_head=2)
    m = build_gpt2(cfg, batch=1, seq_len=8, with_presents=False, seed=3)
    g = import_model(m)
    ids = rng.integers(0, 64, (1, 8)).astype(np.int64)
    got = Engine(g).run({"input_ids": ids})["logits"]

    C = {k: torch.from_numpy(np.asarray(v)) for k, v in g.constants.items()}
    # the position Gather is constant-folded at import (wpe may be pruned)
    pe = C["pos_emb"] if "pos_emb" in C else C["wpe"][:8]
    x = C["wte"][torch.from_numpy(ids)] + pe

    def ln(t, p):
        return F.layer_norm(t, (32,), C[f"{p}_g"], C[f"{p}_b"], eps=1e-5)

    h = ln(x, "blk0_ln1")
    qkv = h @ C["blk0_attn_qkv_w"] + C["blk0_attn_qkv_b"]
    q, k, v = qkv.split(32, dim=-1)

    def heads(t):
        return t.view(1, 8, 2, 16).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    att = (q @ k.transpose(-1, -2)) / np.sqrt(16.0)
    mask = torch.triu(torch.ones(8, 8, dtype=torch.bool), 1)
    att = att.masked_fill(mask, -1e9)
    ctx = F.softmax(att, dim=-1) @ v
    ctx = ctx.permute(0, 2, 1, 3).reshape(1, 8, 32)
    x = x + ctx @ C["blk0_attn_proj_w"] + C["blk0_attn_proj_b"]
    h = ln(x, "blk0_ln2")
    h = F.gelu(h @ C["blk0_mlp_fc_w"] + C["blk0_mlp_fc_b"], approximate="tanh")
    x = x + h @ C["blk0_mlp_proj_w"] + C["blk0_mlp_proj_b"]
    x = ln(x, "ln_f")
    want = (x @ C["wte_T"]).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_resize_bilinear_vs_torch_half_pixel():
    """Resize linear + half_pixel == torch interpolate(align_corners=False)."""
    x = f32(2, 3, 7, 9)
    scales = np.array([1.0, 1.0, 2.0, 2.0], np.float32)
    (got,) = run_op("Resize", {"x": x},
                    {"roi": np.zeros(0, np.float32), "s": scales},
                    mode="linear",
                    coordinate_transformation_mode="half_pixel")
    want = F.interpolate(torch.from_numpy(x), scale_factor=2.0,
                         mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_vs_torch_align_corners():
    x = f32(1, 2, 5, 6)
    scales = np.array([1.0, 1.0, 2.0, 2.0], np.float32)
    (got,) = run_op("Resize", {"x": x},
                    {"roi": np.zeros(0, np.float32), "s": scales},
                    mode="linear",
                    coordinate_transformation_mode="align_corners")
    want = F.interpolate(torch.from_numpy(x), scale_factor=2.0,
                         mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_nearest_vs_torch():
    """ONNX nearest (asymmetric+floor) == torch interpolate nearest."""
    x = f32(1, 3, 5, 7)
    scales = np.array([1.0, 1.0, 2.0, 3.0], np.float32)
    (got,) = run_op("Resize", {"x": x},
                    {"roi": np.zeros(0, np.float32), "s": scales},
                    mode="nearest",
                    coordinate_transformation_mode="asymmetric",
                    nearest_mode="floor")
    want = F.interpolate(torch.from_numpy(x), scale_factor=(2.0, 3.0),
                         mode="nearest").numpy()
    np.testing.assert_array_equal(got, want)
    # half_pixel + round_prefer_floor downscale (ORT default form)
    scales = np.array([1.0, 1.0, 0.6, 0.6], np.float32)
    (got,) = run_op("Resize", {"x": x},
                    {"roi": np.zeros(0, np.float32), "s": scales},
                    mode="nearest")
    assert got.shape == (1, 3, 3, 4)
    # independent spec reference: src = (i + 0.5) / SCALE - 0.5 (the scale,
    # NOT the do/di ratio — they differ when floor(di*scale) != di*scale)
    def idx(di, do):
        src = (np.arange(do) + 0.5) / 0.6 - 0.5
        return np.clip(np.ceil(src - 0.5), 0, di - 1).astype(int)
    want = x[:, :, idx(5, 3)][:, :, :, idx(7, 4)]
    np.testing.assert_array_equal(got, want)


def test_grouped_conv_transpose_vs_torch():
    x, w = f32(2, 8, 6, 6), f32(8, 3, 3, 3)  # groups=4: w [Cin, Cout/g, k, k]
    (got,) = run_op("ConvTranspose", {"x": x}, {"w": w}, group=4,
                    strides=[2, 2], pads=[1, 1, 1, 1], output_padding=[1, 1])
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=2, padding=1, output_padding=1,
                              groups=4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_maxpool_indices_and_unpool_vs_torch():
    """MaxPool's Indices output (ONNX whole-tensor flat convention) and the
    MaxUnpool scatter round-trip, validated against torch."""
    x = f32(2, 3, 9, 10)
    vals, idx = run_op("MaxPool", {"x": x}, kernel_shape=[2, 2],
                       strides=[2, 2], n_outputs=2)
    tv, ti = F.max_pool2d(torch.from_numpy(x), 2, stride=2,
                          return_indices=True)
    np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
    # torch indices are per-(N,C) plane; ONNX adds the (n*C + c)*H*W base
    N, C, H, W = x.shape
    base = (np.arange(N)[:, None, None, None] * C
            + np.arange(C)[None, :, None, None]) * (H * W)
    np.testing.assert_array_equal(idx, ti.numpy() + base)

    (rec,) = run_op("MaxUnpool", {"v": vals, "i": idx},
                    {"os": np.array([N, C, H, W], np.int64)},
                    kernel_shape=[2, 2], strides=[2, 2])
    want = F.max_unpool2d(tv, ti, 2, stride=2,
                          output_size=(H, W)).numpy()
    assert rec.shape == want.shape
    np.testing.assert_allclose(rec, want, rtol=1e-6)


def test_maxpool_indices_with_padding_and_dilation():
    x = f32(1, 2, 7, 7)
    vals, idx = run_op("MaxPool", {"x": x}, kernel_shape=[3, 3],
                       strides=[2, 2], pads=[1, 1, 1, 1], n_outputs=2)
    tv, ti = F.max_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                          return_indices=True)
    np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
    base = (np.arange(1)[:, None, None, None] * 2
            + np.arange(2)[None, :, None, None]) * 49
    np.testing.assert_array_equal(idx, ti.numpy() + base)
    # dilated windows exercise the off_h/off_w * dilation factors
    vals, idx = run_op("MaxPool", {"x": x}, kernel_shape=[3, 3],
                       strides=[1, 1], dilations=[2, 2], n_outputs=2)
    tv, ti = F.max_pool2d(torch.from_numpy(x), 3, stride=1, dilation=2,
                          return_indices=True)
    np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, ti.numpy() + base)
