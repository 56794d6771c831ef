"""Conformance cases for the long-tail ops in ops/extra.py (trig, Lp,
spectral, random, geometry) — same single-node harness as
test_conformance.py."""

import numpy as np
import pytest

from util import run_op

rng = np.random.default_rng(21)


def f32(*shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("op,fn,gen", [
    ("Tan", np.tan, lambda *s: f32(*s) * 0.5),
    ("Asin", np.arcsin, lambda *s: rng.uniform(-0.99, 0.99, s).astype(np.float32)),
    ("Acos", np.arccos, lambda *s: rng.uniform(-0.99, 0.99, s).astype(np.float32)),
    ("Atan", np.arctan, f32),
    ("Sinh", np.sinh, f32),
    ("Cosh", np.cosh, f32),
    ("Asinh", np.arcsinh, f32),
    ("Acosh", np.arccosh, lambda *s: rng.uniform(1.1, 5.0, s).astype(np.float32)),
    ("Atanh", np.arctanh, lambda *s: rng.uniform(-0.9, 0.9, s).astype(np.float32)),
])
def test_trig_tail(op, fn, gen):
    x = gen(3, 4)
    (out,) = run_op(op, {"x": x})
    np.testing.assert_allclose(out, fn(x), rtol=1e-5, atol=1e-6)


def test_bitwise_not_xor():
    a = rng.integers(-100, 100, (3, 4)).astype(np.int32)
    b = rng.integers(-100, 100, (3, 4)).astype(np.int32)
    (out,) = run_op("BitwiseNot", {"x": a}, opset=18)
    np.testing.assert_array_equal(out, ~a)
    (out,) = run_op("BitwiseXor", {"a": a, "b": b}, opset=18)
    np.testing.assert_array_equal(out, a ^ b)


def test_det():
    x = f32(4, 3, 3)
    (out,) = run_op("Det", {"x": x})
    np.testing.assert_allclose(out, np.linalg.det(x), rtol=1e-4, atol=1e-4)


def test_reduce_log_sum():
    x = np.abs(f32(3, 4, 5)) + 0.1
    (out,) = run_op("ReduceLogSum", {"x": x},
                    initializers={"axes": np.array([1], np.int64)}, opset=18)
    np.testing.assert_allclose(out, np.log(x.sum(axis=1, keepdims=True)),
                               rtol=1e-5)


def test_lp_normalization():
    x = f32(4, 6)
    (out,) = run_op("LpNormalization", {"x": x}, axis=1, p=2)
    ref = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5)
    (out1,) = run_op("LpNormalization", {"x": x}, axis=0, p=1)
    np.testing.assert_allclose(out1, x / np.abs(x).sum(axis=0), rtol=1e-5)


def test_global_lp_pool():
    x = f32(2, 3, 4, 5)
    (out,) = run_op("GlobalLpPool", {"x": x}, p=2)
    ref = np.sqrt((x * x).sum(axis=(2, 3), keepdims=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_lp_pool():
    import torch
    import torch.nn.functional as F

    x = f32(2, 3, 8, 8)
    (out,) = run_op("LpPool", {"x": x}, kernel_shape=[2, 2],
                    strides=[2, 2], p=2)
    ref = F.lp_pool2d(torch.from_numpy(x), 2, 2, 2).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_center_crop_pad():
    x = f32(3, 10, 8)
    (out,) = run_op("CenterCropPad", {"x": x},
                    initializers={"shape": np.array([3, 6, 12], np.int64)},
                    opset=18)
    assert out.shape == (3, 6, 12)
    np.testing.assert_allclose(out[:, :, 2:10], x[:, 2:8, :], rtol=1e-6)
    assert np.all(out[:, :, :2] == 0) and np.all(out[:, :, 10:] == 0)


def test_col2im_matches_torch_fold():
    import torch
    import torch.nn.functional as F

    C, kh, kw = 2, 2, 3
    H, W = 6, 7
    stride, pad = (2, 1), (1, 0)
    t = torch.randn(1, C * kh * kw, 20)  # 4 x 5 sliding blocks
    ref = F.fold(t, output_size=(H, W), kernel_size=(kh, kw),
                 stride=stride, padding=pad).numpy()
    (out,) = run_op(
        "Col2Im", {"x": t.numpy().astype(np.float32)},
        initializers={"image_shape": np.array([H, W], np.int64),
                      "block_shape": np.array([kh, kw], np.int64)},
        strides=list(stride), pads=[pad[0], pad[1], pad[0], pad[1]],
        opset=18)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("op,npfn", [
    ("HannWindow", lambda n: 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)),
    ("HammingWindow", lambda n: 25 / 46 - 21 / 46 * np.cos(
        2 * np.pi * np.arange(n) / n)),
    ("BlackmanWindow", lambda n: 0.42 - 0.5 * np.cos(
        2 * np.pi * np.arange(n) / n) + 0.08 * np.cos(
        4 * np.pi * np.arange(n) / n)),
])
def test_windows(op, npfn):
    (out,) = run_op(op, {}, initializers={"size": np.array(16, np.int64)},
                    opset=17)
    np.testing.assert_allclose(out, npfn(16).astype(np.float32),
                               rtol=1e-5, atol=1e-6)


def test_dft_matches_numpy():
    x = f32(2, 16, 1)
    (out,) = run_op("DFT", {"x": x}, opset=17)
    ref = np.fft.fft(x[..., 0], axis=1)
    np.testing.assert_allclose(out[..., 0], ref.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[..., 1], ref.imag, rtol=1e-4, atol=1e-4)


def test_dft_inverse_onesided():
    x = f32(1, 8, 2)
    (out,) = run_op("DFT", {"x": x}, inverse=1, opset=17)
    ref = np.fft.ifft(x[..., 0] + 1j * x[..., 1], axis=1)
    np.testing.assert_allclose(out[..., 0], ref.real, rtol=1e-4, atol=1e-5)


def test_stft():
    B, L, frame, hop = 2, 32, 8, 4
    x = f32(B, L)
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
           ).astype(np.float32)
    (out,) = run_op(
        "STFT", {"signal": x},
        initializers={"frame_step": np.array(hop, np.int64), "window": win},
        onesided=1, opset=17)
    n_frames = (L - frame) // hop + 1
    assert out.shape == (B, n_frames, frame // 2 + 1, 2)
    for f in range(n_frames):
        seg = x[:, f * hop: f * hop + frame] * win
        ref = np.fft.rfft(seg, axis=-1)
        np.testing.assert_allclose(out[:, f, :, 0], ref.real, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(out[:, f, :, 1], ref.imag, rtol=1e-4,
                                   atol=1e-4)


def test_mel_weight_matrix():
    (out,) = run_op(
        "MelWeightMatrix", {},
        initializers={"num_mel_bins": np.array(8, np.int32),
                      "dft_length": np.array(64, np.int32),
                      "sample_rate": np.array(8000, np.int32),
                      "lower_edge_hertz": np.array(0.0, np.float32),
                      "upper_edge_hertz": np.array(4000.0, np.float32)},
        opset=17)
    assert out.shape == (33, 8)
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    assert out.sum() > 0  # triangles present


def test_random_ops_are_deterministic():
    kw = dict(initializers=None, opset=17)
    (a,) = run_op("RandomNormal", {}, shape=[64, 64], seed=3.0, **kw)
    (b,) = run_op("RandomNormal", {}, shape=[64, 64], seed=3.0, **kw)
    np.testing.assert_array_equal(a, b)  # same seed -> same stream
    assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.1
    (u,) = run_op("RandomUniform", {}, shape=[256], low=2.0, high=3.0, **kw)
    assert u.min() >= 2.0 and u.max() <= 3.0
    x = f32(4, 8)
    (ln,) = run_op("RandomNormalLike", {"x": x}, seed=1.0)
    assert ln.shape == x.shape
    (lu,) = run_op("RandomUniformLike", {"x": x}, seed=1.0)
    assert lu.shape == x.shape and lu.min() >= 0.0 and lu.max() <= 1.0


def test_bernoulli_and_multinomial():
    p = np.full((2, 1000), 0.3, np.float32)
    (out,) = run_op("Bernoulli", {"x": p}, seed=5.0, opset=15)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    assert abs(out.mean() - 0.3) < 0.05
    logits = np.log(np.array([[0.05, 0.9, 0.05]], np.float32))
    (samp,) = run_op("Multinomial", {"x": np.repeat(logits, 4, 0)},
                     sample_size=64, seed=2.0, opset=13)
    assert samp.shape == (4, 64)
    assert (samp == 1).mean() > 0.7  # mode dominates


def test_scatter_deprecated_alias():
    x = np.zeros((3, 3), np.float32)
    idx = np.array([[0, 2]], np.int64)
    upd = np.array([[1.0, 2.0]], np.float32)
    (out,) = run_op("Scatter", {"data": x, "indices": idx, "updates": upd},
                    axis=1, opset=10)
    ref = x.copy()
    ref[0, 0], ref[0, 2] = 1.0, 2.0
    np.testing.assert_array_equal(out, ref)


def test_seedless_random_nodes_decorrelated():
    """Two seedless RandomNormal nodes in ONE graph must draw independent
    streams (advisor finding: both got PRNGKey(0) and emitted identical
    tensors); explicit equal seeds still share a stream per the spec."""
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model
    from onnx_rusty_inference_engine_tpu.models._builder import GraphBuilder

    b = GraphBuilder("rnd", opset=17)
    b.node("RandomNormal", [], ["a"], shape=[32, 32], dtype=1)
    b.node("RandomNormal", [], ["b"], shape=[32, 32], dtype=1)
    b.output("a", [32, 32])
    b.output("b", [32, 32])
    out = Engine(import_model(b.model()))({})
    assert not np.allclose(np.asarray(out["a"]), np.asarray(out["b"]))

    b2 = GraphBuilder("rnd2", opset=17)
    b2.node("RandomNormal", [], ["a"], shape=[8, 8], dtype=1, seed=5.0)
    b2.node("RandomNormal", [], ["b"], shape=[8, 8], dtype=1, seed=5.0)
    b2.output("a", [8, 8])
    b2.output("b", [8, 8])
    out2 = Engine(import_model(b2.model()))({})
    np.testing.assert_array_equal(np.asarray(out2["a"]),
                                  np.asarray(out2["b"]))


@pytest.mark.parametrize("op", ["HannWindow", "HammingWindow",
                                "BlackmanWindow"])
def test_window_size_one_symmetric(op):
    """periodic=0, size=1 used to compute i/(size-1) = 0/0 -> NaN; the
    symmetric single-sample window is [1.0] (numpy convention)."""
    (out,) = run_op(op, {}, initializers={"size": np.array(1, np.int64)},
                    periodic=0, opset=17)
    np.testing.assert_array_equal(out, np.ones(1, np.float32))
