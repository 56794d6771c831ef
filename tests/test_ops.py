"""Per-op conformance tests (ONNX backend-test style; SURVEY.md §4 plan (a)).

Each test builds a single-op ONNX model in memory, serializes and reparses it
through the wire codec, lowers via the registry, and checks against a numpy
reference computed inline.
"""

import numpy as np
import pytest

from util import run_op

rng = np.random.default_rng(42)


def f32(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_matmul_2d():
    a, b = f32(3, 4), f32(4, 3)
    (out,) = run_op("MatMul", {"a": a, "b": b})
    np.testing.assert_allclose(out, a @ b, rtol=1e-5)


def test_matmul_batched():
    a, b = f32(2, 5, 3, 4), f32(2, 5, 4, 6)
    (out,) = run_op("MatMul", {"a": a, "b": b})
    np.testing.assert_allclose(out, a @ b, rtol=1e-5)


def test_gemm_transB():
    a, b, c = f32(4, 8), f32(6, 8), f32(6)
    (out,) = run_op("Gemm", {"a": a}, {"b": b, "c": c},
                    alpha=0.5, beta=2.0, transB=1)
    np.testing.assert_allclose(out, 0.5 * (a @ b.T) + 2.0 * c, rtol=1e-5)


def test_add_broadcast_bias():
    # (reference add mode 1: 4-D activation + per-channel bias, add_op.rs:75)
    x, b = f32(2, 8, 5, 5), f32(8, 1, 1)
    (out,) = run_op("Add", {"x": x}, {"b": b})
    np.testing.assert_allclose(out, x + b, rtol=1e-6)


@pytest.mark.parametrize("op,fn", [
    ("Sub", np.subtract), ("Mul", np.multiply), ("Div", np.divide),
])
def test_binary_elementwise(op, fn):
    a, b = f32(3, 4), f32(3, 4)
    (out,) = run_op(op, {"a": a, "b": b})
    np.testing.assert_allclose(out, fn(a, b), rtol=1e-5)


def test_relu():
    x = f32(2, 3, 4, 5)
    (out,) = run_op("Relu", {"x": x})
    np.testing.assert_array_equal(out, np.maximum(x, 0))


def test_conv_same_upper():
    # MNIST-style: 5x5 SAME_UPPER conv keeps 28x28 (convolution_op.rs SAME path)
    x, w = f32(1, 1, 28, 28), f32(8, 1, 5, 5)
    (out,) = run_op("Conv", {"x": x}, {"w": w}, auto_pad="SAME_UPPER",
                    kernel_shape=[5, 5], strides=[1, 1], dilations=[1, 1], group=1)
    assert out.shape == (1, 8, 28, 28)
    # reference value via explicit correlation at one location
    pad = np.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)))
    want = np.sum(pad[0, 0, 7:12, 9:14] * w[3, 0])  # out[h,w] = Σ pad[h+i, w+j]·k[i,j]
    np.testing.assert_allclose(out[0, 3, 7, 9], want, rtol=1e-4)


def test_conv_explicit_pads_stride():
    x, w, b = f32(2, 3, 11, 13), f32(4, 3, 3, 3), f32(4)
    (out,) = run_op("Conv", {"x": x}, {"w": w, "b": b},
                    pads=[1, 1, 1, 1], strides=[2, 2])
    assert out.shape == (2, 4, 6, 7)
    pad = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    want = np.sum(pad[1, :, 4:7, 6:9] * w[2]) + b[2]
    np.testing.assert_allclose(out[1, 2, 2, 3], want, rtol=1e-4)


def test_conv_grouped():
    x, w = f32(1, 4, 8, 8), f32(8, 2, 3, 3)
    (out,) = run_op("Conv", {"x": x}, {"w": w}, group=2, pads=[1, 1, 1, 1])
    assert out.shape == (1, 8, 8, 8)
    # group 1 output channel 5 uses input channels 2:4
    pad = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    want = np.sum(pad[0, 2:4, 3:6, 3:6] * w[5])
    np.testing.assert_allclose(out[0, 5, 3, 3], want, rtol=1e-4)


def test_conv_dilated():
    x, w = f32(1, 2, 12, 12), f32(3, 2, 3, 3)
    (out,) = run_op("Conv", {"x": x}, {"w": w}, dilations=[2, 2])
    assert out.shape == (1, 3, 8, 8)
    want = np.sum(x[0, :, 0:5:2, 0:5:2] * w[1])
    np.testing.assert_allclose(out[0, 1, 0, 0], want, rtol=1e-4)


def test_maxpool():
    x = f32(1, 3, 8, 8)
    (out,) = run_op("MaxPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2])
    assert out.shape == (1, 3, 4, 4)
    want = x.reshape(1, 3, 4, 2, 4, 2).max(axis=(3, 5))
    np.testing.assert_array_equal(out, want)


def test_maxpool_pads():
    x = f32(1, 2, 5, 5)
    (out,) = run_op("MaxPool", {"x": x}, kernel_shape=[3, 3], strides=[3, 3],
                    pads=[1, 1, 1, 1])
    assert out.shape == (1, 2, 2, 2)


def test_maxpool_ceil_mode():
    x = f32(1, 1, 7, 7)
    (out,) = run_op("MaxPool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2],
                    ceil_mode=1)
    assert out.shape == (1, 1, 4, 4)


def test_averagepool():
    x = f32(1, 3, 8, 8)
    (out,) = run_op("AveragePool", {"x": x}, kernel_shape=[2, 2], strides=[2, 2])
    want = x.reshape(1, 3, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_averagepool_pad_exclude():
    x = np.ones((1, 1, 4, 4), np.float32)
    (out,) = run_op("AveragePool", {"x": x}, kernel_shape=[3, 3], strides=[1, 1],
                    pads=[1, 1, 1, 1], count_include_pad=0)
    np.testing.assert_allclose(out, np.ones((1, 1, 4, 4)), rtol=1e-6)


def test_global_average_pool():
    x = f32(2, 5, 7, 9)
    (out,) = run_op("GlobalAveragePool", {"x": x})
    np.testing.assert_allclose(out, x.mean(axis=(2, 3), keepdims=True), rtol=1e-5)


def test_softmax_opset8_flattens():
    # opset <13 semantics over [B,C,H,W] (softmax_op.rs:46-56)
    x = f32(2, 4, 3, 3)
    (out,) = run_op("Softmax", {"x": x}, opset=8, axis=1)
    flat = x.reshape(2, -1)
    e = np.exp(flat - flat.max(axis=1, keepdims=True))
    want = (e / e.sum(axis=1, keepdims=True)).reshape(x.shape)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_softmax_opset13_axis():
    x = f32(2, 3, 5)
    (out,) = run_op("Softmax", {"x": x}, opset=13, axis=-1)
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(out, e / e.sum(axis=-1, keepdims=True), rtol=1e-5)


def test_reshape_zero_and_minus_one():
    x = f32(2, 3, 4, 5)
    (out,) = run_op("Reshape", {"x": x},
                    {"shape": np.array([0, -1], dtype=np.int64)})
    assert out.shape == (2, 60)
    np.testing.assert_array_equal(out, x.reshape(2, 60))


def test_concat_nary():
    xs = {f"x{i}": f32(2, i + 1, 3) for i in range(3)}
    (out,) = run_op("Concat", xs, axis=1)
    np.testing.assert_array_equal(out, np.concatenate(list(xs.values()), axis=1))


def test_dropout_inference_identity():
    x = f32(2, 3, 4, 4)
    (out,) = run_op("Dropout", {"x": x}, ratio=0.5)
    np.testing.assert_array_equal(out, x)


def test_transpose():
    x = f32(2, 3, 4)
    (out,) = run_op("Transpose", {"x": x}, perm=[2, 0, 1])
    np.testing.assert_array_equal(out, x.transpose(2, 0, 1))


def test_split():
    x = f32(2, 10)
    outs = run_op("Split", {"x": x}, axis=1, split=[3, 3, 4], n_outputs=3)
    np.testing.assert_array_equal(outs[0], x[:, :3])
    np.testing.assert_array_equal(outs[2], x[:, 6:])


def test_gather():
    x = f32(10, 4)
    idx = np.array([1, 5, 2], dtype=np.int64)
    (out,) = run_op("Gather", {"x": x}, {"idx": idx}, axis=0)
    np.testing.assert_array_equal(out, x[idx])


def test_slice_opset10():
    x = f32(5, 8)
    (out,) = run_op(
        "Slice", {"x": x},
        {"starts": np.array([1], np.int64), "ends": np.array([7], np.int64),
         "axes": np.array([1], np.int64), "steps": np.array([2], np.int64)},
        opset=13)
    np.testing.assert_array_equal(out, x[:, 1:7:2])


def test_batchnorm():
    x = f32(2, 3, 4, 4)
    scale, bias, mean, var = f32(3), f32(3), f32(3), np.abs(f32(3)) + 0.5
    (out,) = run_op("BatchNormalization", {"x": x},
                    {"scale": scale, "bias": bias, "mean": mean, "var": var},
                    epsilon=1e-5)
    sh = (1, 3, 1, 1)
    want = (x - mean.reshape(sh)) / np.sqrt(var.reshape(sh) + 1e-5) \
        * scale.reshape(sh) + bias.reshape(sh)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_layernorm():
    x = f32(2, 5, 8)
    scale, bias = f32(8), f32(8)
    (out,) = run_op("LayerNormalization", {"x": x}, {"scale": scale, "bias": bias},
                    axis=-1, epsilon=1e-5)
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_reduce_mean():
    x = f32(2, 3, 4)
    (out,) = run_op("ReduceMean", {"x": x}, axes=[1], keepdims=1)
    np.testing.assert_allclose(out, x.mean(axis=1, keepdims=True), rtol=1e-5)


def test_argmax_and_flatten():
    x = f32(3, 7)
    (out,) = run_op("ArgMax", {"x": x}, axis=1, keepdims=0)
    np.testing.assert_array_equal(out, x.argmax(axis=1))
    (out,) = run_op("Flatten", {"x": f32(2, 3, 4)}, axis=2)
    assert out.shape == (6, 4)


def test_unary_ops():
    x = f32(3, 4)
    for op, fn in [("Exp", np.exp), ("Sqrt", lambda v: np.sqrt(np.abs(v))),
                   ("Tanh", np.tanh), ("Abs", np.abs), ("Neg", np.negative)]:
        arg = np.abs(x) if op == "Sqrt" else x
        (out,) = run_op(op, {"x": arg})
        np.testing.assert_allclose(out, fn(arg), rtol=1e-4, atol=1e-6)


def test_erf_gelu_sigmoid():
    x = f32(4, 4)
    (out,) = run_op("Sigmoid", {"x": x})
    np.testing.assert_allclose(out, 1 / (1 + np.exp(-x)), rtol=1e-4)
    import math
    (out,) = run_op("Erf", {"x": x})
    want = np.vectorize(math.erf)(x)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_clip_where_cast():
    x = f32(3, 3)
    (out,) = run_op("Clip", {"x": x}, min=-0.5, max=0.5)
    np.testing.assert_array_equal(out, np.clip(x, -0.5, 0.5))
    cond = x > 0
    (out,) = run_op("Where", {"c": cond, "a": x, "b": -x})
    np.testing.assert_array_equal(out, np.where(cond, x, -x))
    (out,) = run_op("Cast", {"x": x}, to=7)  # INT64 (int32 under default no-x64 JAX)
    assert np.issubdtype(out.dtype, np.integer)


def test_pad_constant():
    x = f32(2, 3)
    (out,) = run_op("Pad", {"x": x},
                    {"pads": np.array([0, 1, 0, 2], np.int64)}, opset=13)
    np.testing.assert_array_equal(out, np.pad(x, ((0, 0), (1, 2))))


def test_lrn():
    x = f32(1, 6, 4, 4)
    size, alpha, beta, bias = 3, 1e-3, 0.75, 1.0
    (out,) = run_op("LRN", {"x": x}, size=size, alpha=alpha, beta=beta, bias=bias)
    sq = x ** 2
    want = np.zeros_like(x)
    for c in range(6):
        lo, hi = max(0, c - 1), min(6, c + 2)
        s = sq[:, lo:hi].sum(axis=1)
        want[:, c] = x[:, c] / (bias + alpha / size * s) ** beta
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_conv_transpose():
    x, w = f32(1, 3, 5, 5), f32(3, 4, 3, 3)
    (out,) = run_op("ConvTranspose", {"x": x}, {"w": w}, strides=[2, 2])
    assert out.shape == (1, 4, 11, 11)
    # spot check corner: out[0,o,0,0] = sum_i x[0,i,0,0]*w[i,o,0,0]
    want = np.einsum("i,io->o", x[0, :, 0, 0], w[:, :, 0, 0])
    np.testing.assert_allclose(out[0, :, 0, 0], want, rtol=1e-4)


def test_resize_nearest_asymmetric():
    x = f32(1, 2, 4, 4)
    (out,) = run_op(
        "Resize", {"x": x},
        {"roi": np.array([], np.float32),
         "scales": np.array([1.0, 1.0, 2.0, 2.0], np.float32)},
        mode="nearest", coordinate_transformation_mode="asymmetric",
        opset=13)
    assert out.shape == (1, 2, 8, 8)
    np.testing.assert_array_equal(out, x.repeat(2, axis=2).repeat(2, axis=3))


def test_upsample_opset9():
    x = f32(1, 1, 3, 3)
    (out,) = run_op("Upsample", {"x": x},
                    {"scales": np.array([1.0, 1.0, 3.0, 3.0], np.float32)},
                    mode="nearest", opset=9)
    assert out.shape == (1, 1, 9, 9)
    np.testing.assert_array_equal(out, x.repeat(3, axis=2).repeat(3, axis=3))


def test_resize_linear_sizes():
    x = f32(1, 1, 4, 4)
    (out,) = run_op(
        "Resize", {"x": x},
        {"roi": np.array([], np.float32),
         "scales": np.array([], np.float32),
         "sizes": np.array([1, 1, 8, 8], np.int64)},
        mode="linear", opset=13)
    assert out.shape == (1, 1, 8, 8)
    assert np.isfinite(out).all()
