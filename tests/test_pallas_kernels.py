"""Pallas kernel tests — interpret mode on CPU, compiled on TPU.

(The same kernels were verified compiled on the real chip:
experiments/pallas_probe.py — exact int32 equality with XLA.)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul import (
    qconv1x1_int8_requant,
    qmatmul_int8,
    qmatmul_int8_requant,
)

rng = np.random.default_rng(23)
INTERP = jax.default_backend() != "tpu"


def test_qmatmul_int8_exact():
    a = rng.integers(-127, 127, (100, 300), dtype=np.int8)
    b = rng.integers(-127, 127, (300, 50), dtype=np.int8)
    got = np.asarray(qmatmul_int8(jnp.asarray(a), jnp.asarray(b),
                                  interpret=INTERP))
    want = a.astype(np.int32) @ b.astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_qmatmul_requant_with_bias():
    a = rng.integers(-127, 127, (64, 128), dtype=np.int8)
    b = rng.integers(-127, 127, (128, 96), dtype=np.int8)
    bias = rng.integers(-1000, 1000, (96,), dtype=np.int32)
    mult = (np.abs(rng.standard_normal(96)) * 1e-3 + 1e-4).astype(np.float32)
    got = np.asarray(qmatmul_int8_requant(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mult), jnp.asarray(bias),
        interpret=INTERP))
    acc = a.astype(np.int64) @ b.astype(np.int64) + bias
    want = np.clip(np.round(acc.astype(np.float64) * mult), -128, 127)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qconv1x1_fused_matches_xla_path():
    """The Pallas 1x1-conv path must agree with the XLA QLinearConv lowering."""
    from util import run_op

    B, C, H, W, O = 2, 32, 7, 7, 48
    x_q = rng.integers(-127, 127, (B, C, H, W), dtype=np.int8)
    w_q = rng.integers(-127, 127, (O, C, 1, 1), dtype=np.int8)
    b_q = rng.integers(-500, 500, (O,), dtype=np.int32)
    x_s = np.float32(0.05)
    w_s = (np.abs(rng.standard_normal(O)) * 0.01 + 1e-3).astype(np.float32)
    y_s = np.float32(0.1)

    feeds = ({"x": x_q},
             {"x_s": x_s, "x_zp": np.int8(0), "w": w_q, "w_s": w_s,
              "w_zp": np.zeros(O, np.int8), "y_s": y_s, "y_zp": np.int8(0),
              "b": b_q})
    os.environ["ORIET_KERNELS"] = "xla"
    try:
        (want,) = run_op("QLinearConv", *feeds)
        os.environ["ORIET_KERNELS"] = "pallas"
        (got,) = run_op("QLinearConv", *feeds)
    finally:
        os.environ["ORIET_KERNELS"] = "xla"
    assert got.dtype == np.int8
    # rounding of exact-half values may differ by 1 LSB between paths
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.99


@pytest.mark.parametrize("M,K,N,qb", [
    (40, 512, 96, 256),    # two quant blocks, whole-K tile
    (16, 4096, 128, 256),  # 16 quant blocks -> 8-block K tiles (grid loop)
    (8, 200, 48, 256),     # single block (qb clamped to K=200), odd shapes
])
def test_qmatmul_int4_matches_reference(M, K, N, qb):
    from onnx_rusty_inference_engine_tpu.ops.kernels.qmatmul_int4 import (
        qmatmul_int4_bf16)
    from onnx_rusty_inference_engine_tpu.quant import pack_int4

    a = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    packed, scales = pack_int4(w, block_size=qb)
    got = np.asarray(qmatmul_int4_bf16(
        jnp.asarray(a), jnp.asarray(packed), jnp.asarray(scales),
        interpret=INTERP))
    # reference: dequantized int4 weights, bf16 activations
    lo = (packed & 0xF).astype(np.int8) - 8
    hi = (packed >> 4).astype(np.int8) - 8
    q = np.stack([lo, hi], axis=-1).reshape(N, K)
    nb = scales.shape[1]
    wd = (q.reshape(N, nb, K // nb) * scales[:, :, None]).reshape(N, K).T
    import ml_dtypes
    want = a.astype(ml_dtypes.bfloat16).astype(np.float32) @ \
        wd.astype(ml_dtypes.bfloat16).astype(np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02  # bf16 accumulation-order differences only


def test_matmul_nbits_pallas_path_via_engine():
    """MatMulNBits lowering (fused kernel on non-xla path) matches the naive
    dequantize-then-matmul lowering."""
    from util import run_op

    K, N = 512, 64
    a = rng.standard_normal((8, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    from onnx_rusty_inference_engine_tpu.quant import pack_int4
    packed, scales = pack_int4(w, block_size=256)

    feeds = ({"a": a}, {"p": packed, "s": scales})
    os.environ["ORIET_KERNELS"] = "xla"
    try:
        (want,) = run_op("MatMulNBits", *feeds, K=K, N=N, bits=4,
                         block_size=256)
        os.environ["ORIET_KERNELS"] = "pallas"
        (got,) = run_op("MatMulNBits", *feeds, K=K, N=N, bits=4,
                        block_size=256)
    finally:
        os.environ["ORIET_KERNELS"] = "xla"
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02
