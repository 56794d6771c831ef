"""ORT-contrib QLinear op family (QOperator-format models from
onnxruntime.quantization): conformance vs explicit dequant->op->requant."""

import numpy as np

from util import run_op

rng = np.random.default_rng(83)


def q8(*shape):
    return rng.integers(-100, 100, shape).astype(np.int8)


def u8(*shape):
    return rng.integers(0, 200, shape).astype(np.uint8)


def _dq(x, s, zp=0):
    return (x.astype(np.float32) - zp) * s


def _rq(x, s, zp=0, lo=-128, hi=127, dt=np.int8):
    return np.clip(np.round(x / s) + zp, lo, hi).astype(dt)


def test_qlinear_add_mul():
    a, b = q8(3, 7), q8(3, 7)
    sa, sb, sy = np.float32(0.02), np.float32(0.05), np.float32(0.06)
    zp = np.int8(0)
    (got,) = run_op("QLinearAdd", {"a": a},
                    {"sa": sa, "za": zp, "b": b, "sb": sb, "zb": zp,
                     "sy": sy, "zy": zp})
    want = _rq(_dq(a, sa) + _dq(b, sb), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    (got,) = run_op("QLinearMul", {"a": a},
                    {"sa": sa, "za": zp, "b": b, "sb": sb, "zb": zp,
                     "sy": sy, "zy": zp})
    want = _rq(_dq(a, sa) * _dq(b, sb), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qlinear_add_uint8_zero_points():
    a, b = u8(2, 5), u8(2, 5)
    sa, sb, sy = np.float32(0.03), np.float32(0.04), np.float32(0.05)
    za, zb, zy = np.uint8(128), np.uint8(100), np.uint8(120)
    (got,) = run_op("QLinearAdd", {"a": a},
                    {"sa": sa, "za": za, "b": b, "sb": sb, "zb": zb,
                     "sy": sy, "zy": zy})
    want = _rq(_dq(a, sa, 128) + _dq(b, sb, 100), sy, 120, 0, 255, np.uint8)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qlinear_sigmoid_leaky():
    x = q8(4, 9)
    sx, sy = np.float32(0.04), np.float32(1 / 256)
    zp = np.int8(0)
    (got,) = run_op("QLinearSigmoid", {"x": x},
                    {"sx": sx, "zx": zp, "sy": sy, "zy": zp})
    want = _rq(1 / (1 + np.exp(-_dq(x, sx))), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    (got,) = run_op("QLinearLeakyRelu", {"x": x},
                    {"sx": sx, "zx": zp, "sy": sx, "zy": zp}, alpha=0.1)
    want = _rq(np.where(_dq(x, sx) >= 0, _dq(x, sx), 0.1 * _dq(x, sx)), sx)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qlinear_global_average_pool():
    x = q8(2, 4, 5, 5)
    sx, sy = np.float32(0.02), np.float32(0.02)
    zp = np.int8(0)
    (got,) = run_op("QLinearGlobalAveragePool", {"x": x},
                    {"sx": sx, "zx": zp, "sy": sy, "zy": zp})
    want = _rq(_dq(x, sx).mean(axis=(2, 3), keepdims=True), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qlinear_concat():
    a, b = q8(2, 3, 4), q8(2, 5, 4)
    sy = np.float32(0.05)
    zp = np.int8(0)
    # QLinearConcat input order: (Y_scale, Y_zp), then (X, x_s, x_zp) triples
    from util import make_model, node
    from onnx_rusty_inference_engine_tpu import onnx_io
    from onnx_rusty_inference_engine_tpu.engine import Engine
    from onnx_rusty_inference_engine_tpu.graph import import_model

    n = node("QLinearConcat",
             ["sy", "zy", "a", "sa", "za", "b", "sb", "zb"], ["out0"], axis=1)
    m = make_model([n], {"a": a},
                   ["out0"],
                   {"sy": sy, "zy": zp, "sa": np.float32(0.05), "za": zp,
                    "b": b, "sb": np.float32(0.02), "zb": zp})
    m2 = onnx_io.parse_model(onnx_io.serialize_model(m))
    got = Engine(import_model(m2)).run({"a": a})["out0"]
    want = _rq(np.concatenate([_dq(a, 0.05), _dq(b, 0.02)], axis=1), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_qgemm():
    a = q8(4, 6)
    b = q8(6, 5)
    sa, sb, sy = np.float32(0.02), np.float32(0.03), np.float32(0.1)
    zp = np.int8(0)
    bias = rng.integers(-500, 500, (5,)).astype(np.int32)
    (got,) = run_op("QGemm", {"a": a},
                    {"sa": sa, "za": zp, "b": b, "sb": sb, "zb": zp,
                     "c": bias, "sy": sy, "zy": zp}, alpha=1.0)
    acc = a.astype(np.int32) @ b.astype(np.int32) + bias
    want = _rq(acc * (float(sa) * float(sb)), sy)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
