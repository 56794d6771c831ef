"""Quantized ONNX op emitters: QLinearConv / QLinearMatMul / (De)QuantizeLinear.

The north-star hot path (BASELINE.json): int8 x int8 -> int32 contractions on
the MXU with the dequant/requant epilogue fused in. Two lowering backends:

- "xla" (default): `lax.conv_general_dilated` / `dot_general` with
  preferred_element_type=int32 — XLA lowers these natively onto the TPU MXU
  (measured ~805 int8 TOP/s matmul vs ~498 fp32 on v5e) and fuses the
  elementwise requant into the epilogue.
- "pallas": hand-written fused kernels (ops/kernels/qmatmul.py) for the
  cases where manual control wins; toggle with ORIET_KERNELS=pallas or
  engine/kernel config.

Requant math (ONNX QLinear convention): y = saturate(round(acc * (x_s * w_s
/ y_s)) + y_zp). Our quantizer emits symmetric tensors (zp = 0), but the
emitters honor arbitrary static zero points for ONNX compatibility.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register
from .standard import _conv_dimension_numbers, _conv_padding


def _use_pallas() -> bool:
    return os.environ.get("ORIET_KERNELS", "xla") == "pallas"


# --------------------------------------------------------------------------
# Quantize / Dequantize
# --------------------------------------------------------------------------
@register("QuantizeLinear")
def quantize_linear(ctx: LoweringContext, node: Node, ins):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    qdtype = zp.dtype if zp is not None else jnp.int8
    info = jnp.iinfo(qdtype)
    axis = int(node.attr("axis", 1))
    if scale.ndim == 1 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = scale.size
        scale = scale.reshape(shape)
        if zp is not None and zp.size == scale.size:
            zp = zp.reshape(shape)
    y = jnp.round(x / scale)
    if zp is not None:
        y = y + zp.astype(y.dtype)
    return (jnp.clip(y, info.min, info.max).astype(qdtype),)


@register("DequantizeLinear")
def dequantize_linear(ctx: LoweringContext, node: Node, ins):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    axis = int(node.attr("axis", 1))
    if scale.ndim == 1 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = scale.size
        scale = scale.reshape(shape)
        if zp is not None and zp.size == scale.size:
            zp = zp.reshape(shape)
    xf = x.astype(jnp.float32)
    if zp is not None:
        xf = xf - zp.astype(jnp.float32)
    return (xf * scale.astype(jnp.float32),)


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
def _static_zp_is_zero(ctx: LoweringContext, name: str) -> bool:
    v = ctx.constant(name) if name else None
    return v is not None and not np.any(v)


def _requant(acc_i32, multiplier, y_zp, out_dtype=jnp.int8):
    """acc * mult (fp32 epilogue on the VPU, fused by XLA) -> saturate."""
    info = jnp.iinfo(out_dtype)
    y = jnp.round(acc_i32.astype(jnp.float32) * multiplier)
    if y_zp is not None:
        y = y + y_zp.astype(jnp.float32)
    return jnp.clip(y, info.min, info.max).astype(out_dtype)


# --------------------------------------------------------------------------
# QLinearConv
# --------------------------------------------------------------------------
@register("QLinearConv")
def qlinear_conv(ctx: LoweringContext, node: Node, ins):
    (x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp) = ins[:8]
    bias = ins[8] if len(ins) > 8 else None
    spatial = x.ndim - 2
    kernel = node.attr("kernel_shape", w.shape[2:])
    strides = [int(s) for s in node.attr("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attr("dilations", [1] * spatial)]
    group = int(node.attr("group", 1))
    padding = _conv_padding(node, x.shape[2:], kernel, strides, dilations)

    sym = (_static_zp_is_zero(ctx, node.inputs[2])
           and _static_zp_is_zero(ctx, node.inputs[5]))
    if (sym and _use_pallas() and spatial == 2 and group == 1
            and _static_zp_is_zero(ctx, node.inputs[7])
            and tuple(w.shape[2:]) == (1, 1)
            and all(s == 1 for s in strides)
            and not any(lo or hi for lo, hi in padding)):
        # 1x1 stride-1 conv IS a matmul: fused Pallas kernel (dequant-free
        # int8 contraction + int32 bias + requant, all in VMEM)
        from .kernels.qmatmul import qconv1x1_int8_requant

        mult = (x_s.astype(jnp.float32) * w_s.astype(jnp.float32)
                / y_s.astype(jnp.float32))
        interp = jax.default_backend() != "tpu"
        return (qconv1x1_int8_requant(x, w, mult, bias, interpret=interp),)
    if sym:
        lhs, rhs = x, w  # int8 x int8 -> int32 directly on the MXU
    else:  # general (asymmetric) path: widen then subtract zero points
        lhs = x.astype(jnp.int32) - x_zp.astype(jnp.int32)
        rhs = w.astype(jnp.int32) - w_zp.astype(jnp.int32).reshape(
            (-1,) + (1,) * (w.ndim - 1))
    acc = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dimension_numbers(spatial),
        feature_group_count=group,
        preferred_element_type=jnp.int32,
    )
    if bias is not None:
        acc = acc + bias.reshape((1, -1) + (1,) * spatial)
    mult = (x_s.astype(jnp.float32) * w_s.astype(jnp.float32)
            / y_s.astype(jnp.float32))
    if mult.ndim == 1 and mult.size > 1:  # per-output-channel
        mult = mult.reshape((1, -1) + (1,) * spatial)
    return (_requant(acc, mult, y_zp),)


# --------------------------------------------------------------------------
# QLinearMatMul
# --------------------------------------------------------------------------
@register("QLinearMatMul")
def qlinear_matmul(ctx: LoweringContext, node: Node, ins):
    (a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp) = ins[:8]
    bias = ins[8] if len(ins) > 8 else None

    sym = (_static_zp_is_zero(ctx, node.inputs[2])
           and _static_zp_is_zero(ctx, node.inputs[5]))
    if sym and _use_pallas() and a.ndim == 2 and b.ndim == 2:
        from .kernels.qmatmul import qmatmul_int8

        acc = qmatmul_int8(a, b)
    elif sym:
        acc = jnp.matmul(a, b, preferred_element_type=jnp.int32)
    else:
        acc = jnp.matmul(a.astype(jnp.int32) - a_zp.astype(jnp.int32),
                         b.astype(jnp.int32) - b_zp.astype(jnp.int32),
                         preferred_element_type=jnp.int32)
    if bias is not None:
        acc = acc + bias
    mult = (a_s.astype(jnp.float32) * b_s.astype(jnp.float32)
            / y_s.astype(jnp.float32))
    # 1-D b_s = per-output-column: broadcasts over the last dim naturally
    return (_requant(acc, mult, y_zp),)


# --------------------------------------------------------------------------
# Integer-output variants (ONNX MatMulInteger / ConvInteger)
# --------------------------------------------------------------------------
@register("MatMulInteger")
def matmul_integer(ctx: LoweringContext, node: Node, ins):
    a, b = ins[0], ins[1]
    a_zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    b_zp = ins[3] if len(ins) > 3 and ins[3] is not None else None
    if a_zp is not None:
        a = a.astype(jnp.int32) - a_zp.astype(jnp.int32)
    if b_zp is not None:
        b = b.astype(jnp.int32) - b_zp.astype(jnp.int32)
    return (jnp.matmul(a, b, preferred_element_type=jnp.int32),)


@register("ConvInteger")
def conv_integer(ctx: LoweringContext, node: Node, ins):
    x, w = ins[0], ins[1]
    x_zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    spatial = x.ndim - 2
    kernel = node.attr("kernel_shape", w.shape[2:])
    strides = [int(s) for s in node.attr("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attr("dilations", [1] * spatial)]
    padding = _conv_padding(node, x.shape[2:], kernel, strides, dilations)
    w_zp = ins[3] if len(ins) > 3 and ins[3] is not None else None
    x = x.astype(jnp.int32)
    w = w.astype(jnp.int32)
    if x_zp is not None:
        x = x - x_zp.astype(jnp.int32)
    if w_zp is not None:
        z = w_zp.astype(jnp.int32)
        if z.ndim == 1 and z.shape[0] > 1:
            # per-output-channel zero point aligns with w's M axis (axis
            # 0), not the trailing kernel-width axis plain broadcasting
            # would hit
            z = z.reshape((-1,) + (1,) * (w.ndim - 1))
        w = w - z
    acc = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dimension_numbers(spatial),
        feature_group_count=int(node.attr("group", 1)),
        preferred_element_type=jnp.int32,
    )
    return (acc,)


@register("MatMulNBits", domain="com.microsoft")
def matmul_nbits(ctx: LoweringContext, node: Node, ins):
    """Weight-only INT4 matmul (quant.pack_int4 layout): activations stay
    floating; packed nibbles are expanded + block-dequantized on the fly and
    the contraction runs in bf16 on the MXU. Unpack/dequant is elementwise,
    so XLA fuses it into the matmul's weight operand read."""
    a, packed, scales = ins[0], ins[1], ins[2]
    K = int(node.attr("K"))
    N = int(node.attr("N"))
    bits = int(node.attr("bits", 4))
    if bits != 4:
        raise UnsupportedOpError("MatMulNBits: only bits=4 supported")
    layout = node.attr("layout", "")
    if isinstance(layout, bytes):
        layout = layout.decode()
    block = int(node.attr("block_size", K))
    lead = a.shape[:-1]
    interp = jax.default_backend() != "tpu"

    if layout == "planar":
        # our quantizer's TPU-native layout (quant.pack_int4_planar):
        # nibble planes = contiguous halves of K; scales arrive k-major in
        # the kernel's sublane-windowed layout so the fused call launches
        # with zero auxiliary XLA ops (see planar_layout)
        from .kernels.qmatmul_int4 import (int4_planar_supported,
                                           planar_layout,
                                           qmatmul_int4_planar)

        if ((jax.default_backend() == "tpu" or _use_pallas())
                and int4_planar_supported(K, block)):
            out = qmatmul_int4_planar(a.reshape(-1, K), packed, scales,
                                      qblock=block, interpret=interp)
            return (out[:, :N].reshape(*lead, N).astype(a.dtype),)
        Nw, Kh = packed.shape
        nbh, bs = planar_layout(K, block)
        lo = (packed & 0xF).astype(jnp.int8) - 8       # [Nw, Kh] (k < Kh)
        hi = (packed >> 4).astype(jnp.int8) - 8        # [Nw, Kh] (k >= Kh)
        s = scales.astype(jnp.bfloat16).reshape(2, nbh, Nw)
        planes = []
        for plane, sp in ((lo, s[0]), (hi, s[1])):
            wq = plane.reshape(Nw, nbh, bs).astype(jnp.bfloat16)
            planes.append((wq * sp.T[:, :, None]).reshape(Nw, Kh))
        w = jnp.concatenate(planes, axis=1)[:N]
        out = jnp.matmul(a.astype(jnp.bfloat16), w.T,
                         preferred_element_type=jnp.float32)
        return (out.astype(a.dtype),)

    n_blocks = K // block

    from .kernels.qmatmul_int4 import int4_fused_supported

    use_fused = (jax.default_backend() == "tpu" or _use_pallas()) \
        and int4_fused_supported(K, n_blocks)
    if use_fused:
        # Pallas kernel: weights stay packed in HBM, unpack+dequant in VMEM
        # (the naive path below materializes the full bf16 matrix and is
        # memory-bound at 4x the traffic)
        from .kernels.qmatmul_int4 import qmatmul_int4_bf16

        a2 = a.reshape(-1, K)
        out = qmatmul_int4_bf16(a2, packed, scales, interpret=interp)
        return (out[:, :N].reshape(*lead, N).astype(a.dtype),)

    Nw = packed.shape[0]  # may be pre-padded past the logical N
    lo = (packed & 0xF).astype(jnp.int8) - 8          # [Nw, K//2] (even k)
    hi = (packed >> 4).astype(jnp.int8) - 8           # [Nw, K//2] (odd k)
    q = jnp.stack([lo, hi], axis=-1).reshape(Nw, K)    # interleave -> [Nw, K]
    wq = q.reshape(Nw, n_blocks, block).astype(jnp.bfloat16)
    w = (wq * scales.astype(jnp.bfloat16)[:, :, None]).reshape(Nw, K)[:N]
    out = jnp.matmul(a.astype(jnp.bfloat16), w.T,
                     preferred_element_type=jnp.float32)
    return (out.astype(a.dtype),)


@register("DynamicQuantizeLinear")
def dynamic_quantize_linear(ctx: LoweringContext, node: Node, ins):
    """uint8 dynamic quantization per ONNX spec."""
    x = ins[0]
    qmin, qmax = 0.0, 255.0
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / (qmax - qmin)
    scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(qmin - x_min / scale), qmin, qmax).astype(jnp.uint8)
    y = jnp.clip(jnp.round(x / scale) + zp.astype(jnp.float32), qmin, qmax
                 ).astype(jnp.uint8)
    return (y, scale.astype(jnp.float32), zp)


# --------------------------------------------------------------------------
# ORT contrib (com.microsoft) QLinear elementwise/pool family — these appear
# in externally quantized models (onnxruntime.quantization QOperator mode),
# so ingesting them directly matters for drop-in compatibility. Compute is
# dequant -> op -> requant in fp32 intermediates; XLA fuses the whole chain
# into one elementwise kernel, so the int8 tensors never round-trip HBM
# wider than necessary.
# --------------------------------------------------------------------------
def _dq(x, s, zp):
    xf = x.astype(jnp.float32)
    if zp is not None:
        xf = xf - zp.astype(jnp.float32)
    return xf * s.astype(jnp.float32)


def _q(xf, s, zp, like_dtype):
    info = jnp.iinfo(like_dtype)
    y = jnp.round(xf / s.astype(jnp.float32))
    if zp is not None:
        y = y + zp.astype(jnp.float32)
    return jnp.clip(y, info.min, info.max).astype(like_dtype)


def _qlinear_binary(fn):
    def emit(ctx: LoweringContext, node: Node, ins):
        a, a_s, a_zp, b, b_s, b_zp, y_s = ins[:7]
        y_zp = ins[7] if len(ins) > 7 else None
        out = fn(_dq(a, a_s, a_zp), _dq(b, b_s, b_zp))
        return (_q(out, y_s, y_zp, a.dtype),)
    return emit


register("QLinearAdd", domain="com.microsoft")(_qlinear_binary(jnp.add))
register("QLinearMul", domain="com.microsoft")(_qlinear_binary(jnp.multiply))


def _qlinear_unary(fn):
    def emit(ctx: LoweringContext, node: Node, ins):
        x, x_s, x_zp, y_s = ins[0], ins[1], ins[2], ins[3]
        y_zp = ins[4] if len(ins) > 4 else None
        return (_q(fn(node, _dq(x, x_s, x_zp)), y_s, y_zp, x.dtype),)
    return emit


register("QLinearSigmoid", domain="com.microsoft")(_qlinear_unary(lambda n, x: jax.nn.sigmoid(x)))
register("QLinearLeakyRelu", domain="com.microsoft")(_qlinear_unary(
    lambda n, x: jnp.where(x >= 0, x, x * float(n.attr("alpha", 0.01)))))


@register("QLinearGlobalAveragePool", domain="com.microsoft")
def qlinear_global_average_pool(ctx: LoweringContext, node: Node, ins):
    x, x_s, x_zp, y_s = ins[0], ins[1], ins[2], ins[3]
    y_zp = ins[4] if len(ins) > 4 else None
    spatial = tuple(range(2, x.ndim))
    if int(node.attr("channels_last", 0)):
        spatial = tuple(range(1, x.ndim - 1))
    out = jnp.mean(_dq(x, x_s, x_zp), axis=spatial, keepdims=True)
    return (_q(out, y_s, y_zp, x.dtype),)


@register("QLinearAveragePool", domain="com.microsoft")
def qlinear_average_pool(ctx: LoweringContext, node: Node, ins):
    from .standard import average_pool

    x, x_s, x_zp, y_s = ins[0], ins[1], ins[2], ins[3]
    y_zp = ins[4] if len(ins) > 4 else None
    (out,) = average_pool(ctx, node, [_dq(x, x_s, x_zp)])
    return (_q(out, y_s, y_zp, x.dtype),)


@register("QLinearConcat", domain="com.microsoft")
def qlinear_concat(ctx: LoweringContext, node: Node, ins):
    y_s, y_zp = ins[0], ins[1]
    parts = [_dq(ins[i], ins[i + 1], ins[i + 2])
             for i in range(2, len(ins), 3)]
    out = jnp.concatenate(parts, axis=int(node.attr("axis", 1)))
    return (_q(out, y_s, y_zp, ins[2].dtype),)


@register("QGemm", domain="com.microsoft")
def qgemm(ctx: LoweringContext, node: Node, ins):
    (a, a_s, a_zp, b, b_s, b_zp) = ins[:6]
    bias = ins[6] if len(ins) > 6 else None          # int32, scale a_s*b_s
    y_s = ins[7] if len(ins) > 7 else None
    y_zp = ins[8] if len(ins) > 8 else None
    alpha = float(node.attr("alpha", 1.0))
    if int(node.attr("transA", 0)):
        a = a.T
    if int(node.attr("transB", 0)):
        b = b.T  # per-column b_s already follows the output dim (broadcasts)
    ai = a.astype(jnp.int32) - (a_zp.astype(jnp.int32) if a_zp is not None
                                else 0)
    bi = b.astype(jnp.int32) - (b_zp.astype(jnp.int32) if b_zp is not None
                                else 0)
    acc = jnp.matmul(ai, bi, preferred_element_type=jnp.int32)
    if bias is not None:
        acc = acc + bias
    out = alpha * acc.astype(jnp.float32) * (
        a_s.astype(jnp.float32) * b_s.astype(jnp.float32))
    if y_s is None:  # float output variant
        return (out,)
    return (_q(out, y_s, y_zp, a.dtype),)
