"""fp32/generic ONNX op emitters → jax.numpy / jax.lax.

Covers the reference's whole 10-op set (reference: src/inference_engine/
model_inference.rs:138-161 — Conv, Relu, MaxPool, Concat, Dropout,
GlobalAveragePool, Softmax, Reshape, Add, MatMul) plus the broader op set
needed for the north-star model families (ResNet-50, GPT-2 decoder) and for
real ONNX exports (Gemm, BatchNormalization, LRN, Transpose, Split, Gather,
elementwise/reduction families, …). Each emitter is rank-general and
batch-general, unlike the reference ops which hardcode batch index 0
(e.g. convolution_op.rs:480) and cap ranks at 4 (utils.rs:117-121).

Convs/matmuls lower to `lax.conv_general_dilated` / `jnp.matmul` so XLA tiles
them onto the MXU; elementwise ops fuse into their producers.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import onnx_io
from ..graph import Node, _resolve_reshape
from .registry import LoweringContext, UnsupportedOpError, register
from .registry import index_dtype as _idt


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
def _fp32_precision(x):
    """fp32 inputs contract at full precision (TPU otherwise defaults to a
    bf16-based matmul pass, breaking golden parity); bf16/int inputs keep the
    fast path."""
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def _onnx_pads_to_lax(pads: Sequence[int], spatial: int) -> List[Tuple[int, int]]:
    """ONNX pads = [x1_begin, x2_begin, ..., x1_end, x2_end, ...] → [(lo, hi)]."""
    return [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]


def _auto_pad(
    auto_pad: str,
    in_spatial: Sequence[int],
    kernel: Sequence[int],
    strides: Sequence[int],
    dilations: Sequence[int],
) -> List[Tuple[int, int]]:
    """SAME_UPPER / SAME_LOWER / VALID padding per the ONNX spec.

    (Reference equivalent: get_padding_size, src/inference_fp32_ops/
    convolution_op.rs:519-557.)
    """
    if auto_pad == "VALID":
        return [(0, 0)] * len(in_spatial)
    out = []
    for size, k, s, d in zip(in_spatial, kernel, strides, dilations):
        eff_k = (k - 1) * d + 1
        out_size = -(-size // s)  # ceil
        total = max(0, (out_size - 1) * s + eff_k - size)
        lo = total // 2
        hi = total - lo
        if auto_pad == "SAME_LOWER":
            lo, hi = hi, lo
        out.append((lo, hi))
    return out


def _conv_padding(node: Node, in_spatial, kernel, strides, dilations):
    pads = node.attr("pads")
    auto_pad = node.attr("auto_pad", "NOTSET")
    # Per ONNX spec pads and auto_pad are mutually exclusive; some exporters
    # set both — explicit nonzero pads win (reference mirrors this:
    # convolution_op.rs:169-173).
    if pads is not None and (auto_pad in ("NOTSET", "") or any(pads)):
        return _onnx_pads_to_lax(pads, len(in_spatial))
    if auto_pad in ("NOTSET", "", None):
        return [(0, 0)] * len(in_spatial)
    return _auto_pad(auto_pad, in_spatial, kernel, strides, dilations)


def _conv_dimension_numbers(spatial: int) -> lax.ConvDimensionNumbers:
    # ONNX layout is channels-first: N C *spatial; kernels O I *spatial.
    lhs = (0, 1) + tuple(range(2, 2 + spatial))
    rhs = (0, 1) + tuple(range(2, 2 + spatial))
    return lax.ConvDimensionNumbers(lhs_spec=lhs, rhs_spec=rhs, out_spec=lhs)


# --------------------------------------------------------------------------
# Convolution family
# --------------------------------------------------------------------------
@register("Conv")
def conv(ctx: LoweringContext, node: Node, ins):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    spatial = x.ndim - 2
    kernel = node.attr("kernel_shape", w.shape[2:])
    strides = [int(s) for s in node.attr("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attr("dilations", [1] * spatial)]
    group = int(node.attr("group", 1))
    padding = _conv_padding(node, x.shape[2:], kernel, strides, dilations)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dimension_numbers(spatial),
        feature_group_count=group,
        precision=_fp32_precision(x),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return (out,)


@register("ConvTranspose")
def conv_transpose(ctx: LoweringContext, node: Node, ins):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    spatial = x.ndim - 2
    kernel = node.attr("kernel_shape", w.shape[2:])
    strides = [int(s) for s in node.attr("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attr("dilations", [1] * spatial)]
    group = int(node.attr("group", 1))
    pads = node.attr("pads", [0] * (2 * spatial))
    out_pads = node.attr("output_padding", [0] * spatial)
    # ONNX ConvTranspose == gradient of Conv: lhs-dilate input by stride,
    # pad with (eff_k - 1 - pad) on both sides, then stride-1 conv with
    # the kernel flipped and its I/O axes swapped (kernel layout is
    # [C_in, C_out/g, *k]; for groups the I/O swap happens WITHIN each
    # group, then feature_group_count carries the grouping).
    eff_k = [(int(k) - 1) * d + 1 for k, d in zip(kernel, dilations)]
    padding = [
        (ek - 1 - int(pads[i]), ek - 1 - int(pads[i + spatial]) + int(out_pads[i]))
        for i, ek in enumerate(eff_k)
    ]
    w_flip = jnp.flip(w, axis=tuple(range(2, 2 + spatial)))
    if group == 1:
        w_t = jnp.swapaxes(w_flip, 0, 1)
    else:
        cin, cog = w.shape[0], w.shape[1]
        wg = w_flip.reshape((group, cin // group, cog) + w.shape[2:])
        wg = jnp.swapaxes(wg, 1, 2)  # [g, C_out/g, C_in/g, *k]
        w_t = wg.reshape((group * cog, cin // group) + w.shape[2:])
    out = lax.conv_general_dilated(
        x,
        w_t,
        window_strides=[1] * spatial,
        padding=padding,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dimension_numbers(spatial),
        feature_group_count=group,
        precision=_fp32_precision(x),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return (out,)


# --------------------------------------------------------------------------
# Pooling
# --------------------------------------------------------------------------
def _pool(node: Node, x, init, reduce_fn, is_avg=False):
    spatial = x.ndim - 2
    kernel = [int(k) for k in node.attr("kernel_shape")]
    strides = [int(s) for s in node.attr("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attr("dilations", [1] * spatial)]
    ceil_mode = int(node.attr("ceil_mode", 0))
    padding = _conv_padding(node, x.shape[2:], kernel, strides, dilations)
    if ceil_mode:
        # extend end-padding so the last partial window is included
        new_pad = []
        for i, (lo, hi) in enumerate(padding):
            size = x.shape[2 + i]
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            out_ceil = -(-(size + lo + hi - eff_k) // strides[i]) + 1
            needed = (out_ceil - 1) * strides[i] + eff_k - (size + lo)
            new_pad.append((lo, max(hi, needed)))
        padding = new_pad
    window = (1, 1) + tuple(kernel)
    w_strides = (1, 1) + tuple(strides)
    w_dil = (1, 1) + tuple(dilations)
    full_pad = [(0, 0), (0, 0)] + padding
    out = lax.reduce_window(
        x, init, reduce_fn, window, w_strides, full_pad, window_dilation=w_dil
    )
    return out, padding, kernel, strides


@register("MaxPool")
def max_pool(ctx: LoweringContext, node: Node, ins):
    # (Reference equivalent: max_pool2d, src/inference_fp32_ops/max_pool_op.rs:157-360.)
    x = ins[0]
    if jnp.issubdtype(x.dtype, jnp.floating):
        dtype_min = jnp.array(-jnp.inf, dtype=x.dtype)
    else:
        dtype_min = jnp.array(jnp.iinfo(x.dtype).min, dtype=x.dtype)
    out, _, _, _ = _pool(node, x, dtype_min, lax.max)
    if len([o for o in node.outputs if o]) < 2:
        return (out,)
    return (out, _max_pool_indices(node, x, out.shape))


def _max_pool_indices(node: Node, x, out_shape):
    """ONNX MaxPool's second output: int64 flat indices into the WHOLE input
    tensor (row-major incl. the N and C strides), first-max tie-breaking.
    Computed from window patches: argmax per window -> (kh, kw) offset ->
    global position. 2-D spatial, storage_order=0 (row-major)."""
    if x.ndim != 4:
        raise UnsupportedOpError("MaxPool Indices: only 2-D spatial supported")
    if int(node.attr("storage_order", 0)):
        raise UnsupportedOpError("MaxPool Indices: storage_order=1 (col-major)")
    N, C, H, W = x.shape
    if N * C * H * W > np.iinfo(np.int32).max:
        # JAX runs without x64 here: int64 indices would silently truncate
        raise UnsupportedOpError(
            "MaxPool Indices: flat index range exceeds int32 (enable x64)")
    OH, OW = out_shape[2], out_shape[3]
    kh, kw = [int(k) for k in node.attr("kernel_shape")]
    sh, sw = [int(s) for s in node.attr("strides", [1, 1])]
    dh, dw = [int(d) for d in node.attr("dilations", [1, 1])]
    padding = _conv_padding(node, x.shape[2:], (kh, kw), (sh, sw), (dh, dw))
    (pt, pb), (pl, pr) = padding
    neg = (jnp.array(-jnp.inf, x.dtype)
           if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.array(jnp.iinfo(x.dtype).min, x.dtype))
    # pad enough for ceil_mode windows too
    need_h = (OH - 1) * sh + (kh - 1) * dh + 1 - (H + pt)
    need_w = (OW - 1) * sw + (kw - 1) * dw + 1 - (W + pl)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pt, max(pb, need_h)),
                     (pl, max(pr, need_w))), constant_values=neg)
    # gather each window's elements: [N, C, KH*KW, OH, OW]
    oh = jnp.arange(OH)[:, None, None, None] * sh
    ow = jnp.arange(OW)[None, :, None, None] * sw
    kh_i = jnp.arange(kh)[None, None, :, None] * dh
    kw_i = jnp.arange(kw)[None, None, None, :] * dw
    hs = (oh + kh_i)  # [OH, 1, KH, 1]
    ws = (ow + kw_i)  # [1, OW, 1, KW]
    win = xp[:, :, hs, ws]  # [N, C, OH, OW, KH, KW]
    win = win.reshape(N, C, OH, OW, kh * kw)
    off = jnp.argmax(win, axis=-1)  # first max, row-major in-window
    off_h = off // kw * dh
    off_w = off % kw * dw
    gh = jnp.arange(OH)[None, None, :, None] * sh - pt + off_h
    gw = jnp.arange(OW)[None, None, None, :] * sw - pl + off_w
    base = (jnp.arange(N)[:, None, None, None] * C
            + jnp.arange(C)[None, :, None, None]) * (H * W)
    # ONNX mandates int64 Indices; under JAX's default x64-disabled config
    # this lands as int32 on device (values are range-guarded so they fit).
    # The host boundary (InferenceResult) widens to int64 for consumers
    # that check the dtype — same policy as ArgMax/TopK/Shape.
    return (base + gh * W + gw).astype(_idt())


@register("MaxUnpool")
def max_unpool(ctx: LoweringContext, node: Node, ins):
    """Scatter pooled values back to their MaxPool positions (SegNet-style
    unpooling). Indices follow the ONNX whole-tensor flat convention."""
    x, idx = ins[0], ins[1]
    if len(ins) > 2 and ins[2] is not None:
        out_shape = tuple(int(v) for v in
                          ctx.require_constant(node.inputs[2],
                                               "MaxUnpool output_shape"))
    else:
        kh, kw = [int(k) for k in node.attr("kernel_shape")]
        sh, sw = [int(s) for s in node.attr("strides", [1, 1])]
        pads = [int(p) for p in node.attr("pads", [0, 0, 0, 0])]
        N, C, OH, OW = x.shape
        out_shape = (N, C, (OH - 1) * sh + kh - pads[0] - pads[2],
                     (OW - 1) * sw + kw - pads[1] - pads[3])
    total = int(np.prod(out_shape))
    flat = jnp.zeros((total,), x.dtype).at[idx.reshape(-1)].set(x.reshape(-1))
    return (flat.reshape(out_shape),)


@register("AveragePool")
def average_pool(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    count_include_pad = int(node.attr("count_include_pad", 0))
    out, padding, kernel, strides = _pool(node, x, 0.0, lax.add, is_avg=True)
    if count_include_pad or not any(lo or hi for lo, hi in padding):
        out = out / math.prod(kernel)
    else:
        ones = jnp.ones((1, 1) + x.shape[2:], dtype=x.dtype)
        counts = lax.reduce_window(
            ones, 0.0, lax.add,
            (1, 1) + tuple(kernel), (1, 1) + tuple(strides),
            [(0, 0), (0, 0)] + padding,
        )
        out = out / counts
    return (out,)


@register("GlobalAveragePool")
def global_average_pool(ctx: LoweringContext, node: Node, ins):
    # (Reference: src/inference_fp32_ops/global_average_pool_op.rs:33-52.)
    x = ins[0]
    return (jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True),)


@register("GlobalMaxPool")
def global_max_pool(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    return (jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True),)


# --------------------------------------------------------------------------
# Matmul / Gemm
# --------------------------------------------------------------------------
@register("MatMul")
def matmul(ctx: LoweringContext, node: Node, ins):
    # (Reference: src/inference_fp32_ops/mul_op.rs — 2-D only; this is N-D.)
    a, b = ins
    out = jnp.matmul(a, b, precision=_fp32_precision(a),
                     preferred_element_type=_accum_dtype(a))
    # ONNX MatMul output dtype == input dtype; the fp32 accumulation stays
    # on the MXU and only the epilogue casts (fp16/bf16 inputs)
    return (out.astype(a.dtype) if a.dtype != out.dtype else out,)


def _accum_dtype(a):
    return jnp.float32 if a.dtype in (jnp.float32, jnp.bfloat16, jnp.float16) else None


@register("Gemm")
def gemm(ctx: LoweringContext, node: Node, ins):
    a, b = ins[0], ins[1]
    c = ins[2] if len(ins) > 2 else None
    alpha = float(node.attr("alpha", 1.0))
    beta = float(node.attr("beta", 1.0))
    if int(node.attr("transA", 0)):
        a = a.T
    if int(node.attr("transB", 0)):
        b = b.T
    out = alpha * jnp.matmul(a, b, precision=_fp32_precision(a),
                             preferred_element_type=_accum_dtype(a))
    if c is not None and beta != 0.0:
        out = out + beta * c
    return (out.astype(a.dtype),)


@register("Einsum")
def einsum(ctx: LoweringContext, node: Node, ins):
    eq = node.attr("equation")
    return (jnp.einsum(eq, *ins),)


# --------------------------------------------------------------------------
# Elementwise (binary, with numpy broadcasting)
# --------------------------------------------------------------------------
def _binary(fn):
    def emit(ctx, node, ins):
        return (fn(ins[0], ins[1]),)
    return emit


register("Add")(_binary(jnp.add))        # reference: add_op.rs
register("Sub")(_binary(jnp.subtract))
register("Mul")(_binary(jnp.multiply))
register("Div")(_binary(jnp.divide))
register("Pow")(_binary(jnp.power))
register("Equal")(_binary(jnp.equal))
register("Greater")(_binary(jnp.greater))
register("GreaterOrEqual")(_binary(jnp.greater_equal))
register("Less")(_binary(jnp.less))
register("LessOrEqual")(_binary(jnp.less_equal))
register("And")(_binary(jnp.logical_and))
register("Or")(_binary(jnp.logical_or))
register("Xor")(_binary(jnp.logical_xor))
register("BitwiseAnd")(_binary(jnp.bitwise_and))
register("BitwiseOr")(_binary(jnp.bitwise_or))
@register("Mod")
def mod(ctx, node, ins):
    a, b = ins
    # fmod=1: C fmod (sign follows the dividend); fmod=0: Python-style
    if int(node.attr("fmod", 0)):
        return (jnp.fmod(a, b),)
    return (jnp.mod(a, b),)


@register("Min")
def op_min(ctx, node, ins):
    out = ins[0]
    for x in ins[1:]:
        out = jnp.minimum(out, x)
    return (out,)


@register("Max")
def op_max(ctx, node, ins):
    out = ins[0]
    for x in ins[1:]:
        out = jnp.maximum(out, x)
    return (out,)


@register("Sum")
def op_sum(ctx, node, ins):
    out = ins[0]
    for x in ins[1:]:
        out = out + x
    return (out,)


@register("Mean")
def op_mean(ctx, node, ins):
    return (sum(ins[1:], start=ins[0]) / len(ins),)


# --------------------------------------------------------------------------
# Elementwise (unary)
# --------------------------------------------------------------------------
def _unary(fn):
    def emit(ctx, node, ins):
        return (fn(ins[0]),)
    return emit


register("Relu")(_unary(lambda x: jnp.maximum(x, 0)))  # reference: relu_op.rs:31-33
register("Sigmoid")(_unary(jax.nn.sigmoid))
register("Tanh")(_unary(jnp.tanh))
register("Exp")(_unary(jnp.exp))
register("Log")(_unary(jnp.log))
register("Sqrt")(_unary(jnp.sqrt))
register("Reciprocal")(_unary(lambda x: 1.0 / x))
register("Neg")(_unary(jnp.negative))
register("Abs")(_unary(jnp.abs))
register("Floor")(_unary(jnp.floor))
register("Ceil")(_unary(jnp.ceil))
register("Round")(_unary(jnp.round))
register("Sign")(_unary(jnp.sign))
register("Erf")(_unary(jax.scipy.special.erf))
register("Not")(_unary(jnp.logical_not))
register("Softplus")(_unary(jax.nn.softplus))
register("Softsign")(_unary(jax.nn.soft_sign))
register("Sin")(_unary(jnp.sin))
register("Cos")(_unary(jnp.cos))
register("IsNaN")(_unary(jnp.isnan))
@register("IsInf")
def is_inf(ctx, node, ins):
    x = ins[0]
    pos = bool(int(node.attr("detect_positive", 1)))
    neg = bool(int(node.attr("detect_negative", 1)))
    out = jnp.isinf(x)
    if pos and not neg:
        out = out & (x > 0)
    elif neg and not pos:
        out = out & (x < 0)
    elif not pos and not neg:
        out = jnp.zeros_like(out)
    return (out,)


@register("LeakyRelu")
def leaky_relu(ctx, node, ins):
    alpha = float(node.attr("alpha", 0.01))
    return (jax.nn.leaky_relu(ins[0], alpha),)


@register("Elu")
def elu(ctx, node, ins):
    alpha = float(node.attr("alpha", 1.0))
    return (jax.nn.elu(ins[0], alpha),)


@register("Selu")
def selu(ctx, node, ins):
    return (jax.nn.selu(ins[0]),)


@register("HardSigmoid")
def hard_sigmoid(ctx, node, ins):
    alpha = float(node.attr("alpha", 0.2))
    beta = float(node.attr("beta", 0.5))
    return (jnp.clip(alpha * ins[0] + beta, 0.0, 1.0),)


@register("Gelu")
def gelu(ctx, node, ins):
    a = node.attr("approximate", "none")
    if isinstance(a, bytes):  # wire-parsed string attrs arrive as bytes
        a = a.decode()
    return (jax.nn.gelu(ins[0], approximate=a == "tanh"),)


@register("Clip")
def clip(ctx, node, ins):
    x = ins[0]
    lo = node.attr("min")
    hi = node.attr("max")
    if lo is None and len(ins) > 1 and ins[1] is not None:
        lo = ins[1]
    if hi is None and len(ins) > 2 and ins[2] is not None:
        hi = ins[2]
    return (jnp.clip(x, lo, hi),)


@register("PRelu")
def prelu(ctx, node, ins):
    x, slope = ins
    return (jnp.where(x >= 0, x, x * slope),)


@register("Where")
def where(ctx, node, ins):
    return (jnp.where(ins[0], ins[1], ins[2]),)


@register("Cast")
def cast(ctx, node, ins):
    to = onnx_io.DTYPE_TO_NUMPY[int(node.attr("to"))]
    return (ins[0].astype(to),)


@register("CastLike")
def cast_like(ctx, node, ins):
    return (ins[0].astype(ins[1].dtype),)


# --------------------------------------------------------------------------
# Softmax family
# --------------------------------------------------------------------------
def _softmax_axis(ctx, node, x):
    default = 1 if ctx.opset < 13 else -1
    return int(node.attr("axis", default))


@register("Softmax")
def softmax(ctx: LoweringContext, node: Node, ins):
    # Opset <13 semantics: flatten to 2-D at `axis`, softmax over the tail.
    # (The reference hardcodes the flatten-all-trailing form:
    # src/inference_fp32_ops/softmax_op.rs:46-56.)
    x = ins[0]
    axis = _softmax_axis(ctx, node, x)
    if ctx.opset < 13:
        ax = axis % x.ndim
        lead = math.prod(x.shape[:ax]) if ax else 1
        flat = x.reshape(lead, -1)
        out = jax.nn.softmax(flat, axis=-1).reshape(x.shape)
        return (out,)
    return (jax.nn.softmax(x, axis=axis),)


@register("LogSoftmax")
def log_softmax(ctx, node, ins):
    x = ins[0]
    axis = _softmax_axis(ctx, node, x)
    if ctx.opset < 13:
        ax = axis % x.ndim
        lead = math.prod(x.shape[:ax]) if ax else 1
        flat = x.reshape(lead, -1)
        return (jax.nn.log_softmax(flat, axis=-1).reshape(x.shape),)
    return (jax.nn.log_softmax(x, axis=axis),)


# --------------------------------------------------------------------------
# Shape manipulation
# --------------------------------------------------------------------------
@register("Reshape")
def reshape(ctx: LoweringContext, node: Node, ins):
    # (Reference: src/inference_fp32_ops/reshape_op.rs — 4D→2D only; this is full spec.)
    x = ins[0]
    shape = ctx.require_constant(node.inputs[1], "Reshape shape")
    tgt = list(_resolve_reshape(x.shape, shape, allowzero=int(node.attr("allowzero", 0))))
    # Batch polymorphism: ONNX exports bake the batch size into Reshape
    # targets (e.g. MNIST's [1, 256]). When the element counts disagree and
    # the tail divides evenly, treat the leading dim as the batch dim.
    total = math.prod(x.shape)
    if math.prod(tgt) != total and -1 not in tgt:
        tail = math.prod(tgt[1:])
        if tail > 0 and total % tail == 0:
            tgt[0] = total // tail
    return (jnp.reshape(x, tuple(tgt)),)


@register("Flatten")
def flatten(ctx, node, ins):
    x = ins[0]
    ax = int(node.attr("axis", 1)) % (x.ndim + 1)
    return (jnp.reshape(x, (math.prod(x.shape[:ax]) if ax else 1, -1)),)


@register("Transpose")
def transpose(ctx, node, ins):
    x = ins[0]
    perm = node.attr("perm", list(reversed(range(x.ndim))))
    return (jnp.transpose(x, perm),)


@register("Concat")
def concat(ctx, node, ins):
    # N-ary per spec (reference caps at 2 inputs: concatenate_op.rs:15-18).
    return (jnp.concatenate(ins, axis=int(node.attr("axis", 1))),)


@register("Split")
def split(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    axis = int(node.attr("axis", 0))
    sizes = node.attr("split")
    if sizes is None and len(ins) > 1 and ins[1] is not None:
        sizes = ctx.require_constant(node.inputs[1], "Split sizes").tolist()
    n_out = len(node.outputs)
    if sizes is None:
        sizes = [x.shape[axis] // n_out] * n_out
    bounds = np.cumsum(sizes)[:-1].tolist()
    return tuple(jnp.split(x, bounds, axis=axis))


@register("Squeeze")
def squeeze(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    axes = node.attr("axes")
    if axes is None and len(ins) > 1 and node.inputs[1]:
        axes = ctx.require_constant(node.inputs[1], "Squeeze axes").tolist()
    if axes is None:
        return (jnp.squeeze(x),)
    return (jnp.squeeze(x, axis=tuple(int(a) % x.ndim for a in axes)),)


@register("Unsqueeze")
def unsqueeze(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    axes = node.attr("axes")
    if axes is None:
        axes = ctx.require_constant(node.inputs[1], "Unsqueeze axes").tolist()
    out = x
    for ax in sorted(int(a) for a in axes):
        out = jnp.expand_dims(out, ax if ax >= 0 else ax + out.ndim + 1)
    return (out,)


@register("Expand")
def expand(ctx: LoweringContext, node: Node, ins):
    from ..graph import _broadcast_expand
    x = ins[0]
    shape = np.asarray(ctx.require_constant(node.inputs[1], "Expand shape"))
    # Batch polymorphism (same convention as Reshape above): exports bake
    # the batch size into Expand targets; when ranks match and the leading
    # dims disagree without either being broadcastable-1, follow the
    # runtime batch (e.g. pipeline microbatching slices the batch dim).
    # Gated on the trace actually being batch-polymorphic — at the
    # declared batch a mismatch is an invalid Expand and must error.
    if (ctx.batch_polymorphic
            and len(shape) == x.ndim and x.shape[0] != 1 and shape[0] != 1
            and int(shape[0]) != x.shape[0]):
        shape = shape.copy()
        shape[0] = x.shape[0]
    return (jnp.broadcast_to(x, _broadcast_expand(x.shape, shape)),)


@register("Tile")
def tile(ctx: LoweringContext, node: Node, ins):
    reps = ctx.require_constant(node.inputs[1], "Tile repeats")
    return (jnp.tile(ins[0], tuple(int(r) for r in reps)),)


@register("Slice")
def slice_op(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    if ctx.opset >= 10 or len(node.inputs) > 1:
        starts = ctx.require_constant(node.inputs[1], "Slice starts").tolist()
        ends = ctx.require_constant(node.inputs[2], "Slice ends").tolist()
        axes = (ctx.require_constant(node.inputs[3], "Slice axes").tolist()
                if len(node.inputs) > 3 and node.inputs[3] else list(range(len(starts))))
        steps = (ctx.require_constant(node.inputs[4], "Slice steps").tolist()
                 if len(node.inputs) > 4 and node.inputs[4] else [1] * len(starts))
    else:
        starts = [int(v) for v in node.attr("starts")]
        ends = [int(v) for v in node.attr("ends")]
        axes = [int(v) for v in (node.attr("axes") or range(len(starts)))]
        steps = [1] * len(starts)
    sl = [slice(None)] * x.ndim
    for ax, st, en, sp in zip(axes, starts, ends, steps):
        sl[int(ax)] = slice(int(st), int(en), int(sp))
    return (x[tuple(sl)],)


def _wrap_indices(idx, dim: int):
    """ONNX negative-index wrap. Combined with mode="clip" below, an
    out-of-range index (undefined per the ONNX spec) clamps to the edge
    instead of producing JAX's fill-mode NaN — NaN here is a time bomb:
    one NaN row scatter-matmuled into a KV cache poisons every later
    attention over it (-1e9 masking cannot mask NaN), which is exactly
    how parked decode slots broke multi-round speculation on chip."""
    idx = idx.astype(jnp.int32)
    return jnp.where(idx < 0, idx + dim, idx)


@register("Gather")
def gather(ctx, node, ins):
    x, idx = ins
    axis = int(node.attr("axis", 0))
    return (jnp.take(x, _wrap_indices(idx, x.shape[axis]), axis=axis,
                     mode="clip"),)


@register("GatherElements")
def gather_elements(ctx, node, ins):
    x, idx = ins
    axis = int(node.attr("axis", 0))
    return (jnp.take_along_axis(x, _wrap_indices(idx, x.shape[axis]),
                                axis=axis, mode="clip"),)


@register("ScatterND")
def scatter_nd(ctx, node, ins):
    data, indices, updates = ins
    red = node.attr("reduction", "none")
    red = red.decode() if isinstance(red, bytes) else str(red)
    at = data.at[tuple(jnp.moveaxis(indices, -1, 0))]
    ops = {"none": at.set, "add": at.add, "mul": at.multiply,
           "max": at.max, "min": at.min}
    if red not in ops:
        raise UnsupportedOpError(f"ScatterND reduction {red!r}")
    return (ops[red](updates),)


def _shape_slice(node: Node, rank: int):
    """Shape-15 start/end attrs -> a python slice over the dims.

    Spec semantics: negatives count from the end, then CLAMP to [0, rank]
    (exporters emit sentinels like end=INT64_MAX meaning "to the end");
    start >= end yields an empty result."""

    def norm(v, default):
        if v is None:
            return default
        v = int(v)
        if v < 0:
            v += rank
        return max(0, min(rank, v))

    return slice(norm(node.attr("start"), 0), norm(node.attr("end"), rank))


@register("Shape")
def shape_op(ctx, node, ins):
    dims = ins[0].shape[_shape_slice(node, ins[0].ndim)]
    return (jnp.asarray(dims, dtype=_idt()),)


@register("Size")
def size_op(ctx, node, ins):
    return (jnp.asarray(ins[0].size, dtype=_idt()),)


@register("Identity")
def identity(ctx, node, ins):
    return (ins[0],)


@register("Dropout")
def dropout(ctx, node, ins):
    # Inference mode: identity; mask output (if requested) is all-true.
    # (Reference: src/inference_fp32_ops/dropout_op.rs:66-71 — same no-op,
    # but its mask output is an unimplemented TODO, dropout_op.rs:35-41.)
    outs = [ins[0]]
    if len(node.outputs) > 1 and node.outputs[1]:
        outs.append(jnp.ones(ins[0].shape, dtype=jnp.bool_))
    return tuple(outs)


@register("Constant")
def constant_node(ctx: LoweringContext, node: Node, ins):
    for key in ("value", "value_float", "value_int", "value_floats", "value_ints"):
        if key in node.attrs:
            return (jnp.asarray(node.attrs[key]),)
    raise UnsupportedOpError("Constant node without a supported value attribute")


@register("ConstantOfShape")
def constant_of_shape(ctx: LoweringContext, node: Node, ins):
    shape = ctx.require_constant(node.inputs[0], "ConstantOfShape shape")
    val = node.attr("value")
    fill = val.reshape(-1)[0] if isinstance(val, np.ndarray) else np.float32(0)
    return (jnp.full(tuple(int(d) for d in shape), fill),)


@register("Pad")
def pad(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    mode = node.attr("mode", "constant")
    if ctx.opset >= 11 or len(node.inputs) > 1:
        pads = ctx.require_constant(node.inputs[1], "Pad pads").tolist()
        cval = ins[2] if len(ins) > 2 and ins[2] is not None else 0.0
    else:
        pads = [int(p) for p in node.attr("pads")]
        cval = float(node.attr("value", 0.0))
    n = x.ndim
    pad_width = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    if any(lo < 0 or hi < 0 for lo, hi in pad_width):
        # ONNX allows negative pads = cropping; slice those off first.
        # Over-cropping clamps to an empty axis rather than wrapping.
        def stops(i, lo, hi):
            start = min(max(0, -lo), x.shape[i])
            return slice(start, max(start, x.shape[i] - max(0, -hi)))

        x = x[tuple(stops(i, lo, hi)
                    for i, (lo, hi) in enumerate(pad_width))]
        pad_width = [(max(0, lo), max(0, hi)) for lo, hi in pad_width]
    if mode == "constant":
        return (jnp.pad(x, pad_width, constant_values=cval),)
    jmode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
    return (jnp.pad(x, pad_width, mode=jmode),)


# --------------------------------------------------------------------------
# Reductions / argmax
# --------------------------------------------------------------------------
def _reduce(fn):
    def emit(ctx: LoweringContext, node: Node, ins):
        x = ins[0]
        axes = node.attr("axes")
        if axes is None and len(ins) > 1 and ins[1] is not None:
            axes = ctx.require_constant(node.inputs[1], "Reduce axes").tolist()
        keepdims = bool(int(node.attr("keepdims", 1)))
        if axes is None:
            if int(node.attr("noop_with_empty_axes", 0)):
                return (x,)
            axes_t = None
        else:
            axes_t = tuple(int(a) % x.ndim for a in axes)
        return (fn(x, axis=axes_t, keepdims=keepdims),)
    return emit


register("ReduceMean")(_reduce(jnp.mean))
register("ReduceSum")(_reduce(jnp.sum))
register("ReduceMax")(_reduce(jnp.max))
register("ReduceMin")(_reduce(jnp.min))
register("ReduceProd")(_reduce(jnp.prod))
register("ReduceL2")(_reduce(lambda x, axis, keepdims: jnp.sqrt(
    jnp.sum(x * x, axis=axis, keepdims=keepdims))))
register("ReduceL1")(_reduce(lambda x, axis, keepdims: jnp.sum(
    jnp.abs(x), axis=axis, keepdims=keepdims)))
register("ReduceLogSumExp")(_reduce(lambda x, axis, keepdims: jax.scipy.special.logsumexp(
    x, axis=axis, keepdims=keepdims)))
register("ReduceSumSquare")(_reduce(lambda x, axis, keepdims: jnp.sum(
    x * x, axis=axis, keepdims=keepdims)))


def _arg_reduce(fn):
    def emit(ctx, node, ins):
        x = ins[0]
        axis = int(node.attr("axis", 0))
        keepdims = bool(int(node.attr("keepdims", 1)))
        if int(node.attr("select_last_index", 0)):
            # ONNX: ties resolve to the LAST occurrence; argmax/argmin give
            # the first, so run on the reversed axis and re-map the index
            rev = jnp.flip(x, axis)
            out = (x.shape[axis] - 1 - fn(rev, axis=axis)).astype(_idt())
        else:
            out = fn(x, axis=axis).astype(_idt())
        if keepdims:
            out = jnp.expand_dims(out, axis)
        return (out,)
    return emit


register("ArgMax")(_arg_reduce(jnp.argmax))
register("ArgMin")(_arg_reduce(jnp.argmin))


@register("TopK")
def topk(ctx: LoweringContext, node: Node, ins):
    x = ins[0]
    if len(ins) > 1 and ins[1] is not None:
        k = int(ctx.require_constant(node.inputs[1], "TopK k").reshape(-1)[0])
    else:
        k = int(node.attr("k"))
    axis = int(node.attr("axis", -1))
    largest = int(node.attr("largest", 1))
    x_m = jnp.moveaxis(x, axis, -1) if axis not in (-1, x.ndim - 1) else x
    if largest:
        v, i = lax.top_k(x_m, k)
    else:  # smallest-k, ascending (lax.top_k of the negation)
        v, i = lax.top_k(-x_m, k)
        v = -v
    if axis not in (-1, x.ndim - 1):
        v = jnp.moveaxis(v, -1, axis)
        i = jnp.moveaxis(i, -1, axis)
    return (v, i.astype(_idt()))


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------
@register("BatchNormalization")
def batch_norm(ctx, node, ins):
    x, scale, bias, mean, var = ins[:5]
    eps = float(node.attr("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    return ((x - mean.reshape(shape)) * (scale * inv).reshape(shape) + bias.reshape(shape),)


@register("LayerNormalization")
def layer_norm(ctx, node, ins):
    x = ins[0]
    scale = ins[1]
    bias = ins[2] if len(ins) > 2 else None
    axis = int(node.attr("axis", -1))
    eps = float(node.attr("epsilon", 1e-5))
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    return (out,)


@register("InstanceNormalization")
def instance_norm(ctx, node, ins):
    x, scale, bias = ins
    eps = float(node.attr("epsilon", 1e-5))
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) * lax.rsqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape),)


@register("LRN")
def lrn(ctx, node, ins):
    x = ins[0]
    size = int(node.attr("size"))
    alpha = float(node.attr("alpha", 1e-4))
    beta = float(node.attr("beta", 0.75))
    bias = float(node.attr("bias", 1.0))
    sq = jnp.square(x)
    lo = (size - 1) // 2
    hi = size - 1 - lo
    window = (1, size) + (1,) * (x.ndim - 2)
    sums = lax.reduce_window(
        sq, 0.0, lax.add, window, (1,) * x.ndim,
        [(0, 0), (lo, hi)] + [(0, 0)] * (x.ndim - 2),
    )
    return (x / jnp.power(bias + (alpha / size) * sums, beta),)


# --------------------------------------------------------------------------
# Misc
# --------------------------------------------------------------------------
@register("Resize", "Upsample")
def resize(ctx: LoweringContext, node: Node, ins):
    """Resize (opset 10+) / Upsample (opset 7-9): nearest + linear modes with
    the common coordinate transforms (asymmetric, half_pixel, align_corners)."""
    x = ins[0]
    mode = node.attr("mode", "nearest")
    coord = node.attr("coordinate_transformation_mode", "half_pixel")

    out_shape = None
    if node.op_type == "Upsample":
        scales = (node.attr("scales")
                  or ctx.require_constant(node.inputs[1], "Upsample scales"))
        scales = np.asarray(scales, dtype=np.float64).reshape(-1)
        coord = "asymmetric"
    else:
        scales = None
        if len(node.inputs) > 2 and node.inputs[2]:
            s = ctx.constant(node.inputs[2])
            if s is not None and s.size:
                scales = np.asarray(s, np.float64).reshape(-1)
        if scales is None and len(node.inputs) > 3 and node.inputs[3]:
            sizes = ctx.require_constant(node.inputs[3], "Resize sizes")
            out_shape = tuple(int(v) for v in sizes.reshape(-1))
    if out_shape is None:
        if scales is None:
            raise UnsupportedOpError("Resize needs static scales or sizes")
        out_shape = tuple(int(np.floor(d * s))
                          for d, s in zip(x.shape, scales))
    # the spec's coordinate transforms are defined in terms of the SCALE,
    # which differs from do/di whenever floor(di*scale) != di*scale
    axis_scales = (tuple(float(v) for v in scales) if scales is not None
                   else tuple(do / di for do, di in zip(out_shape, x.shape)))
    if node.op_type == "Upsample" or ctx.opset < 11:
        coord = "asymmetric"  # opset-10 Resize / Upsample semantics

    if mode in (b"nearest", "nearest"):
        method = "nearest"
    elif mode in (b"linear", "linear"):
        method = "linear"
    elif mode in (b"cubic", "cubic"):
        method = "cubic"
    else:
        raise UnsupportedOpError(f"Resize mode {mode!r}")

    if method == "nearest":
        # exact ONNX nearest: coordinate transform + nearest_mode rounding
        nm = node.attr("nearest_mode", "round_prefer_floor")
        nm = nm.decode() if isinstance(nm, bytes) else str(nm)
        if node.op_type == "Upsample" or ctx.opset < 11:
            nm = "floor"  # legacy semantics
        out = x
        for ax, (do, di) in enumerate(zip(out_shape, x.shape)):
            if do == di:
                continue
            src = _resize_src(np.arange(do, dtype=np.float64), di, do,
                              axis_scales[ax], coord)
            if nm == "floor":
                idx = np.floor(src)
            elif nm == "ceil":
                idx = np.ceil(src)
            elif nm == "round_prefer_ceil":
                idx = np.floor(src + 0.5)
            elif nm == "round_prefer_floor":
                idx = np.ceil(src - 0.5)
            else:
                raise UnsupportedOpError(f"Resize nearest_mode {nm!r}")
            idx = np.clip(idx, 0, di - 1).astype(np.int32)
            out = jnp.take(out, jnp.asarray(idx), axis=ax)
        return (out,)
    if method == "linear":
        # separable per-axis gather-lerp with the exact ONNX coordinate
        # transform (jax.image.resize only implements half_pixel)
        out = x.astype(jnp.float32)
        for ax, (do, di) in enumerate(zip(out_shape, x.shape)):
            if do != di:
                out = _resize_linear_axis(out, ax, do, axis_scales[ax],
                                          coord)
        return (out.astype(x.dtype),)
    # cubic path: jax.image.resize implements ONLY half_pixel semantics —
    # reject other coordinate transforms instead of silently mis-resampling
    if coord != "half_pixel":
        raise UnsupportedOpError(
            f"Resize mode=cubic with coordinate_transformation_mode="
            f"{coord!r} not supported (only half_pixel)")
    out = jax.image.resize(x, out_shape, method=method)
    return (out.astype(x.dtype),)


def _resize_src(i, di: int, do: int, scale: float, coord: str):
    """Output index -> source coordinate per coordinate_transformation_mode
    (spec formulas are in terms of the SCALE; works on numpy or jnp
    index vectors)."""
    if coord == "align_corners":
        return i * ((di - 1) / max(do - 1, 1))
    if coord == "asymmetric":
        return i / scale
    if coord == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if do > 1 else i * 0.0
    if coord == "half_pixel":
        return (i + 0.5) / scale - 0.5
    if coord == "half_pixel_symmetric":
        adjustment = do / (scale * di)
        offset = di / 2 * (1 - adjustment)
        return offset + (i + 0.5) / scale - 0.5
    raise UnsupportedOpError(
        f"Resize: coordinate_transformation_mode {coord!r} not supported")


def _resize_linear_axis(x, ax: int, do: int, scale: float, coord: str):
    """1-D linear interpolation along `ax` to length `do` under an ONNX
    coordinate_transformation_mode."""
    di = x.shape[ax]
    src = _resize_src(jnp.arange(do, dtype=jnp.float32), di, do, scale,
                      coord)
    src = jnp.clip(src, 0.0, di - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, di - 1)
    w = src - lo
    shape = [1] * x.ndim
    shape[ax] = do
    w = w.reshape(shape)
    return (jnp.take(x, lo, axis=ax) * (1 - w)
            + jnp.take(x, hi, axis=ax) * w)


@register("Range")
def range_op(ctx: LoweringContext, node: Node, ins):
    start = ctx.require_constant(node.inputs[0], "Range start").item()
    limit = ctx.require_constant(node.inputs[1], "Range limit").item()
    delta = ctx.require_constant(node.inputs[2], "Range delta").item()
    return (jnp.arange(start, limit, delta),)


@register("Trilu")
def trilu(ctx, node, ins):
    x = ins[0]
    k = 0
    if len(node.inputs) > 1 and node.inputs[1]:
        # jnp.triu/tril need a static diagonal offset
        k = int(ctx.require_constant(node.inputs[1], "Trilu k").reshape(()))
    upper = int(node.attr("upper", 1))
    return ((jnp.triu(x, k) if upper else jnp.tril(x, k)),)


@register("OneHot")
def one_hot(ctx: LoweringContext, node: Node, ins):
    indices, depth, values = ins
    d = int(ctx.require_constant(node.inputs[1], "OneHot depth").reshape(-1)[0])
    axis = int(node.attr("axis", -1))
    off, on = values[0], values[1]
    oh = jax.nn.one_hot(indices.astype(jnp.int32), d, axis=axis)
    return ((oh * (on - off) + off).astype(values.dtype),)


# --------------------------------------------------------------------------
# Extended coverage: activations, block layout, norms, indexing
# --------------------------------------------------------------------------
register("HardSwish")(_unary(
    lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)))
register("Mish")(_unary(lambda x: x * jnp.tanh(jax.nn.softplus(x))))


@register("Celu")
def celu(ctx, node, ins):
    a = float(node.attr("alpha", 1.0))
    x = ins[0]
    return (jnp.maximum(x, 0) + jnp.minimum(0.0, a * (jnp.exp(x / a) - 1)),)


@register("ThresholdedRelu")
def thresholded_relu(ctx, node, ins):
    a = float(node.attr("alpha", 1.0))
    return (jnp.where(ins[0] > a, ins[0], 0.0).astype(ins[0].dtype),)


@register("Shrink")
def shrink(ctx, node, ins):
    lambd = float(node.attr("lambd", 0.5))
    bias = float(node.attr("bias", 0.0))
    x = ins[0]
    return (jnp.where(x < -lambd, x + bias,
                      jnp.where(x > lambd, x - bias, 0.0)).astype(x.dtype),)


@register("Hardmax")
def hardmax(ctx, node, ins):
    x = ins[0]
    axis = int(node.attr("axis", 1 if ctx.opset < 13 else -1))
    idx = jnp.argmax(x, axis=axis)
    return (jax.nn.one_hot(idx, x.shape[axis], axis=axis, dtype=x.dtype),)


@register("BitShift")
def bit_shift(ctx, node, ins):
    x, y = ins
    d = node.attr("direction", b"LEFT")
    d = d.decode() if isinstance(d, bytes) else str(d)
    return ((x << y) if d.upper() == "LEFT" else (x >> y),)


@register("EyeLike")
def eye_like(ctx, node, ins):
    x = ins[0]
    k = int(node.attr("k", 0))
    to = node.attr("dtype")
    dt = onnx_io.DTYPE_TO_NUMPY[int(to)] if to is not None else x.dtype
    return (jnp.eye(x.shape[0], x.shape[1], k=k, dtype=dt),)


@register("SpaceToDepth")
def space_to_depth(ctx, node, ins):
    x = ins[0]
    bs = int(node.attr("blocksize"))
    N, C, H, W = x.shape
    y = x.reshape(N, C, H // bs, bs, W // bs, bs)
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    return (y.reshape(N, C * bs * bs, H // bs, W // bs),)


@register("DepthToSpace")
def depth_to_space(ctx, node, ins):
    x = ins[0]
    bs = int(node.attr("blocksize"))
    mode = node.attr("mode", b"DCR")
    mode = mode.decode() if isinstance(mode, bytes) else str(mode)
    N, C, H, W = x.shape
    if mode == "DCR":
        y = x.reshape(N, bs, bs, C // (bs * bs), H, W)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        y = x.reshape(N, C // (bs * bs), bs, bs, H, W)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return (y.reshape(N, C // (bs * bs), H * bs, W * bs),)


@register("MeanVarianceNormalization")
def mean_variance_normalization(ctx, node, ins):
    x = ins[0]
    axes = tuple(int(a) for a in node.attr("axes", [0, 2, 3]))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=axes, keepdims=True))
    return ((x - mean) / (std + 1e-9),)


@register("GroupNormalization")
def group_normalization(ctx, node, ins):
    x, scale, bias = ins[0], ins[1], ins[2]
    eps = float(node.attr("epsilon", 1e-5))
    g = int(node.attr("num_groups"))
    N, C = x.shape[0], x.shape[1]
    xg = x.reshape(N, g, C // g, *x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xn = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    shape = (1, C) + (1,) * (x.ndim - 2)
    # opset 18 semantics: per-channel scale/bias (stash_type fp32)
    if scale.size == g:  # opset 18 draft semantics: per-group
        scale = jnp.repeat(scale, C // g)
        bias = jnp.repeat(bias, C // g)
    return (xn * scale.reshape(shape) + bias.reshape(shape),)


@register("RMSNormalization", "SimplifiedLayerNormalization")
def rms_normalization(ctx, node, ins):
    x, scale = ins[0], ins[1]
    axis = int(node.attr("axis", -1))
    eps = float(node.attr("epsilon", 1e-5))
    axes = tuple(range(axis % x.ndim, x.ndim))
    ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=axes, keepdims=True)
    return ((x * jax.lax.rsqrt(ms + eps).astype(x.dtype)) * scale,)


@register("GatherND")
def gather_nd(ctx, node, ins):
    data, indices = ins
    b = int(node.attr("batch_dims", 0))
    idx = indices.astype(jnp.int32)

    def gather_one(d, i):
        k = i.shape[-1]
        flat = i.reshape(-1, k)
        out = d[tuple(flat[:, j] for j in range(k))]
        return out.reshape(i.shape[:-1] + d.shape[k:])

    fn = gather_one
    for _ in range(b):
        fn = jax.vmap(fn)
    return (fn(data, idx),)


@register("ScatterElements")
def scatter_elements(ctx, node, ins):
    data, indices, updates = ins
    axis = int(node.attr("axis", 0))
    red = node.attr("reduction", b"none")
    red = red.decode() if isinstance(red, bytes) else str(red)
    idx = indices.astype(jnp.int32)
    # build full index grids: scatter along `axis` with elementwise indices
    grids = jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing="ij")
    grids[axis] = idx
    at = data.at[tuple(grids)]
    ops = {"none": at.set, "add": at.add, "mul": at.multiply,
           "max": at.max, "min": at.min}
    return (ops[red](updates),)


@register("CumSum")
def cumsum(ctx, node, ins):
    x = ins[0]
    axis = int(ctx.require_constant(node.inputs[1], "CumSum axis").reshape(()))
    exclusive = int(node.attr("exclusive", 0))
    reverse = int(node.attr("reverse", 0))
    if reverse:
        x = jnp.flip(x, axis)
    y = jnp.cumsum(x, axis=axis, dtype=x.dtype)
    if exclusive:
        y = y - x
    if reverse:
        y = jnp.flip(y, axis)
    return (y,)


@register("GridSample")
def grid_sample(ctx, node, ins):
    """2-D GridSample: bilinear/nearest, zeros/border padding,
    align_corners. X [N,C,H,W], grid [N,Ho,Wo,2] in [-1,1] -> [N,C,Ho,Wo].
    Pure gather formulation — XLA lowers it to dynamic-gathers on TPU."""
    x, grid = ins
    mode = node.attr("mode", b"linear")
    mode = mode.decode() if isinstance(mode, bytes) else str(mode)
    pad = node.attr("padding_mode", b"zeros")
    pad = pad.decode() if isinstance(pad, bytes) else str(pad)
    align = int(node.attr("align_corners", 0))
    if x.ndim != 4:
        raise UnsupportedOpError("GridSample: only 2-D (NCHW) supported")
    if mode in ("cubic", "bicubic") or pad == "reflection":
        raise UnsupportedOpError(
            f"GridSample: mode={mode}/padding={pad} not supported")
    N, C, H, W = x.shape
    gx, gy = grid[..., 0], grid[..., 1]  # [N,Ho,Wo]

    def unnorm(g, size):
        if align:
            return (g + 1) * (size - 1) / 2
        return ((g + 1) * size - 1) / 2

    ix, iy = unnorm(gx, W), unnorm(gy, H)

    def fetch(yi, xi):
        """x[n, :, yi, xi] with padding; yi/xi int32 [N,Ho,Wo]."""
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        n_idx = jnp.arange(N).reshape(N, 1, 1)
        v = x[n_idx, :, yc, xc]          # [N,Ho,Wo,C]
        v = jnp.moveaxis(v, -1, 1)       # [N,C,Ho,Wo]
        if pad == "zeros":
            v = jnp.where(inb[:, None], v, 0)
        return v

    if mode == "nearest":
        return (fetch(jnp.round(iy).astype(jnp.int32),
                      jnp.round(ix).astype(jnp.int32)),)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[:, None]
    wy = (iy - y0)[:, None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x0i + 1)
    v10 = fetch(y0i + 1, x0i)
    v11 = fetch(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return ((top * (1 - wy) + bot * wy).astype(x.dtype),)


@register("ReverseSequence")
def reverse_sequence(ctx, node, ins):
    """Per-batch reversal of each sequence's valid prefix (same gather trick
    as the RNN emitters' _flip_valid, generalized to attribute axes)."""
    x, seq_lens = ins
    from .rnn import _flip_valid

    batch_axis = int(node.attr("batch_axis", 1))
    time_axis = int(node.attr("time_axis", 0))
    xm = jnp.moveaxis(x, (time_axis, batch_axis), (0, 1))
    return (jnp.moveaxis(_flip_valid(xm, seq_lens), (0, 1),
                         (time_axis, batch_axis)),)
