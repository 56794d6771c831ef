"""Long-tail ONNX operators: trig, Lp pools/norms, spectral (DFT/STFT/
window generators/MelWeightMatrix), random-number ops, and small geometry
ops (CenterCropPad, Col2Im).

These complete the ai.onnx coverage beyond what any bundled model needs
(the reference implements 10 ops total, src/main.rs:39-41); every emitter
here has a conformance case in tests/test_conformance.py.

ONNX ops whose OUTPUT SHAPE depends on input VALUES (NonZero, Unique,
Compress, NonMaxSuppression) live in ops/bounded.py with a static-bound
padded-output convention (valid entries first, documented sentinels) —
XLA still compiles one static-shape program.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .registry import LoweringContext, UnsupportedOpError, register


def _unary(fn):
    def emit(ctx, node, ins):
        return (fn(ins[0]),)
    return emit


# --- trig tail -------------------------------------------------------------
register("Tan")(_unary(jnp.tan))
register("Asin")(_unary(jnp.arcsin))
register("Acos")(_unary(jnp.arccos))
register("Atan")(_unary(jnp.arctan))
register("Sinh")(_unary(jnp.sinh))
register("Cosh")(_unary(jnp.cosh))
register("Asinh")(_unary(jnp.arcsinh))
register("Acosh")(_unary(jnp.arccosh))
register("Atanh")(_unary(jnp.arctanh))

# --- bitwise tail ----------------------------------------------------------
register("BitwiseNot")(_unary(jnp.bitwise_not))


@register("BitwiseXor")
def bitwise_xor(ctx, node, ins):
    return (jnp.bitwise_xor(ins[0], ins[1]),)


@register("Det")
def det(ctx, node, ins):
    return (jnp.linalg.det(ins[0]),)


def _register_reduce_log_sum():
    from .standard import _reduce

    register("ReduceLogSum")(_reduce(
        lambda x, axis, keepdims: jnp.log(
            jnp.sum(x, axis=axis, keepdims=keepdims))))


_register_reduce_log_sum()


# --- Lp family -------------------------------------------------------------
@register("LpNormalization")
def lp_normalization(ctx, node, ins):
    x = ins[0]
    axis = int(node.attr("axis", -1))
    p = int(node.attr("p", 2))
    if p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return (x / norm,)


@register("GlobalLpPool")
def global_lp_pool(ctx, node, ins):
    x = ins[0]
    p = int(node.attr("p", 2))
    axes = tuple(range(2, x.ndim))
    if p == 1:
        out = jnp.sum(jnp.abs(x), axis=axes, keepdims=True)
    elif p == 2:
        out = jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))
    else:
        out = jnp.sum(jnp.abs(x) ** p, axis=axes, keepdims=True) ** (1.0 / p)
    return (out,)


@register("LpPool")
def lp_pool(ctx, node, ins):
    from .standard import _pool

    p = int(node.attr("p", 2))
    s, _, _, _ = _pool(node, jnp.abs(ins[0]) ** p, 0.0, jax.lax.add)
    return (s ** (1.0 / p),)


# --- geometry --------------------------------------------------------------
@register("CenterCropPad")
def center_crop_pad(ctx, node, ins):
    x = ins[0]
    shape = ctx.constant(node.inputs[1])
    if shape is None:
        raise UnsupportedOpError("CenterCropPad: dynamic target shape")
    target = [int(v) for v in np.asarray(shape).reshape(-1)]
    axes = node.attr("axes")
    if axes is None:
        axes = list(range(len(target)))
    axes = [int(a) % x.ndim for a in np.asarray(axes).reshape(-1)]
    out = x
    for ax, t in zip(axes, target):
        d = out.shape[ax]
        if d >= t:  # center crop
            start = (d - t) // 2
            out = jax.lax.slice_in_dim(out, start, start + t, axis=ax)
        else:       # center pad with zeros
            lo = (t - d) // 2
            pads = [(0, 0)] * out.ndim
            pads[ax] = (lo, t - d - lo)
            out = jnp.pad(out, pads)
    return (out,)


@register("Col2Im")
def col2im(ctx, node, ins):
    """Rearrange column blocks back into an image (inverse of im2col),
    overlapping regions summed — implemented as a scatter-add over the
    statically unrolled block offsets (all shapes static)."""
    x = ins[0]                                # [N, C*prod(block), L]
    img_shape = ctx.constant(node.inputs[1])
    blk_shape = ctx.constant(node.inputs[2])
    if img_shape is None or blk_shape is None:
        raise UnsupportedOpError("Col2Im: dynamic image/block shape")
    image_shape = [int(v) for v in np.asarray(img_shape).reshape(-1)]
    block_shape = [int(v) for v in np.asarray(blk_shape).reshape(-1)]
    nd = len(image_shape)
    dil = [int(v) for v in (node.attr("dilations") or [1] * nd)]
    pads = [int(v) for v in (node.attr("pads") or [0] * 2 * nd)]
    strides = [int(v) for v in (node.attr("strides") or [1] * nd)]
    N = x.shape[0]
    C = x.shape[1] // int(np.prod(block_shape))
    padded = [image_shape[d] + pads[d] + pads[nd + d] for d in range(nd)]
    n_blocks = [(padded[d] - dil[d] * (block_shape[d] - 1) - 1)
                // strides[d] + 1 for d in range(nd)]
    assert int(np.prod(n_blocks)) == x.shape[2], "Col2Im: L mismatch"
    x = x.reshape((N, C) + tuple(block_shape) + tuple(n_blocks))
    out = jnp.zeros((N, C) + tuple(padded), x.dtype)
    # unroll over block-local offsets (small, static)
    for off in np.ndindex(*block_shape):
        patch = x[(slice(None), slice(None)) + off]  # [N, C, *n_blocks]
        idx = (slice(None), slice(None)) + tuple(
            slice(off[d] * dil[d],
                  off[d] * dil[d] + strides[d] * n_blocks[d], strides[d])
            for d in range(nd))
        out = out.at[idx].add(patch)
    crop = (slice(None), slice(None)) + tuple(
        slice(pads[d], pads[d] + image_shape[d]) for d in range(nd))
    return (out[crop],)


# --- spectral --------------------------------------------------------------
def _window(name: str, ctx, node):
    size = ctx.constant(node.inputs[0])
    if size is None:
        raise UnsupportedOpError(f"{node.op_type}: dynamic size")
    size = int(np.asarray(size).reshape(()))
    periodic = bool(int(node.attr("periodic", 1)))
    dtype_attr = node.attr("output_datatype", 1)
    if size == 1 and not periodic:
        # symmetric single-sample window is [1.0] (numpy/scipy convention);
        # the cosine formula would divide by n = size - 1 = 0 -> NaN
        from ..onnx_io import DTYPE_TO_NUMPY

        return (jnp.ones((1,), DTYPE_TO_NUMPY[int(dtype_attr)]),)
    n = size if periodic else size - 1
    i = jnp.arange(size, dtype=jnp.float32)
    if name == "hann":
        w = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * i / n)
    elif name == "hamming":
        # ONNX spec coefficients (25/46)
        w = 25.0 / 46.0 - (21.0 / 46.0) * jnp.cos(2 * jnp.pi * i / n)
    else:  # blackman
        w = (0.42 - 0.5 * jnp.cos(2 * jnp.pi * i / n)
             + 0.08 * jnp.cos(4 * jnp.pi * i / n))
    dtype = node.attr("output_datatype", 1)
    from ..onnx_io import DTYPE_TO_NUMPY

    return (w.astype(DTYPE_TO_NUMPY[int(dtype)]),)


@register("HannWindow")
def hann_window(ctx, node, ins):
    return _window("hann", ctx, node)


@register("HammingWindow")
def hamming_window(ctx, node, ins):
    return _window("hamming", ctx, node)


@register("BlackmanWindow")
def blackman_window(ctx, node, ins):
    return _window("blackman", ctx, node)


@register("DFT")
def dft(ctx, node, ins):
    """DFT over one axis. Real input [..., 1] or complex [..., 2] (last dim
    is the complex pair per ONNX); output [..., 2]."""
    x = ins[0]
    inverse = bool(int(node.attr("inverse", 0)))
    onesided = bool(int(node.attr("onesided", 0)))
    if len(node.inputs) > 2 and node.inputs[2]:
        ax = ctx.constant(node.inputs[2])
        axis = int(np.asarray(ax).reshape(())) if ax is not None else 1
    else:
        axis = int(node.attr("axis", 1))
    if len(node.inputs) > 1 and node.inputs[1]:
        if ctx.constant(node.inputs[1]) is None:
            raise UnsupportedOpError("DFT: dynamic dft_length")
        n = int(np.asarray(ctx.constant(node.inputs[1])).reshape(()))
    else:
        n = None
    if x.shape[-1] == 2:
        xc = jax.lax.complex(x[..., 0], x[..., 1])
    else:
        xc = x[..., 0].astype(jnp.complex64)
    axis = axis % xc.ndim
    fn = jnp.fft.ifft if inverse else jnp.fft.fft
    y = fn(xc, n=n, axis=axis)
    if onesided:
        L = y.shape[axis]
        y = jax.lax.slice_in_dim(y, 0, L // 2 + 1, axis=axis)
    return (jnp.stack([y.real, y.imag], axis=-1).astype(jnp.float32),)


@register("STFT")
def stft(ctx, node, ins):
    """Short-time Fourier transform: frame the signal (static hop/window),
    apply the optional window, batch-FFT the frames."""
    x = ins[0]  # [B, L] or [B, L, 1]
    hop = ctx.constant(node.inputs[1])
    if hop is None:
        raise UnsupportedOpError("STFT: dynamic frame_step")
    hop = int(np.asarray(hop).reshape(()))
    window = ins[2] if len(node.inputs) > 2 and node.inputs[2] else None
    if len(node.inputs) > 3 and node.inputs[3]:
        fl = ctx.constant(node.inputs[3])
        if fl is None:
            raise UnsupportedOpError("STFT: dynamic frame_length")
        frame_len = int(np.asarray(fl).reshape(()))
    elif window is not None:
        frame_len = window.shape[-1]
    else:
        raise UnsupportedOpError("STFT needs frame_length or window")
    onesided = bool(int(node.attr("onesided", 1)))
    squeeze = False
    if x.ndim == 3:
        if x.shape[-1] != 1:
            raise UnsupportedOpError("STFT: complex input not supported")
        x = x[..., 0]
        squeeze = True
    B, L = x.shape
    n_frames = (L - frame_len) // hop + 1
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_len)[None, :])          # [F, frame_len]
    frames = x[:, idx]                                 # [B, F, frame_len]
    if window is not None:
        frames = frames * window
    y = jnp.fft.fft(frames, axis=-1)
    if onesided:
        y = y[..., : frame_len // 2 + 1]
    out = jnp.stack([y.real, y.imag], axis=-1).astype(jnp.float32)
    return (out,)


@register("MelWeightMatrix")
def mel_weight_matrix(ctx, node, ins):
    vals = [ctx.constant(i) for i in node.inputs[:5]]
    if any(v is None for v in vals):
        raise UnsupportedOpError("MelWeightMatrix: dynamic inputs")
    n_mel, dft_len, sr, f_lo, f_hi = [
        float(np.asarray(v).reshape(())) for v in vals]
    n_mel, dft_len, sr = int(n_mel), int(dft_len), int(sr)
    n_bins = dft_len // 2 + 1

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(f_lo), hz_to_mel(f_hi), n_mel + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((dft_len + 1) * hz_pts / sr).astype(np.int64)
    out = np.zeros((n_bins, n_mel), np.float32)
    for m in range(n_mel):
        lo, c, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(int(lo), int(c)):
            if c > lo and 0 <= k < n_bins:
                out[k, m] = (k - lo) / (c - lo)
        for k in range(int(c), int(hi)):
            if hi > c and 0 <= k < n_bins:
                out[k, m] = (hi - k) / (hi - c)
    from ..onnx_io import DTYPE_TO_NUMPY

    dtype = int(node.attr("output_datatype", 1))
    return (jnp.asarray(out.astype(DTYPE_TO_NUMPY[dtype])),)


# --- random ----------------------------------------------------------------
# ONNX leaves RNG reproducibility implementation-defined; we derive the key
# from the seed attribute (or a fixed default) so the compiled program is a
# pure function — same seed, same stream, every run (the XLA-native
# contract; torch/ORT give different streams anyway).
def _key(node):
    seed = node.attr("seed")
    if seed is not None:
        # explicit seed: honor it exactly (two nodes with the same seed
        # attr intentionally share a stream, per the ONNX seed contract)
        return jax.random.PRNGKey(int(np.float32(seed).view(np.int32)))
    # seedless: salt by the node's output name so distinct random nodes in
    # one graph get independent (but still deterministic) streams — without
    # this, every same-shape seedless node emits bit-identical tensors
    import zlib

    salt = zlib.crc32(node.outputs[0].encode()) & 0x7FFFFFFF
    return jax.random.PRNGKey(salt)


def _rand_shape_dtype(node, like=None):
    from ..onnx_io import DTYPE_TO_NUMPY

    if like is not None:
        shape = like.shape
        dt = node.attr("dtype")
        dtype = DTYPE_TO_NUMPY[int(dt)] if dt is not None else like.dtype
    else:
        shape = tuple(int(v) for v in node.attr("shape"))
        dtype = DTYPE_TO_NUMPY[int(node.attr("dtype", 1))]
    return shape, dtype


@register("RandomNormal", "RandomNormalLike")
def random_normal(ctx, node, ins):
    like = ins[0] if ins else None
    shape, dtype = _rand_shape_dtype(node, like)
    mean = float(node.attr("mean", 0.0))
    scale = float(node.attr("scale", 1.0))
    y = jax.random.normal(_key(node), shape) * scale + mean
    return (y.astype(dtype),)


@register("RandomUniform", "RandomUniformLike")
def random_uniform(ctx, node, ins):
    like = ins[0] if ins else None
    shape, dtype = _rand_shape_dtype(node, like)
    lo = float(node.attr("low", 0.0))
    hi = float(node.attr("high", 1.0))
    y = jax.random.uniform(_key(node), shape, minval=lo, maxval=hi)
    return (y.astype(dtype),)


@register("Bernoulli")
def bernoulli(ctx, node, ins):
    from ..onnx_io import DTYPE_TO_NUMPY

    x = ins[0]
    dt = node.attr("dtype")
    dtype = DTYPE_TO_NUMPY[int(dt)] if dt is not None else x.dtype
    y = jax.random.bernoulli(_key(node), x.astype(jnp.float32))
    return (y.astype(dtype),)


@register("Multinomial")
def multinomial(ctx, node, ins):
    from ..onnx_io import DTYPE_TO_NUMPY

    x = ins[0]  # [B, C] unnormalized log-probs per ONNX
    n = int(node.attr("sample_size", 1))
    dtype = DTYPE_TO_NUMPY[int(node.attr("dtype", 6))]
    keys = jax.random.split(_key(node), n)
    cols = [jax.random.categorical(k, x, axis=-1) for k in keys]
    return (jnp.stack(cols, axis=-1).astype(dtype),)


# --- deprecated alias ------------------------------------------------------
@register("Scatter")
def scatter(ctx, node, ins):
    """Deprecated opset-9/10 alias of ScatterElements."""
    from .standard import scatter_elements

    return scatter_elements(ctx, node, ins)


@register("AffineGrid")
def affine_grid(ctx, node, ins):
    """ai.onnx AffineGrid (opset 20): sampling grid for a batch of 2-D/3-D
    affine transforms (torch.nn.functional.affine_grid semantics; feeds
    GridSample). theta [N,2,3] -> grid [N,H,W,2]; theta [N,3,4] ->
    grid [N,D,H,W,3]. The base grid is built in numpy at trace time
    (static `size`), so only one [P,dim+1]x[dim+1,dim] matmul per batch
    row reaches the device."""
    theta = ins[0]
    size = ctx.require_constant(node.inputs[1], "AffineGrid size")
    align = int(node.attr("align_corners", 0))
    dims = [int(v) for v in np.asarray(size).reshape(-1)]
    if len(dims) not in (4, 5):
        raise UnsupportedOpError(
            f"AffineGrid: size must have 4 or 5 elements, got {len(dims)}")
    N, spatial = dims[0], dims[2:]
    nd = len(spatial)  # 2 (H,W) or 3 (D,H,W)

    def axis(s):
        if align:
            return np.linspace(-1.0, 1.0, s) if s > 1 else np.zeros(1)
        return (2.0 * np.arange(s) + 1.0) / s - 1.0

    # mesh in (x, y[, z]) order = reversed spatial order (x fastest)
    coords = np.meshgrid(*[axis(s) for s in reversed(spatial)],
                         indexing="ij")
    # meshgrid over (W,) / (W,H) reversed -> arrange to spatial-major
    coords = [c.transpose(*reversed(range(nd))) for c in coords]
    base = np.stack(coords + [np.ones(tuple(spatial))], axis=-1)
    base = base.reshape(-1, nd + 1).astype(np.float32)  # [P, nd+1]
    # grid[n, p] = theta[n] @ base[p]  -> [N, P, nd]
    g = jnp.einsum("pk,nok->npo", jnp.asarray(base, theta.dtype), theta)
    return (g.reshape((N, *spatial, nd)),)
