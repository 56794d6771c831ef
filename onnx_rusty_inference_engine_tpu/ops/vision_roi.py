"""Region-of-interest ops: RoiAlign / MaxRoiPool (detection-head pooling).

The reference engine's op set has none of these (10-op CNN match,
src/inference_engine/model_inference.rs:138-161); they complete the core
opset for detection models (Faster/Mask R-CNN heads).

TPU-native formulation — NO index gathers anywhere (CLAUDE.md: big-index
gathers are catastrophic on this chip; a one-hot matmul scatter is ~2600×
faster for the measured case):

* RoiAlign: bilinear interpolation is separable, so each roi's sampling
  becomes two small DENSE weight matrices Wy [P,H] and Wx [Q,W] (two
  nonzeros per row — the bilinear taps) and the whole op is one einsum
  `rph,rchw,rqw->rcpq` that XLA tiles onto the MXU. For `mode=avg` the
  sub-grid averaging folds INTO the weight matrices (rows pre-summed per
  output bin), so the matmul directly yields bin outputs.
* MaxRoiPool: bin membership is separable in h and w, so the pooled max is
  two chained masked-max reductions (mask_h then mask_w) — elementwise
  select + reduce, fully fusable.
* Batch selection (roi → image) is a one-hot einsum `rn,nchw->rchw`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register


def _batch_select(x, batch_idx, n_rois):
    """X [N,C,H,W] + batch_indices [R] → per-roi images [R,C,H,W], as a
    one-hot matmul (never an index gather)."""
    N = x.shape[0]
    oh = (batch_idx.astype(jnp.int32)[:, None]
          == jnp.arange(N, dtype=jnp.int32)[None, :]).astype(x.dtype)
    return jnp.einsum("rn,nchw->rchw", oh, x)


def _bilinear_weights(start, bin_size, n_bins, grid, size, fold_avg):
    """Per-roi separable bilinear sampling weights.

    start/bin_size: [R] roi start coordinate and bin extent (float).
    n_bins: static output bins; grid: static samples per bin; size: H or W.
    Returns [R, n_bins*grid, size] (or [R, n_bins, size] with the 1/grid
    averaging folded in when fold_avg).

    Sample positions follow the spec: start + (bin + (i+0.5)/grid) * bin_size.
    Out-of-image samples (y < -1 or y > size) contribute zero; in-range
    samples clamp to [0, size-1] and split between floor/ceil rows.
    """
    xp = jnp if hasattr(start, "dtype") and not isinstance(
        start, np.ndarray) else np
    R = start.shape[0]
    frac = (jnp.arange(n_bins * grid) if xp is jnp
            else np.arange(n_bins * grid))
    # bin index and in-bin offset for each of the n_bins*grid samples
    pos = (frac // grid) + ((frac % grid) + 0.5) / grid          # [P]
    y = start[:, None] + pos[None, :] * bin_size[:, None]        # [R,P]
    valid = (y >= -1.0) & (y <= size)
    yc = xp.clip(y, 0.0, size - 1.0)
    y0 = xp.floor(yc)
    ly = yc - y0
    y0i = y0.astype(xp.int32)
    y1i = xp.minimum(y0i + 1, size - 1)
    rows = xp.arange(size, dtype=xp.int32)[None, None, :]        # [1,1,size]
    w = ((1.0 - ly)[..., None] * (rows == y0i[..., None])
         + ly[..., None] * (rows == y1i[..., None]))             # [R,P,size]
    w = xp.where(valid[..., None], w, 0.0)
    if fold_avg:
        w = w.reshape(R, n_bins, grid, size).sum(axis=2) / grid  # [R,B,size]
    return w


@register("RoiAlign")
def roi_align(ctx: LoweringContext, node: Node, ins):
    x, rois, batch_idx = ins[0], ins[1], ins[2]
    out_h = int(node.attr("output_height", 1))
    out_w = int(node.attr("output_width", 1))
    sr = int(node.attr("sampling_ratio", 0))
    scale = float(node.attr("spatial_scale", 1.0))
    mode = node.attr("mode", b"avg")
    mode = mode.decode() if isinstance(mode, bytes) else str(mode)
    ctm = node.attr("coordinate_transformation_mode", b"half_pixel")
    ctm = ctm.decode() if isinstance(ctm, bytes) else str(ctm)
    if mode not in ("avg", "max"):
        raise UnsupportedOpError(f"RoiAlign: unknown mode {mode!r}")
    N, C, H, W = x.shape
    R = rois.shape[0]
    offset = 0.5 if ctm == "half_pixel" else 0.0

    def roi_geometry(r):
        """r: [..., 4] → (start_y, start_x, bin_h, bin_w)."""
        start_x = r[..., 0] * scale - offset
        start_y = r[..., 1] * scale - offset
        roi_w = r[..., 2] * scale - offset - start_x
        roi_h = r[..., 3] * scale - offset - start_y
        if ctm != "half_pixel":  # legacy mode clamps degenerate rois
            mod = jnp if hasattr(r, "dtype") and not isinstance(
                r, np.ndarray) else np
            roi_w = mod.maximum(roi_w, 1.0)
            roi_h = mod.maximum(roi_h, 1.0)
        return start_y, start_x, roi_h / out_h, roi_w / out_w

    xsel = _batch_select(x, batch_idx, R)  # [R,C,H,W]

    if sr > 0:
        sy, sx, bh, bw = roi_geometry(rois)
        fold = mode == "avg"
        wy = _bilinear_weights(sy, bh, out_h, sr, H, fold).astype(x.dtype)
        wx = _bilinear_weights(sx, bw, out_w, sr, W, fold).astype(x.dtype)
        out = jnp.einsum("rph,rchw,rqw->rcpq", wy, xsel, wx)
        if mode == "max":
            out = out.reshape(R, C, out_h, sr, out_w, sr).max(axis=(3, 5))
        return (out,)

    # sampling_ratio=0: the grid density is ceil(roi/bin) PER ROI — a
    # data-dependent shape. Legal only when the rois are trace-time
    # constants (then each roi unrolls with its exact grid, R is bounded).
    rois_c = ctx.constant(node.inputs[1])
    if rois_c is None:
        raise UnsupportedOpError(
            "RoiAlign: sampling_ratio=0 (adaptive grid) needs trace-time "
            "constant rois under XLA static shapes; set sampling_ratio > 0 "
            "for runtime rois")
    rois_np = np.asarray(rois_c, dtype=np.float64)
    outs = []
    for r in range(R):
        sy, sx, bh, bw = roi_geometry(rois_np[r:r + 1])
        gh = max(int(np.ceil(bh[0])), 1)  # spec: ceil(roi_extent / out_bins)
        gw = max(int(np.ceil(bw[0])), 1)
        fold = mode == "avg"
        wy = jnp.asarray(_bilinear_weights(sy, bh, out_h, gh, H, fold),
                         dtype=x.dtype)
        wx = jnp.asarray(_bilinear_weights(sx, bw, out_w, gw, W, fold),
                         dtype=x.dtype)
        o = jnp.einsum("ph,chw,qw->cpq", wy[0], xsel[r], wx[0])
        if mode == "max":
            o = o.reshape(C, out_h, gh, out_w, gw).max(axis=(2, 4))
        outs.append(o)
    return (jnp.stack(outs),)


@register("DeformConv")
def deform_conv(ctx: LoweringContext, node: Node, ins):
    """Deformable convolution (DCNv1/v2, opset 19).

    Each kernel tap samples X at its regular grid position PLUS a learned
    per-position offset, bilinearly; v2 adds a per-tap modulation mask.
    Offset channel layout is [offset_group, kH, kW, (dy, dx)] — the
    torchvision-compatible order the ONNX reference implementation uses.

    Lowering: the four bilinear corners are fetched with vectorized
    advanced indexing (the GridSample precedent in standard.py — XLA
    lowers it to dynamic-gather; this op is a detection-head accessory,
    not a serving hot path), then the tap contraction is ONE einsum
    `ngcijpq,gmcij->ngmpq` that XLA places on the MXU."""
    x, w, offset = ins[0], ins[1], ins[2]
    bias = ins[3] if len(ins) > 3 else None
    mask = ins[4] if len(ins) > 4 else None
    N, C, H, W_ = x.shape
    M, _, KH, KW = w.shape
    groups = int(node.attr("group", 1))
    og = int(node.attr("offset_group", 1))
    strides = [int(v) for v in node.attr("strides", [1, 1])]
    dil = [int(v) for v in node.attr("dilations", [1, 1])]
    pads = [int(v) for v in node.attr("pads", [0, 0, 0, 0])]
    OH, OW = offset.shape[2], offset.shape[3]

    # regular grid per (tap, output position)
    base_y = (jnp.arange(OH) * strides[0] - pads[0])[None, :] \
        + (jnp.arange(KH) * dil[0])[:, None]                    # [KH,OH]
    base_x = (jnp.arange(OW) * strides[1] - pads[1])[None, :] \
        + (jnp.arange(KW) * dil[1])[:, None]                    # [KW,OW]
    off = offset.reshape(N, og, KH, KW, 2, OH, OW)
    y = base_y[None, None, :, None, :, None] + off[:, :, :, :, 0]
    xx = base_x[None, None, None, :, None, :] + off[:, :, :, :, 1]
    # y/xx: [N, OG, KH, KW, OH, OW]

    xg = x.reshape(N, og, C // og, H, W_)

    def corner(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W_)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W_ - 1)
        n_idx = jnp.arange(N).reshape(N, 1, 1, 1, 1, 1)
        g_idx = jnp.arange(og).reshape(1, og, 1, 1, 1, 1)
        v = xg[n_idx, g_idx, :, yc, xc]      # [N,OG,KH,KW,OH,OW,Cg]
        return jnp.where(inb[..., None], v, 0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(xx)
    ly = (y - y0)[..., None]
    lx = (xx - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    samp = (corner(y0i, x0i) * (1 - ly) * (1 - lx)
            + corner(y0i, x0i + 1) * (1 - ly) * lx
            + corner(y0i + 1, x0i) * ly * (1 - lx)
            + corner(y0i + 1, x0i + 1) * ly * lx)
    # zero-pad semantics: a sample fully outside contributes 0; points in
    # the [-1, 0) / (size-1, size] border band interpolate against zeros,
    # which the per-corner in-bounds masking above already produces
    if mask is not None:
        samp = samp * mask.reshape(N, og, KH, KW, OH, OW)[..., None]

    # [N,OG,KH,KW,OH,OW,Cg] -> [N, G, C/G, KH, KW, OH, OW]
    s = jnp.moveaxis(samp, -1, 2).reshape(N, C, KH, KW, OH, OW)
    s = s.reshape(N, groups, C // groups, KH, KW, OH, OW)
    wg = w.reshape(groups, M // groups, C // groups, KH, KW)
    out = jnp.einsum("ngcijpq,gmcij->ngmpq", s, wg)
    out = out.reshape(N, M, OH, OW)
    if bias is not None:
        out = out + bias.reshape(1, M, 1, 1)
    return (out.astype(x.dtype),)


@register("MaxRoiPool")
def max_roi_pool(ctx: LoweringContext, node: Node, ins):
    x, rois = ins[0], ins[1]  # rois [R,5] = (batch, x1, y1, x2, y2)
    ph_, pw_ = [int(v) for v in node.attr("pooled_shape")]
    scale = float(node.attr("spatial_scale", 1.0))
    N, C, H, W = x.shape
    R = rois.shape[0]

    xsel = _batch_select(x, rois[:, 0], R)

    def axis_masks(lo, hi, n_bins, size):
        """Caffe RoIPool bin boundaries → membership mask [R, n_bins, size]
        and per-bin emptiness [R, n_bins]."""
        start = jnp.round(lo * scale)
        end = jnp.round(hi * scale)
        length = jnp.maximum(end - start + 1.0, 1.0)
        b = jnp.arange(n_bins, dtype=x.dtype)[None, :]
        bin_lo = jnp.floor(b * length[:, None] / n_bins) + start[:, None]
        bin_hi = (jnp.ceil((b + 1) * length[:, None] / n_bins)
                  + start[:, None])
        bin_lo = jnp.clip(bin_lo, 0, size)
        bin_hi = jnp.clip(bin_hi, 0, size)
        cells = jnp.arange(size, dtype=x.dtype)[None, None, :]
        mask = (cells >= bin_lo[..., None]) & (cells < bin_hi[..., None])
        return mask, bin_hi <= bin_lo

    mask_h, empty_h = axis_masks(rois[:, 2], rois[:, 4], ph_, H)
    mask_w, empty_w = axis_masks(rois[:, 1], rois[:, 3], pw_, W)

    neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
    # stage 1: max over H per (bin_h, w); stage 2: max over W per bin_w
    t = jnp.where(mask_h[:, None, :, :, None], xsel[:, :, None, :, :], neg)
    t = t.max(axis=3)                                   # [R,C,PH,W]
    o = jnp.where(mask_w[:, None, None, :, :], t[:, :, :, None, :], neg)
    o = o.max(axis=4)                                   # [R,C,PH,PW]
    empty = empty_h[:, None, :, None] | empty_w[:, None, None, :]
    return (jnp.where(empty, 0.0, o).astype(x.dtype),)
