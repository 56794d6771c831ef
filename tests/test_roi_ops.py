"""RoiAlign / MaxRoiPool vs an independent scalar numpy reference
(implemented directly from the spec algorithm: per-sample bilinear
interpolation and Caffe-style integer bin boundaries)."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.ops.registry import UnsupportedOpError
from util import run_op

rng = np.random.default_rng(7)


def _bilinear(img, y, x):
    C, H, W = img.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C)
    y = min(max(y, 0.0), H - 1.0)
    x = min(max(x, 0.0), W - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (img[:, y0, x0] * (1 - ly) * (1 - lx)
            + img[:, y0, x1] * (1 - ly) * lx
            + img[:, y1, x0] * ly * (1 - lx)
            + img[:, y1, x1] * ly * lx)


def ref_roi_align(x, rois, bidx, oh, ow, sr, scale, mode, ctm):
    R = len(rois)
    C = x.shape[1]
    H, W = x.shape[2], x.shape[3]
    off = 0.5 if ctm == "half_pixel" else 0.0
    out = np.zeros((R, C, oh, ow))
    for r in range(R):
        sx = rois[r, 0] * scale - off
        sy = rois[r, 1] * scale - off
        rw = rois[r, 2] * scale - off - sx
        rh = rois[r, 3] * scale - off - sy
        if ctm != "half_pixel":
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / oh, rw / ow
        gh = sr if sr > 0 else max(int(np.ceil(bh)), 1)
        gw = sr if sr > 0 else max(int(np.ceil(bw)), 1)
        img = x[bidx[r]]
        for p in range(oh):
            for q in range(ow):
                vals = [
                    _bilinear(img,
                              sy + (p + (iy + 0.5) / gh) * bh,
                              sx + (q + (ix + 0.5) / gw) * bw)
                    for iy in range(gh) for ix in range(gw)
                ]
                agg = np.mean if mode == "avg" else np.max
                out[r, :, p, q] = agg(np.stack(vals), axis=0)
    return out


def ref_max_roi_pool(x, rois, ph, pw, scale):
    R = len(rois)
    C, H, W = x.shape[1], x.shape[2], x.shape[3]
    out = np.zeros((R, C, ph, pw))
    for r in range(R):
        b = int(rois[r, 0])
        ws, hs = np.round(rois[r, 1] * scale), np.round(rois[r, 2] * scale)
        we, he = np.round(rois[r, 3] * scale), np.round(rois[r, 4] * scale)
        rh, rw = max(he - hs + 1, 1.0), max(we - ws + 1, 1.0)
        for p in range(ph):
            h0 = int(np.clip(np.floor(p * rh / ph) + hs, 0, H))
            h1 = int(np.clip(np.ceil((p + 1) * rh / ph) + hs, 0, H))
            for q in range(pw):
                w0 = int(np.clip(np.floor(q * rw / pw) + ws, 0, W))
                w1 = int(np.clip(np.ceil((q + 1) * rw / pw) + ws, 0, W))
                if h1 <= h0 or w1 <= w0:
                    continue  # empty bin stays 0
                out[r, :, p, q] = x[b, :, h0:h1, w0:w1].max(axis=(1, 2))
    return out


@pytest.mark.parametrize("mode,ctm,sr", [
    ("avg", "half_pixel", 2),
    ("max", "half_pixel", 3),
    ("avg", "output_half_pixel", 2),
])
def test_roi_align_runtime_rois(mode, ctm, sr):
    x = rng.standard_normal((2, 3, 12, 10)).astype(np.float32)
    rois = np.array([[0.4, 1.1, 7.2, 9.0],
                     [2.0, 0.0, 9.5, 5.5],
                     [0.0, 0.0, 9.9, 11.9]], np.float32)
    bidx = np.array([0, 1, 1], np.int64)
    (got,) = run_op("RoiAlign", {"x": x, "rois": rois, "b": bidx},
                    output_height=4, output_width=3, sampling_ratio=sr,
                    spatial_scale=1.0, mode=mode,
                    coordinate_transformation_mode=ctm)
    want = ref_roi_align(x, rois, bidx, 4, 3, sr, 1.0, mode, ctm)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_spatial_scale_and_oob():
    """Feature-map scale 0.5 plus a roi hanging off the image edge."""
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    rois = np.array([[-2.0, -2.0, 10.0, 6.0],
                     [8.0, 8.0, 18.0, 18.0]], np.float32)
    bidx = np.array([0, 0], np.int64)
    (got,) = run_op("RoiAlign", {"x": x, "rois": rois, "b": bidx},
                    output_height=2, output_width=2, sampling_ratio=2,
                    spatial_scale=0.5, mode="avg")
    want = ref_roi_align(x, rois, bidx, 2, 2, 2, 0.5, "avg", "half_pixel")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_static_rois():
    """sampling_ratio=0: per-roi adaptive grid, legal for constant rois."""
    x = rng.standard_normal((2, 2, 10, 10)).astype(np.float32)
    rois = np.array([[0.0, 0.0, 9.0, 9.0],
                     [1.0, 2.0, 4.0, 8.0]], np.float32)
    bidx = np.array([1, 0], np.int64)
    (got,) = run_op("RoiAlign", {"x": x},
                    initializers={"rois": rois, "b": bidx},
                    output_height=3, output_width=3, sampling_ratio=0,
                    mode="avg")
    want = ref_roi_align(x, rois, bidx, 3, 3, 0, 1.0, "avg", "half_pixel")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_runtime_rois_rejected():
    x = rng.standard_normal((1, 1, 6, 6)).astype(np.float32)
    rois = np.array([[0.0, 0.0, 5.0, 5.0]], np.float32)
    bidx = np.array([0], np.int64)
    with pytest.raises(UnsupportedOpError, match="sampling_ratio"):
        run_op("RoiAlign", {"x": x, "rois": rois, "b": bidx},
               output_height=2, output_width=2, sampling_ratio=0)


def test_max_roi_pool():
    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 8.0, 6.0],
                     [1, 0.0, 0.0, 10.0, 8.0],
                     [0, 3.0, 2.0, 4.0, 3.0]], np.float32)
    (got,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                    pooled_shape=[3, 4], spatial_scale=1.0)
    want = ref_max_roi_pool(x, rois, 3, 4, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_roi_pool_scale_and_degenerate():
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    # second roi collapses to a point; third is partially out of range
    rois = np.array([[0, 2.0, 2.0, 10.0, 10.0],
                     [0, 4.0, 4.0, 4.0, 4.0],
                     [0, -4.0, -4.0, 2.0, 2.0]], np.float32)
    (got,) = run_op("MaxRoiPool", {"x": x, "rois": rois},
                    pooled_shape=[2, 2], spatial_scale=0.5)
    want = ref_max_roi_pool(x, rois, 2, 2, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# DeformConv
# ---------------------------------------------------------------------------
def ref_deform_conv(x, w, offset, bias, mask, strides, pads, dil, groups, og):
    N, C, H, W_ = x.shape
    M, _, KH, KW = w.shape
    OH, OW = offset.shape[2], offset.shape[3]
    off = offset.reshape(N, og, KH, KW, 2, OH, OW)
    msk = (np.ones((N, og, KH, KW, OH, OW)) if mask is None
           else mask.reshape(N, og, KH, KW, OH, OW))
    out = np.zeros((N, M, OH, OW))
    cg = C // groups
    for n in range(N):
        for m in range(M):
            g = m // (M // groups)
            for p in range(OH):
                for q in range(OW):
                    acc = 0.0
                    for ci in range(cg):
                        c = g * cg + ci
                        ogi = c // (C // og)
                        for i in range(KH):
                            for j in range(KW):
                                y = (p * strides[0] - pads[0] + i * dil[0]
                                     + off[n, ogi, i, j, 0, p, q])
                                xx = (q * strides[1] - pads[1] + j * dil[1]
                                      + off[n, ogi, i, j, 1, p, q])
                                v = _bilinear_zeropad(x[n, c], y, xx)
                                acc += (w[m, ci, i, j] * v
                                        * msk[n, ogi, i, j, p, q])
                    out[n, m, p, q] = acc + (0.0 if bias is None else bias[m])
    return out


def _bilinear_zeropad(img, y, x):
    """Bilinear with zero padding outside [0, H-1] x [0, W-1] (each corner
    outside the image contributes zero)."""
    H, W = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    v = 0.0
    for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
        for (xc, wx) in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
            if 0 <= yy < H and 0 <= xc < W:
                v += wy * wx * img[yy, xc]
    return v


def test_deform_conv_zero_offsets_equals_conv():
    """With zero offsets and no mask, DeformConv must equal plain Conv."""
    x = rng.standard_normal((2, 4, 7, 7)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    OH = OW = 7  # stride 1, pad 1
    off = np.zeros((2, 1 * 3 * 3 * 2, OH, OW), np.float32)
    (got,) = run_op("DeformConv", {"x": x, "w": w, "off": off, "b": b},
                    kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1])
    (want,) = run_op("Conv", {"x": x, "w": w, "b": b},
                     kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_conv_offsets_mask_groups():
    """Fractional offsets + modulation mask + group=2, offset_group=2,
    stride 2, dilation 2 vs the scalar reference."""
    N, C, H, W_ = 1, 4, 9, 8
    M, KH, KW = 4, 2, 3
    groups, og = 2, 2
    strides, pads, dil = [2, 1], [1, 2, 1, 2], [2, 1]
    OH = (H + pads[0] + pads[2] - dil[0] * (KH - 1) - 1) // strides[0] + 1
    OW = (W_ + pads[1] + pads[3] - dil[1] * (KW - 1) - 1) // strides[1] + 1
    x = rng.standard_normal((N, C, H, W_)).astype(np.float32)
    w = rng.standard_normal((M, C // groups, KH, KW)).astype(np.float32)
    off = (rng.standard_normal((N, og * KH * KW * 2, OH, OW)) * 1.7
           ).astype(np.float32)
    mask = rng.uniform(0.0, 1.0, (N, og * KH * KW, OH, OW)).astype(np.float32)
    (got,) = run_op("DeformConv",
                    {"x": x, "w": w, "off": off, "b": np.zeros(M, np.float32),
                     "mask": mask},
                    kernel_shape=[KH, KW], strides=strides, pads=pads,
                    dilations=dil, group=groups, offset_group=og)
    want = ref_deform_conv(x, w, off, None, mask, strides,
                           [pads[0], pads[1]], dil, groups, og)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
