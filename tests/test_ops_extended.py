"""Extended op coverage: activations, block layout, norms, indexing —
verified against torch / numpy references."""

import numpy as np
import pytest

from util import run_op

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

rng = np.random.default_rng(61)


def f32(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_hardswish_mish_celu_vs_torch():
    x = f32(3, 17)
    (got,) = run_op("HardSwish", {"x": x})
    np.testing.assert_allclose(got, F.hardswish(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-6)
    (got,) = run_op("Mish", {"x": x})
    np.testing.assert_allclose(got, F.mish(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-6)
    (got,) = run_op("Celu", {"x": x}, alpha=0.7)
    np.testing.assert_allclose(got, F.celu(torch.from_numpy(x), 0.7).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_shrink_thresholded_relu():
    x = f32(4, 9)
    (got,) = run_op("Shrink", {"x": x}, lambd=0.5, bias=0.1)
    want = F.softshrink(torch.from_numpy(x), 0.5).numpy()
    # softshrink == Shrink with bias=lambd? no: ONNX bias is subtracted;
    # torch softshrink subtracts lambd. Compare against explicit formula.
    want = np.where(x < -0.5, x + 0.1, np.where(x > 0.5, x - 0.1, 0.0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    (got,) = run_op("ThresholdedRelu", {"x": x}, alpha=1.0)
    np.testing.assert_allclose(
        got, F.threshold(torch.from_numpy(x), 1.0, 0.0).numpy(), rtol=1e-6)


def test_hardmax():
    x = f32(5, 7)
    (got,) = run_op("Hardmax", {"x": x}, axis=-1)
    want = np.zeros_like(x)
    want[np.arange(5), x.argmax(1)] = 1.0
    np.testing.assert_array_equal(got, want)


def test_bitshift_eyelike():
    x = rng.integers(0, 64, (3, 4)).astype(np.uint32)
    s = np.full((3, 4), 2, np.uint32)
    (got,) = run_op("BitShift", {"x": x, "s": s}, direction="LEFT")
    np.testing.assert_array_equal(got, x << 2)
    (got,) = run_op("EyeLike", {"x": f32(4, 6)}, k=1)
    np.testing.assert_array_equal(got, np.eye(4, 6, k=1, dtype=np.float32))


def test_space_to_depth_depth_to_space_roundtrip():
    x = f32(2, 3, 8, 10)
    (y,) = run_op("SpaceToDepth", {"x": x}, blocksize=2)
    assert y.shape == (2, 12, 4, 5)
    # torch pixel_unshuffle uses CRD; ONNX SpaceToDepth is DCR-ordered:
    # check via the spec's reshape/transpose definition
    want = x.reshape(2, 3, 4, 2, 5, 2).transpose(0, 3, 5, 1, 2, 4)
    want = want.reshape(2, 12, 4, 5)
    np.testing.assert_array_equal(y, want)
    (back,) = run_op("DepthToSpace", {"x": y}, blocksize=2, mode="DCR")
    np.testing.assert_array_equal(back, x)
    # CRD mode == torch pixel_shuffle
    (got,) = run_op("DepthToSpace", {"x": f32(1, 12, 4, 5)}, blocksize=2,
                    mode="CRD")


def test_depth_to_space_crd_matches_torch_pixel_shuffle():
    x = f32(2, 12, 4, 5)
    (got,) = run_op("DepthToSpace", {"x": x}, blocksize=2, mode="CRD")
    want = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_array_equal(got, want)


def test_group_normalization_vs_torch():
    x = f32(2, 8, 5, 5)
    scale = f32(8)
    bias = f32(8)
    (got,) = run_op("GroupNormalization", {"x": x},
                    {"scale": scale, "bias": bias}, num_groups=4,
                    epsilon=1e-5)
    want = F.group_norm(torch.from_numpy(x), 4, torch.from_numpy(scale),
                        torch.from_numpy(bias)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rms_normalization_vs_torch():
    x = f32(3, 4, 16)
    scale = f32(16)
    (got,) = run_op("RMSNormalization", {"x": x}, {"scale": scale},
                    axis=-1, epsilon=1e-5)
    want = F.rms_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                      1e-5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mean_variance_normalization():
    x = f32(2, 3, 4, 4)
    (got,) = run_op("MeanVarianceNormalization", {"x": x})
    mean = x.mean(axis=(0, 2, 3), keepdims=True)
    std = x.std(axis=(0, 2, 3), keepdims=True)
    np.testing.assert_allclose(got, (x - mean) / (std + 1e-9), rtol=1e-4,
                               atol=1e-5)


def test_gather_nd():
    data = f32(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]], np.int64)  # -> [2, 4]
    (got,) = run_op("GatherND", {"x": data}, {"i": idx})
    np.testing.assert_array_equal(got, data[[0, 1], [1, 2]])
    # batch_dims=1
    idx2 = np.array([[1], [0]], np.int64)  # per-batch row pick -> [2, 4]
    (got,) = run_op("GatherND", {"x": data}, {"i": idx2}, batch_dims=1)
    np.testing.assert_array_equal(got, np.stack([data[0, 1], data[1, 0]]))


def test_scatter_elements():
    data = np.zeros((3, 3), np.float32)
    idx = np.array([[1, 0, 2], [0, 2, 1]], np.int64)
    upd = f32(2, 3)
    (got,) = run_op("ScatterElements", {"x": data}, {"i": idx, "u": upd},
                    axis=0)
    want = torch.zeros(3, 3).scatter_(
        0, torch.from_numpy(idx), torch.from_numpy(upd)).numpy()
    np.testing.assert_array_equal(got, want)
    (got,) = run_op("ScatterElements", {"x": data}, {"i": idx, "u": upd},
                    axis=0, reduction="add")
    want = torch.zeros(3, 3).scatter_add_(
        0, torch.from_numpy(idx), torch.from_numpy(upd)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cumsum_modes():
    x = f32(3, 5)
    ax = np.array(1, np.int64)
    (got,) = run_op("CumSum", {"x": x}, {"axis": ax})
    np.testing.assert_allclose(got, np.cumsum(x, 1), rtol=1e-6)
    (got,) = run_op("CumSum", {"x": x}, {"axis": ax}, exclusive=1)
    want = np.cumsum(x, 1) - x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    (got,) = run_op("CumSum", {"x": x}, {"axis": ax}, reverse=1)
    np.testing.assert_allclose(got, np.flip(np.cumsum(np.flip(x, 1), 1), 1),
                               rtol=1e-6)


def test_grid_sample_vs_torch():
    x = f32(2, 3, 7, 9)
    grid = (rng.uniform(-1.2, 1.2, (2, 5, 6, 2))).astype(np.float32)
    for mode, align, pad in [("linear", 0, "zeros"), ("linear", 1, "border"),
                             ("nearest", 1, "zeros")]:
        (got,) = run_op("GridSample", {"x": x}, {"g": grid}, mode=mode,
                        align_corners=align, padding_mode=pad)
        tmode = "bilinear" if mode == "linear" else mode
        want = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                             mode=tmode, padding_mode=pad,
                             align_corners=bool(align)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{mode}/{align}/{pad}")


def test_shape_start_end_and_negative_pad():
    x = f32(2, 3, 4)
    (got,) = run_op("Shape", {"x": x}, start=1)
    np.testing.assert_array_equal(got, [3, 4])
    (got,) = run_op("Shape", {"x": x}, end=2)
    np.testing.assert_array_equal(got, [2, 3])
    (got,) = run_op("Shape", {"x": x}, start=-2)
    np.testing.assert_array_equal(got, [3, 4])
    # negative pads crop (ONNX spec); mixed signs compose
    pads = np.array([1, -1, 0, 0, 0, 2], np.int64)
    (got,) = run_op("Pad", {"x": x}, {"p": pads})
    assert got.shape == (3, 2, 6)
    np.testing.assert_array_equal(got[1:3, :, :4], x[:, 1:, :])


def test_shape_sentinel_bounds():
    """Shape-15 clamp semantics: exporter sentinels like end=INT64_MAX."""
    x = f32(2, 3, 4)
    (got,) = run_op("Shape", {"x": x}, end=2**62)
    np.testing.assert_array_equal(got, [2, 3, 4])
    (got,) = run_op("Shape", {"x": x}, start=5)
    assert got.size == 0
    (got,) = run_op("Shape", {"x": x}, start=2, end=1)
    assert got.size == 0


def test_topk_smallest_and_einsum():
    x = f32(3, 8)
    vals, idx = run_op("TopK", {"x": x}, {"k": np.array([3], np.int64)},
                       axis=-1, largest=0, sorted=1, n_outputs=2)
    np.testing.assert_allclose(vals, np.sort(x, -1)[:, :3], rtol=1e-6)
    np.testing.assert_array_equal(np.take_along_axis(x, idx.astype(int), -1),
                                  vals)
    a, bm = f32(2, 3, 4), f32(2, 4, 5)
    (got,) = run_op("Einsum", {"a": a, "b": bm}, equation="bij,bjk->bik")
    np.testing.assert_allclose(got, a @ bm, rtol=1e-4, atol=1e-5)


def test_argmax_select_last_index():
    x = np.array([[1.0, 3.0, 3.0, 2.0],
                  [5.0, 5.0, 1.0, 5.0]], np.float32)
    (got,) = run_op("ArgMax", {"x": x}, axis=1, keepdims=0)
    np.testing.assert_array_equal(got, [1, 0])
    (got,) = run_op("ArgMax", {"x": x}, axis=1, keepdims=0,
                    select_last_index=1)
    np.testing.assert_array_equal(got, [2, 3])
    (got,) = run_op("ArgMin", {"x": x}, axis=0, keepdims=0,
                    select_last_index=1)
    np.testing.assert_array_equal(got, [0, 0, 1, 0])


def test_mod_fmod_modes():
    a = np.array([-4.3, 7.2, 5.0, -3.0], np.float32)
    b = np.array([2.1, -3.0, 8.0, 5.0], np.float32)
    (got,) = run_op("Mod", {"a": a, "b": b}, fmod=1)
    np.testing.assert_allclose(got, np.fmod(a, b), rtol=1e-5, atol=1e-6)
    ai = np.array([-7, 7, -7], np.int32)
    bi = np.array([3, -3, -3], np.int32)
    (got,) = run_op("Mod", {"a": ai, "b": bi})
    np.testing.assert_array_equal(got, np.mod(ai, bi))


def test_reverse_sequence():
    x = np.arange(24, dtype=np.float32).reshape(4, 2, 3)  # [T=4, B=2, D=3]
    sl = np.array([4, 2], np.int64)
    (got,) = run_op("ReverseSequence", {"x": x}, {"sl": sl},
                    batch_axis=1, time_axis=0)
    want = x.copy()
    want[:4, 0] = x[3::-1, 0]
    want[:2, 1] = x[1::-1, 1]
    np.testing.assert_array_equal(got, want)
    # batch-major layout
    xb = np.transpose(x, (1, 0, 2))  # [B, T, D]
    (got,) = run_op("ReverseSequence", {"x": xb}, {"sl": sl},
                    batch_axis=0, time_axis=1)
    np.testing.assert_array_equal(got, np.transpose(want, (1, 0, 2)))


def test_scatter_nd_reductions():
    data = np.zeros((4, 3), np.float32)
    idx = np.array([[0], [2], [0]], np.int64)
    upd = np.array([[1, 2, 3], [4, 5, 6], [10, 20, 30]], np.float32)
    (got,) = run_op("ScatterND", {"x": data}, {"i": idx, "u": upd},
                    reduction="add")
    want = np.zeros((4, 3), np.float32)
    want[0] = upd[0] + upd[2]
    want[2] = upd[1]
    np.testing.assert_array_equal(got, want)
    (got,) = run_op("ScatterND", {"x": np.ones((4, 3), np.float32)},
                    {"i": idx, "u": upd}, reduction="max")
    want = np.ones((4, 3), np.float32)
    want[0] = np.maximum(np.maximum(upd[0], upd[2]), 1)
    want[2] = np.maximum(upd[1], 1)
    np.testing.assert_array_equal(got, want)
