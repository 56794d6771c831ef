"""Conformance for the bounded-shape lowerings of value-dependent-shape
ops (ops/bounded.py): NonZero, Compress, Unique, NonMaxSuppression.

Each test compares the VALID prefix of the padded output against the true
dynamic-shape numpy reference, and asserts the documented padding sentinel
on the rest. (The reference engine panics on all of these,
model_inference.rs:158-160.)
"""

import numpy as np
import pytest

from util import run_op

rng = np.random.default_rng(99)


# ---------------------------------------------------------------------------
# NonZero
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("shape", [(7,), (3, 5), (2, 3, 4)])
def test_nonzero(shape):
    x = (rng.random(shape) > 0.6).astype(np.float32) * rng.random(shape)
    (out,) = run_op("NonZero", {"x": x.astype(np.float32)})
    ref = np.stack(np.nonzero(x))                 # [rank, n_true] row-major
    n_true = ref.shape[1]
    assert out.shape == (len(shape), int(np.prod(shape)))
    np.testing.assert_array_equal(out[:, :n_true], ref)
    np.testing.assert_array_equal(out[:, n_true:], 0)


def test_nonzero_all_and_none():
    (out,) = run_op("NonZero", {"x": np.ones((2, 3), np.float32)})
    np.testing.assert_array_equal(out, np.stack(np.nonzero(np.ones((2, 3)))))
    (out,) = run_op("NonZero", {"x": np.zeros((2, 3), np.float32)})
    np.testing.assert_array_equal(out, 0)


def test_nonzero_bool_input():
    x = np.array([True, False, True, True, False])
    (out,) = run_op("NonZero", {"x": x})
    np.testing.assert_array_equal(out[:, :3], [[0, 2, 3]])


# ---------------------------------------------------------------------------
# Compress
# ---------------------------------------------------------------------------
def test_compress_axis():
    x = rng.standard_normal((4, 5)).astype(np.float32)
    cond = np.array([True, False, True, False])
    (out,) = run_op("Compress", {"x": x}, {"cond": cond}, axis=0)
    ref = x[cond]
    assert out.shape == x.shape
    np.testing.assert_array_equal(out[: ref.shape[0]], ref)
    np.testing.assert_array_equal(out[ref.shape[0]:], 0)


def test_compress_flattened():
    x = rng.standard_normal((3, 4)).astype(np.float32)
    cond = rng.random(12) > 0.5
    (out,) = run_op("Compress", {"x": x}, {"cond": cond})
    ref = x.reshape(-1)[cond]
    np.testing.assert_array_equal(out[: ref.size], ref)
    np.testing.assert_array_equal(out[ref.size:], 0)


def test_compress_short_condition():
    """Spec: condition may be shorter than the axis — missing entries are
    False."""
    x = np.arange(6, dtype=np.float32)
    (out,) = run_op("Compress", {"x": x},
                    {"cond": np.array([False, True, True])})
    np.testing.assert_array_equal(out[:2], [1.0, 2.0])
    np.testing.assert_array_equal(out[2:], 0)


# ---------------------------------------------------------------------------
# Unique
# ---------------------------------------------------------------------------
def test_unique_sorted():
    x = np.array([2, 1, 1, 3, 4, 3], np.float32)
    y, idx, inv, cnt = run_op("Unique", {"x": x}, n_outputs=4, opset=11)
    uy, uidx, uinv, ucnt = np.unique(x, return_index=True,
                                     return_inverse=True,
                                     return_counts=True)
    k = uy.size
    np.testing.assert_array_equal(y[:k], uy)
    np.testing.assert_array_equal(idx[:k], uidx)
    np.testing.assert_array_equal(cnt[:k], ucnt)
    np.testing.assert_array_equal(inv, uinv)       # inverse is full-length
    np.testing.assert_array_equal(y[k:], 0)
    np.testing.assert_array_equal(cnt[k:], 0)


def test_unique_unsorted_first_occurrence():
    x = np.array([2, 1, 1, 3, 4, 3], np.int64)
    y, idx, inv, cnt = run_op("Unique", {"x": x}, n_outputs=4, sorted=0,
                              opset=11)
    # order of first occurrence: 2, 1, 3, 4
    np.testing.assert_array_equal(y[:4], [2, 1, 3, 4])
    np.testing.assert_array_equal(idx[:4], [0, 1, 3, 4])
    np.testing.assert_array_equal(cnt[:4], [1, 2, 2, 1])
    np.testing.assert_array_equal(inv, [0, 1, 1, 2, 3, 2])


def test_unique_random_matches_numpy():
    x = rng.integers(0, 10, 40).astype(np.float32)
    y, idx, inv, cnt = run_op("Unique", {"x": x}, n_outputs=4, opset=11)
    uy, uidx, uinv, ucnt = np.unique(x, return_index=True,
                                     return_inverse=True,
                                     return_counts=True)
    k = uy.size
    np.testing.assert_array_equal(y[:k], uy)
    np.testing.assert_array_equal(idx[:k], uidx)
    np.testing.assert_array_equal(inv, uinv)
    np.testing.assert_array_equal(cnt[:k], ucnt)


# ---------------------------------------------------------------------------
# NonMaxSuppression
# ---------------------------------------------------------------------------
def _nms_ref(boxes, scores, max_out, iou_thr, score_thr):
    """Plain-python greedy NMS reference (corner format)."""
    rows = []
    B, S, _ = boxes.shape
    C = scores.shape[1]
    for b in range(B):
        y1 = np.minimum(boxes[b, :, 0], boxes[b, :, 2])
        y2 = np.maximum(boxes[b, :, 0], boxes[b, :, 2])
        x1 = np.minimum(boxes[b, :, 1], boxes[b, :, 3])
        x2 = np.maximum(boxes[b, :, 1], boxes[b, :, 3])
        area = (y2 - y1) * (x2 - x1)
        for c in range(C):
            alive = scores[b, c] > score_thr
            picked = []
            while alive.any() and len(picked) < max_out:
                i = int(np.where(alive, scores[b, c], -np.inf).argmax())
                picked.append(i)
                iy1 = np.maximum(y1[i], y1)
                iy2 = np.minimum(y2[i], y2)
                ix1 = np.maximum(x1[i], x1)
                ix2 = np.minimum(x2[i], x2)
                inter = np.clip(iy2 - iy1, 0, None) * np.clip(
                    ix2 - ix1, 0, None)
                union = area[i] + area - inter
                iou = np.where(union > 0, inter / union, 0)
                alive &= ~(iou > iou_thr)
                alive[i] = False
            rows.extend([b, c, i] for i in picked)
    return np.asarray(rows, np.int64).reshape(-1, 3)


def test_nms_matches_reference():
    B, S, C = 2, 12, 3
    boxes = rng.random((B, S, 4)).astype(np.float32) * 10
    scores = rng.random((B, C, S)).astype(np.float32)
    max_out, iou_thr, score_thr = 4, 0.5, 0.3
    (out,) = run_op(
        "NonMaxSuppression", {"boxes": boxes, "scores": scores},
        {"max_out": np.array(max_out, np.int64),
         "iou_thr": np.array(iou_thr, np.float32),
         "score_thr": np.array(score_thr, np.float32)}, opset=11)
    ref = _nms_ref(boxes, scores, max_out, iou_thr, score_thr)
    assert out.shape == (B * C * max_out, 3)
    got_valid = out[out[:, 0] >= 0]
    np.testing.assert_array_equal(got_valid, ref)
    np.testing.assert_array_equal(out[out[:, 0] < 0], -1)


def test_nms_center_point_boxes():
    boxes_c = np.array([[[5, 5, 2, 2], [5.2, 5.2, 2, 2], [9, 9, 1, 1]]],
                       np.float32)                      # [1, 3, 4] centers
    scores = np.array([[[0.9, 0.8, 0.7]]], np.float32)  # [1, 1, 3]
    (out,) = run_op(
        "NonMaxSuppression", {"boxes": boxes_c, "scores": scores},
        {"max_out": np.array(3, np.int64),
         "iou_thr": np.array(0.5, np.float32)},
        center_point_box=1, opset=11)
    valid = out[out[:, 0] >= 0]
    # box 1 heavily overlaps box 0 -> suppressed; box 2 survives
    np.testing.assert_array_equal(valid, [[0, 0, 0], [0, 0, 2]])


def test_nms_score_threshold_suppresses_everything():
    boxes = rng.random((1, 5, 4)).astype(np.float32)
    scores = rng.random((1, 2, 5)).astype(np.float32) * 0.1
    (out,) = run_op(
        "NonMaxSuppression", {"boxes": boxes, "scores": scores},
        {"max_out": np.array(3, np.int64),
         "iou_thr": np.array(0.5, np.float32),
         "score_thr": np.array(0.99, np.float32)}, opset=11)
    np.testing.assert_array_equal(out, -1)
