"""Bounded-shape lowerings for ONNX ops whose OUTPUT SHAPE depends on
input VALUES: NonZero, Unique, Compress, NonMaxSuppression.

XLA compiles one static-shape program, so the true dynamic shapes cannot
exist on a TPU. Instead of refusing (the round-2 "design boundary" — and
the reference simply panics on any of these, model_inference.rs:158-160),
each op here follows the static-bound convention used by ORT/TF-Lite on
fixed-shape backends:

- the output is PADDED to a static worst-case size (the input extent, or
  an explicit bound like NMS's max_output_boxes_per_class);
- valid entries come first, in the op's specified order;
- padding is a documented sentinel (0 for indices/values, -1 rows for NMS
  selected_indices), so downstream gathers stay in-bounds.

This makes detection-style models (SSD/YOLO post-processing) compile into
the same single XLA program as everything else: the selection loops are
lax.fori_loop / sort-based compaction — compiler-friendly control flow,
no data-dependent shapes anywhere.

Padded-count recovery: every op's valid count is recomputable downstream
with pure ONNX ops (e.g. NonZero count = ReduceSum(Cast(x != 0)); NMS
valid rows have batch_index >= 0), so no out-of-spec extra outputs are
emitted and the wire format stays standard.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .registry import UnsupportedOpError, register
from .registry import index_dtype as _idt


def _stable_front_order(keep_mask: jnp.ndarray) -> jnp.ndarray:
    """Permutation that moves True positions to the front, preserving
    relative order on both sides (stable compaction via argsort on the
    inverted mask — XLA sorts are stable with these integer keys)."""
    return jnp.argsort(~keep_mask, stable=True)


@register("NonZero")
def nonzero(ctx, node, ins):
    """Indices of nonzero elements, row-major, as int64 [rank, N].

    Static bound: N = numel(x). Valid columns first (row-major order, per
    spec); padding columns are 0. The valid count equals
    ReduceSum(Cast(x != 0)) for any consumer that needs it."""
    x = ins[0]
    if x.ndim == 0:
        x = x[None]
    mask = (x != 0).reshape(-1)
    n = mask.shape[0]
    order = _stable_front_order(mask)                   # valid flats first
    count = jnp.sum(mask)
    flat = jnp.where(jnp.arange(n) < count, order, 0)   # pad -> index 0...
    # padding must be 0, not a stale flat index
    idx = jnp.unravel_index(flat, x.shape)
    out = jnp.stack([i.astype(_idt()) for i in idx])  # [rank, N]
    valid = (jnp.arange(n) < count)[None, :]
    return (jnp.where(valid, out, 0),)


@register("Compress")
def compress(ctx, node, ins):
    """Select elements along an axis (or of the flattened tensor) where
    condition is True. Static bound: the full input extent; selected
    elements first (original order), padding 0."""
    x, cond = ins[0], ins[1]
    cond = cond.astype(bool).reshape(-1)
    axis = node.attr("axis")
    if axis is None:
        x = x.reshape(-1)
        axis = 0
    else:
        axis = int(axis) % x.ndim
    n = x.shape[axis]
    # ONNX allows condition shorter than the axis: missing entries = False
    if cond.shape[0] < n:
        cond = jnp.pad(cond, (0, n - cond.shape[0]))
    else:
        cond = cond[:n]
    order = _stable_front_order(cond)
    count = jnp.sum(cond)
    y = jnp.take(x, order, axis=axis)
    valid = jnp.arange(n) < count
    shape = [1] * x.ndim
    shape[axis] = n
    return (jnp.where(valid.reshape(shape), y, jnp.zeros((), x.dtype)),)


@register("Unique")
def unique(ctx, node, ins):
    """Unique values with indices / inverse / counts, padded to the input
    extent (valid entries first, padding 0).

    sorted=1 (default): ascending values. sorted=0: order of first
    occurrence. axis attr (unique subtensors) is not supported — flattened
    semantics only, which is what detection/NLP post-processing uses."""
    if node.attr("axis") is not None:
        raise UnsupportedOpError(
            "Unique: axis attribute (unique subtensors) not supported; "
            "flattened semantics only")
    want_sorted = bool(int(node.attr("sorted", 1)))
    x = ins[0].reshape(-1)
    n = x.shape[0]
    if n == 0:
        e = jnp.zeros((0,), _idt())
        return x, e, e, e

    sort_perm = jnp.argsort(x, stable=True)             # stable: ties keep
    sx = x[sort_perm]                                   # original order
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sx[1:] != sx[:-1]])      # group starts
    group_id = jnp.cumsum(is_first) - 1                 # [n], per sorted pos
    count = jnp.sum(is_first)                           # number of uniques

    # per-group stats over the sorted stream (segment ops, static n bins)
    first_idx = jax.ops.segment_min(sort_perm, group_id, num_segments=n)
    counts = jax.ops.segment_sum(jnp.ones((n,), _idt()), group_id,
                                 num_segments=n)
    values = jax.ops.segment_max(sx, group_id, num_segments=n)  # any member

    if want_sorted:
        rank_of_group = jnp.arange(n)                   # already ascending
    else:
        # order groups by first occurrence; stable argsort of first_idx
        # restricted to valid groups (invalid groups have min-identity
        # first_idx = huge, so they sort to the back naturally)
        occ_order = jnp.argsort(
            jnp.where(jnp.arange(n) < count, first_idx,
                      jnp.iinfo(first_idx.dtype).max))
        values = values[occ_order]
        first_idx = first_idx[occ_order]
        counts = counts[occ_order]
        # rank_of_group[g] = output slot of sorted-group g
        rank_of_group = jnp.argsort(occ_order)

    valid = jnp.arange(n) < count
    y = jnp.where(valid, values, jnp.zeros((), x.dtype))
    indices = jnp.where(valid, first_idx, 0).astype(_idt())
    counts = jnp.where(valid, counts, 0).astype(_idt())
    # inverse: for input position p, the output slot of its group
    inv_sorted = rank_of_group[group_id]                # per sorted pos
    inverse = jnp.zeros((n,), _idt()).at[sort_perm].set(inv_sorted)
    return y, indices.astype(_idt()), inverse, counts


def _iou_matrix(boxes: jnp.ndarray, center_point_box: int) -> jnp.ndarray:
    """[S, 4] boxes -> [S, S] IoU. Corner format per ONNX default
    ([y1, x1, y2, x2] with flipped corners allowed); center format
    ([x_c, y_c, w, h]) when center_point_box=1."""
    if center_point_box:
        xc, yc, w, h = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        x1, x2 = xc - w / 2, xc + w / 2
        y1, y2 = yc - h / 2, yc + h / 2
    else:
        y1 = jnp.minimum(boxes[:, 0], boxes[:, 2])
        y2 = jnp.maximum(boxes[:, 0], boxes[:, 2])
        x1 = jnp.minimum(boxes[:, 1], boxes[:, 3])
        x2 = jnp.maximum(boxes[:, 1], boxes[:, 3])
    area = (y2 - y1) * (x2 - x1)                        # [S]
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    inter = (jnp.clip(iy2 - iy1, 0) * jnp.clip(ix2 - ix1, 0))
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_single(scores: jnp.ndarray, iou: jnp.ndarray, max_out: int,
                iou_thr, score_thr) -> tuple:
    """Greedy NMS for ONE (batch, class): scores [S], iou [S, S] ->
    (selected box indices [max_out], valid mask [max_out]).

    lax.fori_loop with a static trip count — each iteration picks the
    argmax of the still-alive scores and suppresses overlaps. All shapes
    static; the VPU does S-wide masking, no gathers of dynamic extent."""
    S = scores.shape[0]
    alive0 = scores > score_thr

    def body(k, carry):
        alive, sel, ok = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        any_left = masked[best] > -jnp.inf
        sel = sel.at[k].set(jnp.where(any_left, best, 0))
        ok = ok.at[k].set(any_left)
        # suppress the chosen box and everything overlapping it
        suppress = (iou[best] > iou_thr) | (jnp.arange(S) == best)
        alive = alive & jnp.where(any_left, ~suppress, True)
        return alive, sel, ok

    sel0 = jnp.zeros((max_out,), _idt())
    ok0 = jnp.zeros((max_out,), bool)
    _, sel, ok = lax.fori_loop(0, max_out, body, (alive0, sel0, ok0))
    return sel, ok


@register("NonMaxSuppression")
def non_max_suppression(ctx, node, ins):
    """Greedy per-class NMS. boxes [B,S,4], scores [B,C,S] ->
    selected_indices int64 [B*C*max_out, 3] rows of
    (batch, class, box), grouped by (batch, class) with each group's
    picks in descending-score order.

    Static-bound convention: max_output_boxes_per_class must be a
    trace-time constant (it is an initializer in every real detection
    export); invalid rows are (-1, -1, -1) so consumers mask with
    `row[..., 0] >= 0`. iou/score thresholds may be runtime tensors."""
    boxes, scores = ins[0], ins[1]
    if len(node.inputs) > 2 and node.inputs[2]:
        max_out = int(np.asarray(ctx.require_constant(
            node.inputs[2], "NonMaxSuppression max_output_boxes_per_class")
        ).reshape(()))
    else:
        max_out = 0
    if max_out <= 0:
        return (jnp.zeros((0, 3), _idt()),)
    iou_thr = (ins[3].reshape(()) if len(ins) > 3 and ins[3] is not None
               else jnp.float32(0.0))
    score_thr = (ins[4].reshape(()) if len(ins) > 4 and ins[4] is not None
                 else -jnp.inf)
    center = int(node.attr("center_point_box", 0))
    B, S, _ = boxes.shape
    C = scores.shape[1]
    max_out = min(max_out, S)

    iou = jax.vmap(lambda bx: _iou_matrix(bx, center))(boxes)  # [B,S,S]

    def per_batch(sc_b, iou_b):                          # sc_b [C,S]
        return jax.vmap(
            lambda sc: _nms_single(sc, iou_b, max_out, iou_thr, score_thr)
        )(sc_b)

    sel, ok = jax.vmap(per_batch)(scores, iou)           # [B,C,max_out]
    b_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=_idt())[:, None, None], sel.shape)
    c_idx = jnp.broadcast_to(
        jnp.arange(C, dtype=_idt())[None, :, None], sel.shape)
    rows = jnp.stack([b_idx, c_idx, sel], axis=-1)       # [B,C,M,3]
    rows = jnp.where(ok[..., None], rows, -1)
    return (rows.reshape(-1, 3),)
