"""Training-graph loss ops: NegativeLogLikelihoodLoss / SoftmaxCrossEntropyLoss.

These appear in ONNX *training* exports (and in inference graphs that score
candidates, e.g. reranking); the reference engine (10-op CNN set,
src/inference_engine/model_inference.rs:138-161) has no loss ops.

TPU-native note: the per-position class pick `input[n, target[n], d...]` is
a gather with an index tensor the size of the batch — exactly the pattern
CLAUDE.md bans on this chip (index-gathers that a tiny matmul can scatter).
Both ops therefore lower the pick as a ONE-HOT MULTIPLY-SUM over the class
axis: XLA fuses the comparison + select + reduce into the surrounding
elementwise graph, and nothing touches the (catastrophically slow) gather
path. ignore_index falls out for free: an out-of-range index produces an
all-zero one-hot row.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph import Node
from .registry import LoweringContext, UnsupportedOpError, register


def _one_hot_pick(values, target, n_classes):
    """-sum over class axis of values * one_hot(target): values [N,C,d...],
    target int [N,d...] → picked [N,d...]. Out-of-range targets pick 0."""
    cls = jnp.arange(n_classes, dtype=jnp.int32)
    cls = cls.reshape((1, n_classes) + (1,) * (values.ndim - 2))
    oh = (target[:, None].astype(jnp.int32) == cls)
    return jnp.sum(jnp.where(oh, values, 0), axis=1)


def _nll_core(ctx: LoweringContext, node: Node, logp, target, weight):
    """Shared NLL math: loss positions, per-position weights, reduction."""
    n_classes = logp.shape[1]
    reduction = node.attr("reduction", b"mean")
    reduction = reduction.decode() if isinstance(reduction, bytes) else reduction
    ignore_index = node.attr("ignore_index")

    picked = -_one_hot_pick(logp, target, n_classes)  # [N, d...]
    if weight is not None:
        w_t = _one_hot_pick(
            jnp.broadcast_to(
                weight.reshape((1, n_classes) + (1,) * (picked.ndim - 1)),
                (picked.shape[0], n_classes) + picked.shape[1:]),
            target, n_classes)
    else:
        w_t = jnp.ones_like(picked)
    if ignore_index is not None:
        keep = (target.astype(jnp.int32) != int(ignore_index))
        w_t = jnp.where(keep, w_t, 0)
        picked = jnp.where(keep, picked, 0)
    loss = picked * w_t

    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        # spec: weighted mean — denominator is the summed per-position
        # weight (ignored positions carry weight 0), not the element count
        denom = jnp.sum(w_t)
        return jnp.sum(loss) / jnp.where(denom == 0, 1, denom)
    raise UnsupportedOpError(
        f"{node.op_type}: unknown reduction {reduction!r}")


@register("NegativeLogLikelihoodLoss")
def negative_log_likelihood_loss(ctx: LoweringContext, node: Node, ins):
    logp, target = ins[0], ins[1]
    weight = ins[2] if len(ins) > 2 else None
    return (_nll_core(ctx, node, logp, target, weight),)


@register("SoftmaxCrossEntropyLoss")
def softmax_cross_entropy_loss(ctx: LoweringContext, node: Node, ins):
    scores, target = ins[0], ins[1]
    weight = ins[2] if len(ins) > 2 else None
    import jax

    logp = jax.nn.log_softmax(scores, axis=1)
    loss = _nll_core(ctx, node, logp, target, weight)
    if len(node.outputs) > 1 and node.outputs[1]:
        return (loss, logp)
    return (loss,)
