"""Loss ops differentially tested against torch (CPU): NLLLoss and
SoftmaxCrossEntropyLoss across reductions, class weights, ignore_index,
2-D and 4-D inputs, and the optional log_prob output."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from util import run_op

rng = np.random.default_rng(23)


def _nll_case(shape, reduction, weight=None, ignore_index=None):
    N, C = shape[0], shape[1]
    logp = np.log(rng.dirichlet(np.ones(C), size=(N,) + tuple(shape[2:]))
                  ).astype(np.float32)
    if logp.ndim > 2:  # class axis at dim 1, both here and in torch
        logp = np.moveaxis(logp, -1, 1)
    target = rng.integers(0, C, size=(N,) + tuple(shape[2:])).astype(np.int64)
    if ignore_index is not None:
        target.flat[:: max(target.size // 3, 1)] = ignore_index
    attrs = {"reduction": reduction}
    if ignore_index is not None:
        attrs["ignore_index"] = ignore_index
    feeds = {"logp": logp, "t": target}
    if weight is not None:
        feeds["w"] = weight
    (got,) = run_op("NegativeLogLikelihoodLoss", feeds, **attrs)
    want = F.nll_loss(
        torch.from_numpy(logp), torch.from_numpy(target),
        weight=None if weight is None else torch.from_numpy(weight),
        reduction=reduction,
        ignore_index=-100 if ignore_index is None else ignore_index,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_nll_2d(reduction):
    _nll_case((6, 5), reduction)


@pytest.mark.parametrize("reduction", ["sum", "mean"])
def test_nll_4d_weighted(reduction):
    w = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    _nll_case((3, 5, 4, 2), reduction, weight=w)


def test_nll_ignore_index_mean():
    w = rng.uniform(0.5, 2.0, size=4).astype(np.float32)
    _nll_case((8, 4), "mean", weight=w, ignore_index=2)
    _nll_case((8, 4), "mean", ignore_index=1)


def test_nll_out_of_range_ignore_index():
    # the torch/onnx convention: ignore_index may be outside [0, C)
    _nll_case((6, 3), "mean", ignore_index=-100)


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_softmax_ce(reduction):
    N, C = 5, 7
    scores = rng.standard_normal((N, C)).astype(np.float32) * 3
    target = rng.integers(0, C, size=N).astype(np.int64)
    loss, logp = run_op("SoftmaxCrossEntropyLoss",
                        {"s": scores, "t": target},
                        n_outputs=2, reduction=reduction)
    want = F.cross_entropy(torch.from_numpy(scores), torch.from_numpy(target),
                           reduction=reduction).numpy()
    np.testing.assert_allclose(loss, want, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        logp, F.log_softmax(torch.from_numpy(scores), dim=1).numpy(),
        rtol=2e-5, atol=1e-6)


def test_softmax_ce_4d_weighted_ignore():
    N, C, H = 4, 6, 3
    scores = rng.standard_normal((N, C, H)).astype(np.float32)
    target = rng.integers(0, C, size=(N, H)).astype(np.int64)
    target[0, 0] = 5
    w = rng.uniform(0.2, 1.5, size=C).astype(np.float32)
    (got,) = run_op("SoftmaxCrossEntropyLoss",
                    {"s": scores, "t": target, "w": w},
                    reduction="mean", ignore_index=5)
    want = F.cross_entropy(torch.from_numpy(scores), torch.from_numpy(target),
                           weight=torch.from_numpy(w), reduction="mean",
                           ignore_index=5).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
