"""UNet family: torch parity (ConvTranspose + skip concats), int8."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.unet import TINY, build_unet
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(131)
B, S = 2, 32


@pytest.fixture(scope="module")
def unet_graph():
    return import_model(build_unet(TINY, batch=B, size=S))


def _img():
    return rng.standard_normal((B, 3, S, S)).astype(np.float32)


def test_unet_forward(unet_graph):
    out = Engine(unet_graph).run({"image": _img()})["mask_logits"]
    assert out.shape == (B, TINY.num_classes, S, S)
    assert np.all(np.isfinite(out))


def test_unet_vs_torch(unet_graph):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    g = unet_graph
    c = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in g.constants.items()}
    x = _img()

    def cr(t, name, stride=1):
        return F.relu(F.conv2d(t, c[f"{name}_w"], c[f"{name}_b"],
                               stride=stride, padding=1))

    h = torch.from_numpy(x)
    skips = []
    for d in range(TINY.depth):
        h = cr(h, f"enc{d}")
        skips.append(h)
        h = cr(h, f"down{d}", stride=2)
    h = cr(h, "bottleneck")
    for d in reversed(range(TINY.depth)):
        h = F.conv_transpose2d(h, c[f"up{d}_w"], stride=2)
        h = torch.cat([h, skips[d]], dim=1)
        h = cr(h, f"dec{d}")
    want = F.conv2d(h, c["head_w"], c["head_b"]).numpy()

    got = Engine(unet_graph).run({"image": x})["mask_logits"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_unet_int8(unet_graph):
    x = _img()
    q = quantize_graph(unet_graph, calibration_inputs=[{"image": x}])
    n_qc = sum(1 for n in q.nodes if n.op_type == "QLinearConv")
    assert n_qc == 2 * TINY.depth + 2 + TINY.depth  # enc/down + bottleneck/head + dec
    ref = Engine(unet_graph).run({"image": x})["mask_logits"]
    got = Engine(q).run({"image": x})["mask_logits"]
    # per-pixel argmax agreement (the segmentation-relevant metric)
    agree = (ref.argmax(1) == got.argmax(1)).mean()
    assert agree > 0.95, agree
