"""ViT family: full-model torch parity, int8 quantization."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.vit import TINY, build_vit
from onnx_rusty_inference_engine_tpu.quant import quantize_graph

rng = np.random.default_rng(127)
B = 2


@pytest.fixture(scope="module")
def vit_graph():
    return import_model(build_vit(TINY, batch=B))


def _img():
    return rng.standard_normal(
        (B, 3, TINY.image_size, TINY.image_size)).astype(np.float32)


def test_vit_forward(vit_graph):
    out = Engine(vit_graph).run({"pixel_values": _img()})["logits"]
    assert out.shape == (B, TINY.num_classes)
    assert np.all(np.isfinite(out))


def test_vit_vs_torch_full_model(vit_graph):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    g = vit_graph
    c = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in g.constants.items()}
    cfg = TINY
    D, H, hd, P = cfg.hidden, cfg.n_head, cfg.head_dim, cfg.patch_size
    x = _img()

    def ln(t, name):
        return F.layer_norm(t, (D,), c[f"{name}_g"], c[f"{name}_b"], 1e-6)

    def lin(t, name):
        return t @ c[f"{name}_w"] + c[f"{name}_b"]

    h = F.conv2d(torch.from_numpy(x), c["patch_w"], c["patch_b"], stride=P)
    N = cfg.n_patches
    h = h.reshape(B, D, N).transpose(1, 2)  # [B, N, D]
    # the CLS Expand is constant-folded at import; use the folded tensor
    cls = (c["cls_batched"] if "cls_batched" in c
           else c["cls_token"].expand(B, 1, D))
    h = torch.cat([cls, h], dim=1) + c["pos_emb"]
    S = N + 1
    for i in range(cfg.n_layer):
        x1 = ln(h, f"l{i}_ln1")
        q = lin(x1, f"l{i}_q").view(B, S, H, hd).transpose(1, 2)
        k = lin(x1, f"l{i}_k").view(B, S, H, hd).transpose(1, 2)
        v = lin(x1, f"l{i}_v").view(B, S, H, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), -1)
        ctx = (att @ v).transpose(1, 2).reshape(B, S, D)
        h = h + lin(ctx, f"l{i}_proj")
        x2 = ln(h, f"l{i}_ln2")
        h = h + lin(F.gelu(lin(x2, f"l{i}_fc")), f"l{i}_out")
    h = ln(h, "ln_f")
    want = lin(h[:, 0], "head").numpy()

    got = Engine(vit_graph).run({"pixel_values": x})["logits"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vit_int8(vit_graph):
    x = _img()
    q = quantize_graph(vit_graph, calibration_inputs=[{"pixel_values": x}])
    n_qc = sum(1 for n in q.nodes if n.op_type == "QLinearConv")
    n_qm = sum(1 for n in q.nodes if n.op_type == "QLinearMatMul")
    assert n_qc == 1  # the patch embedding
    assert n_qm == 6 * TINY.n_layer + 1  # q/k/v/proj/fc/out + head
    ref = Engine(vit_graph).run({"pixel_values": x})["logits"]
    got = Engine(q).run({"pixel_values": x})["logits"]
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.95, corr
