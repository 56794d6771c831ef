"""E2E ingestion of INDEPENDENTLY-produced ONNX files (torch.onnx.export).

Round-1 verdict: all non-MNIST fixtures were built by our own GraphBuilder and
parsed back by our own codec, so a systematic encode/decode bug would cancel
out. These tests ingest files our code did not write — the only other
independent fixture is the reference's CNTK-exported mnist-8.onnx
(/root/reference/models/mnist-8.onnx, src/main.rs:11-14) — and assert our
outputs match torch's own forward pass.

The environment has torch but not the `onnx` package; the TorchScript
exporter only needs `onnx` for a final onnxscript-function-insertion pass
that is a no-op for plain aten models, so we bypass it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from onnx_rusty_inference_engine_tpu.engine import Engine  # noqa: E402
from onnx_rusty_inference_engine_tpu.graph import import_onnx  # noqa: E402


def _export(model, args, path, opset=17, **kw):
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    # _add_onnxscript_fn only splices onnxscript custom functions into the
    # proto (none exist for plain aten models) but unconditionally imports
    # the uninstalled `onnx` package — bypass it.
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        torch.onnx.export(model, args, str(path), opset_version=opset,
                          dynamo=False, **kw)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


class SmallCNN(nn.Module):
    """conv -> bn -> relu -> maxpool -> conv -> relu -> avgpool -> gemm."""

    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1)
        self.bn = nn.BatchNorm2d(8)
        self.c2 = nn.Conv2d(8, 16, 3, stride=2)
        self.fc = nn.Linear(16 * 3 * 3, 10)

    def forward(self, x):
        x = torch.relu(self.bn(self.c1(x)))
        x = torch.max_pool2d(x, 2)
        x = torch.relu(self.c2(x))
        x = torch.nn.functional.avg_pool2d(x, 1)
        return self.fc(torch.flatten(x, 1))


class SmallTransformer(nn.Module):
    """embedding -> 2x pre-LN encoder blocks (MHA + GELU MLP) -> head."""

    def __init__(self, vocab=64, d=32, heads=4):
        super().__init__()
        self.emb = nn.Embedding(vocab, d)
        self.blocks = nn.ModuleList([
            nn.TransformerEncoderLayer(
                d_model=d, nhead=heads, dim_feedforward=2 * d,
                activation="gelu", batch_first=True, norm_first=True)
            for _ in range(2)])
        self.norm = nn.LayerNorm(d)
        self.head = nn.Linear(d, vocab)

    def forward(self, ids):
        x = self.emb(ids)
        for b in self.blocks:
            x = b(x)
        return self.head(self.norm(x))


def test_torch_exported_cnn_matches_torch(tmp_path):
    torch.manual_seed(0)
    m = SmallCNN().eval()
    x = torch.randn(2, 3, 16, 16)
    path = tmp_path / "cnn.onnx"
    _export(m, (x,), path)

    g = import_onnx(str(path))
    assert g.opset == 17
    out = Engine(g).run({g.input_names[0]: x.numpy()})
    ref = m(x).detach().numpy()
    np.testing.assert_allclose(out.outputs[g.outputs[0]], ref,
                               rtol=1e-4, atol=1e-5)


def test_torch_exported_cnn_keeps_batchnorm_node(tmp_path):
    """Without constant folding the BatchNormalization node survives —
    exercises the importer + BN lowering on a real exporter's layout."""
    torch.manual_seed(1)
    m = SmallCNN().eval()
    x = torch.randn(2, 3, 16, 16)
    path = tmp_path / "cnn_bn.onnx"
    _export(m, (x,), path, do_constant_folding=False)

    g = import_onnx(str(path))
    out = Engine(g).run({g.input_names[0]: x.numpy()})
    ref = m(x).detach().numpy()
    np.testing.assert_allclose(out.outputs[g.outputs[0]], ref,
                               rtol=1e-4, atol=1e-5)


def test_torch_exported_transformer_matches_torch(tmp_path):
    torch.manual_seed(2)
    m = SmallTransformer().eval()
    ids = torch.randint(0, 64, (2, 9))
    path = tmp_path / "tfm.onnx"
    _export(m, (ids,), path)

    g = import_onnx(str(path))
    with torch.no_grad():
        ref = m(ids).numpy()
    out = Engine(g).run({g.input_names[0]: ids.numpy()})
    np.testing.assert_allclose(out.outputs[g.outputs[0]], ref,
                               rtol=1e-3, atol=1e-4)


def test_torch_exported_dynamic_batch(tmp_path):
    """Symbolic batch dim from a real exporter (dynamic_axes)."""
    torch.manual_seed(3)
    m = SmallCNN().eval()
    x = torch.randn(2, 3, 16, 16)
    path = tmp_path / "cnn_dyn.onnx"
    _export(m, (x,), path,
            input_names=["input"], output_names=["logits"],
            dynamic_axes={"input": {0: "batch"}, "logits": {0: "batch"}})

    g = import_onnx(str(path))
    spec = g.inputs[0]
    assert not isinstance(spec.shape[0], int)  # symbolic batch survived
    eng = Engine(g)
    for b in (1, 5):
        xb = torch.randn(b, 3, 16, 16)
        out = eng.run({"input": xb.numpy()})
        np.testing.assert_allclose(out.outputs["logits"],
                                   m(xb).detach().numpy(),
                                   rtol=1e-4, atol=1e-5)
