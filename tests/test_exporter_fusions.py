"""Exporter-pattern fusion passes (passes.fuse_layernorm / fuse_gelu_erf)
against REAL torch exports: at opset <= 16 torch decomposes LayerNorm into
ReduceMean/Sub/Pow/Sqrt/Div chains and always emits exact GELU as the
Div/Erf/Add/Mul/Mul chain. The passes must collapse both AND preserve the
numerics exactly."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from onnx_rusty_inference_engine_tpu.engine import Engine  # noqa: E402
from onnx_rusty_inference_engine_tpu.graph import import_onnx  # noqa: E402

from test_torch_export import _export  # noqa: E402  (reuses onnx-free shim)

rng = np.random.default_rng(41)


class LnGeluBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln = nn.LayerNorm(32)
        self.fc1 = nn.Linear(32, 64)
        self.fc2 = nn.Linear(64, 32)
        self.act = nn.GELU()  # exact (erf) form

    def forward(self, x):
        return x + self.fc2(self.act(self.fc1(self.ln(x))))


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    m = nn.Sequential(LnGeluBlock(), LnGeluBlock()).eval()
    x = torch.randn(2, 8, 32)
    path = tmp_path_factory.mktemp("fuse") / "blk13.onnx"
    _export(m, (x,), path, opset=13)
    with torch.no_grad():
        ref = m(x).numpy()
    return str(path), x.numpy(), ref


def test_decomposed_layernorm_fused(exported):
    path, x, ref = exported
    g = import_onnx(path)
    ops = [n.op_type for n in g.nodes]
    assert ops.count("LayerNormalization") == 2   # one per block
    assert "Pow" not in ops and "Sqrt" not in ops  # chain gone


def test_erf_gelu_fused(exported):
    path, x, ref = exported
    g = import_onnx(path)
    ops = [n.op_type for n in g.nodes]
    assert ops.count("Gelu") == 2
    assert "Erf" not in ops


def test_fused_graph_matches_torch(exported):
    path, x, ref = exported
    g = import_onnx(path)
    out = Engine(g).run({g.input_names[0]: x})
    (y,) = out.outputs.values()
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


def test_opset17_native_ln_still_works(tmp_path):
    """opset 17 exports LayerNormalization natively; the GELU chain is
    still decomposed and must still fuse."""
    m = nn.Sequential(LnGeluBlock()).eval()
    x = torch.randn(1, 4, 32)
    path = tmp_path / "blk17.onnx"
    _export(m, (x,), path, opset=17)
    g = import_onnx(path)
    ops = [n.op_type for n in g.nodes]
    assert "LayerNormalization" in ops and "Gelu" in ops
    with torch.no_grad():
        ref = m(x).numpy()
    out = Engine(g).run({g.input_names[0]: x.numpy()})
    (y,) = out.outputs.values()
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
