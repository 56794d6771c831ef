"""Whisper-style audio encoder (models/audio.py): the log-mel frontend
runs IN-GRAPH (STFT + MelWeightMatrix); verify the frontend against an
independent numpy spectrogram and the transformer against torch."""

import numpy as np
import pytest

from onnx_rusty_inference_engine_tpu.debug import dump_intermediates
from onnx_rusty_inference_engine_tpu.engine import Engine
from onnx_rusty_inference_engine_tpu.graph import import_model
from onnx_rusty_inference_engine_tpu.models.audio import (
    TINY, build_audio_encoder)

rng = np.random.default_rng(29)


@pytest.fixture(scope="module")
def graph():
    return import_model(build_audio_encoder(TINY, batch=2, n_samples=1024))


def _np_logmel(x, g):
    """Independent numpy frontend: frame -> hann -> rfft -> power -> mel
    (mel matrix read from the imported graph's baked constant path via a
    probe of the 'mel_w'... the matrix itself is validated separately in
    test_ops_extra; here we take the op output as given)."""
    n_fft, hop = TINY.n_fft, TINY.hop
    B, L = x.shape
    F = (L - n_fft) // hop + 1
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack([x[:, f * hop: f * hop + n_fft] for f in range(F)], 1)
    spec = np.fft.rfft(frames * hann, axis=-1)
    return (np.abs(spec) ** 2).astype(np.float32)  # [B, F, bins]


def test_frontend_matches_numpy(graph):
    x = (rng.standard_normal((2, 1024)) * 0.1).astype(np.float32)
    vals = dump_intermediates(graph, {"audio": x}, names=["power", "logmel"])
    ref_power = _np_logmel(x, graph)
    np.testing.assert_allclose(vals["power"], ref_power, rtol=1e-3,
                               atol=1e-5)
    assert vals["logmel"].shape == (2, (1024 - 64) // 32 + 1, TINY.n_mels)
    assert np.all(np.isfinite(vals["logmel"]))


def test_audio_encoder_forward(graph):
    x = (rng.standard_normal((2, 1024)) * 0.1).astype(np.float32)
    out = Engine(graph).run({"audio": x})
    logits = out.outputs["logits"]
    assert logits.shape == (2, TINY.num_classes)
    assert np.all(np.isfinite(logits))
    # different audio -> different logits (frontend actually matters)
    out2 = Engine(graph).run({"audio": x * 0.0 + 0.01})
    assert np.abs(logits - out2.outputs["logits"]).max() > 1e-4


def test_transformer_stage_matches_torch(graph):
    """Feed the graph's own logmel into a torch reimplementation of the
    conv stem + encoder + head using the graph's weights."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F_

    x = (rng.standard_normal((2, 1024)) * 0.1).astype(np.float32)
    vals = dump_intermediates(graph, {"audio": x},
                              names=["logmel", "logits"])
    c = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in graph.constants.items()}
    lm = torch.from_numpy(vals["logmel"]).transpose(1, 2)  # [B, n_mels, F]
    a = F_.gelu(F_.conv1d(lm, c["conv1_w"], c["conv1_b"], padding=1),
                approximate="none")
    a = F_.pad(a, (1, 0))  # ONNX pads=[1,0] is asymmetric
    h = F_.gelu(F_.conv1d(a, c["conv2_w"], c["conv2_b"], stride=2),
                approximate="none")
    h = h.transpose(1, 2) + c["pos_emb"]

    D, H = TINY.d_model, TINY.n_head
    hd = D // H
    B, S, _ = h.shape

    def ln(t, g, bias):
        return F_.layer_norm(t, (D,), g, bias)

    for i in range(TINY.n_layer):
        y = ln(h, c[f"l{i}_ln1_g"], c[f"l{i}_ln1_b"])
        q = (y @ c[f"l{i}_q_w"] + c[f"l{i}_q_b"]).view(
            B, S, H, hd).transpose(1, 2)
        k = (y @ c[f"l{i}_k_w"] + c[f"l{i}_k_b"]).view(
            B, S, H, hd).transpose(1, 2)
        v = (y @ c[f"l{i}_v_w"] + c[f"l{i}_v_b"]).view(
            B, S, H, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), -1)
        ctx = (att @ v).transpose(1, 2).reshape(B, S, D)
        h = h + ctx @ c[f"l{i}_proj_w"] + c[f"l{i}_proj_b"]
        y = ln(h, c[f"l{i}_ln2_g"], c[f"l{i}_ln2_b"])
        m = F_.gelu(y @ c[f"l{i}_fc_w"] + c[f"l{i}_fc_b"], approximate="none")
        h = h + m @ c[f"l{i}_out_w"] + c[f"l{i}_out_b"]
    h = ln(h, c["ln_f_g"], c["ln_f_b"]).mean(dim=1)
    ref = (h @ c["head_w"] + c["head_b"]).numpy()
    np.testing.assert_allclose(vals["logits"], ref, rtol=1e-3, atol=1e-3)
